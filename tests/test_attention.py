import jax
import jax.numpy as jnp
import numpy as np

from mfvit_tpu.ops.attention import (
    cross_attention_1q,
    mhsa,
    mhsa_reference,
)


def _qkv(key, B=2, H=3, N=197, D=32, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    shape = (B, H, N, D)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def test_pallas_interpret_matches_xla(rng):
    q, k, v = _qkv(rng, B=1, H=2)
    ref = mhsa_reference(q, k, v)
    out = mhsa(q, k, v, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_pallas_interpret_matches_xla_bf16(rng):
    q, k, v = _qkv(rng, dtype=jnp.bfloat16)
    ref = mhsa_reference(q, k, v)
    out = mhsa(q, k, v, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_mhsa_matches_naive_softmax(rng):
    """XLA path against a hand-written per-head loop."""
    q, k, v = _qkv(rng, B=1, H=2, N=9, D=4)
    out = mhsa_reference(q, k, v)
    scale = 4 ** -0.5
    for h in range(2):
        s = np.asarray(q)[0, h] @ np.asarray(k)[0, h].T * scale
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out)[0, h], p @ np.asarray(v)[0, h],
                                   atol=1e-5, rtol=1e-5)


def test_cross_attention_1q_is_mhsa_row0(rng):
    """The 1-query CA must equal the first row of full attention."""
    q, k, v = _qkv(rng, B=2, H=3, N=33, D=16)
    full = mhsa_reference(q, k, v)
    one = cross_attention_1q(q[:, :, :1], k, v)
    np.testing.assert_allclose(np.asarray(one)[:, :, 0],
                               np.asarray(full)[:, :, 0],
                               atol=1e-5, rtol=1e-5)


def test_pallas_mhsa_grad_matches_xla(rng):
    """The Pallas forward must be differentiable (custom_vjp) and its
    gradients must match the XLA reference formulation."""
    import functools
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (2, 3, 197, 64), jnp.float32)
    k = jax.random.normal(k2, (2, 3, 197, 64), jnp.float32)
    v = jax.random.normal(k3, (2, 3, 197, 64), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(mhsa(q, k, v, backend="pallas_interpret") ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(mhsa(q, k, v, backend="xla") ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_packed_attention_matches_unpacked(rng):
    from mfvit_tpu.ops.attention import mhsa_from_packed
    B, N, heads, hd = 2, 197, 12, 32
    dim = heads * hd
    qkv = jax.random.normal(rng, (B, N, 3 * dim), jnp.float32)
    scale = hd ** -0.5
    ref = mhsa_from_packed(qkv, heads, scale, backend="xla")
    out = mhsa_from_packed(qkv, heads, scale, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_packed_attention_grad_matches(rng):
    from mfvit_tpu.ops.attention import mhsa_from_packed
    B, N, heads, hd = 2, 67, 4, 16
    dim = heads * hd
    qkv = jax.random.normal(rng, (B, N, 3 * dim), jnp.float32)
    scale = hd ** -0.5

    gp = jax.grad(lambda q: jnp.sum(
        mhsa_from_packed(q, heads, scale, backend="pallas_interpret") ** 2))(qkv)
    gx = jax.grad(lambda q: jnp.sum(
        mhsa_from_packed(q, heads, scale, backend="xla") ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-3, atol=1e-3)


def test_transposed_packed_attention_matches(rng):
    from mfvit_tpu.ops.attention import mhsa_from_packed, mhsa_packed_t
    B, N, heads, hd = 2, 197, 12, 32
    dim = heads * hd
    qkv = jax.random.normal(rng, (B, N, 3 * dim), jnp.float32)
    scale = hd ** -0.5
    ref = mhsa_from_packed(qkv, heads, scale, backend="xla")
    out_t = mhsa_packed_t(qkv.transpose(0, 2, 1), heads, scale, True)
    np.testing.assert_allclose(np.asarray(out_t.transpose(0, 2, 1)),
                               np.asarray(ref), atol=1e-4, rtol=1e-3)


def test_transposed_packed_grad_matches(rng):
    from mfvit_tpu.ops.attention import mhsa_from_packed, mhsa_packed_t
    B, N, heads, hd = 2, 67, 4, 16
    dim = heads * hd
    qkv_t = jax.random.normal(rng, (B, 3 * dim, N), jnp.float32)
    scale = hd ** -0.5
    gp = jax.grad(lambda q: jnp.sum(
        mhsa_packed_t(q, heads, scale, True) ** 2))(qkv_t)
    gx = jax.grad(lambda q: jnp.sum(
        mhsa_from_packed(q.transpose(0, 2, 1), heads, scale,
                         backend="xla").transpose(0, 2, 1) ** 2))(qkv_t)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-3, atol=1e-3)


def test_vit_pallas_transposed_path_matches_xla(rng):
    """The full ViT forward through the transposed-kernel path must equal
    the XLA path."""
    from mfvit_tpu.nn import vit as vit_mod
    cfg = vit_mod.ViTConfig("t", img_size=32, patch=16, dim=64, depth=2,
                            heads=2)
    params = vit_mod.init(rng, cfg, num_classes=3)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    a = vit_mod.apply(params, img, cfg, compute_dtype=jnp.float32,
                      attn_backend="xla")
    b = vit_mod.apply(params, img, cfg, compute_dtype=jnp.float32,
                      attn_backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-3)
