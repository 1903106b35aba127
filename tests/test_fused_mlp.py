"""Fused LN+MLP+residual kernel: value and gradient parity with XLA."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import vit
from mfvit_tpu.nn.layers import layernorm, mlp
from mfvit_tpu.ops.fused_mlp import fused_mlp_block


def _xla_ref(x, ln_s, ln_b, w1, b1, w2, b2):
    h = layernorm({"scale": ln_s, "bias": ln_b}, x)
    h = jax.nn.gelu((h @ w1).astype(jnp.float32) + b1,
                    approximate=False).astype(x.dtype)
    return x + ((h @ w2).astype(jnp.float32) + b2).astype(x.dtype)


@pytest.fixture
def args(rng):
    ks = jax.random.split(rng, 4)
    D, Hd = 64, 256
    x = jax.random.normal(ks[0], (2, 67, D), jnp.float32)
    return (x, jnp.ones(D) * 1.1, jnp.zeros(D) + 0.05,
            jax.random.normal(ks[1], (D, Hd)) * 0.05, jnp.zeros(Hd),
            jax.random.normal(ks[2], (Hd, D)) * 0.05, jnp.zeros(D))


def test_fused_mlp_values(args):
    out = fused_mlp_block(*args, True)
    ref = _xla_ref(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_mlp_grads(args):
    def loss_f(fn):
        def inner(*a):
            return jnp.sum(fn(*a) ** 2)
        return inner

    gp = jax.grad(loss_f(lambda *a: fused_mlp_block(*a, True)),
                  argnums=tuple(range(7)))(*args)
    gx = jax.grad(loss_f(_xla_ref), argnums=tuple(range(7)))(*args)
    # the fused backward runs its gradient GEMMs with bf16 inputs (standard
    # TPU mixed-precision training); tolerance is bf16-grade relative to
    # gradient magnitude
    for a, b in zip(gp, gx):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, atol=4e-3)


def test_vit_forward_with_fused_mlp_matches_xla(rng):
    cfg = vit.ViTConfig("t", img_size=32, patch=16, dim=64, depth=2, heads=2)
    params = vit.init(rng, cfg, num_classes=3)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    a = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                  attn_backend="xla")
    b = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                  attn_backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-3)


def test_bigdim_backward_matches_xla_reference():
    """The big-dim split backward (dx kernel + Hd-chunked dw kernel)
    matches the fp32 XLA reference at bf16-recompute tolerance (vit_base
    gate lifted)."""
    from mfvit_tpu.ops import fused_mlp as fm

    B, N, D, Hd = 2, 13, 768, 3072
    ks = jax.random.split(jax.random.PRNGKey(4), 8)
    g = jax.random.normal(ks[0], (B, N, D), jnp.float32)
    x = jax.random.normal(ks[1], (B, N, D), jnp.float32)
    ln_s = 1 + 0.1 * jax.random.normal(ks[2], (D,))
    ln_b = 0.1 * jax.random.normal(ks[3], (D,))
    w1 = 0.05 * jax.random.normal(ks[4], (D, Hd))
    b1 = 0.05 * jax.random.normal(ks[5], (Hd,))
    w2 = 0.05 * jax.random.normal(ks[6], (Hd, D))
    b2 = 0.05 * jax.random.normal(ks[7], (D,))
    res = (x, ln_s, ln_b, w1, b1, w2, b2)
    ref = fm._bwd_xla_reference(True, res, g)
    out = fm._fused_mlp_bwd_bigdim(g, x, ln_s, ln_b, w1, b1, w2, True)
    for a, b in zip(out, ref):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        sc = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / sc, b / sc, atol=1e-2)
        cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999


def test_final_ln_variant_values_and_grads(args):
    """fused_mlp_block_final_ln == LN_final(fused_mlp_block(...)), values
    and gradients (the epilogue-LN backward recomputes in XLA fp32)."""
    from mfvit_tpu.ops.fused_mlp import fused_mlp_block_final_ln

    D = args[0].shape[-1]
    fs = jnp.ones(D) * 0.9
    fb = jnp.zeros(D) + 0.02

    def ref(*a):
        return layernorm({"scale": a[7], "bias": a[8]}, _xla_ref(*a[:7]))

    full = args + (fs, fb)
    out = fused_mlp_block_final_ln(*full, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(*full)),
                               atol=2e-5, rtol=1e-4)

    def loss_f(fn):
        def inner(*a):
            return jnp.sum(fn(*a) ** 2)
        return inner

    gp = jax.grad(loss_f(lambda *a: fused_mlp_block_final_ln(*a, True)),
                  argnums=tuple(range(9)))(*full)
    gx = jax.grad(loss_f(ref), argnums=tuple(range(9)))(*full)
    for a, b in zip(gp, gx):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, atol=4e-3)
