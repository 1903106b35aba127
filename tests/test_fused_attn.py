"""Fused attention half-block kernel: value and gradient parity with the
unfused XLA formulation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import vit
from mfvit_tpu.nn.layers import layernorm, linear
from mfvit_tpu.ops.attention import mhsa_from_packed
from mfvit_tpu.ops.fused_attn import fused_attention_block

H, Dh = 4, 16
D = H * Dh
SCALE = Dh ** -0.5


def _xla_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj):
    h = layernorm({"scale": ln_s, "bias": ln_b}, x)
    qkv = h @ wqkv.astype(h.dtype) + bqkv.astype(h.dtype)
    attn = mhsa_from_packed(qkv, H, SCALE, backend="xla")
    return x + attn @ wproj.astype(h.dtype) + bproj.astype(h.dtype)


@pytest.fixture
def args(rng):
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (2, 67, D), jnp.float32)
    return (x, jnp.ones(D) * 1.05, jnp.zeros(D) + 0.02,
            jax.random.normal(ks[1], (D, 3 * D)) * 0.05,
            jax.random.normal(ks[2], (3 * D,)) * 0.01,
            jax.random.normal(ks[3], (D, D)) * 0.05, jnp.zeros(D))


def test_fused_attention_values(args):
    out = fused_attention_block(*args, H, SCALE, True)
    ref = _xla_ref(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_attention_grads(args):
    def loss_f(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    gp = jax.grad(loss_f(lambda *a: fused_attention_block(*a, H, SCALE, True)),
                  argnums=tuple(range(7)))(*args)
    gx = jax.grad(loss_f(_xla_ref), argnums=tuple(range(7)))(*args)
    # fused backward runs its gradient GEMMs with bf16 inputs (standard TPU
    # mixed-precision training): bf16-grade tolerance vs the fp32 reference
    for a, b in zip(gp, gx):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-2)
        cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999, cos


def test_full_vit_pallas_path(rng):
    cfg = vit.ViTConfig("t", img_size=32, patch=16, dim=D, depth=2, heads=H)
    params = vit.init(rng, cfg, num_classes=3)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    a = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                  attn_backend="xla")
    b = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                  attn_backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-3)
    # training parity through the fused kernels
    def loss(p, backend):
        out = vit.apply(p, img, cfg, compute_dtype=jnp.float32,
                        attn_backend=backend)
        return jnp.sum(out ** 2)
    gx = jax.grad(lambda p: loss(p, "xla"))(params)
    gp = jax.grad(lambda p: loss(p, "pallas_interpret"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gp)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-2)


def test_bigdim_backward_matches_xla_reference():
    """The D>512 split backward (dx kernel + XLA weight-grad GEMMs) matches
    the fp32 XLA reference at bf16-recompute tolerance (vit_base gate,
    commit 9a9b307 lifted)."""
    from mfvit_tpu.ops import fused_attn as fa

    B, N, D, H = 2, 13, 768, 12
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    g = jax.random.normal(ks[0], (B, N, D), jnp.float32)
    x = jax.random.normal(ks[1], (B, N, D), jnp.float32)
    ln_s = 1 + 0.1 * jax.random.normal(ks[2], (D,))
    ln_b = 0.1 * jax.random.normal(ks[3], (D,))
    wqkv = 0.05 * jax.random.normal(ks[4], (D, 3 * D))
    bqkv = 0.05 * jax.random.normal(ks[5], (3 * D,))
    wproj = 0.05 * jax.random.normal(ks[6], (D, D))
    bproj = 0.05 * jax.random.normal(ks[7], (D,))
    scale = (D // H) ** -0.5
    res = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    ref = fa._bwd_xla_reference(H, scale, True, res, g)
    out = fa._fused_attn_bwd_bigdim(g, x, ln_s, ln_b, wqkv, bqkv, wproj,
                                    H, scale, True)
    pairs = [(out[0], ref[0]), (out[1], ref[3]), (out[2], ref[4]),
             (out[3], ref[5]), (out[4], ref[6]), (out[5], ref[1]),
             (out[6], ref[2])]
    for a, b in pairs:
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        sc = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / sc, b / sc, atol=1e-2)
        cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999


@pytest.mark.slow
def test_supported_gates_large_dims():
    """VMEM feasibility check: ViT-S/base at 224 fit; img-size 384
    (N=577) does not — vit.apply falls back to XLA math instead of a
    StopIteration mid-trace."""
    from mfvit_tpu.ops import fused_attn as fa
    from mfvit_tpu.nn import vit

    assert fa.supported(197, 384, 12)
    assert fa.supported(197, 768, 12)
    assert not fa.supported(577, 384, 12)
    # the gate covers the BACKWARD too: vit_small_ori@384 (N=577, H=6)
    # fits the forward but its staged backward would blow VMEM
    assert not fa.supported(577, 384, 6)
    # and big-dim forwards that only fit under the lenient small-dim
    # budget: vit_base@288 (N=325)
    assert not fa.supported(325, 768, 12)
    # shipped configs keep their calibrated CBs
    assert fa._fwd_cb(512, 197, 384, 12) == 4
    assert fa._bwd_cb(512, 197, 384, 12) == 2
    assert fa._fwd_cb(64, 197, 768, 12) == 1

    # img 384 now routes to the query-blocked long-sequence kernel
    assert fa.qblocked_supported(577, 384, 12)
    # adaptive query-block planner: the shipped vit_small@384 corner keeps
    # the full-lane QB=128; vit_small_ori@512 (previously stranded on XLA
    # attention) now fits at QB=64; vit_base@384 is infeasible even at
    # QB=32 (measured 18.21M scoped vs the 16M limit at the real batch —
    # QB only shrinks the score block, and the resident
    # qkv_t/weights/double-buffered-io terms already blow the budget)
    assert fa._qblocked_qb(577, 384, 12) == 128
    assert fa._qblocked_qb(577, 768, 12) is None
    assert fa._qblocked_qb(1025, 384, 6) == 64
    assert fa._qblocked_qb(1025, 768, 12) is None
    assert fa.qblocked_supported(1025, 384, 6)
    assert not fa.qblocked_supported(577, 768, 12)
    cfg = vit.get_config("vit_small", img_size=384)
    params = vit.init(jax.random.PRNGKey(0), cfg, num_classes=3)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 384, 384, 3))
    out = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                    attn_backend="pallas_interpret")  # blocked-kernel route
    assert out.shape == (2, 3)
    ref = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                    attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_qblocked_large_sequence_matches_xla():
    """The query-blocked long-sequence kernel (values AND gradients via
    its XLA-recompute backward) matches the unfused XLA formulation at a
    padded, odd sequence length (N=325 -> Np=384)."""
    from mfvit_tpu.ops import fused_attn as fa
    from mfvit_tpu.nn.layers import layernorm

    B, N, D, H = 2, 325, 64, 4
    k = jax.random.split(jax.random.PRNGKey(3), 6)
    x = jax.random.normal(k[0], (B, N, D), jnp.float32)
    ln_s = 1 + 0.02 * jax.random.normal(k[1], (D,))
    ln_b = 0.02 * jax.random.normal(k[2], (D,))
    wqkv = 0.1 * jax.random.normal(k[3], (D, 3 * D))
    bqkv = 0.02 * jax.random.normal(k[4], (3 * D,))
    wproj = 0.1 * jax.random.normal(k[5], (D, D))
    bproj = jnp.zeros((D,))
    scale = (D // H) ** -0.5

    def xla_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj):
        h = layernorm({"scale": ln_s, "bias": ln_b}, x)
        qkv = (h @ wqkv + bqkv).reshape(B, N, 3, H, D // H)
        q, kk, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kk) * scale
        p = jax.nn.softmax(s, -1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, D)
        return x + o @ wproj + bproj

    args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    ref = xla_ref(*args)
    got = fa.fused_attention_block_large(*args, H, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    gp = jax.grad(loss(lambda *a: fa.fused_attention_block_large(
        *a, H, scale, True)), argnums=tuple(range(7)))(*args)
    gx = jax.grad(loss(xla_ref), argnums=tuple(range(7)))(*args)
    for a, b in zip(gp, gx):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        sc = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / sc, b / sc, atol=2e-3)

    # the block loop is query-block-size-invariant: forced QB=64/32 (what
    # the planner picks at big dims, e.g. vit_base@384 -> 32) match the
    # default QB=128 result to dot-tiling noise (same per-row math,
    # different GEMM shapes -> different fp32 reduction splits)
    for forced in (64, 32):
        got_qb = fa._impl_qblocked(*args, H, scale, True, force_qb=forced)
        np.testing.assert_allclose(np.asarray(got_qb), np.asarray(got),
                                   atol=1e-5, rtol=1e-6)
