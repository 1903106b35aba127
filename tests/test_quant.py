"""Int8 W8A8 inference path: quantized linear accuracy and full quantized
ViT forward close to the bf16/fp32 reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import vit
from mfvit_tpu.ops import quant

TINY = vit.ViTConfig("t", img_size=32, patch=16, dim=64, depth=2, heads=2)


def test_quantized_linear_close(rng):
    k1, k2 = jax.random.split(rng)
    w = jax.random.normal(k1, (64, 128)) * 0.05
    x = jax.random.normal(k2, (10, 64))
    qp = quant.quantize_weight(w)
    assert qp["q"].dtype == jnp.int8
    y = quant.quantized_linear(qp, x)
    ref = x @ w
    err = np.abs(np.asarray(y) - np.asarray(ref))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.03, rel


def test_quantized_vit_forward_close(rng):
    params = vit.init(rng, TINY, num_classes=3)
    qparams = quant.quantize_vit_params(params)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ref = np.asarray(vit.apply(params, img, TINY, compute_dtype=jnp.float32,
                               attn_backend="xla"))
    out = np.asarray(vit.apply(qparams, img, TINY,
                               compute_dtype=jnp.float32,
                               attn_backend="xla"))
    # top-1 agreement and small logit drift
    assert (out.argmax(-1) == ref.argmax(-1)).all()
    assert np.abs(out - ref).max() < 0.15 * max(1.0, np.abs(ref).max())


def test_quantize_preserves_head_exactness(rng):
    params = vit.init(rng, TINY, num_classes=3)
    q = quant.quantize_vit_params(params)
    np.testing.assert_array_equal(np.asarray(q["head"]["w"]),
                                  np.asarray(params["head"]["w"]))
    assert "wq" in q["blocks"][0]["qkv"]


def test_quantize_conv_stem_vit(rng):
    """vit_conv_* archs keep their conv stem full precision."""
    cfg = vit.ViTConfig("ct", img_size=32, patch=16, dim=64, depth=1,
                        heads=2, conv_stem=True, qkv_bias=False)
    params = vit.init(rng, cfg, num_classes=3)
    q = quant.quantize_vit_params(params)
    assert "stem" in q["patch"]  # untouched
    assert "wq" in q["blocks"][0]["proj"]
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = vit.apply(q, img, cfg, compute_dtype=jnp.float32,
                    attn_backend="xla")
    assert out.shape == (2, 3)


def test_int8_fused_serving_path(rng):
    """The in-kernel W8A8 path (fused_int8) matches the bf16 path: same
    top-1, small logit drift."""
    from mfvit_tpu.ops import fused_int8 as fi8
    cfg = vit.ViTConfig("t8", img_size=32, patch=16, dim=64, depth=2,
                        heads=2)
    params = vit.init(rng, cfg, num_classes=3)
    qparams = fi8.quantize_vit_for_serving(params)
    assert "qkv8" in qparams["blocks"][0]
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ref = np.asarray(vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                               attn_backend="xla"))
    out = np.asarray(vit.apply(qparams, img, cfg,
                               compute_dtype=jnp.float32,
                               attn_backend="pallas_interpret"))
    assert (out.argmax(-1) == ref.argmax(-1)).all()
    assert np.abs(out - ref).max() < 0.2 * max(1.0, np.abs(ref).max()), \
        np.abs(out - ref).max()


def test_int8_attn_vmem_gate():
    """The int8 attention kernel's feasibility gate, pinned to the
    on-chip calibration matrix (tools/calibrate_i8_attn.py): ViT-S fits
    through N=577 (img-size 384); vit_base dims blow the fp32 score
    buffers past N=257. Gate and kernel share the _i8_cb planner, so
    these verdicts are exactly the kernel's compile feasibility."""
    from mfvit_tpu.ops import fused_int8 as fi8
    # measured PASS corners
    assert fi8.attn_supported(197, 384, 6)
    assert fi8.attn_supported(197, 768, 12)
    assert fi8.attn_supported(257, 768, 12)
    assert fi8.attn_supported(577, 384, 6)
    # measured FAIL corners
    assert not fi8.attn_supported(385, 768, 12)
    assert not fi8.attn_supported(577, 768, 12)
    assert not fi8.attn_supported(769, 384, 6)
    # the planner mirrors the gate: feasible dims pick a CB, infeasible
    # dims return None (the kernel raises, pointing at the gate)
    assert fi8._i8_cb(4, 197, 384, 6) == 2
    assert fi8._i8_cb(3, 197, 384, 6) == 1  # odd batch
    assert fi8._i8_cb(4, 577, 768, 12) is None


def test_i8_attn_force_cb_bypasses_planner(rng, monkeypatch):
    """force_cb (the calibration tool's override) compiles at exactly the
    requested CB without consulting _i8_cb — otherwise corners the current
    budget rejects would raise at trace time and the budget could never be
    re-calibrated downward on-chip."""
    from mfvit_tpu.ops import fused_int8 as fi8
    D, N, heads = 64, 64, 2
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, N, D), jnp.bfloat16)
    ln = jnp.ones((D,), jnp.float32)
    w = fi8.quantize_weight_cols(jax.random.normal(k, (D, 3 * D)) * 0.05)
    p = fi8.quantize_weight_cols(jax.random.normal(k, (D, D)) * 0.05)
    b3 = jnp.zeros((3 * D,), jnp.float32)
    bd = jnp.zeros((D,), jnp.float32)
    args = (x, ln, jnp.zeros_like(ln), w["q"], w["s"], b3, p["q"], p["s"],
            bd, heads, (D // heads) ** -0.5)
    planned = np.asarray(fi8.fused_attention_block_i8(*args, True))

    def boom(*a):
        raise AssertionError("planner consulted despite force_cb")

    monkeypatch.setattr(fi8, "_i8_cb", boom)
    forced = np.asarray(fi8.fused_attention_block_i8(*args, True,
                                                     force_cb=1))
    np.testing.assert_allclose(forced, planned, rtol=0, atol=1e-5)
    # a fresh trace WITHOUT force_cb does consult the planner (different
    # batch so the jit cache can't serve the first call's trace)
    args4 = (jnp.concatenate([x, x]),) + args[1:]
    with pytest.raises(AssertionError, match="planner consulted"):
        fi8.fused_attention_block_i8(*args4, True)


def test_int8_composite_fallback(rng, monkeypatch):
    """The composite serving path — dequant-weight attention + the Pallas
    int8 MLP kernel — is what a VMEM-infeasible int8-attention config
    runs on the Pallas backend (vit_base at img >= 384). Since round 5
    the dequant attention half itself runs through the query-blocked
    bf16 KERNEL when it fits (tier 2 of the fallback chain), not unfused
    XLA. Unreachable naturally on CPU (interpret mode has no VMEM limit),
    so monkeypatch the fused_int8.attn_kernel_ok routing seam to force it
    through vit.apply and check it against the fp32 reference."""
    from mfvit_tpu.ops import fused_int8 as fi8
    cfg = vit.ViTConfig("t8c", img_size=32, patch=16, dim=64, depth=2,
                        heads=2)
    params = vit.init(rng, cfg, num_classes=3)
    qparams = fi8.quantize_vit_for_serving(params)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ref = np.asarray(vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                               attn_backend="xla"))
    full = np.asarray(vit.apply(qparams, img, cfg,
                                compute_dtype=jnp.float32,
                                attn_backend="pallas_interpret"))
    monkeypatch.setattr(fi8, "attn_kernel_ok",
                        lambda N, D, heads, interp: False)
    large_calls = []
    orig_large = vit.fused_attention_block_large

    def large_spy(*a, **k):
        large_calls.append(1)
        return orig_large(*a, **k)

    monkeypatch.setattr(vit, "fused_attention_block_large", large_spy)
    comp = np.asarray(vit.apply(qparams, img, cfg,
                                compute_dtype=jnp.float32,
                                attn_backend="pallas_interpret"))
    # tier 2 was taken: the query-blocked kernel ran in every block
    assert len(large_calls) == cfg.depth, large_calls
    # the composite path really diverged from the full-kernel path (the
    # attention half is W8-dequant instead of in-kernel W8A8) yet stays
    # close to the reference with the same top-1
    assert (comp.argmax(-1) == ref.argmax(-1)).all()
    assert np.abs(comp - ref).max() < 0.2 * max(1.0, np.abs(ref).max()), \
        np.abs(comp - ref).max()
    assert np.abs(comp - full).max() > 0.0  # the branch actually switched


def test_int8_kernels_survive_bf16_vmem_gate(rng, monkeypatch):
    """Regression: a qkv8 tree routes on its OWN planner (i8_pallas), not
    the bf16 kernels' VMEM gates. Emulates a config where the bf16 gates
    AND the int8 attention planner AND the query-blocked kernel all
    reject (vit_base at img >= 512) on the real 'pallas' backend, and
    asserts the N-independent row-tiled int8 MLP kernel STILL runs
    (previously the whole block silently fell back to full-dequant XLA,
    losing the composite path's int8 MLP speedup)."""
    from mfvit_tpu.ops import fused_int8 as fi8
    cfg = vit.ViTConfig("t8g", img_size=32, patch=16, dim=64, depth=2,
                        heads=2)
    params = vit.init(rng, cfg, num_classes=3)
    qparams = fi8.quantize_vit_for_serving(params)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    # composite reference on the interpret backend (bf16 gates can't fire
    # there, so the attention seams are forced): tier-3 XLA dequant
    monkeypatch.setattr(fi8, "attn_kernel_ok",
                        lambda N, D, heads, interp: False)
    monkeypatch.setattr(vit, "qblocked_supported",
                        lambda N, D, heads: False)
    comp = np.asarray(vit.apply(qparams, img, cfg,
                                compute_dtype=jnp.float32,
                                attn_backend="pallas_interpret"))
    # the vit_base@512 situation: non-interpret backend, bf16 gates reject
    monkeypatch.setattr(vit, "fused_attn_supported",
                        lambda N, D, heads: False)
    calls = []
    orig_mlp = fi8.fused_mlp_block_i8

    def mlp_spy(x, lns, lnb, w1q, w1s, b1, w2q, w2s, b2, interpret=False):
        calls.append(interpret)
        # delegate to interpret mode: no real Pallas compile on CPU
        return orig_mlp(x, lns, lnb, w1q, w1s, b1, w2q, w2s, b2, True)

    monkeypatch.setattr(fi8, "fused_mlp_block_i8", mlp_spy)
    out = np.asarray(vit.apply(qparams, img, cfg,
                               compute_dtype=jnp.float32,
                               attn_backend="pallas"))
    # the MLP kernel was reached on the non-interpret path, every block
    assert calls == [False] * cfg.depth, calls
    # and the math equals the composite path (XLA dequant attention +
    # int8 MLP kernel)
    np.testing.assert_allclose(out, comp, rtol=0, atol=1e-5)


def test_int8_xla_dequant_fallback(rng):
    """When the Pallas path is off (or the kernel is VMEM-infeasible) a
    qkv8 tree still serves: int8 weights are dequantized and the unfused
    XLA math runs — close to the fp32 reference, same top-1."""
    from mfvit_tpu.ops import fused_int8 as fi8
    cfg = vit.ViTConfig("t8f", img_size=32, patch=16, dim=64, depth=2,
                        heads=2)
    params = vit.init(rng, cfg, num_classes=3)
    qparams = fi8.quantize_vit_for_serving(params)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ref = np.asarray(vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                               attn_backend="xla"))
    out = np.asarray(vit.apply(qparams, img, cfg,
                               compute_dtype=jnp.float32,
                               attn_backend="xla"))
    assert (out.argmax(-1) == ref.argmax(-1)).all()
    # W8 dequant + fp32 activations: tighter than the in-kernel W8A8 path
    assert np.abs(out - ref).max() < 0.1 * max(1.0, np.abs(ref).max()), \
        np.abs(out - ref).max()
