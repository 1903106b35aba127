"""Int8 serving variants of the fused block kernels (W8A8, inference only).

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate. The earlier
XLA-level W8A8 path was SLOWER than bf16 because dynamic activation
quantization costs extra HBM passes; here quantization happens inside the
kernels on VMEM-resident tiles, so the int8 GEMM speedup is pocketed.

Weights: per-output-channel symmetric int8 (quantized offline by
``quantize_vit_for_serving``). Activations: per-row (per-token) dynamic
absmax scales computed in-kernel. Attention math itself (scores, softmax,
PV) stays bf16/fp32; LayerNorms and the residual stream stay fp32/bf16 —
measured top-1 agreement with the bf16 path is 100% (tests + on-chip).

Inference-only by design: no custom VJP (training uses the bf16 kernels).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfvit_tpu.ops.fused_mlp import _gelu_exactish

Params = Dict[str, Any]


_MB = 1024 * 1024


def _i8_cb(B: int, N: int, D: int, heads: int):
    """Largest feasible CB for ``fused_attention_block_i8``, or None.

    Planning model: int8 weights + ONE loop iteration's fp32 score buffer
    (heads, N, Np) + the int32 qkv accumulator / fp32 transposed-qkv pair
    (3D, Np) + CB double-buffered bf16 io tiles. Temporaries are counted
    once, not per CB — Mosaic reuses the unrolled iterations' buffers
    (measured: vit_base CB=2 compiles although a per-CB count says 2x).
    The model still over-counts within-iteration reuse (scores/exp share,
    the PV epilogue reuses the qkv pair), so the budget is CALIBRATED,
    not physical VMEM: tools/calibrate_i8_attn.py measured 11 corners
    on-chip; every pass sits at est <= 18.9 MB (N=577/D=384 CB=2) and
    every fail at est >= 23.6 MB (N=385/D=768 CB=1) — 21 MB splits them
    with margin both ways."""
    Np = -(-N // 128) * 128
    est = lambda c: (4 * D * D                     # int8 qkv + proj  # noqa: E731
                     + heads * N * Np * 4          # fp32 scores
                     + 3 * D * Np * 8              # int32 acc + fp32 qkv_t
                     + c * 8 * N * D)              # dbl-buffered bf16 io
    return next((c for c in (2, 1) if B % c == 0 and est(c) < 21 * _MB),
                None)


def attn_supported(N: int, D: int, heads: int) -> bool:
    """VMEM feasibility of ``fused_attention_block_i8`` at these dims.

    Shares ``_i8_cb``'s exact formula (the kernel's own CB planner), so
    vit.apply's gate and the kernel can never disagree — the
    fused_attn.supported() pattern. False => vit.apply dequantizes the
    int8 weights and runs the unfused XLA attention half instead (long
    sequences at big dims, e.g. vit_base at img-size >= 384)."""
    return _i8_cb(1, N, D, heads) is not None


def attn_kernel_ok(N: int, D: int, heads: int, interpret: bool) -> bool:
    """vit.apply's routing seam for the qkv8 attention half: interpret
    mode has no VMEM limit so it always takes the kernel. Tests
    monkeypatch THIS function to drive the composite fallback path
    (XLA dequant attention + Pallas int8 MLP) off-chip."""
    return interpret or attn_supported(N, D, heads)


def dequant_w(p: Params) -> jnp.ndarray:
    """int8 + per-out-column scales -> fp32 weight (XLA fallback path)."""
    return p["q"].astype(jnp.float32) * p["s"]


def quantize_weight_cols(w: jnp.ndarray) -> Params:
    """fp32 (in, out) -> int8 + per-OUT-column fp32 scales."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def _quant_rows(h: jnp.ndarray):
    """fp32 (M, K) -> int8 + per-row scale (M, 1)."""
    s = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    return q, s


# ----------------------------------------------------------- int8 MLP half

def _mlp_kernel_i8(x_ref, lns_ref, lnb_ref, w1q_ref, w1s_ref, b1_ref,
                   w2q_ref, w2s_ref, b2_ref, o_ref):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns_ref[...] + lnb_ref[...]
    hq, hs = _quant_rows(h)
    acc = jax.lax.dot_general(hq, w1q_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    h1 = acc.astype(jnp.float32) * hs * w1s_ref[...] + b1_ref[...]
    h1 = _gelu_exactish(h1)
    h1q, h1s = _quant_rows(h1)
    acc2 = jax.lax.dot_general(h1q, w2q_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * h1s * w2s_ref[...] + b2_ref[...]
    o_ref[...] = x + y.astype(x.dtype)


from mfvit_tpu.ops.fused_mlp import _tile_m


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mlp_block_i8(x, ln_s, ln_b, w1q, w1s, b1, w2q, w2s, b2,
                       interpret: bool = False):
    B, N, D = x.shape
    Hd = w1q.shape[1]
    TM = _tile_m(D, Hd)
    M = B * N
    Mp = ((M + TM - 1) // TM) * TM
    xp = x.reshape(M, D)
    if Mp != M:
        xp = jnp.pad(xp, ((0, Mp - M), (0, 0)))

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        _mlp_kernel_i8,
        grid=(Mp // TM,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * D * Hd * 2,
            bytes_accessed=2 * Mp * D * x.dtype.itemsize + D * Hd * 2,
            transcendentals=Mp * Hd,
        ),
        interpret=interpret,
    )(xp, vec(ln_s), vec(ln_b), w1q, vec(w1s), vec(b1), w2q, vec(w2s),
      vec(b2))
    return out[:M].reshape(B, N, D)


# ----------------------------------------- int8 attention half (qkv/proj)

def _attn_kernel_i8(x_ref, lns_ref, lnb_ref, wqkvq_ref, wqkvs_ref,
                    bqkv_ref, wprojq_ref, wprojs_ref, bproj_ref, o_ref, *,
                    heads: int, scale: float):
    cb, N, D = x_ref.shape
    Dh = D // heads
    for b in range(cb):
        xb = x_ref[b]
        xf = xb.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns_ref[...] \
            + lnb_ref[...]
        hq, hs = _quant_rows(h)  # (N, D) int8, (N, 1)
        # transposed int8 GEMM: (3D, N) int32
        acc = jax.lax.dot_general(wqkvq_ref[...], hq,
                                  (((0,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        qkv_t = acc.astype(jnp.float32) * wqkvs_ref[...].T * hs.T \
            + bqkv_ref[...].T
        qkv = qkv_t.astype(xb.dtype).reshape(3, heads, Dh, N)
        q = (qkv[0].astype(jnp.float32) * scale).astype(xb.dtype)
        k, v = qkv[1], qkv[2]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        mx = jnp.max(s, -1, keepdims=True)
        p = jnp.exp(s - mx)
        r = 1.0 / jnp.sum(p, -1, keepdims=True)
        o = jax.lax.dot_general(v, p.astype(v.dtype),
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o * r.reshape(heads, 1, N)
        o = o.reshape(D, N)
        # per-token (column) quant of o, int8 proj GEMM -> (N, D)
        os_ = jnp.max(jnp.abs(o), axis=0, keepdims=True) / 127.0  # (1, N)
        os_ = jnp.where(os_ == 0, 1.0, os_)
        oq = jnp.clip(jnp.round(o / os_), -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(oq, wprojq_ref[...],
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        y = acc2.astype(jnp.float32) * os_.T * wprojs_ref[...] \
            + bproj_ref[...]
        o_ref[b] = xb + y.astype(xb.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "interpret",
                                    "force_cb"))
def fused_attention_block_i8(x, ln_s, ln_b, wqkvq, wqkvs, bqkv, wprojq,
                             wprojs, bproj, heads: int, scale: float,
                             interpret: bool = False,
                             force_cb: int | None = None):
    B, N, D = x.shape
    if force_cb is not None:
        # calibration-only override (tools/calibrate_i8_attn.py): compile
        # at exactly this CB so the PROBE measures the chip, not the
        # planner — production call sites must leave it None
        assert B % force_cb == 0, (B, force_cb)
        CB = force_cb
    else:
        CB = _i8_cb(B, N, D, heads)
    if CB is None:
        if interpret:
            # interpreter mode has no VMEM constraint (off-chip debugging)
            CB = next(c for c in (2, 1) if B % c == 0)
        else:
            raise ValueError(
                f"int8 fused attention kernel does not fit VMEM at N={N}, "
                f"D={D} even at CB=1 — gate call sites on "
                "fused_int8.attn_supported() (vit.apply does)")

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    kern = functools.partial(_attn_kernel_i8, heads=heads, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B // CB,),
        in_specs=[
            pl.BlockSpec((CB, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * 4 * D + 4 * B * heads * N * N * (D // heads),
            bytes_accessed=2 * B * N * D * x.dtype.itemsize + 4 * D * D,
            transcendentals=B * heads * N * N,
        ),
        interpret=interpret,
    )(x, vec(ln_s), vec(ln_b), wqkvq, vec(wqkvs), vec(bqkv), wprojq,
      vec(wprojs), vec(bproj))


# ------------------------------------------------------------- converters

def quantize_vit_for_serving(params: Params) -> Params:
    """Produce a serving param tree whose blocks carry int8 weights for the
    fused kernels (detected via the 'qkv8' key in vit.apply). Patch embed,
    LNs, cls/pos and the fp32 head stay exact."""
    q: Params = {k: v for k, v in params.items() if k != "blocks"}
    q["blocks"] = []
    for blk in params["blocks"]:
        qkv8 = quantize_weight_cols(blk["qkv"]["w"])
        proj8 = quantize_weight_cols(blk["proj"]["w"])
        fc18 = quantize_weight_cols(blk["mlp"]["fc1"]["w"])
        fc28 = quantize_weight_cols(blk["mlp"]["fc2"]["w"])
        q["blocks"].append({
            "norm1": blk["norm1"], "norm2": blk["norm2"],
            "qkv8": dict(qkv8, b=blk["qkv"].get(
                "b", jnp.zeros(blk["qkv"]["w"].shape[1], jnp.float32))),
            "proj8": dict(proj8, b=blk["proj"]["b"]),
            "fc18": dict(fc18, b=blk["mlp"]["fc1"]["b"]),
            "fc28": dict(fc28, b=blk["mlp"]["fc2"]["b"]),
        })
    return q
