"""Fused MF-ViT CA fusion-head Pallas kernel.

The reference fusion head (crossvit_..._sum.py:35-65,:126-155) at its
default configuration (cross_attn_depth=1, multi_scale_enc_depth=1) only
ever *uses* the CLS row of each fused stream: ``apply`` adds the encoder
output to the original tokens and immediately pools position 0. The XLA
formulation still materializes full (B, N, D) sequences through two
concats + two LayerNorms per direction — ~15 ms of mostly HBM traffic at
B=2048 on v5e (tools/profile_fwd.py).

This kernel computes exactly the two fused CLS vectors in one pass over
the token streams: per direction, LN(eps=1e-5) over the [own-CLS,
other-patches] sequence, the k/v GEMMs (one packed (D, 2D) GEMM), the
1-query attention as VPU lane math (scores via elementwise mult + lane
reduction — the (1, N) score row never needs the MXU), the out
projection, the CLS residual, and the outer LN(eps=1e-6). Output: the
two (B, D) fused CLS rows ``tokens[:, 0] + encoder_cls``.

Backward = jax.vjp of the equivalent XLA math under custom_vjp (the
fusion head is a tiny share of the training step; inference is where the
15 ms lived).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]


def _dir_cls(tok_own, tok_other, lns5, lnb5, wq, wkv, wproj, bproj,
             lns6, lnb6, heads: int, scale: float):
    """One direction's fused-CLS math for ONE image, all in VMEM.

    tok_own/tok_other: (N, D). Sequence = [own CLS, other patches].
    Returns (1, D) fp32: own_cls + LN_eps1e-6(own_cls + proj(attn)).
    """
    N, D = tok_own.shape
    d = D // heads
    seq = jnp.concatenate([tok_own[0:1], tok_other[1:]], axis=0)
    sf = seq.astype(jnp.float32)
    mu = jnp.mean(sf, -1, keepdims=True)
    var = jnp.mean(jnp.square(sf - mu), -1, keepdims=True)
    xn = ((sf - mu) * jax.lax.rsqrt(var + 1e-5) * lns5 + lnb5).astype(
        seq.dtype)
    # packed k/v GEMM: (N, D) x (D, 2D)
    kv = jax.lax.dot_general(xn, wkv, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    k = kv[:, :D]
    v = kv[:, D:]
    q = jax.lax.dot_general(xn[0:1], wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (1, D)
    # 1-query attention via head-masked GEMMs, keeping every tensor in a
    # standard (rows, lanes) layout (narrow (N, heads) tensors and
    # broadcast-replicated softmaxes both trip Mosaic relayout bugs):
    # Q3[h] = q zeroed outside head h's lane block, so one (H, D) x (N, D)
    # GEMM yields per-head scores (H, N) with the sequence on lanes.
    head_of_lane = jax.lax.broadcasted_iota(jnp.int32, (heads, D), 1) // d
    head_idx = jax.lax.broadcasted_iota(jnp.int32, (heads, D), 0)
    mask = (head_of_lane == head_idx).astype(jnp.float32)  # (H, D)
    q3 = jnp.broadcast_to(q * scale, (heads, D)) * mask
    s = jax.lax.dot_general(q3, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (H, N)
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    p = e / jnp.sum(e, axis=-1, keepdims=True)            # (H, N) fp32
    o3 = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (H, D)
    o = jnp.sum(o3 * mask, axis=0, keepdims=True)         # (1, D) fp32
    y = jax.lax.dot_general(o.astype(seq.dtype), wproj,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bproj
    cal = tok_own[0:1].astype(jnp.float32) + y            # (1, D)
    mu2 = jnp.mean(cal, -1, keepdims=True)
    var2 = jnp.mean(jnp.square(cal - mu2), -1, keepdims=True)
    cls = (cal - mu2) * jax.lax.rsqrt(var2 + 1e-6) * lns6 + lnb6
    return tok_own[0:1].astype(jnp.float32) + cls


def _kernel(tc_ref, te_ref, lns5s_ref, lnb5s_ref, wqs_ref, wkvs_ref,
            wps_ref, bps_ref, lns6s_ref, lnb6s_ref,
            lns5l_ref, lnb5l_ref, wql_ref, wkvl_ref, wpl_ref, bpl_ref,
            lns6l_ref, lnb6l_ref, oc_ref, oe_ref, *, heads: int,
            scale: float):
    cb = tc_ref.shape[0]
    for b in range(cb):
        # 's' direction: CXR CLS attends over Enh patches -> CXR output
        oc_ref[b:b + 1] = _dir_cls(
            tc_ref[b], te_ref[b], lns5s_ref[...], lnb5s_ref[...],
            wqs_ref[...], wkvs_ref[...], wps_ref[...], bps_ref[...],
            lns6s_ref[...], lnb6s_ref[...], heads, scale)
        # 'l' direction: Enh CLS attends over CXR patches -> Enh output
        oe_ref[b:b + 1] = _dir_cls(
            te_ref[b], tc_ref[b], lns5l_ref[...], lnb5l_ref[...],
            wql_ref[...], wkvl_ref[...], wpl_ref[...], bpl_ref[...],
            lns6l_ref[...], lnb6l_ref[...], heads, scale)


def _flatten_layer(layer: Params):
    """fusion params layer {ca_s, ln_s, ca_l, ln_l} -> flat operand tuple
    (s-direction first, matching the kernel argument order)."""
    ops = []
    for ca_key, ln_key in (("ca_s", "ln_s"), ("ca_l", "ln_l")):
        ca = layer[ca_key]
        ln = layer[ln_key]
        ops.extend([
            ca["norm"]["scale"], ca["norm"]["bias"],
            ca["wq"]["w"],
            jnp.concatenate([ca["wk"]["w"], ca["wv"]["w"]], axis=1),
            ca["proj"]["w"], ca["proj"]["b"],
            ln["scale"], ln["bias"],
        ])
    return tuple(ops)


def _cls_xla(tok_c, tok_e, flat, heads: int):
    """XLA reference of the kernel math (identical formulation, batched) —
    the custom_vjp backward and the parity target."""
    (lns5s, lnb5s, wqs, wkvs, wps, bps, lns6s, lnb6s,
     lns5l, lnb5l, wql, wkvl, wpl, bpl, lns6l, lnb6l) = flat
    B, N, D = tok_c.shape
    d = D // heads
    scale = d ** -0.5

    def direction(own, other, lns5, lnb5, wq, wkv, wp, bp, lns6, lnb6):
        seq = jnp.concatenate([own[:, 0:1], other[:, 1:]], axis=1)
        sf = seq.astype(jnp.float32)
        mu = jnp.mean(sf, -1, keepdims=True)
        var = jnp.mean(jnp.square(sf - mu), -1, keepdims=True)
        xn = ((sf - mu) * jax.lax.rsqrt(var + 1e-5) * lns5 + lnb5).astype(
            seq.dtype)
        kv = jnp.einsum("bnd,dk->bnk", xn, wkv.astype(xn.dtype),
                        preferred_element_type=jnp.float32)
        k, v = kv[..., :D], kv[..., D:]
        q = jnp.einsum("bnd,dk->bnk", xn[:, 0:1], wq.astype(xn.dtype),
                       preferred_element_type=jnp.float32)
        s = jnp.einsum("bqhd,bnhd->bhqn", (q * scale).reshape(B, 1, heads, d),
                       k.reshape(B, N, heads, d))
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqn,bnhd->bqhd", p,
                       v.reshape(B, N, heads, d)).reshape(B, 1, D)
        y = jnp.einsum("bqd,dk->bqk", o.astype(xn.dtype), wp.astype(xn.dtype),
                       preferred_element_type=jnp.float32) + bp
        cal = own[:, 0:1].astype(jnp.float32) + y
        mu2 = jnp.mean(cal, -1, keepdims=True)
        var2 = jnp.mean(jnp.square(cal - mu2), -1, keepdims=True)
        cls = (cal - mu2) * jax.lax.rsqrt(var2 + 1e-6) * lns6 + lnb6
        return (own[:, 0].astype(jnp.float32) + cls[:, 0])

    oc = direction(tok_c, tok_e, lns5s, lnb5s, wqs, wkvs, wps, bps,
                   lns6s, lnb6s)
    oe = direction(tok_e, tok_c, lns5l, lnb5l, wql, wkvl, wpl, bpl,
                   lns6l, lnb6l)
    return oc, oe


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_fusion_cls(tok_c, tok_e, flat, heads: int = 3,
                     interpret: bool = False):
    """(B, N, D) token streams -> the two fused CLS rows (B, D) fp32:
    ``tokens[:, 0] + encoder_cls`` for CXR and Enh respectively (the only
    rows the depth-1 fusion head ever consumes). ``flat`` is
    ``_flatten_layer(layer_params)``."""
    return _impl(tok_c, tok_e, flat, heads, interpret)


@functools.partial(jax.jit, static_argnames=("heads", "interpret", "cb"))
def _impl(tok_c, tok_e, flat, heads, interpret, cb: int | None = None):
    B, N, D = tok_c.shape
    d = D // heads
    scale = d ** -0.5
    if cb:
        CB = cb
    elif interpret:
        CB = next(c for c in (8, 4, 2, 1) if B % c == 0)
    else:
        # compiled outputs are (CB, D) blocks: the sublane dim must be
        # 8-divisible (Pallas block rule) — callers fall back to the XLA
        # path when B % 8 != 0 (see fusion.apply)
        CB = 8
    if B % CB:
        raise ValueError(
            f"fused_fusion_cls needs B % {CB} == 0 (got B={B}); a partial "
            "last grid step would return uninitialized rows — use the XLA "
            "path (fusion.apply gates on this)")

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    def prep(i, a):
        # weights bf16 (match the token compute dtype), vectors fp32
        if a.ndim == 1:
            return vec(a)
        return a.astype(tok_c.dtype)

    operands = [prep(i, a) for i, a in enumerate(flat)]
    const = lambda i: (0, 0)  # noqa: E731
    blk3 = lambda i: (i, 0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731

    def spec(a):
        return pl.BlockSpec(a.shape, const, memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, heads=heads, scale=scale)
    oc, oe = pl.pallas_call(
        kern,
        grid=(B // CB,),
        in_specs=[
            pl.BlockSpec((CB, N, D), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, N, D), blk3, memory_space=pltpu.VMEM),
        ] + [spec(a) for a in operands],
        out_specs=[
            pl.BlockSpec((CB, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, D), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * (3 * D) * 2,
            bytes_accessed=2 * B * N * D * tok_c.dtype.itemsize,
            transcendentals=2 * B * N * heads,
        ),
        interpret=interpret,
    )(tok_c, tok_e, *operands)
    return oc, oe


def _fwd(tok_c, tok_e, flat, heads, interpret):
    out = _impl(tok_c, tok_e, flat, heads, interpret)
    return out, (tok_c, tok_e, flat)


def _bwd(heads, interpret, res, g):
    tok_c, tok_e, flat = res
    _, vjp = jax.vjp(lambda tc, te, fl: _cls_xla(tc, te, fl, heads),
                     tok_c, tok_e, flat)
    return vjp(g)


fused_fusion_cls.defvjp(_fwd, _bwd)


def supported(layer_count: int, enc_count: int, heads: int, dim: int) -> bool:
    """Kernel fast path covers the reference default config: depth-1
    encoder whose head_dim is lane-aligned (heads=3, dim=384 -> d=128)."""
    d = dim // heads
    return (layer_count == 1 and enc_count == 1 and dim % heads == 0
            and d % 128 == 0)
