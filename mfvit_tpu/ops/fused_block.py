"""Whole-transformer-block Pallas kernel: LN1+qkv+MHSA+proj+res + LN2+MLP+res.

Round-1 shipped TWO kernels per block (ops/fused_attn.py + ops/fused_mlp.py);
each reads and writes the full (B, N, D) activation to HBM, so the residual
seam between the halves costs two extra HBM passes per block. This kernel
keeps ``x`` VMEM-resident across the seam: one read + one write of the
activation per block instead of two of each, with every weight of the block
resident in VMEM (ViT-S block weights = 3.6 MB bf16, well inside the 16 MB
budget with CB=2 images per grid step and double-buffered tiles).

The attention math is per-image (batched-heads dot_generals, transposed qkv
layout — see ops/fused_attn.py); the MLP half runs on the flattened
(CB*N, D) row block in one GEMM pair so the MXU sees large M.

Backward composes the existing fused backward kernels (recompute the
attention half forward to get the MLP-half input), so training through this
kernel costs the same as the two-kernel path.

Reference chain being accelerated: one ViT block of the branch forwards in
the MF-ViT CA inference path (SURVEY §3.4; fusion main :128-135).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfvit_tpu.ops import fused_attn as fa
from mfvit_tpu.ops import fused_mlp as fm
from mfvit_tpu.ops.fused_mlp import _gelu_exactish


def _block_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                  b2_ref, o_ref, *, heads: int, scale: float):
    cb, N, D = x_ref.shape
    Dh = D // heads
    # ---- attention half, per image (scores never leave VMEM)
    for b in range(cb):
        xb = x_ref[b]
        xf = xb.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln1s_ref[...]
             + ln1b_ref[...]).astype(xb.dtype)
        qkv_t = jax.lax.dot_general(
            wqkv_ref[...], h, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv_t = qkv_t + bqkv_ref[...].T
        qkv = qkv_t.astype(xb.dtype).reshape(3, heads, Dh, N)
        q = (qkv[0].astype(jnp.float32) * scale).astype(xb.dtype)
        k, v = qkv[1], qkv[2]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        mx = jnp.max(s, -1, keepdims=True)
        p = jnp.exp(s - mx)
        r = 1.0 / jnp.sum(p, -1, keepdims=True)
        o = jax.lax.dot_general(
            v, p.astype(v.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o = (o * r.reshape(heads, 1, N)).reshape(D, N).astype(xb.dtype)
        y = jax.lax.dot_general(
            o, wproj_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # x2 lives in o_ref (VMEM) — never round-trips to HBM
        o_ref[b] = xb + (y + bproj_ref[...]).astype(xb.dtype)
    # ---- MLP half on the flattened (cb*N, D) rows: one big GEMM pair
    x2 = o_ref[...].reshape(cb * N, D)
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln2s_ref[...]
         + ln2b_ref[...]).astype(x2.dtype)
    h = jax.lax.dot_general(h, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _gelu_exactish(h + b1_ref[...]).astype(x2.dtype)
    y = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2_ref[...]
    o_ref[...] = (x2 + y.astype(x2.dtype)).reshape(cb, N, D)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def fused_transformer_block(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                            ln2_s, ln2_b, w1, b1, w2, b2,
                            heads: int, scale: float,
                            interpret: bool = False):
    """x (B, N, dim) -> full transformer block (attention + MLP halves)."""
    return _impl(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                 w1, b1, w2, b2, heads, scale, interpret)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret",
                                             "cb"))
def _impl(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, w1, b1,
          w2, b2, heads, scale, interpret, cb: int | None = None):
    B, N, D = x.shape
    Hd = w1.shape[1]
    CB = cb if cb else next(c for c in (2, 1) if B % c == 0)

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    kern = functools.partial(_block_kernel, heads=heads, scale=scale)
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
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * 4 * D + 4 * B * heads * N * N * (D // heads)
            + 4 * B * N * D * Hd,
            bytes_accessed=2 * B * N * D * x.dtype.itemsize
            + (4 * D * D + 2 * D * Hd) * 2,
            transcendentals=B * heads * N * N + B * N * Hd,
        ),
        interpret=interpret,
    )(x, vec(ln1_s), vec(ln1_b), wqkv.astype(x.dtype), vec(bqkv),
      wproj.astype(x.dtype), vec(bproj), vec(ln2_s), vec(ln2_b),
      w1.astype(x.dtype), vec(b1), w2.astype(x.dtype), vec(b2))


def _fwd(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, w1, b1,
         w2, b2, heads, scale, interpret):
    out = _impl(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                w1, b1, w2, b2, heads, scale, interpret)
    return out, (x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                 w1, b1, w2, b2)


def _bwd(heads, scale, interpret, res, g):
    """Compose the two existing fused backward kernels: recompute the
    attention-half output (one forward kernel) to feed the MLP backward,
    then run the attention backward."""
    (x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     w1, b1, w2, b2) = res
    x2 = fa._impl(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, heads, scale,
                  interpret)
    g2, dln2s, dln2b, dw1, db1, dw2, db2 = fm._bwd(
        interpret, (x2, ln2_s, ln2_b, w1, b1, w2, b2), g)
    dx, dln1s, dln1b, dwqkv, dbqkv, dwproj, dbproj = fa._bwd(
        heads, scale, interpret,
        (x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj), g2)
    return (dx, dln1s, dln1b, dwqkv, dbqkv, dwproj, dbproj,
            dln2s, dln2b, dw1, db1, dw2, db2)


fused_transformer_block.defvjp(_fwd, _bwd)
