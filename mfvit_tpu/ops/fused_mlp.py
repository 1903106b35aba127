"""Fused transformer-MLP Pallas kernel: LN + fc1 + GELU + fc2 + residual.

One pass over the activations with both weight matrices resident in VMEM:
streams M-row tiles of (B*N, dim), does the LayerNorm, both GEMMs and the
GELU on-chip and writes the residual-added output. Measured 120 TF/s vs
XLA's 80 TF/s for the ViT-S MLP block on v5e (docs/PERF.md) — XLA spills
the (M, 4*dim) hidden activation to HBM between its two GEMM fusions.

GELU is exact-erf via the Abramowitz-Stegun 7.1.26 polynomial
(|err| < 1.5e-7 — far below bf16 resolution; Pallas TPU cannot lower
``erfc``). Backward is XLA math under ``custom_vjp``.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

def _tile_m(dim: int, hidden: int, itemsize: int = 2) -> int:
    """M-rows per grid step, sized to the 16MB VMEM budget: weights
    (dim*hidden*2) + double-buffered x/out tiles + the fp32 hidden tile.
    512 fits ViT-S (384/1536, measured optimal); larger dims shrink."""
    for tm in (512, 256, 128):
        weights = 2 * dim * hidden * itemsize
        act = tm * hidden * 4 + 4 * tm * dim * itemsize
        if weights + act < 13 * 1024 * 1024:
            return tm
    return 128


def _erf_poly(z: jnp.ndarray) -> jnp.ndarray:
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))


def _gelu_exactish(h: jnp.ndarray) -> jnp.ndarray:
    return h * 0.5 * (1.0 + _erf_poly(h * 0.7071067811865476))


def _pick_cb(B: int, N: int, D: int, Hd: int) -> int:
    """Images per grid step for the 3D forward kernel, sized to VMEM:
    bf16 weights + double-buffered in/out tiles + one image's fp32
    LN/hidden scratch. ViT-S lands on 8, vit_base on 1."""
    weights = 2 * D * Hd * 2
    scratch = N * (Hd + 2 * D) * 4
    for cb in (8, 4, 2, 1):
        tiles = 2 * cb * N * D * 2 * 2
        if B % cb == 0 and weights + scratch + tiles < 13 * 1024 * 1024:
            return cb
    return 1


def _mlp_kernel(x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref):
    """Per-image loop over (N, D) rows. A flat (CB*N, D) formulation needs
    XLA-level reshapes around the kernel that physically re-tile the 77 MB
    activation per block (N=197 rows are not 8-sublane aligned) — measured
    ~0.25 ms/block; the 3D layout keeps the block-to-block chain
    reshape-free (docs/PERF.md round-2 notes)."""
    cb, N, D = x_ref.shape
    for b in range(cb):
        x = x_ref[b]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s_ref[...]
             + ln_b_ref[...]).astype(x.dtype)
        h = jax.lax.dot_general(h, w1_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = _gelu_exactish(h + b1_ref[...]).astype(x.dtype)
        y = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y + b2_ref[...]
        o_ref[b] = x + y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_mlp_block(x, ln_s, ln_b, w1, b1, w2, b2, interpret: bool = False):
    """x (B, N, dim) -> x + MLP(LN(x)), all fused. Weights fp32 or bf16."""
    return _fused_mlp_impl(x, ln_s, ln_b, w1, b1, w2, b2, interpret)


@functools.partial(jax.jit, static_argnames=("interpret", "cb"))
def _fused_mlp_impl(x, ln_s, ln_b, w1, b1, w2, b2, interpret: bool,
                    cb: int | None = None):
    B, N, D = x.shape
    Hd = w1.shape[1]
    CB = cb if cb else _pick_cb(B, N, D, Hd)

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731 — weights resident across steps
    return pl.pallas_call(
        _mlp_kernel,
        grid=(B // CB,),
        in_specs=[
            pl.BlockSpec((CB, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
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
            flops=2 * B * N * D * Hd * 2,
            bytes_accessed=2 * B * N * D * x.dtype.itemsize + D * Hd * 4,
            transcendentals=B * N * Hd,
        ),
        interpret=interpret,
    )(x, vec(ln_s), vec(ln_b), w1.astype(x.dtype), vec(b1),
      w2.astype(x.dtype), vec(b2))


# ------------------------- final-block variant: epilogue LayerNorm ------
#
# The ViT's LAST block can fold the model's final LayerNorm into the MLP
# kernel's epilogue, saving one full HBM round-trip of the activations
# (~1.9 ms per ViT-S branch at B=2048 — tools/profile_fwd.py). Backward:
# the epilogue LN backprops in XLA (recompute of o = x + MLP(LN(x)) in
# fp32), then the gradient flows through the standard fused MLP backward.

def _mlp_kernel_final(x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, fs_ref, fb_ref, o_ref):
    cb, N, D = x_ref.shape
    for b in range(cb):
        x = x_ref[b]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s_ref[...]
             + ln_b_ref[...]).astype(x.dtype)
        h = jax.lax.dot_general(h, w1_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = _gelu_exactish(h + b1_ref[...]).astype(x.dtype)
        y = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = xf + y + b2_ref[...]
        mu2 = jnp.mean(o, -1, keepdims=True)
        var2 = jnp.mean(jnp.square(o - mu2), -1, keepdims=True)
        o_ref[b] = ((o - mu2) * jax.lax.rsqrt(var2 + 1e-6) * fs_ref[...]
                    + fb_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_mlp_block_final_ln(x, ln_s, ln_b, w1, b1, w2, b2, final_s,
                             final_b, interpret: bool = False):
    """x (B, N, dim) -> LN_final(x + MLP(LN(x))) — the ViT's last block
    with the model's final LayerNorm folded into the kernel epilogue."""
    return _fused_mlp_final_impl(x, ln_s, ln_b, w1, b1, w2, b2, final_s,
                                 final_b, interpret)


@functools.partial(jax.jit, static_argnames=("interpret", "cb"))
def _fused_mlp_final_impl(x, ln_s, ln_b, w1, b1, w2, b2, final_s, final_b,
                          interpret: bool, cb: int | None = None):
    B, N, D = x.shape
    Hd = w1.shape[1]
    CB = cb if cb else _pick_cb(B, N, D, Hd)

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        _mlp_kernel_final,
        grid=(B // CB,),
        in_specs=[
            pl.BlockSpec((CB, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * Hd * 2,
            bytes_accessed=2 * B * N * D * x.dtype.itemsize + D * Hd * 4,
            transcendentals=B * N * Hd,
        ),
        interpret=interpret,
    )(x, vec(ln_s), vec(ln_b), w1.astype(x.dtype), vec(b1),
      w2.astype(x.dtype), vec(b2), vec(final_s), vec(final_b))


def _final_fwd(x, ln_s, ln_b, w1, b1, w2, b2, final_s, final_b,
               interpret: bool):
    out = _fused_mlp_final_impl(x, ln_s, ln_b, w1, b1, w2, b2, final_s,
                                final_b, interpret)
    return out, (x, ln_s, ln_b, w1, b1, w2, b2, final_s, final_b)


def _final_bwd(interpret: bool, res, g):
    x, ln_s, ln_b, w1, b1, w2, b2, final_s, final_b = res
    # recompute o = x + MLP(LN(x)) in fp32 (XLA; one block's forward) and
    # backprop the epilogue LN, then reuse the fused MLP backward
    B, N, D = x.shape
    xf = x.reshape(-1, D).astype(jnp.float32)
    gf = g.reshape(-1, D).astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h1 = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
    a = h1 @ w1.astype(jnp.float32) + b1
    cdf = 0.5 * (1.0 + jax.lax.erf(a * 0.7071067811865476))
    o = xf + (a * cdf) @ w2.astype(jnp.float32) + b2
    mu2 = jnp.mean(o, -1, keepdims=True)
    var2 = jnp.mean(jnp.square(o - mu2), -1, keepdims=True)
    inv2 = jax.lax.rsqrt(var2 + 1e-6)
    ohat = (o - mu2) * inv2
    d_final_s = jnp.sum(gf * ohat, 0)
    d_final_b = jnp.sum(gf, 0)
    dohat = gf * final_s
    go = inv2 * (dohat - jnp.mean(dohat, -1, keepdims=True)
                 - ohat * jnp.mean(dohat * ohat, -1, keepdims=True))
    g2 = go.reshape(B, N, D).astype(x.dtype)
    dx, dscale, dbias, dw1, db1, dw2, db2 = _bwd(interpret, (
        x, ln_s, ln_b, w1, b1, w2, b2), g2)
    return (dx, dscale, dbias, dw1, db1, dw2, db2,
            d_final_s.astype(final_s.dtype), d_final_b.astype(final_b.dtype))


fused_mlp_block_final_ln.defvjp(_final_fwd, _final_bwd)


def _bwd_kernel(g_ref, x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, ds_ref, db_ref):
    """Fused backward: recompute LN/hidden in VMEM, all five gradient
    GEMMs on-chip, weight/bias grads accumulated across the sequential
    grid (outputs with constant index_map). (CB, N, D) blocks with a
    per-image loop — the flat layout's XLA-level reshapes physically
    re-tile the activation (see _mlp_kernel)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    cb = x_ref.shape[0]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    for b in range(cb):
        x = x_ref[b].astype(jnp.float32)
        g = g_ref[b].astype(jnp.float32)
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
        inv = jax.lax.rsqrt(var + 1e-6)
        xhat = (x - mu) * inv
        h1 = (xhat * lns_ref[...] + lnb_ref[...]).astype(jnp.bfloat16)
        a = jax.lax.dot_general(
            h1, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[...]
        erf = _erf_poly(a * 0.7071067811865476)
        cdf = 0.5 * (1.0 + erf)
        pdf = jnp.exp(-0.5 * a * a) * 0.3989422804014327
        ga_pre = jax.lax.dot_general(g, w2, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        ga = (ga_pre * (cdf + a * pdf)).astype(jnp.bfloat16)
        gelu_a = (a * cdf).astype(jnp.bfloat16)
        gb = g.astype(jnp.bfloat16)
        dw2_ref[...] += jax.lax.dot_general(
            gelu_a, gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db2_ref[...] += jnp.sum(g, 0, keepdims=True)
        dw1_ref[...] += jax.lax.dot_general(
            h1, ga, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[...] += jnp.sum(ga.astype(jnp.float32), 0, keepdims=True)
        dh1 = jax.lax.dot_general(ga, w1, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds_ref[...] += jnp.sum(dh1 * xhat, 0, keepdims=True)
        db_ref[...] += jnp.sum(dh1, 0, keepdims=True)
        dxhat = dh1 * lns_ref[...]
        dx_ln = inv * (dxhat - jnp.mean(dxhat, -1, keepdims=True)
                       - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True))
        dx_ref[b] = (g + dx_ln).astype(dx_ref.dtype)


def _bwd_small_cb(B: int, N: int, D: int, Hd: int):
    """Feasible CB for the single-kernel backward (None => route to the
    row-tiled big-dim path, which is N-independent). Budget calibrated so
    ViT-S/224 keeps the shipped CB=2 (est 17.3 MB with Mosaic liveness
    reuse) while N=577 (est 22 MB at CB=1) routes away."""
    per_img = N * (2 * D * 4 + 3 * Hd * 4 + (Hd + 2 * D) * 2)
    fixed = 2 * D * Hd * 4 + 2 * D * Hd * 2
    return next((c for c in (2, 1)
                 if B % c == 0 and fixed + c * per_img < 18 * 1024 * 1024),
                None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_mlp_bwd_impl(g, x, ln_s, ln_b, w1, b1, w2, interpret: bool):
    B, N, D = x.shape
    Hd = w1.shape[1]
    # the fp32 weight-grad accumulators share VMEM with everything else,
    # so CB stays small (ViT-S: 2 x 384*1536*4 = 4.7 MB accumulators)
    CB = _bwd_small_cb(B, N, D, Hd)
    if CB is None:
        CB = next(c for c in (2, 1) if B % c == 0)  # interpret-mode path

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    blk = lambda i: (i, 0, 0)  # noqa: E731
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(B // CB,),
        in_specs=[
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((D, Hd), jnp.float32),
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * B * N * D * Hd,
            bytes_accessed=3 * B * N * D * x.dtype.itemsize + 2 * D * Hd * 4,
            transcendentals=2 * B * N * Hd,
        ),
        interpret=interpret,
    )(g, x, vec(ln_s), vec(ln_b), w1.astype(jnp.bfloat16), vec(b1),
      w2.astype(jnp.bfloat16))
    dx, dw1, db1, dw2, db2, dscale, dbias = outs
    return dx, dscale[0], dbias[0], dw1, db1[0], dw2, db2[0]


# ------------------- large-dim backward: dx kernel + chunked dw kernel --
#
# vit_base's fp32 weight-grad accumulators (2 x 768 x 3072 x 4B = 19 MB)
# cannot live in VMEM alongside the weights, so the single-kernel backward
# above is gated to ViT-S dims. For larger dims the backward splits into:
#  - a dx kernel: streams row tiles once, recomputes LN/hidden, produces
#    dx and the (tiny) LN-param grads — needs both weights (bf16) but NO
#    large accumulators;
#  - a dw kernel with grid (Hd-chunk OUTER, row-tile INNER): each chunk's
#    fp32 accumulators (D, HC)+(HC, D) are visited consecutively across
#    the inner row sweep, so they stay VMEM-resident; LN recompute is
#    repeated per chunk (cheap VPU), GEMM FLOPs stay split by chunk.

def _bwd_dx_kernel(g_ref, x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                   dx_ref, ds_ref, db_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-6)
    xhat = (x - mu) * inv
    h1 = (xhat * lns_ref[...] + lnb_ref[...]).astype(jnp.bfloat16)
    a = jax.lax.dot_general(h1, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b1_ref[...]
    erf = _erf_poly(a * 0.7071067811865476)
    cdf = 0.5 * (1.0 + erf)
    pdf = jnp.exp(-0.5 * a * a) * 0.3989422804014327
    ga_pre = jax.lax.dot_general(g, w2_ref[...], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    ga = (ga_pre * (cdf + a * pdf)).astype(jnp.bfloat16)
    dh1 = jax.lax.dot_general(ga, w1_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds_ref[...] += jnp.sum(dh1 * xhat, 0, keepdims=True)
    db_ref[...] += jnp.sum(dh1, 0, keepdims=True)
    dxhat = dh1 * lns_ref[...]
    dx_ln = inv * (dxhat - jnp.mean(dxhat, -1, keepdims=True)
                   - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True))
    dx_ref[...] = (g + dx_ln).astype(dx_ref.dtype)


def _bwd_dw_kernel(g_ref, x_ref, lns_ref, lnb_ref, w1c_ref, b1c_ref,
                   w2c_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        # per-chunk accumulators: zeroed at each chunk's first row step
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        # db2 is chunk-independent (constant index): zero once, accumulate
        # only during the first chunk's row sweep
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    xhat = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    h1 = (xhat * lns_ref[...] + lnb_ref[...]).astype(jnp.bfloat16)
    a = jax.lax.dot_general(h1, w1c_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b1c_ref[...]
    erf = _erf_poly(a * 0.7071067811865476)
    cdf = 0.5 * (1.0 + erf)
    pdf = jnp.exp(-0.5 * a * a) * 0.3989422804014327
    ga_pre = jax.lax.dot_general(g, w2c_ref[...], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    ga = (ga_pre * (cdf + a * pdf)).astype(jnp.bfloat16)
    gelu_a = (a * cdf).astype(jnp.bfloat16)
    gb = g.astype(jnp.bfloat16)
    dw1_ref[...] += jax.lax.dot_general(h1, ga, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(ga.astype(jnp.float32), 0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(gelu_a, gb, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        db2_ref[...] += jnp.sum(g, 0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_mlp_bwd_bigdim(g, x, ln_s, ln_b, w1, b1, w2, interpret: bool):
    B, N, D = x.shape
    Hd = w1.shape[1]
    TM = 256  # verified on-chip at vit_base dims (Mosaic liveness reuse
    # keeps the (TM, Hd) fp32 temps + both bf16 weights inside VMEM)
    M = B * N
    Mp = ((M + TM - 1) // TM) * TM
    gp = g.reshape(M, D)
    xp = x.reshape(M, D)
    if Mp != M:
        gp = jnp.pad(gp, ((0, Mp - M), (0, 0)))
        xp = jnp.pad(xp, ((0, Mp - M), (0, 0)))

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    w1b = w1.astype(jnp.bfloat16)
    w2b = w2.astype(jnp.bfloat16)
    const = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    dx, dscale, dbias = pl.pallas_call(
        _bwd_dx_kernel,
        grid=(Mp // TM,),
        in_specs=[
            pl.BlockSpec((TM, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(gp, xp, vec(ln_s), vec(ln_b), w1b, vec(b1), w2b)

    # chunk Hd so each chunk's fp32 accumulators fit VMEM (<= ~4 MB each)
    if Hd % 128:
        # the fallback chunking below assumes 128-aligned hidden dims;
        # a non-multiple would leave tail accumulator columns unwritten
        raise ValueError(
            f"big-dim MLP backward requires hidden dim % 128 == 0 "
            f"(got {Hd})")
    K = 1
    while (2 * D * (Hd // K) * 4 > 4 * 1024 * 1024
           or Hd % K or (Hd // K) % 128):
        K += 1
        if K > Hd // 128:
            K = Hd // 128
            break
    HC = Hd // K
    dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_dw_kernel,
        grid=(K, Mp // TM),
        in_specs=[
            pl.BlockSpec((TM, D), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, D), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, HC), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HC), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HC, D), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, HC), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HC), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HC, D), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, Hd), jnp.float32),
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(gp, xp, vec(ln_s), vec(ln_b), w1b, vec(b1), w2b)
    return (dx[:M].reshape(B, N, D), dscale[0], dbias[0], dw1, db1[0],
            dw2, db2[0])


def _fwd(x, ln_s, ln_b, w1, b1, w2, b2, interpret: bool):
    out = _fused_mlp_impl(x, ln_s, ln_b, w1, b1, w2, b2, interpret)
    return out, (x, ln_s, ln_b, w1, b1, w2, b2)


def _bwd(interpret: bool, res, g):
    """Fused Pallas backward (recompute-in-VMEM). Single kernel when the
    fp32 weight-grad accumulators fit the VMEM budget (ViT-S class);
    dx-kernel + Hd-chunked dw-kernel otherwise (vit_base's 768x3072
    accumulators alone are 19 MB)."""
    x, ln_s, ln_b, w1, b1, w2, b2 = res
    B, N, _ = x.shape
    D, Hd = w1.shape
    if (2 * D * Hd * 4 > 8 * 1024 * 1024
            or (not interpret and _bwd_small_cb(B, N, D, Hd) is None)):
        # big weight-grad accumulators (vit_base) OR long sequences
        # (img-size >= 384): the row-tiled split backward is N-independent
        dx, dscale, dbias, dw1, db1, dw2, db2 = _fused_mlp_bwd_bigdim(
            g, x, ln_s, ln_b, w1, b1, w2, interpret)
    else:
        dx, dscale, dbias, dw1, db1, dw2, db2 = _fused_mlp_bwd_impl(
            g, x, ln_s, ln_b, w1, b1, w2, interpret)
    return (dx, dscale.astype(ln_s.dtype), dbias.astype(ln_b.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


def _bwd_xla_reference(interpret: bool, res, g):
    """XLA-math backward (fp32) — kept as the numerical reference."""
    x, ln_s, ln_b, w1, b1, w2, b2 = res
    B, N, D = x.shape
    xf = x.reshape(-1, D).astype(jnp.float32)
    gf = g.reshape(-1, D).astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-6)
    xhat = (xf - mu) * inv
    h1 = xhat * ln_s + ln_b
    w1f, w2f = w1.astype(jnp.float32), w2.astype(jnp.float32)
    a = h1 @ w1f + b1
    ga_pre = gf @ w2f.T
    # exact gelu grad: 0.5*(1+erf(a/sqrt2)) + a * pdf(a)
    cdf = 0.5 * (1.0 + jax.lax.erf(a * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * a * a) * 0.3989422804014327
    ga = ga_pre * (cdf + a * pdf)
    gelu_a = a * cdf
    dw2 = gelu_a.T @ gf
    db2 = jnp.sum(gf, 0)
    dw1 = h1.T @ ga
    db1 = jnp.sum(ga, 0)
    dh1 = ga @ w1f.T
    dscale = jnp.sum(dh1 * xhat, 0)
    dbias = jnp.sum(dh1, 0)
    # LayerNorm backward
    dxhat = dh1 * ln_s
    dx_ln = inv * (dxhat - jnp.mean(dxhat, -1, keepdims=True)
                   - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True))
    dx = (gf + dx_ln).reshape(B, N, D).astype(x.dtype)
    return (dx, dscale.astype(ln_s.dtype), dbias.astype(ln_b.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


fused_mlp_block.defvjp(_fwd, _bwd)
