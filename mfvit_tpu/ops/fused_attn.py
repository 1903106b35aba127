"""Fused attention half-block kernel: LN + qkv GEMM + MHSA + proj + residual.

One Pallas kernel per transformer-block attention half, weights
VMEM-resident, exact logical shapes (N=197 — no padding or key masking
needed), scores never touch HBM. Measured 2.35 ms vs 4.31 ms for the
separate LN/GEMM/kernel/GEMM chain at B=512 on v5e (docs/PERF.md).

Layout inside: the qkv GEMM emits (3*dim, N) transposed directly
(contraction on the weight's input dim), a free view gives (3, H, Dh, N),
attention runs as batched-heads dot_generals, and the proj GEMM contracts
the transposed output back to (N, dim) — zero transposes anywhere.

Backward is XLA math under custom_vjp (fp32 recompute).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, o_ref, *, heads: int, scale: float, has_bias: bool):
    """Per-image math is the classic chain; ISSUE ORDER is staged so the
    VPU softmax of image b+1 overlaps the MXU PV/proj GEMMs of image b
    (in-order issue per engine queue, async across queues — measured
    6.33 vs 6.65 ms/block at CB=4, tools/bench_pipelined.py)."""
    cb, N, D = x_ref.shape
    Dh = D // heads
    wq = wqkv_ref[...]
    wp = wproj_ref[...]

    def qkv_of(b):
        xb = x_ref[b]  # (N, D)
        xf = xb.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns_ref[...]
             + lnb_ref[...]).astype(xb.dtype)
        # qkv_t (3D, N) = wqkv^T h^T — transposed GEMM, no reshuffle
        qkv_t = jax.lax.dot_general(
            wq, h, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_bias:
            qkv_t = qkv_t + bqkv_ref[...].T
        return qkv_t.astype(xb.dtype).reshape(3, heads, Dh, N)

    def scores_of(qkv):
        # scale q up front: a (H, Dh, N) op instead of (H, N, N)
        q = (qkv[0].astype(jnp.float32) * scale).astype(qkv.dtype)
        return jax.lax.dot_general(
            q, qkv[1], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (H, N, N)

    def softmax_of(s):
        mx = jnp.max(s, -1, keepdims=True)
        p = jnp.exp(s - mx)
        # normalization folded into the PV OUTPUT: one less (H,N,N) pass
        r = 1.0 / jnp.sum(p, -1, keepdims=True)         # (H, N, 1)
        return p, r

    def out_of(b, qkv, p, r):
        v = qkv[2]
        o = jax.lax.dot_general(
            v, p.astype(v.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (H, Dh, N)
        o = o * r.reshape(heads, 1, N)
        o = o.reshape(D, N).astype(x_ref.dtype)
        y = jax.lax.dot_general(
            o, wp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (N, D)
        o_ref[b] = x_ref[b] + (y + bproj_ref[...]).astype(x_ref.dtype)

    qkvs = [qkv_of(b) for b in range(cb)]
    ss = [scores_of(qkvs[b]) for b in range(cb)]
    pr = [None] * cb
    pr[0] = softmax_of(ss[0])
    for b in range(cb):
        if b + 1 < cb:
            pr[b + 1] = softmax_of(ss[b + 1])
        out_of(b, qkvs[b], *pr[b])


_MB = 1024 * 1024


def _fwd_cb(B: int, N: int, D: int, heads: int):
    """Largest feasible forward CB (None if even CB=1 blows VMEM).
    Budget calibrated on-chip: ViT-S CB=4 (est 15.6 MB) compiles,
    vit_base CB=4 (est 23.9 MB) OOMs at 19.6 MB actual. For D > 512 the
    estimate runs HOT instead of conservative — vit_base CB=2 (est
    14.3 MB) measured 16.65 MB scoped, an at-the-edge compile that passed
    or OOMed depending on scheduling — so big dims get a stricter budget
    (CB=1, est 9.5 MB)."""
    Np = -(-N // 128) * 128
    weights = (3 * D * D + D * D) * 2
    per_img = heads * N * Np * 4 + 3 * D * Np * 2 + 4 * N * D * 2
    budget = (16.5 if D <= 512 else 13.0) * _MB
    return next((c for c in (4, 2, 1)
                 if B % c == 0 and weights + c * per_img < budget), None)


def _bwd_cb(B: int, N: int, D: int, heads: int):
    """Largest feasible STAGED-backward CB for the small-dim (D <= 512)
    single-kernel backward: each in-flight image holds its fp32 softmax,
    bf16 qkv/dqkv and fp32 x/g/dx rows; the fp32 weight-grad accumulators
    and bf16 weights are fixed. Calibrated so ViT-S/224 keeps the
    shipped CB=2 (est 14.4 MB) and e.g. N=577/heads=6 (est 20.7 MB even
    at CB=1) returns None."""
    Np = -(-N // 128) * 128
    per_img = heads * N * Np * 4 + 6 * D * Np * 2 + 6 * N * D * 4
    fixed = (3 * D * D + D * D) * 4 + (3 * D * D + D * D) * 2
    return next((c for c in (2, 1)
                 if B % c == 0 and fixed + c * per_img < 16 * _MB), None)


def supported(N: int, D: int, heads: int) -> bool:
    """Do the fused attention kernels — forward AND backward — fit VMEM
    at these dims? Shares the exact budget formulas the kernel entry
    points enforce, so vit.apply's gate and the kernels can never
    disagree. False => vit.apply falls back to the unfused XLA-math path
    (e.g. img-size >= 384: N=577 blows the fp32 score buffers)."""
    if _fwd_cb(8, N, D, heads) is None:
        return False
    Np = -(-N // 128) * 128
    if D > 512:
        # big-dim backward: a single-head group's 4 fp32 (1, N, Np)
        # buffers must fit the ~4 MB group budget
        return 4 * N * Np * 4 < 4 * _MB
    return _bwd_cb(8, N, D, heads) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_attention_block(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                          heads: int, scale: float, interpret: bool = False):
    """x (B, N, dim) -> x + proj(MHSA(LN(x))). bqkv may be zeros for
    bias-free qkv (vit_conv_* archs)."""
    return _impl(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, scale,
                 interpret)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "interpret", "cb"))
def _impl(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, scale, interpret,
          cb: int | None = None):
    B, N, D = x.shape
    # CB=4 measured best for the staged forward at ViT-S dims; the staged
    # issue order keeps every image's fp32 score buffer + bf16 qkv alive
    # at once, so CB shrinks with model width (vit_base OOMs at CB=4)
    if cb:
        CB = cb
    else:
        CB = _fwd_cb(B, N, D, heads)
        if CB is None:
            if interpret:
                # interpreter mode has no VMEM constraint (off-chip
                # debugging of big-dim configs)
                CB = next(c for c in (4, 2, 1) if B % c == 0)
            else:
                raise ValueError(
                    f"fused attention kernel does not fit VMEM at N={N}, "
                    f"D={D} even at CB=1 — gate call sites on "
                    "fused_attn.supported() (vit.apply does)")

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    kern = functools.partial(_kernel, heads=heads, scale=scale,
                             has_bias=True)
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
        ],
        out_specs=pl.BlockSpec((CB, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * 4 * D + 4 * B * heads * N * N * (D // heads),
            bytes_accessed=2 * B * N * D * x.dtype.itemsize + 4 * D * D * 4,
            transcendentals=B * heads * N * N,
        ),
        interpret=interpret,
    )(x, vec(ln_s), vec(ln_b), wqkv.astype(x.dtype), vec(bqkv),
      wproj.astype(x.dtype), vec(bproj))


# -------------------- query-blocked variant for long sequences ---------
#
# At img-size >= ~384 the full fp32 score tensor (heads, N, Np) blows the
# VMEM budget at any CB (N=577, H=12: 17.7 MB), so `supported()` is
# False and vit.apply would fall all the way back to XLA attention
# (~5x slower in this layout). The query-blocked kernel keeps everything
# of the standard kernel EXCEPT that scores/softmax/PV run over 128-query
# row blocks — the flash-attention blocking idea, simplified: keys stay
# VMEM-resident (a (3D, Np) bf16 qkv_t is small even at N=1025), so no
# online-softmax running max/sum is needed, just a key-validity mask on
# the padded tail. Backward = fp32 XLA recompute (these are off-nominal
# research configs; the reference never exceeds 224px).

_QB = 128  # preferred query rows per score block (lane-aligned)


def _qblocked_qb(N: int, D: int, heads: int):
    """Largest feasible query-block size (128 preferred for full-lane
    MXU GEMMs, then 64/32), or None. Shrinking QB only shrinks the fp32
    score block + exp temp — the resident qkv_t/weights/io terms are
    QB-independent. Budget calibrated on-chip at PRODUCTION batch
    (tools/calibrate_qblocked_bigbatch.py) — short-grid probes
    under-measure TWICE over: a 1-step grid skips Mosaic's io
    double-buffering entirely, and even a 2-step grid reads low vs the
    long-grid compile of the same corner (577/768/12 @ QB=32 passed at
    B=2 but OOMed at B=64 with 18.21M scoped vs the 16M limit — scoped
    VMEM grows with grid length). Every corner the 16 MB budget accepts
    measured PASS at B>=32 with XLA-matching output (max accepted est
    15.2 MB — 325/768/12 @ QB=128); vit_base@384 (est 16.7 MB at QB=32)
    is genuinely infeasible at any QB and stays on the XLA fallback.
    vit_small@384 keeps QB=128; vit_small_ori@512 (1025/384/6) fits at
    QB=64."""
    Np = -(-N // 128) * 128
    weights = (3 * D * D + D * D) * 2
    fixed = (3 * D * Np * 2            # bf16 qkv_t
             + D * Np * 2 * 2          # o + staging
             + 6 * Np * D * 2)         # in/out tiles, double-buffered
    est = lambda qb: weights + fixed + heads * qb * Np * 4 * 2  # noqa: E731
    return next((qb for qb in (128, 64, 32) if est(qb) < 16 * _MB), None)


def _kernel_qblocked(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                     wproj_ref, bproj_ref, o_ref, *, heads: int,
                     scale: float, has_bias: bool, n_valid: int,
                     qb: int = _QB):
    cb, Np, D = x_ref.shape  # x arrives zero-padded to a 128-multiple Np
    Dh = D // heads
    wq = wqkv_ref[...]
    wp = wproj_ref[...]
    # key mask: pad keys (columns >= n_valid) contribute -inf scores
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1) < n_valid

    for b in range(cb):
        xb = x_ref[b]
        xf = xb.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns_ref[...]
             + lnb_ref[...]).astype(xb.dtype)
        qkv_t = jax.lax.dot_general(
            wq, h, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_bias:
            qkv_t = qkv_t + bqkv_ref[...].T
        qkv = qkv_t.astype(xb.dtype).reshape(3, heads, Dh, Np)
        q = (qkv[0].astype(jnp.float32) * scale).astype(xb.dtype)
        k = qkv[1]
        v = qkv[2]
        # each query block is projected and written immediately — no
        # (D, Np) attention-output buffer or full-width proj temp lives
        # past the block (the all-resident version hit 18 MB scoped)
        for blk in range(Np // qb):
            sl = slice(blk * qb, (blk + 1) * qb)
            q_blk = q[:, :, sl]                             # (H, Dh, QB)
            s = jax.lax.dot_general(
                q_blk, k, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # (H, QB, Np)
            s = jnp.where(key_ok[None], s, -1e30)
            mx = jnp.max(s, -1, keepdims=True)
            p = jnp.exp(s - mx)
            r = 1.0 / jnp.sum(p, -1, keepdims=True)
            ob = jax.lax.dot_general(
                v, p.astype(v.dtype), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # (H, Dh, QB)
            ob = (ob * r.reshape(heads, 1, qb)).reshape(
                D, qb).astype(xb.dtype)
            y = jax.lax.dot_general(ob, wp, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[b, sl] = x_ref[b, sl] + (
                y + bproj_ref[...]).astype(x_ref.dtype)


def qblocked_supported(N: int, D: int, heads: int) -> bool:
    """Feasibility of the query-blocked kernel at CB=1 at SOME query-block
    size — shares ``_qblocked_qb`` so the gate and the kernel's planner
    can never disagree."""
    return _qblocked_qb(N, D, heads) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_attention_block_large(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                heads: int, scale: float,
                                interpret: bool = False):
    """Long-sequence fused attention half: same math as
    ``fused_attention_block`` via query-blocked scores. Backward is fp32
    XLA recompute."""
    return _impl_qblocked(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads,
                          scale, interpret)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret",
                                             "force_qb"))
def _impl_qblocked(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, scale,
                   interpret, force_qb=None):
    B, N, D = x.shape
    Np = -(-N // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0))) if Np != N else x
    if force_qb is not None:
        # calibration-only override (tools/calibrate_qblocked.py):
        # compile at exactly this query-block size so the probe measures
        # the chip, not the planner
        assert Np % force_qb == 0, (Np, force_qb)
        qb = force_qb
    else:
        qb = _qblocked_qb(N, D, heads)
        if qb is None:
            if interpret:
                qb = _QB  # interpreter mode has no VMEM constraint
            else:
                raise ValueError(
                    f"query-blocked attention kernel does not fit VMEM at "
                    f"N={N}, D={D} even at QB=32 — gate call sites on "
                    "fused_attn.qblocked_supported() (vit.apply does)")

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    kern = functools.partial(_kernel_qblocked, heads=heads, scale=scale,
                             has_bias=True, n_valid=N, qb=qb)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * 4 * D + 4 * B * heads * N * N *
                  (D // heads),
            bytes_accessed=2 * B * Np * D * x.dtype.itemsize + 4 * D * D * 4,
            transcendentals=B * heads * Np * Np,
        ),
        interpret=interpret,
    )(xp, vec(ln_s), vec(ln_b), wqkv.astype(x.dtype), vec(bqkv),
      wproj.astype(x.dtype), vec(bproj))
    return out[:, :N] if Np != N else out


def _fwd_large(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, scale,
               interpret):
    out = _impl_qblocked(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads,
                         scale, interpret)
    return out, (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)


def _bwd_large(heads, scale, interpret, res, g):
    return _bwd_xla_reference(heads, scale, interpret, res, g)


fused_attention_block_large.defvjp(_fwd_large, _bwd_large)


def _bwd_kernel(g_ref, x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                wproj_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                dbproj_ref, ds_ref, db_ref, *, heads: int, scale: float,
                has_bias: bool):
    """Fused attention-half backward: recompute LN/qkv/softmax in VMEM,
    all gradient GEMMs on-chip, weight grads accumulated across the
    sequential grid. ISSUE ORDER is staged like the forward's: image
    b+1's recompute phase (VPU LN + softmax around one MXU GEMM) is
    issued before image b's gradient phase (MXU-heavy), so the engines
    overlap across images instead of ping-ponging within one (4.39 vs
    4.64 ms at B=256/CB=2, bit-identical — tools/bench_bwd_staged.py)."""
    cb, N, D = x_ref.shape
    Dh = D // heads

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    wq = wqkv_ref[...]
    wp = wproj_ref[...]

    def recompute(b):
        """Forward recompute for image b — INCLUDING the qkv bias
        (omitting it once produced a 13% dwproj error)."""
        xb = x_ref[b].astype(jnp.float32)          # (N, D)
        gb = g_ref[b].astype(jnp.float32)
        mu = jnp.mean(xb, -1, keepdims=True)
        var = jnp.mean(jnp.square(xb - mu), -1, keepdims=True)
        inv = jax.lax.rsqrt(var + 1e-6)
        xhat = (xb - mu) * inv
        h = (xhat * lns_ref[...] + lnb_ref[...]).astype(jnp.bfloat16)
        qkv_t = jax.lax.dot_general(wq, h, (((0,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if has_bias:
            qkv_t = qkv_t + bqkv_ref[...].T
        qkv = qkv_t.astype(jnp.bfloat16).reshape(3, heads, Dh, N)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        mx = jnp.max(s, -1, keepdims=True)
        e = jnp.exp(s - mx)
        p = e / jnp.sum(e, -1, keepdims=True)      # (H, N, N) fp32
        return dict(gb=gb, inv=inv, xhat=xhat, h=h, q=q, k=k, v=v, p=p)

    def grads(b, r):
        gb, p, v, q, k, h = r["gb"], r["p"], r["v"], r["q"], r["k"], r["h"]
        pb = p.astype(jnp.bfloat16)
        o = jax.lax.dot_general(v, pb, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o.reshape(D, N)                          # (D, N) fp32
        gbf = gb.astype(jnp.bfloat16)
        # proj grads: y = o^T wproj + bproj. Kept fp32 — cancellation-heavy
        # sums, and this GEMM is tiny (D*N*D) so fp32 is free.
        dwproj_ref[...] += jax.lax.dot_general(
            o, gb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (D, Dout)
        dbproj_ref[...] += jnp.sum(gb, 0, keepdims=True)
        # do (D, N) = wproj @ g^T
        do = jax.lax.dot_general(wp, gbf, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        doh = do.astype(jnp.bfloat16).reshape(heads, Dh, N)
        # attention backward (batched heads)
        dv = jax.lax.dot_general(doh, pb, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # (H,Dh,N)
        dp = jax.lax.dot_general(doh, v, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # (H,N,N)
        dsm = p * (dp - jnp.sum(dp * p, -1, keepdims=True))
        dsb = dsm.astype(jnp.bfloat16)
        dq = jax.lax.dot_general(k, dsb, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(q, dsb, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dqkv_t = jnp.concatenate(
            [dq.reshape(D, N), dk.reshape(D, N), dv.reshape(D, N)],
            axis=0).astype(jnp.bfloat16)            # (3D, N)
        # qkv GEMM grads: qkv_t = wq^T h^T
        dwqkv_ref[...] += jax.lax.dot_general(
            h, dqkv_t, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (D, 3D)
        if has_bias:
            dbqkv_ref[...] += jnp.sum(
                dqkv_t.astype(jnp.float32), 1, keepdims=True).T
        # dh (N, D) = dqkv_t^T wq^T
        dh = jax.lax.dot_general(dqkv_t, wq, (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (N, D)
        ds_ref[...] += jnp.sum(dh * r["xhat"], 0, keepdims=True)
        db_ref[...] += jnp.sum(dh, 0, keepdims=True)
        dxhat = dh * lns_ref[...]
        dx_ln = r["inv"] * (
            dxhat - jnp.mean(dxhat, -1, keepdims=True)
            - r["xhat"] * jnp.mean(dxhat * r["xhat"], -1, keepdims=True))
        dx_ref[b] = (gb + dx_ln).astype(dx_ref.dtype)

    rs = [None] * cb
    rs[0] = recompute(0)
    for b in range(cb):
        if b + 1 < cb:
            rs[b + 1] = recompute(b + 1)
        grads(b, rs[b])


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret",
                                             "has_bias"))
def _fused_attn_bwd_impl(g, x, ln_s, ln_b, wqkv, bqkv, wproj, heads, scale,
                         interpret, has_bias=True):
    B, N, D = x.shape
    CB = _bwd_cb(B, N, D, heads)
    if CB is None:
        if interpret:
            CB = next(c for c in (2, 1) if B % c == 0)
        else:
            raise ValueError(
                f"fused attention backward does not fit VMEM at N={N}, "
                f"D={D} even at CB=1 — gate call sites on "
                "fused_attn.supported() (vit.apply does)")

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    blk = lambda i: (i, 0, 0)  # noqa: E731
    kern = functools.partial(_bwd_kernel, heads=heads, scale=scale,
                             has_bias=has_bias)
    outs = pl.pallas_call(
        kern,
        grid=(B // CB,),
        in_specs=[
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * B * N * D * 4 * D + 4 * B * heads * N * N *
                       (D // heads)),
            bytes_accessed=3 * B * N * D * x.dtype.itemsize + 8 * D * D * 4,
            transcendentals=B * heads * N * N,
        ),
        interpret=interpret,
    )(g, x, vec(ln_s), vec(ln_b), wqkv.astype(jnp.bfloat16), vec(bqkv),
      wproj.astype(jnp.bfloat16))
    dx, dwqkv, dbqkv, dwproj, dbproj, dscale, dbias = outs
    return dx, dwqkv, dbqkv[0], dwproj, dbproj[0], dscale[0], dbias[0]


# ---------------- large-dim backward: dx kernel + XLA weight-grad GEMMs
#
# vit_base's fp32 dwqkv accumulator (768 x 2304 x 4B = 7 MB) plus weights
# and per-image softmax scratch exceed VMEM, so for D > 512 the backward
# splits: the Pallas kernel recomputes the attention internals in VMEM and
# emits dx plus the three GEMM OPERANDS (h, dqkv_t, o) as bf16 side
# outputs; the two big weight-grad contractions (dwqkv = h^T dqkv,
# dwproj = o g) then run as plain XLA GEMMs over the whole batch — XLA
# tiles those fine, it was the softmax recompute that made the pure-XLA
# fallback slow.

def _bwd_dx_kernel(g_ref, x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                   wproj_ref, dx_ref, h_ref, dqkv_ref, o_ref, ds_ref,
                   db_ref, dbq_ref, dbp_ref, *, heads: int, scale: float,
                   has_bias: bool, head_groups: int):
    cb, N, D = x_ref.shape
    Dh = D // heads
    G = heads // head_groups  # heads per group
    wq = wqkv_ref[...]
    wp = wproj_ref[...]

    @pl.when(pl.program_id(0) == 0)
    def _():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    for b in range(cb):
        xb = x_ref[b].astype(jnp.float32)
        gb = g_ref[b].astype(jnp.float32)
        mu = jnp.mean(xb, -1, keepdims=True)
        var = jnp.mean(jnp.square(xb - mu), -1, keepdims=True)
        inv = jax.lax.rsqrt(var + 1e-6)
        xhat = (xb - mu) * inv
        h = (xhat * lns_ref[...] + lnb_ref[...]).astype(jnp.bfloat16)
        h_ref[b] = h
        gbf = gb.astype(jnp.bfloat16)
        dbp_ref[...] += jnp.sum(gb, 0, keepdims=True)
        do = jax.lax.dot_general(wp, gbf, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        doh = do.astype(jnp.bfloat16).reshape(heads, Dh, N)
        # head-group loop: the qkv recompute happens per GROUP via column
        # slices of wqkv, so neither the (3D, N) fp32 qkv buffer nor more
        # than one group's fp32 (G, N, N) score/softmax buffers ever exist
        # (vit_base OOMed with everything resident: 19.5 MB scoped > 16)
        dh = None
        for hg in range(head_groups):
            W = G * Dh
            sls = [slice(t * D + hg * W, t * D + (hg + 1) * W)
                   for t in range(3)]

            def part(t):
                pt = jax.lax.dot_general(
                    wq[:, sls[t]], h, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if has_bias:
                    pt = pt + bqkv_ref[:, sls[t]].T
                return pt.astype(jnp.bfloat16).reshape(G, Dh, N)

            q, k, v = part(0), part(1), part(2)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s * scale
            mx = jnp.max(s, -1, keepdims=True)
            e = jnp.exp(s - mx)
            p = e / jnp.sum(e, -1, keepdims=True)
            pb = p.astype(jnp.bfloat16)
            o = jax.lax.dot_general(v, pb, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            o_ref[b, hg * W:(hg + 1) * W] = o.reshape(W, N).astype(
                jnp.bfloat16)
            dog = doh[hg * G:(hg + 1) * G]
            dv = jax.lax.dot_general(dog, pb, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(dog, v, (((1,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            dsm = p * (dp - jnp.sum(dp * p, -1, keepdims=True))
            dsb = dsm.astype(jnp.bfloat16)
            dq = jax.lax.dot_general(k, dsb, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(q, dsb, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            parts = ((dq * scale).reshape(W, N).astype(jnp.bfloat16),
                     (dk * scale).reshape(W, N).astype(jnp.bfloat16),
                     dv.reshape(W, N).astype(jnp.bfloat16))
            for t in range(3):
                dqkv_ref[b, sls[t]] = parts[t]
                if has_bias:
                    dbq_ref[:, sls[t]] += jnp.sum(
                        parts[t].astype(jnp.float32), 1, keepdims=True).T
                contrib = jax.lax.dot_general(
                    parts[t], wq[:, sls[t]], (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dh = contrib if dh is None else dh + contrib
        ds_ref[...] += jnp.sum(dh * xhat, 0, keepdims=True)
        db_ref[...] += jnp.sum(dh, 0, keepdims=True)
        dxhat = dh * lns_ref[...]
        dx_ln = inv * (dxhat - jnp.mean(dxhat, -1, keepdims=True)
                       - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True))
        dx_ref[b] = (gb + dx_ln).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret",
                                             "has_bias"))
def _fused_attn_bwd_bigdim(g, x, ln_s, ln_b, wqkv, bqkv, wproj, heads,
                           scale, interpret, has_bias=True):
    B, N, D = x.shape
    CB = 1

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    blk = lambda i: (i, 0, 0)  # noqa: E731
    # smallest divisor-of-heads group count whose ~4 fp32 (G, N, N)
    # group buffers stay under ~6 MB
    Np = -(-N // 128) * 128
    hg = next((k for k in range(1, heads + 1)
               if heads % k == 0
               and 4 * (heads // k) * N * Np * 4 < 4 * 1024 * 1024), None)
    if hg is None:
        raise ValueError(
            f"big-dim attention backward does not fit VMEM at N={N}, "
            f"D={D} even with 1-head groups — gate call sites on "
            "fused_attn.supported()")
    kern = functools.partial(_bwd_dx_kernel, heads=heads, scale=scale,
                             has_bias=has_bias, head_groups=hg)
    outs = pl.pallas_call(
        kern,
        grid=(B // CB,),
        in_specs=[
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 3 * D, N), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, D, N), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 3 * D, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, D, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(g, x, vec(ln_s), vec(ln_b), wqkv.astype(jnp.bfloat16), vec(bqkv),
      wproj.astype(jnp.bfloat16))
    dx, h, dqkv_t, o, dscale, dbias, dbqkv, dbproj = outs
    # the two big weight-grad contractions as XLA GEMMs (fp32 accumulate)
    dwqkv = jnp.einsum("bnd,bkn->dk", h, dqkv_t,
                       preferred_element_type=jnp.float32)
    dwproj = jnp.einsum("bdn,bne->de", o, g.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    return (dx, dwqkv, dbqkv[0], dwproj, dbproj[0], dscale[0], dbias[0])


def _fwd(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, scale, interpret):
    out = _impl(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, scale,
                interpret)
    return out, (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)


def _bwd(heads, scale, interpret, res, g):
    x, ln_s, ln_b, wqkv, bqkv, wproj, bproj = res
    D = x.shape[-1]
    if D > 512:
        # fp32 weight-grad accumulators don't fit VMEM beyond ViT-S dims:
        # dx kernel + XLA weight-grad GEMMs (vit_base trains through
        # Pallas too — the old full-XLA fallback recomputed the slow
        # XLA softmax/attention chain)
        dx, dwqkv, dbqkv, dwproj, dbproj, dscale, dbias = \
            _fused_attn_bwd_bigdim(g, x, ln_s, ln_b, wqkv, bqkv, wproj,
                                   heads, scale, interpret)
    else:
        dx, dwqkv, dbqkv, dwproj, dbproj, dscale, dbias = \
            _fused_attn_bwd_impl(g, x, ln_s, ln_b, wqkv, bqkv, wproj,
                                 heads, scale, interpret)
    return (dx, dscale.astype(ln_s.dtype), dbias.astype(ln_b.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype))


def _bwd_xla_reference(heads, scale, interpret, res, g):
    x, ln_s, ln_b, wqkv, bqkv, wproj, bproj = res
    B, N, D = x.shape
    Dh = D // heads
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-6)
    xhat = (xf - mu) * inv
    h = xhat * ln_s + ln_b                                   # (B,N,D)
    wq = wqkv.astype(jnp.float32)
    wp = wproj.astype(jnp.float32)
    qkv = (h @ wq + bqkv).reshape(B, N, 3, heads, Dh)
    q = qkv[:, :, 0]
    k = qkv[:, :, 1]
    v = qkv[:, :, 2]                                          # (B,N,H,Dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, -1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, D)

    # y = o @ wp + bproj; out = x + y
    dy = gf
    dwproj = jnp.einsum("bnd,bne->de", o, dy)
    dbproj = jnp.sum(dy, (0, 1))
    do = (dy @ wp.T).reshape(B, N, heads, Dh)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, do)
    dp = jnp.einsum("bqhd,bkhd->bhqk", do, v)
    ds = p * (dp - jnp.sum(dp * p, -1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q) * scale
    dqkv = jnp.stack([dq, dk, dv], 2).reshape(B, N, 3 * D)
    dwqkv = jnp.einsum("bnd,bnk->dk", h, dqkv)
    dbqkv = jnp.sum(dqkv, (0, 1))
    dh = dqkv @ wq.T
    dscale_ln = jnp.sum(dh * xhat, (0, 1))
    dbias_ln = jnp.sum(dh, (0, 1))
    dxhat = dh * ln_s
    dx_ln = inv * (dxhat - jnp.mean(dxhat, -1, keepdims=True)
                   - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True))
    dx = (gf + dx_ln).astype(x.dtype)
    return (dx, dscale_ln.astype(ln_s.dtype), dbias_ln.astype(ln_b.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype))


fused_attention_block.defvjp(_fwd, _bwd)
