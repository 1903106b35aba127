"""Microbenchmark: MXU/VPU software-pipelined kernel variants.

Hypothesis: inside one grid step the VPU stages (LN, softmax, GELU) are
data-dependent on the immediately preceding MXU GEMM, so the engines
serialize. Issuing the GEMMs of sub-tile j+1 BEFORE the VPU stage of
sub-tile j lets the hardware scoreboard overlap them (in-order issue per
engine queue, async across queues).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfvit_tpu.ops import fused_attn as fa
from mfvit_tpu.ops import fused_mlp as fm
from mfvit_tpu.ops.fused_mlp import _gelu_exactish

B, N, D, H = 512, 197, 384, 12
DEPTH = 12
k = jax.random.split(jax.random.PRNGKey(0), 12)
x = jax.random.normal(k[0], (B, N, D), jnp.bfloat16)
ln1s = 1 + 0.02 * jax.random.normal(k[1], (D,))
ln1b = 0.02 * jax.random.normal(k[2], (D,))
wqkv = 0.05 * jax.random.normal(k[3], (D, 3 * D))
bqkv = 0.02 * jax.random.normal(k[4], (3 * D,))
wproj = 0.05 * jax.random.normal(k[5], (D, D))
bproj = 0.02 * jax.random.normal(k[6], (D,))
ln2s = 1 + 0.02 * jax.random.normal(k[7], (D,))
ln2b = 0.02 * jax.random.normal(k[8], (D,))
w1 = 0.05 * jax.random.normal(k[9], (D, 4 * D))
b1 = 0.02 * jax.random.normal(k[10], (4 * D,))
w2 = 0.05 * jax.random.normal(k[11], (4 * D, D))
b2 = jnp.zeros((D,))
scale = (D // H) ** -0.5


# --------------------------------------------- pipelined MLP kernel

def _mlp_kernel_pipe(x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref,
                     b2_ref, o_ref, *, splits: int):
    TM = x_ref.shape[0]
    S = TM // splits
    w1 = w1_ref[...]
    w2 = w2_ref[...]

    def ln(j):
        xj = x_ref[j * S:(j + 1) * S].astype(jnp.float32)
        mu = jnp.mean(xj, -1, keepdims=True)
        var = jnp.mean(jnp.square(xj - mu), -1, keepdims=True)
        return ((xj - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s_ref[...]
                + ln_b_ref[...]).astype(x_ref.dtype)

    def gemm1(h):
        return jax.lax.dot_general(h, w1, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def act(a):
        return _gelu_exactish(a + b1_ref[...]).astype(x_ref.dtype)

    def gemm2(g, j):
        y = jax.lax.dot_general(g, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[j * S:(j + 1) * S] = (
            x_ref[j * S:(j + 1) * S] + (y + b2_ref[...]).astype(x_ref.dtype))

    # issue order staggers VPU stage j against MXU stage j+1
    a = [None] * splits
    g = [None] * splits
    a[0] = gemm1(ln(0))
    for j in range(splits):
        if j + 1 < splits:
            a[j + 1] = gemm1(ln(j + 1))
        g[j] = act(a[j])
        gemm2(g[j], j)


@functools.partial(jax.jit, static_argnames=("splits", "tm"))
def mlp_pipe(x, ln_s, ln_b, w1, b1, w2, b2, splits: int = 2, tm: int = 512):
    B_, N_, D_ = x.shape
    Hd = w1.shape[1]
    M = B_ * N_
    TM = tm
    Mp = ((M + TM - 1) // TM) * TM
    xp = x.reshape(M, D_)
    if Mp != M:
        xp = jnp.pad(xp, ((0, Mp - M), (0, 0)))

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_mlp_kernel_pipe, splits=splits),
        grid=(Mp // TM,),
        in_specs=[
            pl.BlockSpec((TM, D_), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, D_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D_), x.dtype),
    )(xp, vec(ln_s), vec(ln_b), w1.astype(x.dtype), vec(b1),
      w2.astype(x.dtype), vec(b2))
    return out[:M].reshape(B_, N_, D_)


# --------------------------------------------- staged attention kernel

def _attn_kernel_staged(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                        wproj_ref, bproj_ref, o_ref, *, heads, scale):
    cb, N_, D_ = x_ref.shape
    Dh = D_ // heads
    wq = wqkv_ref[...]
    wp = wproj_ref[...]

    def qkv_of(b):
        xb = x_ref[b]
        xf = xb.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns_ref[...]
             + lnb_ref[...]).astype(xb.dtype)
        qkv_t = jax.lax.dot_general(wq, h, (((0,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        qkv_t = qkv_t + bqkv_ref[...].T
        return qkv_t.astype(xb.dtype).reshape(3, heads, Dh, N_)

    def scores_of(qkv):
        q = (qkv[0].astype(jnp.float32) * scale).astype(qkv.dtype)
        return jax.lax.dot_general(q, qkv[1], (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    def softmax_of(s):
        mx = jnp.max(s, -1, keepdims=True)
        p = jnp.exp(s - mx)
        r = 1.0 / jnp.sum(p, -1, keepdims=True)
        return p, r

    def out_of(b, qkv, p, r):
        v = qkv[2]
        o = jax.lax.dot_general(v, p.astype(v.dtype),
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = (o * r.reshape(heads, 1, N_)).reshape(D_, N_).astype(x_ref.dtype)
        y = jax.lax.dot_general(o, wp, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[b] = x_ref[b] + (y + bproj_ref[...]).astype(x_ref.dtype)

    # stage all MXU-heavy qkv+score GEMMs first, then alternate
    # softmax (VPU) with PV+proj (MXU) so engines overlap across images
    qkvs = [qkv_of(b) for b in range(cb)]
    ss = [scores_of(qkvs[b]) for b in range(cb)]
    pr = [None] * cb
    pr[0] = softmax_of(ss[0])
    for b in range(cb):
        if b + 1 < cb:
            pr[b + 1] = softmax_of(ss[b + 1])
        out_of(b, qkvs[b], *pr[b])


@functools.partial(jax.jit, static_argnames=("heads", "scale", "cb"))
def attn_staged(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, scale,
                cb: int = 2):
    B_, N_, D_ = x.shape

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_attn_kernel_staged, heads=heads, scale=scale),
        grid=(B_ // cb,),
        in_specs=[
            pl.BlockSpec((cb, N_, D_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, 3 * D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, N_, D_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, N_, D_), x.dtype),
    )(x, vec(ln_s), vec(ln_b), wqkv.astype(x.dtype), vec(bqkv),
      wproj.astype(x.dtype), vec(bproj))


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        s = float(np.asarray(out))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(np.asarray(out))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1000:.1f} ms ({dt/DEPTH*1000:.2f} ms/block) "
          f"[checksum {s:.3f}]")


def chain(body):
    @jax.jit
    def run(xx):
        def step(c, _):
            return body(c), ()
        out, _ = jax.lax.scan(step, xx, None, length=DEPTH)
        return jnp.sum(out.astype(jnp.float32))
    return run


timeit("baseline attn+mlp", chain(lambda c: fm._fused_mlp_impl(
    fa._impl(c, ln1s, ln1b, wqkv, bqkv, wproj, bproj, H, scale, False),
    ln2s, ln2b, w1, b1, w2, b2, False)), x)

for sp, tm in ((2, 512), (4, 512), (2, 1024), (4, 1024)):
    timeit(f"attn + mlp_pipe s={sp} tm={tm}", chain(
        lambda c, sp=sp, tm=tm: mlp_pipe(
            fa._impl(c, ln1s, ln1b, wqkv, bqkv, wproj, bproj, H, scale,
                     False),
            ln2s, ln2b, w1, b1, w2, b2, sp, tm)), x)

for cb in (2, 4):
    timeit(f"attn_staged cb={cb} + mlp", chain(
        lambda c, cb=cb: fm._fused_mlp_impl(
            attn_staged(c, ln1s, ln1b, wqkv, bqkv, wproj, bproj, H, scale,
                        cb),
            ln2s, ln2b, w1, b1, w2, b2, False)), x)

timeit("attn_staged cb=2 + mlp_pipe s=2", chain(
    lambda c: mlp_pipe(
        attn_staged(c, ln1s, ln1b, wqkv, bqkv, wproj, bproj, H, scale, 2),
        ln2s, ln2b, w1, b1, w2, b2, 2, 512)), x)
