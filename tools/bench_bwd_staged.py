"""Microbenchmark: MXU/VPU-staged attention BACKWARD kernel.

The shipped backward (ops/fused_attn._bwd_kernel) runs each image's
chain sequentially: the engines ping-pong (VPU LN/softmax-recompute ->
MXU qkv/grad GEMMs -> VPU dsm -> MXU weight grads), serializing at every
cross-engine dependency. The staged variant issues image b+1's
recompute phase before image b's gradient phase so the VPU work of one
image overlaps the MXU GEMMs of the other (the trick that bought 8% on
the forward — docs/PERF.md).

Run: ./tools_tpurun.sh tools/bench_bwd_staged.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfvit_tpu.ops import fused_attn as fa

B, N, D, H = 256, 197, 384, 12
REPS = 12
k = jax.random.split(jax.random.PRNGKey(0), 8)
x = jax.random.normal(k[0], (B, N, D), jnp.bfloat16)
g0 = jax.random.normal(k[1], (B, N, D), jnp.bfloat16)
ln_s = 1 + 0.02 * jax.random.normal(k[2], (D,))
ln_b = 0.02 * jax.random.normal(k[3], (D,))
wqkv = 0.05 * jax.random.normal(k[4], (D, 3 * D))
bqkv = 0.02 * jax.random.normal(k[5], (3 * D,))
wproj = 0.05 * jax.random.normal(k[6], (D, D))
scale = (D // H) ** -0.5


def _staged_bwd_kernel(g_ref, x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                       wproj_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                       dbproj_ref, ds_ref, db_ref, *, heads, scale,
                       has_bias):
    cb, N_, D_ = x_ref.shape
    Dh = D_ // heads

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
        """Forward recompute for image b: VPU LN + MXU qkv GEMM + VPU
        softmax. Returns everything the gradient phase needs."""
        xb = x_ref[b].astype(jnp.float32)
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
        qkv = qkv_t.astype(jnp.bfloat16).reshape(3, heads, Dh, N_)
        q, kk, v = qkv[0], qkv[1], qkv[2]
        s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        mx = jnp.max(s, -1, keepdims=True)
        e = jnp.exp(s - mx)
        p = e / jnp.sum(e, -1, keepdims=True)
        return dict(gb=gb, inv=inv, xhat=xhat, h=h, q=q, k=kk, v=v, p=p)

    def grads(b, r):
        gb, p, v, q, kk, h = r["gb"], r["p"], r["v"], r["q"], r["k"], r["h"]
        pb = p.astype(jnp.bfloat16)
        o = jax.lax.dot_general(v, pb, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o.reshape(D_, N_)
        gbf = gb.astype(jnp.bfloat16)
        dwproj_ref[...] += jax.lax.dot_general(
            o, gb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbproj_ref[...] += jnp.sum(gb, 0, keepdims=True)
        do = jax.lax.dot_general(wp, gbf, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        doh = do.astype(jnp.bfloat16).reshape(heads, Dh, N_)
        dv = jax.lax.dot_general(doh, pb, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(doh, v, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dsm = p * (dp - jnp.sum(dp * p, -1, keepdims=True))
        dsb = dsm.astype(jnp.bfloat16)
        dq = jax.lax.dot_general(kk, dsb, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(q, dsb, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dqkv_t = jnp.concatenate(
            [dq.reshape(D_, N_), dk.reshape(D_, N_), dv.reshape(D_, N_)],
            axis=0).astype(jnp.bfloat16)
        dwqkv_ref[...] += jax.lax.dot_general(
            h, dqkv_t, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_bias:
            dbqkv_ref[...] += jnp.sum(
                dqkv_t.astype(jnp.float32), 1, keepdims=True).T
        dh = jax.lax.dot_general(dqkv_t, wq, (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
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


@functools.partial(jax.jit, static_argnames=("heads", "scale", "cb"))
def staged_bwd(g, x, ln_s, ln_b, wqkv, bqkv, wproj, heads, scale, cb=2):
    B_, N_, D_ = x.shape

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    blk = lambda i: (i, 0, 0)  # noqa: E731
    kern = functools.partial(_staged_bwd_kernel, heads=heads, scale=scale,
                             has_bias=True)
    outs = pl.pallas_call(
        kern,
        grid=(B_ // cb,),
        in_specs=[
            pl.BlockSpec((cb, N_, D_), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, N_, D_), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, 3 * D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, D_), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cb, N_, D_), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, 3 * D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_, N_, D_), x.dtype),
            jax.ShapeDtypeStruct((D_, 3 * D_), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D_), jnp.float32),
            jax.ShapeDtypeStruct((D_, D_), jnp.float32),
            jax.ShapeDtypeStruct((1, D_), jnp.float32),
            jax.ShapeDtypeStruct((1, D_), jnp.float32),
            jax.ShapeDtypeStruct((1, D_), jnp.float32),
        ],
    )(g, x, vec(ln_s), vec(ln_b), wqkv.astype(jnp.bfloat16), vec(bqkv),
      wproj.astype(jnp.bfloat16))
    return outs


def chain(fn):
    @jax.jit
    def run(g):
        def step(c, _):
            outs = fn(c)
            return outs[0], jnp.sum(outs[3][:2])
        out, o = jax.lax.scan(step, g, None, length=REPS)
        return jnp.sum(out.astype(jnp.float32)) + jnp.sum(o)
    return run


def timeit(name, fn):
    try:
        s = float(np.asarray(fn(g0)))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    t0 = time.perf_counter()
    s = float(np.asarray(fn(g0)))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / REPS * 1000:.2f} ms/bwd [checksum {s:.3f}]")


timeit("current  cb=2", chain(lambda g: fa._fused_attn_bwd_impl(
    g, x, ln_s, ln_b, wqkv, bqkv, wproj, H, scale, False)))
for cb in (2, 4):
    timeit(f"staged   cb={cb}", chain(
        lambda g, cb=cb: staged_bwd(g, x, ln_s, ln_b, wqkv, bqkv, wproj,
                                    H, scale, cb)))

# numerical agreement of the staged variant vs the shipped backward
ref = fa._fused_attn_bwd_impl(g0, x, ln_s, ln_b, wqkv, bqkv, wproj, H,
                              scale, False)
got = staged_bwd(g0, x, ln_s, ln_b, wqkv, bqkv, wproj, H, scale, 2)
for i, (a, b) in enumerate(zip(got, ref)):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    sc = max(1.0, np.abs(b).max())
    print(f"out[{i}] max rel-to-scale err {np.abs(a - b).max() / sc:.2e}")
