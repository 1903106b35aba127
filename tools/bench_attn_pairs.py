"""Microbenchmark: staged attention with score/PV dot_generals batched
over PAIRS of images ((2H, Dh, N) batch) vs the shipped per-image staging.
More independent batched matmuls per MXU dispatch could amortize pipeline
ramp on the small Dh=32 contractions.
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


def _attn_pairs_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
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

    qkvs = [qkv_of(b) for b in range(cb)]
    # pair the images: (2H, Dh, N) batched score/PV dots
    pairs = [(qkvs[i], qkvs[i + 1]) for i in range(0, cb, 2)]

    def scores_of(pa, pb_):
        q = jnp.concatenate([pa[0], pb_[0]], 0).astype(jnp.float32) * scale
        kk = jnp.concatenate([pa[1], pb_[1]], 0)
        return jax.lax.dot_general(
            q.astype(kk.dtype), kk, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (2H, N, N)

    def softmax_of(s):
        mx = jnp.max(s, -1, keepdims=True)
        p = jnp.exp(s - mx)
        r = 1.0 / jnp.sum(p, -1, keepdims=True)
        return p, r

    def out_of(pi, pa, pb_, p, r):
        v = jnp.concatenate([pa[2], pb_[2]], 0)
        o = jax.lax.dot_general(v, p.astype(v.dtype),
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = (o * r.reshape(2 * heads, 1, N_)).astype(x_ref.dtype)
        for j in range(2):
            b = 2 * pi + j
            ob = o[j * heads:(j + 1) * heads].reshape(D_, N_)
            y = jax.lax.dot_general(ob, wp, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[b] = x_ref[b] + (y + bproj_ref[...]).astype(x_ref.dtype)

    ss = [scores_of(*p) for p in pairs]
    pr = [None] * len(pairs)
    pr[0] = softmax_of(ss[0])
    for i, pair in enumerate(pairs):
        if i + 1 < len(pairs):
            pr[i + 1] = softmax_of(ss[i + 1])
        out_of(i, *pair, *pr[i])


@functools.partial(jax.jit, static_argnames=("heads", "scale", "cb"))
def attn_pairs(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, scale,
               cb: int = 4):
    B_, N_, D_ = x.shape

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_attn_pairs_kernel, heads=heads, scale=scale),
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


def mlp(c):
    return fm._fused_mlp_impl(c, ln2s, ln2b, w1, b1, w2, b2, False)


timeit("shipped staged cb=4", chain(lambda c: mlp(
    fa._impl(c, ln1s, ln1b, wqkv, bqkv, wproj, bproj, H, scale, False))), x)
for cb in (4, 8):
    timeit(f"pairs cb={cb}", chain(lambda c, cb=cb: mlp(
        attn_pairs(c, ln1s, ln1b, wqkv, bqkv, wproj, bproj, H, scale,
                   cb))), x)
