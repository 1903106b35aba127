"""Microbenchmark: MLP kernel consuming (B, N, D) blocks directly
(in-VMEM flatten) vs the flat (M, D) kernel whose XLA-level reshapes
physically re-tile 77 MB per block (profile: ~0.24 ms/block).

Measured end-to-end style: attention kernel + MLP variant chained 12x.
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


def _mlp3d_kernel(x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref,
                  b2_ref, o_ref, *, flat: bool):
    cb, N_, D_ = x_ref.shape

    def half(x):
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
        return x + (y + b2_ref[...]).astype(x.dtype)

    if flat:
        o_ref[...] = half(x_ref[...].reshape(cb * N_, D_)).reshape(
            cb, N_, D_)
    else:
        for b in range(cb):
            o_ref[b] = half(x_ref[b])


@functools.partial(jax.jit, static_argnames=("cb", "flat"))
def mlp3d(x, ln_s, ln_b, w1, b1, w2, b2, cb: int = 4, flat: bool = True):
    B_, N_, D_ = x.shape
    Hd = w1.shape[1]

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_mlp3d_kernel, flat=flat),
        grid=(B_ // cb,),
        in_specs=[
            pl.BlockSpec((cb, N_, D_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, N_, D_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, N_, D_), x.dtype),
    )(x, vec(ln_s), vec(ln_b), w1.astype(x.dtype), vec(b1),
      w2.astype(x.dtype), vec(b2))


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


def attn(c):
    return fa._impl(c, ln1s, ln1b, wqkv, bqkv, wproj, bproj, H, scale,
                    False)


timeit("baseline flat-MLP", chain(lambda c: fm._fused_mlp_impl(
    attn(c), ln2s, ln2b, w1, b1, w2, b2, False)), x)

for cb in (2, 4, 8):
    timeit(f"mlp3d flat cb={cb}", chain(
        lambda c, cb=cb: mlp3d(attn(c), ln2s, ln2b, w1, b1, w2, b2, cb,
                               True)), x)
for cb in (2, 4):
    timeit(f"mlp3d loop cb={cb}", chain(
        lambda c, cb=cb: mlp3d(attn(c), ln2s, ln2b, w1, b1, w2, b2, cb,
                               False)), x)


# staged per-image variant: GEMM1(b+1) issued before GELU(b) so the VPU
# GELU overlaps the next image's MXU GEMM
def _mlp3d_staged_kernel(x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref, o_ref):
    cb, N_, D_ = x_ref.shape
    w1 = w1_ref[...]
    w2 = w2_ref[...]

    def pre(b):
        xf = x_ref[b].astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s_ref[...]
             + ln_b_ref[...]).astype(x_ref.dtype)
        return jax.lax.dot_general(h, w1, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def post(b, a):
        g = _gelu_exactish(a + b1_ref[...]).astype(x_ref.dtype)
        y = jax.lax.dot_general(g, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[b] = x_ref[b] + (y + b2_ref[...]).astype(x_ref.dtype)

    a = [None] * cb
    a[0] = pre(0)
    for b in range(cb):
        if b + 1 < cb:
            a[b + 1] = pre(b + 1)
        post(b, a[b])


@functools.partial(jax.jit, static_argnames=("cb",))
def mlp3d_staged(x, ln_s, ln_b, w1, b1, w2, b2, cb: int = 4):
    B_, N_, D_ = x.shape
    Hd = w1.shape[1]

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        _mlp3d_staged_kernel,
        grid=(B_ // cb,),
        in_specs=[
            pl.BlockSpec((cb, N_, D_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, N_, D_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, N_, D_), x.dtype),
    )(x, vec(ln_s), vec(ln_b), w1.astype(x.dtype), vec(b1),
      w2.astype(x.dtype), vec(b2))


timeit("mlp3d loop cb=8", chain(
    lambda c: mlp3d(attn(c), ln2s, ln2b, w1, b1, w2, b2, 8, False)), x)
for cb in (2, 4, 8):
    timeit(f"mlp3d staged cb={cb}", chain(
        lambda c, cb=cb: mlp3d_staged(attn(c), ln2s, ln2b, w1, b1, w2, b2,
                                      cb)), x)
