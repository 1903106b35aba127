"""Microbenchmark: two-kernel block vs full-block kernel, CB sweep.

Times a 12-block ViT-S chain (B=512, N=197, D=384) as a lax.scan inside
one jit (honest device time through the axon tunnel — see
docs/PERF.md methodology), fetching a scalar.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mfvit_tpu.ops import fused_attn as fa
from mfvit_tpu.ops import fused_block as fb
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


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        s = float(np.asarray(out))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(np.asarray(out))
    dt = time.perf_counter() - t0
    per_block = dt / DEPTH * 1000
    print(f"{name}: {dt*1000:.1f} ms for {DEPTH} blocks "
          f"({per_block:.2f} ms/block)  [checksum {s:.3f}]")


def chain(body):
    @jax.jit
    def run(x):
        def step(c, _):
            return body(c), ()
        out, _ = jax.lax.scan(step, x, None, length=DEPTH)
        return jnp.sum(out.astype(jnp.float32))
    return run


for cb in (2, 4, 8):
    timeit(f"two-kernel cb={cb}",
           chain(lambda c, cb=cb: fm._fused_mlp_impl(
               fa._impl(c, ln1s, ln1b, wqkv, bqkv, wproj, bproj, H, scale,
                        False, cb=cb),
               ln2s, ln2b, w1, b1, w2, b2, False)), x)

for cb in (1, 2, 4, 8):
    timeit(f"full-block cb={cb}",
           chain(lambda c, cb=cb: fb._impl(
               c, ln1s, ln1b, wqkv, bqkv, wproj, bproj, ln2s, ln2b,
               w1, b1, w2, b2, H, scale, False, cb=cb)), x)
