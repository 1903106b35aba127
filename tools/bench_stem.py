"""Microbenchmark: ViT patch-embed stem formulations on TPU.

The stem is patchify (a physical (B,14,16,14,16,3) transpose of the
~600 MB image batch) + one GEMM + posembed add. Candidates:

  patchify  — current: reshape/transpose then (B*196, 768) x (768, 384)
  conv      — lax.conv_general_dilated 16x16/s16 NHWC (XLA implicit im2col)
  dot5d     — free-view (B,14,16,14,48) then dot_general contracting the
              (16, 48) axes (lets XLA fold the transpose into the GEMM)

Each is scan-chained x12 with a forced data dependence so the dispatch
floor amortizes. Usage: ./tools_tpurun.sh tools/bench_stem.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mfvit_tpu.nn import posembed, vit
from mfvit_tpu.nn.layers import linear

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
REPS = 12
cfg = vit.get_config("vit_small")
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = vit.init(k1, cfg, num_classes=3)
imgs = jax.random.normal(k2, (B, 224, 224, 3), jnp.bfloat16)
POS = posembed.sincos_2d(cfg.grid, cfg.grid, cfg.dim)


def finish(x, p):
    cls = jnp.broadcast_to(p["cls"].astype(x.dtype), (B, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    return (x.astype(jnp.float32) + POS).astype(jnp.bfloat16)


def stem_patchify(p, im):
    x = vit.patchify(im, cfg.patch)
    return finish(linear(p["patch"], x), p)


def stem_conv(p, im):
    w = p["patch"]["w"].reshape(cfg.patch, cfg.patch, 3, cfg.dim)
    x = jax.lax.conv_general_dilated(
        im, w.astype(im.dtype), (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    x = (x + p["patch"]["b"]).astype(im.dtype)
    return finish(x.reshape(B, cfg.num_patches, cfg.dim), p)


def stem_dot5d(p, im):
    g, pt = cfg.grid, cfg.patch
    x5 = im.reshape(B, g, pt, g, pt * 3)
    w3 = p["patch"]["w"].reshape(pt, pt * 3, cfg.dim).astype(im.dtype)
    x = jax.lax.dot_general(
        x5, w3, (((2, 4), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)          # (B, g, g, dim)
    x = (x + p["patch"]["b"]).astype(im.dtype)
    return finish(x.reshape(B, cfg.num_patches, cfg.dim), p)


def timeit(name, stem_fn):
    @jax.jit
    def run(im):
        def step(c, _):
            out = stem_fn(params, c)
            # force sequential dependence without changing values
            c = c + (out[0, 0, 0] * 0).astype(c.dtype)
            return c, jnp.sum(out[:, 0, :8].astype(jnp.float32))
        _, outs = jax.lax.scan(step, im, None, length=REPS)
        return jnp.sum(outs)

    try:
        s = float(np.asarray(run(imgs)))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}")
        return
    t0 = time.perf_counter()
    s = float(np.asarray(run(imgs)))
    dt = time.perf_counter() - t0
    print(f"{name:10s} {dt / REPS * 1000:7.2f} ms/stem  [checksum {s:.1f}]")


timeit("patchify", stem_patchify)
timeit("conv", stem_conv)
timeit("dot5d", stem_dot5d)
