"""Piecewise timing of the MF-ViT CA fused forward on-chip.

Times (fetch-forced, 1-iteration-lag pipeline, bench.py methodology) the
full fused forward and ablated variants to attribute the per-pair budget:

  full        — fused_forward (2 branches + fusion head), the bench path
  branches    — the two ViT branches only (tokens+logits), fusion head cut
  one_branch  — a single ViT branch
  stem_only   — patchify + patch GEMM + posembed per branch (blocks cut)
  nofinal     — branches with the final LayerNorm cut (upper bound on its cost)

Usage: ./tools_tpurun.sh tools/profile_fwd.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mfvit_tpu.models import fusion
from mfvit_tpu.nn import posembed, vit
from mfvit_tpu.nn.layers import linear
from mfvit_tpu.ops.fused_attn import fused_attention_block
from mfvit_tpu.ops.fused_mlp import fused_mlp_block

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
cfg = vit.get_config("vit_small")
k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
vp_c = vit.init(k1, cfg, num_classes=3)
vp_e = vit.init(k2, cfg, num_classes=3)
fp = fusion.init(k3, num_classes=3)
img = jax.random.normal(k4, (B, 224, 224, 3), jnp.bfloat16)


def stem(params, imgs):
    # production formulation (transpose-free patch embed)
    x = vit.patch_embed(params["patch"], imgs, cfg.patch)
    cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (B, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    pos = posembed.sincos_2d(cfg.grid, cfg.grid, cfg.dim)
    return (x.astype(jnp.float32) + pos).astype(jnp.bfloat16)


def blocks(params, x):
    scale = cfg.head_dim ** -0.5
    for blk in params["blocks"]:
        bqkv = blk["qkv"].get("b", jnp.zeros((3 * cfg.dim,), jnp.float32))
        x = fused_attention_block(
            x, blk["norm1"]["scale"], blk["norm1"]["bias"],
            blk["qkv"]["w"], bqkv, blk["proj"]["w"], blk["proj"]["b"],
            cfg.heads, scale, False)
        x = fused_mlp_block(
            x, blk["norm2"]["scale"], blk["norm2"]["bias"],
            blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"],
            blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"], False)
    return x


def branch(params, imgs, final_ln=True):
    if final_ln:
        # production path (incl. the final-LN kernel epilogue)
        return vit.apply(params, imgs, cfg, return_features=True)
    x = blocks(params, stem(params, imgs))
    cls_out = x[:, 0].astype(jnp.float32)
    return x, linear(params["head"], cls_out)


VARIANTS = {
    "full": lambda: jax.jit(lambda a, b: (
        lambda o: o[0] + o[1] + o[2])(
            fusion.fused_forward(vp_c, vp_e, fp, a, b, cfg))),
    "branches": lambda: jax.jit(lambda a, b: (
        branch(vp_c, a)[1] + branch(vp_e, b)[1])),
    "one_branch": lambda: jax.jit(lambda a, b: branch(vp_c, a)[1]),
    "stem_only": lambda: jax.jit(lambda a, b: (
        jnp.sum(stem(vp_c, a), axis=(1, 2), dtype=jnp.float32)[:, None]
        + jnp.sum(stem(vp_e, b), axis=(1, 2), dtype=jnp.float32)[:, None])),
    "nofinal": lambda: jax.jit(lambda a, b: (
        branch(vp_c, a, final_ln=False)[1]
        + branch(vp_e, b, final_ln=False)[1])),
}


def run(fn, iters=20, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(img, img))
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        out = fn(img, img)
        if pending is not None:
            np.asarray(pending)
        pending = out
    np.asarray(pending)
    return (time.perf_counter() - t0) / iters


results = {}
for name, make in VARIANTS.items():
    dt = run(make())
    results[name] = dt
    print(f"{name:12s} {dt * 1000:8.2f} ms/iter   {B / dt:8.0f} pairs/sec",
          flush=True)

full = results["full"]
print(f"\nfusion head : {(full - results['branches']) * 1000:6.2f} ms")
print(f"final LN x2 : {(results['branches'] - results['nofinal']) * 1000:6.2f} ms")
print(f"stems x2    : {results['stem_only'] * 1000:6.2f} ms (incl fixed overhead)")
print(f"one branch  : {results['one_branch'] * 1000:6.2f} ms")
