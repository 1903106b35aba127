"""On-chip check: vit_base at img 384 (qkv8 tree) runs the COMPOSITE int8
path — XLA dequant attention + the Pallas int8 MLP kernel — rather than
falling all the way back to full-dequant XLA (the pre-round-5 bug: the
bf16 kernels' VMEM gates also disabled the int8 MLP kernel). At these
dims BOTH kernel attention tiers are VMEM-infeasible (the int8
full-scores planner and the query-blocked bf16 kernel), so the tier-3
XLA dequant attention is the correct route.

Run: ``./tools_tpurun.sh tools/check_i8_composite_vitbase384.py``.
Prints the routing taken (via a spy on fused_mlp_block_i8), top-1
agreement vs the fp32 XLA reference, and composite vs full-dequant
throughput.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mfvit_tpu.nn import vit
from mfvit_tpu.ops import fused_int8 as fi8

B = 64
cfg = vit.ViTConfig("vit_base_384", img_size=384, patch=16, dim=768,
                    depth=12, heads=12)
print("devices:", jax.devices())
print("i8 attn supported at N=%d D=%d: %s"
      % (cfg.seq_len, cfg.dim, fi8.attn_supported(cfg.seq_len, cfg.dim,
                                                  cfg.heads)))

params = vit.init(jax.random.PRNGKey(0), cfg, num_classes=3)
qparams = fi8.quantize_vit_for_serving(params)
img = jax.random.normal(jax.random.PRNGKey(1), (B, 384, 384, 3),
                        jnp.bfloat16)

calls = []
large_calls = []
orig_mlp = fi8.fused_mlp_block_i8
orig_large = vit.fused_attention_block_large


def mlp_spy(*a, **k):
    calls.append(1)
    return orig_mlp(*a, **k)


def large_spy(*a, **k):
    large_calls.append(1)
    return orig_large(*a, **k)


fi8.fused_mlp_block_i8 = mlp_spy
vit.fused_attention_block_large = large_spy
ref = np.asarray(vit.apply(params, img, cfg, attn_backend="xla"),
                 np.float32)
n0 = len(calls)
out = np.asarray(vit.apply(qparams, img, cfg, attn_backend="pallas"),
                 np.float32)
fi8.fused_mlp_block_i8 = orig_mlp
vit.fused_attention_block_large = orig_large
print("int8 MLP kernel calls during pallas apply:", len(calls) - n0,
      "(expect %d)" % cfg.depth)
print("qblocked dequant-attention kernel calls:", len(large_calls),
      "(expect 0 — qblocked is ALSO VMEM-infeasible at N=577/D=768, so"
      " vit_base@384 runs tier 3: XLA dequant attention)")
agree = (out.argmax(-1) == ref.argmax(-1)).mean()
print("top-1 agreement vs fp32 XLA: %.4f  max |dlogit| %.4f"
      % (agree, np.abs(out - ref).max()))
assert len(calls) - n0 == cfg.depth, "composite path not taken"
assert not large_calls, "qblocked tier unexpectedly taken at vit_base@384"
assert agree >= 0.95, agree


def timed(fn, n=10):
    fn().block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    r.block_until_ready()
    return B * n / (time.perf_counter() - t0)


# params/img go in as jit ARGUMENTS — closing over the fp32 tree as jit
# constants inflates the serialized program past the axon tunnel's
# remote-compile body limit (HTTP 413)
j_pallas = jax.jit(lambda p, i: vit.apply(p, i, cfg,
                                          attn_backend="pallas"))
j_xla = jax.jit(lambda p, i: vit.apply(p, i, cfg, attn_backend="xla"))
print("composite (XLA attn + i8 MLP kernel): %.0f img/s"
      % timed(lambda: j_pallas(qparams, img)))
print("full dequant XLA:                     %.0f img/s"
      % timed(lambda: j_xla(qparams, img)))
print("bf16 pallas (-> XLA attn fallback):   %.0f img/s"
      % timed(lambda: j_pallas(params, img)))
print("bf16 XLA:                             %.0f img/s"
      % timed(lambda: j_xla(params, img)))
print("COMPOSITE CHECK OK")
