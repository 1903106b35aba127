"""vit_base serving: bf16 Pallas vs in-kernel int8 W8A8.

The W8A8 arithmetic-intensity crossover sits above ViT-S dims (docs/PERF.md);
this measures the vit_base side: +2.2% for int8 at B=256 with 98.4% top-1
agreement. Run: ./tools_tpurun.sh tools/bench_vitbase_int8.py
"""
import time

import numpy as np
import jax, jax.numpy as jnp
from mfvit_tpu.nn import vit
from mfvit_tpu.ops.fused_int8 import quantize_vit_for_serving

B = 256
cfg = vit.get_config("vit_base")
params = vit.init(jax.random.PRNGKey(0), cfg, num_classes=3)
img = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3), jnp.bfloat16)

def run(p, label):
    fwd = jax.jit(lambda pp, im: vit.apply(pp, im, cfg))
    print(f"compiling {label}...", flush=True); np.asarray(fwd(p, img)); np.asarray(fwd(p, img))
    t0 = time.perf_counter(); pending = None
    for _ in range(10):
        o = fwd(p, img)
        if pending is not None: np.asarray(pending)
        pending = o
    np.asarray(pending)
    dt = (time.perf_counter() - t0) / 10
    print(f"{label}: {dt*1000:.1f} ms  {B/dt:.0f} img/s")
    return np.asarray(pending)

a = run(params, "vit_base bf16 ")
qp = quantize_vit_for_serving(params)
b = run(qp, "vit_base int8 ")
agree = (a.argmax(-1) == b.argmax(-1)).mean()
print(f"top-1 agreement: {agree:.3f}, max logit drift {np.abs(a-b).max():.3f}")
