"""One-off: does the vit_base B>=128 classifier train step compile?
Usage: check_vitbase_b256_compile.py [B] [attn_backend] [remat]

Findings (round 5, banked in docs/PERF.md): B=64 compiles on the pallas
backend; B=128 and B=256 fail — the axon remote-compile helper dies
with an opaque `tpu_compile_helper subprocess exit code 1` (the real
XLA error is swallowed server-side), remat on or off. The remat
refactor did NOT introduce it: the remat=False jaxpr hashes identically
at HEAD and at the refactor (see PERF.md). The XLA backend compiles all
of these shapes — it is the documented fallback for vit_base at B>=128
on one chip (the production shape shards B=64/chip over the mesh).

vit.apply now auto-downgrades those shapes to XLA at trace time; this
tool measures the RAW kernel-path boundary, so it disables that gate
(MFVIT_NO_ATTN_FALLBACK) when the pallas backend is requested."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mfvit_tpu.nn import vit
from mfvit_tpu.train import steps

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
backend = sys.argv[2] if len(sys.argv) > 2 else None
remat = len(sys.argv) > 3 and sys.argv[3] == "remat"
if backend in (None, "pallas"):
    os.environ["MFVIT_NO_ATTN_FALLBACK"] = "1"  # measure the raw boundary
cfg = vit.get_config("vit_base")
params = vit.init(jax.random.PRNGKey(0), cfg, num_classes=3)
imgs = jnp.zeros((B, cfg.img_size, cfg.img_size, 3), jnp.bfloat16)
labels = jnp.asarray(np.zeros((B,), np.int32))
tx = optax.sgd(0.01, momentum=0.9)
train_step, _ = steps.make_classifier_steps(cfg, tx, attn_backend=backend,
                                            remat=remat)
tag = f"vit_base B={B} backend={backend or 'default'} remat={remat}"
try:
    compiled = train_step.lower(params, tx.init(params), imgs,
                                labels).compile()
    mem = compiled.memory_analysis()
    tmp = getattr(mem, "temp_size_in_bytes", 0) or 0
    print(f"{tag}: COMPILE OK (temp {tmp / 2**20:.0f} MiB)")
except Exception as e:
    print(f"{tag}: COMPILE FAILED — {str(e)[:4000]}")
