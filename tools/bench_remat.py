"""Measure --remat (jax.checkpoint per block): activation-HBM vs step
throughput on the real chip. vit_base classifier train step; compiled
memory from XLA's own analysis (temp = activations + workspace).

Measures the DEFAULT backend path a user gets: big-dim archs at
per-device B >= 128 auto-downgrade to XLA attention (the gate warns —
docs/PERF.md "Known pre-existing limit"); use
tools/check_vitbase_b256_compile.py for raw kernel-path boundaries."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mfvit_tpu.nn import vit
from mfvit_tpu.train import steps

arch = sys.argv[1] if len(sys.argv) > 1 else "vit_base"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256

cfg = vit.get_config(arch)
params = vit.init(jax.random.PRNGKey(0), cfg, num_classes=3)
imgs = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.img_size,
                                                 cfg.img_size, 3),
                         jnp.bfloat16)
labels = jnp.asarray(np.random.default_rng(0).integers(0, 3, B))
tx = optax.sgd(0.01, momentum=0.9)

order = (False, True)
if len(sys.argv) > 3 and sys.argv[3] == "reversed":
    order = (True, False)
for remat in order:
    train_step, _ = steps.make_classifier_steps(cfg, tx, remat=remat)
    p = jax.tree.map(jnp.copy, params)
    st = tx.init(p)
    lowered = train_step.lower(p, st, imgs, labels)
    try:
        compiled = lowered.compile()
    except Exception as e:  # e.g. scoped-VMEM OOM at this (arch, B)
        msg = str(e).splitlines()[0][:160]
        print(f"{arch} B={B} remat={remat}: COMPILE FAILED — {msg}")
        continue
    mem = compiled.memory_analysis()
    tmp = getattr(mem, "temp_size_in_bytes", None)
    # warmup WITH forced loss fetches: through the axon tunnel
    # block_until_ready is not enough (docs/PERF.md methodology), and the
    # first program of a fresh process needs a few fetched steps before
    # per-step dispatch reaches steady state (~300 ms/step before, true
    # rate after)
    for _ in range(4):
        p, st, loss, _ = compiled(p, st, imgs, labels)
        float(loss)
    n, t0 = 10, time.perf_counter()
    pending = None
    for _ in range(n):
        p, st, loss, _ = compiled(p, st, imgs, labels)
        if pending is not None:
            float(pending)
        pending = loss
    float(pending)
    dt = time.perf_counter() - t0
    print(f"{arch} B={B} remat={remat}: "
          f"temp HBM {tmp / 2**20 if tmp else float('nan'):.0f} MiB, "
          f"{B * n / dt:.0f} img/s ({dt / n * 1e3:.1f} ms/step)")
