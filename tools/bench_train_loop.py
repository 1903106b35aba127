"""Training-loop throughput with REAL decode in the loop.

Measures the finetune hot path exactly as cli/finetune.py runs it —
BatchLoader workers decoding PNGs -> device_prefetch (double-buffered
device_put) -> device-fused augmentation -> jitted train step — and the
same loop with the prefetch disabled (synchronous jnp.asarray per step,
the round-1 behavior), on the real chip.

Run: ./tools_tpurun.sh tools/bench_train_loop.py
"""
import os
import tempfile
import time

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.data import datasets, device_aug, device_store
from mfvit_tpu.data import host_transforms as ht
from mfvit_tpu.data import manifest as mf, pipeline
from mfvit_tpu.nn import vit
from mfvit_tpu.train import optim, steps

B = 256
N_IMGS = 512
STEPS = 12

root = tempfile.mkdtemp(prefix="bench_train_")
os.makedirs(f"{root}/images/data", exist_ok=True)
rng = np.random.default_rng(0)
names, labels = [], []
for i in range(N_IMGS):
    fn = f"img_{i}.png"
    img = rng.integers(0, 255, (240, 260, 3), np.uint8)
    cv2.imwrite(f"{root}/images/data/{fn}", img)
    names.append(fn)
    labels.append(i % 3)
mf.write_covid_manifest(f"{root}/man.txt", f"{root}/images", names, labels)

tf = ht.CanvasTransform(img_size=224, training=True, maintain_ratio=True,
                        seed=0)


def make_loader(decode=None):
    ds = datasets.CovidDataset("data", f"{root}/man.txt", tf, decode=decode)
    return pipeline.BatchLoader(ds, B, shuffle=True, seed=0, drop_last=True,
                                num_workers=8)


cfg = vit.get_config("vit_small")
params = vit.init(jax.random.PRNGKey(0), cfg, num_classes=3)
tx = optim.build_optimizer("sgd", 0.01)
train_step, _ = steps.make_classifier_steps(cfg, tx,
                                            compute_dtype=jnp.bfloat16)
opt_state = tx.init(params)
key = jax.random.PRNGKey(1)


def run(prefetch: bool, loader=None):
    global params, opt_state, key
    if loader is None:
        loader = make_loader()
    n = 0
    t0 = None
    done = 0
    pending = None
    while done < STEPS:
        it = pipeline.device_prefetch(iter(loader)) if prefetch \
            else iter(loader)
        for canv, lab in it:
            if not prefetch:
                canv, lab = jnp.asarray(canv), jnp.asarray(lab)
            key, kb = jax.random.split(key)
            x = device_aug.augment_batch(kb, canv, img_type="data",
                                         training=True, rotate_deg=10.0,
                                         out_dtype=jnp.bfloat16)
            p, o, loss, _ = train_step(params, opt_state, x, lab)
            params, opt_state = p, o
            # one-step-lagged loss fetch, exactly like the CLI hot loops
            # (train.metrics.DeferredFetch): the fetch of step i overlaps
            # step i+1's dispatch
            if pending is not None:
                np.asarray(pending)
            pending = loss
            done += 1
            if done == 2:       # warmup: compile + cache fill
                np.asarray(pending)
                pending = None
                t0 = time.perf_counter()
                n = 0
            n += B
            if done >= STEPS:
                break
    np.asarray(pending)
    return n / (time.perf_counter() - t0)


v_pre = run(True)
print(f"train loop WITH device_prefetch: {v_pre:.0f} img/s")
v_sync = run(False)
print(f"train loop synchronous H2D:      {v_sync:.0f} img/s")
print(f"speedup: {v_pre / v_sync:.3f}x")

# decode+resize canvas cache (epoch >= 2 is decode-free): the timed
# window starts after the cache-filling first epoch, i.e. steady state
cached = make_loader(ht.DecodeResizeCache(224, maintain_ratio=True))
v_cache = run(True, cached)
print(f"train loop prefetch + canvas cache: {v_cache:.0f} img/s")
print(f"cache speedup over uncached: {v_cache / v_pre:.3f}x")

# HBM-resident canvas store: the host feeds each image ONCE (fill pass),
# then every epoch is gather + on-device crop/aug — zero per-step H2D.
fill_tf = ht.CanvasTransform(img_size=224, training=False,
                             maintain_ratio=False, seed=0)
sds = datasets.CovidDataset("data", f"{root}/man.txt", fill_tf)
t0f = time.perf_counter()
store = device_store.fill_from_dataset(sds, batch_size=B, seed=0)
print(f"device store fill (one pass incl. H2D): "
      f"{time.perf_counter() - t0f:.1f}s for {len(sds)} imgs")
v_store = run(False, store)
print(f"train loop HBM-resident store:   {v_store:.0f} img/s")
print(f"store speedup over host feed: {v_store / v_pre:.2f}x")

# single-dispatch store loop (the CLI fast path): gather + crop + aug +
# train step in ONE jitted program; only a 1 KB index vector + one RPC
# per step
crop_sz = 224


def fused_store_step_fn(params, opt_state, table, lab_table, idx, key):
    canv = jnp.take(table, idx, axis=0)
    labels = jnp.take(lab_table, idx, axis=0)
    x = device_aug.augment_batch(key, canv, img_type="data", training=True,
                                 rotate_deg=10.0, out_dtype=jnp.bfloat16)
    return train_step(params, opt_state, x, labels)


fused_store_step = jax.jit(fused_store_step_fn, donate_argnums=(0, 1))


def run_fused(store):
    global params, opt_state, key
    n = 0
    t0 = None
    done = 0
    pending = None
    while done < STEPS:
        for idx in store.iter_index_batches():
            key, kb = jax.random.split(key)
            p, o, loss, _ = fused_store_step(
                params, opt_state, store.canvases, store.labels, idx, kb)
            params, opt_state = p, o
            if pending is not None:
                np.asarray(pending)
            pending = loss
            done += 1
            if done == 2:
                np.asarray(pending)
                pending = None
                t0 = time.perf_counter()
                n = 0
            n += B
            if done >= STEPS:
                break
    np.asarray(pending)
    return n / (time.perf_counter() - t0)


v_fused = run_fused(store)
print(f"train loop single-dispatch store: {v_fused:.0f} img/s")
print(f"single-dispatch speedup over host feed: {v_fused / v_pre:.2f}x")
