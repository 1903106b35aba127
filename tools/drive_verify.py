"""End-to-end drive on the real TPU: fused MF-ViT CA forward (Pallas vs XLA
parity), classifier/fusion train steps, device-fused augmentation."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import vit
from mfvit_tpu.models import fusion
from mfvit_tpu.train import optim, steps
from mfvit_tpu.data import device_aug

print("devices:", jax.devices())
assert jax.devices()[0].platform == "tpu", jax.devices()

cfg = vit.get_config("vit_small")
k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
vp_c = vit.init(k1, cfg, num_classes=3)
vp_e = vit.init(k2, cfg, num_classes=3)
fp = fusion.init(k3, num_classes=3)
img = jax.random.normal(k4, (32, 224, 224, 3))

# --- fused forward, pallas vs xla parity
fwd_p = jax.jit(lambda *a: fusion.fused_forward(*a, cfg, attn_backend="pallas"))
fwd_x = jax.jit(lambda *a: fusion.fused_forward(*a, cfg, attn_backend="xla"))
t0 = time.time()
fused_p, lc_p, le_p = jax.block_until_ready(fwd_p(vp_c, vp_e, fp, img, img))
print(f"pallas fused fwd compile+run {time.time()-t0:.1f}s")
fused_x, lc_x, le_x = jax.block_until_ready(fwd_x(vp_c, vp_e, fp, img, img))
d = float(jnp.max(jnp.abs(fused_p - fused_x)))
rel = d / float(jnp.max(jnp.abs(fused_x)))
print(f"pallas-vs-xla fused max abs diff {d:.3e} (rel {rel:.3e})")
assert rel < 2e-2, (d, rel)
assert fused_p.shape == (32, 3) and fused_p.dtype == jnp.float32

# --- device augmentation feeding a train step
canv = jnp.asarray(
    np.random.default_rng(0).integers(0, 255, (16, 224, 224, 3), np.uint8))
batch = device_aug.augment_batch(jax.random.PRNGKey(1), canv, img_type="data",
                                 training=True)

# --- fused rotate-then-crop (device-store train path, round 4): on-TPU
# bit-equality with the unfused full-frame rotation + slice composition
# (mirrors tests/test_data.py::test_rotate_then_crop_matches_full_rotation
# _then_slice, which only runs on CPU)
ka, kt, kl = jax.random.split(jax.random.PRNGKey(7), 3)
x01 = canv.astype(jnp.float32) / 255.0
angles = jax.random.uniform(ka, (16,), minval=-0.2, maxval=0.2)
tops = jax.random.randint(kt, (16,), 0, 224 - 192 + 1)
lefts = jax.random.randint(kl, (16,), 0, 224 - 192 + 1)
fused_rc = jax.jit(device_aug._rotate_crop_nearest,
                   static_argnums=(4,))(x01, angles, tops, lefts, 192)
unfused = jax.jit(jax.vmap(
    lambda img, a, t, l: jax.lax.dynamic_slice(
        device_aug._rotate_nearest(img[None], a[None])[0],
        (t, l, 0), (192, 192, 3))))(x01, angles, tops, lefts)
rc_diff = int(jnp.sum(fused_rc != unfused))
print(f"fused rotate-then-crop vs unfused: {rc_diff} mismatched elements")
assert rc_diff == 0
store_batch = device_aug.augment_train_canvas(
    jax.random.PRNGKey(8), canv, crop=192, img_type="data")
assert store_batch.shape == (16, 192, 192, 3)
assert bool(jnp.all(jnp.isfinite(store_batch)))
labels = jnp.asarray(np.random.default_rng(1).integers(0, 3, 16))

tx = optim.build_optimizer(
    "sgd", optim.finetune_lr(0.01, epochs=90, cos=True, steps_per_epoch=10))
train_step, eval_step = steps.make_classifier_steps(cfg, tx)
params = vit.init(jax.random.PRNGKey(2), cfg, num_classes=3)
state = tx.init(params)
t0 = time.time()
params, state, loss, logits = jax.block_until_ready(
    train_step(params, state, batch, labels))
print(f"classifier train step compile+run {time.time()-t0:.1f}s loss={float(loss):.4f}")
l0 = float(loss)
for _ in range(5):
    params, state, loss, logits = train_step(params, state, batch, labels)
print(f"loss {l0:.4f} -> {float(loss):.4f}")
assert float(loss) < l0

# --- fusion train step (LP protocol: ONLY the fusion head trains — the
# reference's effective optimizer set, cli/fuse.fusion_trainable_mask)
from mfvit_tpu.cli.fuse import fusion_trainable_mask

fparams = {"cxr": vp_c, "enh": vp_e, "fus": fp}
mask = fusion_trainable_mask(fparams)
tx2 = optim.build_optimizer("adam", 1e-4, trainable_mask=mask)
ftrain, feval = steps.make_fusion_steps(cfg, tx2)
fstate = tx2.init(fparams)
t0 = time.time()
fparams, fstate, floss, fout = jax.block_until_ready(
    ftrain(fparams, fstate, batch, batch, labels))
print(f"fusion train step compile+run {time.time()-t0:.1f}s loss={float(floss):.4f}")

# timing: fused inference throughput (pairs/sec). NOTE: ftrain donated
# fparams (aliasing vp_c/vp_e/fp) — time with the returned params.
pc, pe, pf = fparams["cxr"], fparams["enh"], fparams["fus"]
for _ in range(3):
    jax.block_until_ready(fwd_p(pc, pe, pf, img, img))
n, t0 = 20, time.time()
for _ in range(n):
    out = fwd_p(pc, pe, pf, img, img)
jax.block_until_ready(out)
dt = time.time() - t0
print(f"fused fwd b=32: {32 * n / dt:.0f} pairs/sec")
print("VERIFY OK")
