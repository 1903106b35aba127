"""Full reference workflow end to end: synthetic data -> MoCo pretrain ->
LP finetune from the MoCo checkpoint -> MF-ViT CA fuse -> infer.

Run on the TPU chip with ``./tools_tpurun.sh tools/e2e_workflow.py [dir]``.
Validates the cross-stage checkpoint flow (SURVEY §5): MoCo state ->
backbone extraction -> LP model_best -> fusion branches -> serving.
Last verified on-chip: LP reaches 1.0 test top-1 on the class-separable
synthetic set; fusion + infer produce consistent metrics."""
import os, sys, glob
import numpy as np
import cv2

import tempfile
root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="e2e_covid_")
os.makedirs(f"{root}/images/data", exist_ok=True)
os.makedirs(f"{root}/images/Train_Mix", exist_ok=True)
os.makedirs(f"{root}/cds", exist_ok=True)
rng = np.random.default_rng(0)
names, labels = [], []
for i in range(32):
    fn = f"img_{i}.png"; label = i % 3
    for folder in ("data", "Train_Mix"):
        img = rng.integers(0, 255, (240, 260, 3), np.uint8)
        img[:, :, 0] = np.clip(img[:, :, 0] * 0.2 + label * 80, 0, 255)
        cv2.imwrite(f"{root}/images/{folder}/{fn}", img)
    names.append(fn); labels.append(label)

from mfvit_tpu.data import manifest as mf
mf.write_covid_manifest(f"{root}/cds/1_labeled_train_0.txt",
                        f"{root}/images", names[:16], labels[:16])
mf.write_covid_manifest(f"{root}/cds/val_ds.txt",
                        f"{root}/images", names[16:24], labels[16:24])
mf.write_covid_manifest(f"{root}/cds/test_ds.txt",
                        f"{root}/images", names[24:], labels[24:])

COMMON = ["-a", "vit_small", "--img-size", "224", "--crop", "224",
          "--maintain-ratio", "-j", "4", "--seed", "0",
          "--covid-ds", f"{root}/cds", "--semi-ratios", "1"]

from mfvit_tpu.cli import pretrain, finetune, fuse, infer
print("=== pretrain (MoCo v2-queue, 1 epoch) ===")
pretrain.main(COMMON + ["--storage-root", f"{root}/pre", "-b", "16",
                        "--epochs", "1", "--warmup-epochs", "0", "--cos",
                        "--lr", "1.5e-4", "--optimizer", "adamw", "--wd", "0.1",
                        "--moco-dim", "64", "--moco-mlp-dim", "256",
                        "--moco-k", "64", "--moco-t", "0.2", "--moco-m-cos",
                        "--stop-grad-conv1", "--save-epoch", "1"])
moco_ck = glob.glob(f"{root}/pre/*/train_1_0/checkpoint_best_loss")[0]

# extract the backbone from the MoCo state for finetune (orbax path)
import jax
from mfvit_tpu.exp import checkpoint as ck
from mfvit_tpu.nn import vit
from mfvit_tpu.ssl import moco as moco_mod
cfg = vit.get_config("vit_small")
mcfg = moco_mod.MoCoConfig(dim=64, mlp_dim=256, K=64, T=0.2)
like = {"state": moco_mod.init(jax.random.PRNGKey(0), mcfg, cfg), "epoch": 0}
st = ck.restore(moco_ck, like=like)
ck.save(f"{root}/backbone", st["state"]["base"]["encoder"])

print("=== LP finetune from MoCo backbone (2 epochs) ===")
res = finetune.main(COMMON + ["--storage-root", f"{root}/lp", "-b", "16",
                              "--epochs", "2", "--cos", "--lr", "0.3",
                              "--optimizer", "sgd",
                              "--pretrained", f"{root}/backbone"])
print("LP test auc", res[0].test_auc)
lp_ck = glob.glob(f"{root}/lp/*/train_1_0/model_best")[0]

print("=== MF-ViT CA fuse (2 epochs, branches from LP ckpt) ===")
res = fuse.main(COMMON + ["--storage-root", f"{root}/fuse", "-b", "16",
                          "--epochs", "2", "--cos", "--lr", "1e-3",
                          "--pretrained-cxr", lp_ck,
                          "--pretrained-enh", lp_ck])
print("fuse test auc", res[0].test_auc)
fuse_ck = glob.glob(f"{root}/fuse/*/train_1_0/model_best")[0]

print("=== infer ===")
out = infer.main(COMMON + ["--checkpoint", fuse_ck,
                           "--manifest", f"{root}/cds/test_ds.txt",
                           "--output", f"{root}/preds.json", "-b", "8",
                           "--report-throughput"])
print("E2E OK:", out["metrics"])

# Round-3 data layer: the same workflow through the HBM-resident canvas
# store (square-resize policy; --device-store-mb defaults on). The fill
# pass decodes each image once; epochs then run host-free — the notices
# below confirm the store engaged on the real chip, not just CPU tests.
print("=== pretrain, device-store fast path (square resize) ===")
STORE_COMMON = [a for a in COMMON if a != "--maintain-ratio"]
pretrain.main(STORE_COMMON + [
    "--storage-root", f"{root}/pre_store", "-b", "16",
    "--epochs", "2", "--warmup-epochs", "0", "--cos",
    "--lr", "1.5e-4", "--optimizer", "adamw", "--wd", "0.1",
    "--moco-dim", "64", "--moco-mlp-dim", "256",
    "--moco-k", "64", "--moco-t", "0.2", "--moco-m-cos",
    "--stop-grad-conv1"])

print("=== LP finetune, device-store fast path ===")
res = finetune.main(STORE_COMMON + [
    "--storage-root", f"{root}/lp_store", "-b", "16",
    "--epochs", "2", "--cos", "--lr", "0.3", "--optimizer", "sgd",
    "--pretrained", f"{root}/backbone"])
print("store-path LP test auc", res[0].test_auc)
print("E2E STORE PATH OK")
