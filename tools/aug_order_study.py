"""Quantify augmentation-order divergence #7 (docs/PARITY.md):

The reference training stack is flip -> rotate -> crop on the resized
canvas (image_transform.py:58-63); the default device-fused path crops on
the host FIRST (static device shapes) and flips/rotates on-device. This
study trains the SAME full-finetune run under both orders on a synthetic
set with rotation-sensitive spatial class structure (oriented stripes +
border markers — content near the crop boundary, where the orders differ
most) and reports test AUC/ACC per seed.

Usage:  python tools/aug_order_study.py [out_root]
(CPU is fine — vit_test-sized model; ~10 min for 3 seeds x 2 modes.)
"""
import json
import os
import sys
import tempfile

import numpy as np
import cv2

root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="augstudy_")
os.makedirs(f"{root}/images/data", exist_ok=True)
os.makedirs(f"{root}/cds", exist_ok=True)

rng = np.random.default_rng(0)
names, labels = [], []
N = 144  # 96 train / 24 val / 24 test


def make_img(label, r):
    """Oriented-stripe classes with border-hugging markers: the most
    rotation-window-sensitive content (rotation pulls zero corners in and
    moves border content out, which is exactly where crop-then-rotate and
    rotate-then-crop differ)."""
    img = r.integers(40, 216, (96, 104, 3), np.uint8)
    yy, xx = np.mgrid[0:96, 0:104]
    if label == 0:
        stripe = ((yy // 8) % 2 == 0)
    elif label == 1:
        stripe = ((xx // 8) % 2 == 0)
    else:
        stripe = (((yy + xx) // 8) % 2 == 0)
    # low contrast vs the +-88 noise so the task sits BELOW ceiling —
    # at-ceiling metrics cannot discriminate the two aug orders
    img[stripe] = np.minimum(img[stripe].astype(np.int16) + 14,
                             255).astype(np.uint8)
    # border marker band (8px) — lives right where the orders diverge
    band = np.zeros((96, 104), bool)
    band[:8] = band[-8:] = True
    band[:, :8] = band[:, -8:] = True
    img[band & stripe] = np.minimum(
        img[band & stripe].astype(np.int16) + 25, 255).astype(np.uint8)
    return img


for i in range(N):
    label = i % 3
    fn = f"img_{i}.png"
    cv2.imwrite(f"{root}/images/data/{fn}", make_img(label, rng))
    names.append(fn)
    labels.append(label)

from mfvit_tpu.data import manifest as mf  # noqa: E402

mf.write_covid_manifest(f"{root}/cds/1_labeled_train_0.txt",
                        f"{root}/images", names[:96], labels[:96])
mf.write_covid_manifest(f"{root}/cds/val_ds.txt",
                        f"{root}/images", names[96:120], labels[96:120])
mf.write_covid_manifest(f"{root}/cds/test_ds.txt",
                        f"{root}/images", names[120:], labels[120:])

from mfvit_tpu.cli import finetune  # noqa: E402

results = {}
SEEDS = range(int(os.environ.get("AUG_STUDY_SEEDS", "3")))
for mode in ("aug-device", "aug-host"):
    per_seed = []
    for seed in SEEDS:
        out = f"{root}/exp_{mode}_{seed}"
        res = finetune.main([
            "-a", "vit_test", "--img-size", "64", "--crop", "48",
            "--compute-dtype", "float32", "--attn-backend", "xla",
            "-j", "4", "--seed", str(seed), f"--{mode}",
            "--covid-ds", f"{root}/cds", "--storage-root", out,
            "--exp-name", f"augstudy_{mode}_{seed}",
            "--semi-supervised",  # FT: the whole network sees the views
            "-b", "16", "--epochs", "20", "--cos", "--lr", "0.02",
            "--optimizer", "sgd", "--rotate", "10",
            "--semi-ratios", "1"])
        per_seed.append({"seed": seed, "test_auc": res[0].test_auc,
                         "test_acc": res[0].test_acc})
        print(f"[{mode} seed {seed}] test AUC {res[0].test_auc:.4f} "
              f"ACC {res[0].test_acc:.4f}", flush=True)
    aucs = [d["test_auc"] for d in per_seed]
    accs = [d["test_acc"] for d in per_seed]
    results[mode] = {
        "per_seed": per_seed,
        "auc_mean": float(np.mean(aucs)), "auc_std": float(np.std(aucs)),
        "acc_mean": float(np.mean(accs)), "acc_std": float(np.std(accs)),
    }

print(json.dumps(results, indent=2))
with open(f"{root}/aug_order_study.json", "w") as f:
    json.dump(results, f, indent=2)
print(f"results at {root}/aug_order_study.json")
