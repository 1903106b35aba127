"""Batch inference / serving entry point.

The reference has no separate serve path — inference is the val/test phase
of the fusion main (SURVEY §3.4). This CLI runs the one-jitted MF-ViT CA
fused forward over a paired manifest at serving batch sizes, optionally
with the int8 W8A8 weights, and writes predictions (+metrics when labels
are present) as JSON. Also doubles as a throughput check
(``--report-throughput``).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.cli import common
from mfvit_tpu.data import device_aug
from mfvit_tpu.exp import checkpoint as ckpt_mod
from mfvit_tpu.models import fusion as fusion_mod
from mfvit_tpu.nn import vit as vit_mod
from mfvit_tpu.train import metrics
from mfvit_tpu.train import steps as steps_mod


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("mfvit-infer")
    common.add_common_args(p)
    p.add_argument("--checkpoint", required=True,
                   help="orbax dir with {'cxr','enh','fus'} params "
                        "(fuse.py model_best)")
    p.add_argument("--manifest", required=True, help="paired manifest file")
    p.add_argument("--output", default="predictions.json")
    p.add_argument("--int8", action="store_true",
                   help="quantize ViT linears to int8 (W8A8 serving mode)")
    p.add_argument("--fusion-arch", default="ca", choices=["ca", "gpt"],
                   help="must match the checkpoint's fuse --fusion-arch")
    p.add_argument("--gpt-layers", type=int, default=8)
    p.add_argument("--fusion-heads", type=int, default=3)
    # must match the checkpoint's fuse flags or restore() rejects the
    # pytree structure (fuse.py builds the fusion tree with these)
    p.add_argument("--cross-attn-depth", type=int, default=1)
    p.add_argument("--multi-scale-enc-depth", type=int, default=1)
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--report-throughput", action="store_true")
    p.set_defaults(batch_size=256)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = common.get_vit_arch(args)
    k = jax.random.PRNGKey(0)
    gpt_cfg = None
    if args.fusion_arch == "gpt":
        from mfvit_tpu.models import gpt_fusion
        gpt_cfg = common.gpt_fusion_cfg(args, cfg)
        fus_like = gpt_fusion.init(k, gpt_cfg, num_classes=args.num_classes)
        if args.int8:
            raise SystemExit("--int8 serving is wired for the CA fusion "
                             "path only")
    else:
        fus_like = fusion_mod.init(
            k, num_classes=args.num_classes, dim=cfg.dim,
            heads=args.fusion_heads,
            cross_attn_depth=args.cross_attn_depth,
            multi_scale_enc_depth=args.multi_scale_enc_depth)
    like = {
        "cxr": vit_mod.init(k, cfg, num_classes=args.num_classes),
        "enh": vit_mod.init(k, cfg, num_classes=args.num_classes),
        "fus": fus_like,
    }
    params = ckpt_mod.restore(args.checkpoint, like=like)
    if args.int8:
        # in-kernel W8A8 (ops/fused_int8.py): quantization stays on VMEM
        # tiles and the fused kernel set keeps running — the XLA-level
        # quant path (ops/quant.py) disables every fused kernel and is
        # measured SLOWER than bf16 (docs/PERF.md)
        from mfvit_tpu.ops.fused_int8 import quantize_vit_for_serving
        params = dict(params,
                      cxr=quantize_vit_for_serving(params["cxr"]),
                      enh=quantize_vit_for_serving(params["enh"]))

    dt = common.compute_dtype(args)

    # the SAME forward the fuse CLI trained/selected the checkpoint with
    # (train/steps.py) — serving cannot drift from the model_best math
    fwd3 = steps_mod.make_fusion_forward(
        cfg, heads=args.fusion_heads, compute_dtype=dt,
        attn_backend=args.attn_backend, fusion_arch=args.fusion_arch,
        gpt_cfg=gpt_cfg)

    @jax.jit
    def fwd(p, xc, xe):
        fused, lc, le = fwd3(p, xc, xe)
        return fused + lc + le

    loader = common.make_covid_loader(args, args.manifest, "data",
                                      training=False, paired=True)
    n_total = len(loader.ds)
    mesh, n_dev = common.setup_mesh(args)
    params = common.maybe_replicate(params, mesh, n_dev)

    def forward(xc, xe):
        xc = common.maybe_shard(xc, mesh, n_dev)
        xe = common.maybe_shard(xe, mesh, n_dev)
        return fwd(params, xc, xe)

    runner = common.make_eval_runner(args, ["data", "Train_Mix"], forward,
                                     mesh=mesh, n_dev=n_dev)
    t0 = time.perf_counter()
    res = runner.evaluate(loader, n_total=n_total)
    wall = time.perf_counter() - t0
    logits, labels = res["logits"], res["labels"]

    out = {
        "predictions": logits.argmax(-1).tolist(),
        "logits": logits.tolist(),
        "n": int(len(logits)),
    }
    if (labels >= 0).all():
        out["metrics"] = {
            "auc": metrics.macro_ovr_auc(logits, labels, args.num_classes),
            "top1": metrics.top1_acc(logits, labels),
            **metrics.precision_recall_f1(logits, labels, args.num_classes),
        }
    if args.report_throughput:
        # end-to-end number (includes host decode + metric accumulation)
        out["pairs_per_sec_e2e"] = len(logits) / wall
        # sustained device throughput, bench.py methodology: device-resident
        # batch, fetches lag dispatch by one iteration so host dispatch
        # overlaps device compute (docs/PERF.md measurement notes) —
        # previously this path under-reported through the axon tunnel
        batch = next(iter(loader))
        if args.aug_device:
            xc0, xe0 = (device_aug.augment_batch(
                jax.random.PRNGKey(0), jnp.asarray(b), img_type=flavor,
                training=False, out_dtype=dt)
                for b, flavor in zip(batch[:2], ("data", "Train_Mix")))
        else:
            # --aug-host: batches are already normalized floats — feed them
            # exactly as the eval path does (common.make_eval_runner)
            xc0, xe0 = (jnp.asarray(b, dt) for b in batch[:2])
        bsz = int(xc0.shape[0])
        np.asarray(forward(xc0, xe0))  # warm
        iters = 10
        t0 = time.perf_counter()
        pending = None
        for _ in range(iters):
            o = forward(xc0, xe0)
            if pending is not None:
                np.asarray(pending)
            pending = o
        np.asarray(pending)
        out["pairs_per_sec"] = bsz * iters / (time.perf_counter() - t0)
    from mfvit_tpu.exp import storage
    if storage.is_primary():
        # single-writer on multi-process runs (every process computes the
        # same gathered logits; racing writes of identical content would
        # still interleave)
        with open(args.output, "w") as f:
            json.dump(out, f)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("predictions", "logits")}))
    return out


if __name__ == "__main__":
    main()
