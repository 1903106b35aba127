"""MF-ViT CA fusion entry point.

TPU-native rebuild of the reference fusion main
(/root/reference/main_vit_covid_test_val_..._crossvit_2vits_2additionaloutputs_
trainval_sum.py, SURVEY §3.3): two ViT-S branches initialized from
per-branch finetuned checkpoints, CLS cross-attention fusion head, decision
logits = fused + cxr + enh (:868), LP-style freeze of the ViT bodies unless
``--semi-supervised``, per-epoch cosine LR, best-val-AUC checkpointing, and
a paired CXR+Enh dataset that is jointly indexed by construction (fixing
the reference's fragile dual-loader zip, :834-845).

Usage mirrors the README recipe:
  python -m mfvit_tpu.cli.fuse -a vit_small --batch-size 32 --lr 1.5e-4 \
      --cos --epochs 25 --maintain-ratio --rotate --aug-setting chexpert \
      --pretrained-cxr <ckpt> --pretrained-enh <ckpt>
"""
from __future__ import annotations

import argparse
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.cli import common
from mfvit_tpu.data import manifest as mf
from mfvit_tpu.exp import checkpoint as ckpt_mod
from mfvit_tpu.exp import harness, storage
from mfvit_tpu.models import fusion as fusion_mod
from mfvit_tpu.nn import vit as vit_mod
from mfvit_tpu.train import metrics, optim, profiler, steps


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("mfvit-fuse")
    common.add_common_args(p)
    p.add_argument("--optimizer", default="adam",
                   choices=["sgd", "adam", "adamw"])
    p.add_argument("--pretrained-cxr", default="", type=str,
                   help="finetuned CXR-branch ckpt (.pth.tar or orbax); "
                        "may contain {ratio}/{draw} placeholders")
    p.add_argument("--pretrained-enh", default="", type=str)
    p.add_argument("--semi-supervised", dest="semi_supervised",
                   action="store_true")
    p.add_argument("--fusion-arch", default="ca", choices=["ca", "gpt"],
                   help="fusion head: 'ca' = MF-ViT CA CLS cross-attention "
                        "(the paper's method); 'gpt' = TransFuser-style "
                        "joint-sequence GPT (reference model/fuseattention"
                        ".py — present there but never wired to a main)")
    p.add_argument("--gpt-layers", type=int, default=8,
                   help="GPT fusion depth (GlobalConfig n_layer, "
                        "config/config.py:36)")
    p.add_argument("--fusion-heads", type=int, default=3)
    p.add_argument("--cross-attn-depth", type=int, default=1)
    p.add_argument("--multi-scale-enc-depth", type=int, default=1)
    p.add_argument("--num-classes", type=int, default=3)
    common.add_dist_args(p)
    p.set_defaults(epochs=25, lr=1.5e-4, batch_size=32)
    return p


def fusion_trainable_mask(params):
    """The reference fusion-stage optimizer set: ONLY the ``Fus_CrossViT``
    parameters train. The fusion main builds its optimizer from
    ``filter(requires_grad, model.parameters())`` where ``model`` is the
    Fus_CrossViT (fusion main :435-451) — and the branch ViTs are stored
    as bound ``features3D`` methods (fusion model :80-83), so neither
    their bodies NOR their heads are registered submodules; none of them
    ever reach the optimizer. The branch heads still contribute the
    summed decision logits (:868); they just never update. Asserted
    against the imported reference loop in
    tests/test_l5_main_parity.py."""
    return {
        "cxr": jax.tree.map(lambda _: False, params["cxr"]),
        "enh": jax.tree.map(lambda _: False, params["enh"]),
        "fus": jax.tree.map(lambda _: True, params["fus"]),
    }


def load_branch(path: str, cfg, ratio, draw,
                num_classes: int = 3) -> Optional[dict]:
    if not path:
        return None
    path = path.format(ratio=ratio, draw=draw)
    if path.endswith((".pth", ".pth.tar", ".pt")):
        # strict full load of a finetuned single-branch model (fusion main
        # :337-390); keys are plain vits.py names (no module. prefix after
        # single-GPU finetune)
        sd = ckpt_mod.load_torch_state_dict(path)
        if any(k.startswith("module.") for k in sd):
            sd = ckpt_mod.strip_prefix(sd, "module.")
        return ckpt_mod.torch_vit_to_params(sd, cfg)
    like = vit_mod.init(jax.random.PRNGKey(0), cfg, num_classes=num_classes)
    return ckpt_mod.restore(path, like=like)


def make_evaluate(eval_step, args, *, mesh=None, n_dev: int = 1):
    """Per-draw ``evaluate(params, loader, *, n_total) -> (auc, acc)``
    over the paired CXR+Enh eval batches (common.make_param_evaluate)."""
    base = common.make_param_evaluate(args, ["data", "Train_Mix"],
                                      eval_step, mesh=mesh, n_dev=n_dev)

    def evaluate(params, loader, *, n_total: int):
        res = base(params, loader, n_total=n_total)
        return res["auc"], res["acc"]

    return evaluate


def train_one_draw_fn(args, cfg):
    val_man, test_man = mf.eval_manifest_paths(args.covid_ds)
    store_budget = common.StoreBudget(getattr(args, "device_store_mb", 0))
    get_eval_stores = common.lazy_eval_stores(args, val_man, test_man,
                                              "data", paired=True,
                                              budget=store_budget)

    gpt_cfg = (common.gpt_fusion_cfg(args, cfg)
               if args.fusion_arch == "gpt" else None)

    def train_one_draw(ratio, draw, sub_folder, writer):
        key = jax.random.fold_in(common.jax_key(args), draw)
        k1, k2, k3, k_aug = jax.random.split(key, 4)
        if args.fusion_arch == "gpt":
            from mfvit_tpu.models import gpt_fusion
            fus0 = gpt_fusion.init(k3, gpt_cfg,
                                   num_classes=args.num_classes)
        else:
            fus0 = fusion_mod.init(
                k3, num_classes=args.num_classes, dim=cfg.dim,
                heads=args.fusion_heads,
                cross_attn_depth=args.cross_attn_depth,
                multi_scale_enc_depth=args.multi_scale_enc_depth)
        params = {
            "cxr": vit_mod.init(k1, cfg, num_classes=args.num_classes),
            "enh": vit_mod.init(k2, cfg, num_classes=args.num_classes),
            "fus": fus0,
        }
        for branch, path in (("cxr", args.pretrained_cxr),
                             ("enh", args.pretrained_enh)):
            loaded = load_branch(path, cfg, ratio, draw,
                                 num_classes=args.num_classes)
            if loaded is not None:
                params[branch] = loaded

        mask = None
        frozen_snapshot = None
        if not args.semi_supervised:
            # only the fusion head trains — the reference's EFFECTIVE
            # optimizer set (see fusion_trainable_mask; note :297-313
            # also sets requires_grad=False on the branch bodies, but
            # that is moot since no branch param reaches the optimizer)
            mask = fusion_trainable_mask(params)
            frozen_snapshot = {
                b: jax.tree.map(np.asarray, params[b])
                for b in ("cxr", "enh")
            }

        train_man = (mf.split_manifest_path(args.covid_ds, ratio, draw)
                     if float(ratio) != 1.0 else
                     mf.split_manifest_path(args.covid_ds, 1, 0))
        tl = common.make_covid_loader(args, train_man, "data", training=True,
                                      paired=True, seed=draw)
        vl = common.make_covid_loader(args, val_man, "data", training=False,
                                      paired=True, seed=0)
        sl = common.make_covid_loader(args, test_man, "data", training=False,
                                      paired=True, seed=0)
        mesh, n_dev = common.setup_mesh(args)
        # HBM-resident paired canvas store (see common.maybe_device_store).
        # The TRAIN store reserves budget first: training is the ~6x-hot
        # feed, so when --device-store-mb cannot hold everything it is
        # the eval stores that fall back to streaming, never the hot loop
        store = common.maybe_device_store(args, train_man, "data",
                                          paired=True, n_dev=n_dev, mesh=mesh,
                                          seed=draw, budget=store_budget)
        if store is not None:
            tl = store
        # eval stores persist across the (ratio, draw) grid: built on
        # first use from whatever budget the draw-1 train store left
        ev, es = get_eval_stores()
        vl, sl = ev or vl, es or sl
        steps_per_epoch = max(len(tl), 1)

        init_lr = optim.scaled_init_lr(args.lr, args.batch_size,
                                       cos=args.cos, entry="fusion")
        sched = optim.finetune_lr(init_lr, args.epochs, cos=args.cos,
                                  schedule=args.schedule,
                                  steps_per_epoch=steps_per_epoch)
        tx = optim.build_optimizer(args.optimizer, sched,
                                   weight_decay=args.weight_decay,
                                   momentum=args.momentum,
                                   trainable_mask=mask)
        train_step, eval_step = steps.make_fusion_steps(
            cfg, tx, heads=args.fusion_heads,
            freeze_backbones=not args.semi_supervised,
            compute_dtype=common.compute_dtype(args),
            attn_backend=args.attn_backend,
            fusion_arch=args.fusion_arch, gpt_cfg=gpt_cfg,
            remat=args.remat)
        single_dev_store = store is not None and store.mesh is None
        if single_dev_store:
            # single-dispatch store path: gather both flavors + crop +
            # aug + fusion step in ONE jitted program per iteration
            def store_train_step(params, opt_state, t_cxr, t_enh,
                                 lab_table, idx, key):
                cxr = jnp.take(t_cxr, idx, axis=0)
                enh = jnp.take(t_enh, idx, axis=0)
                labels = jnp.take(lab_table, idx, axis=0)
                ka, kb = jax.random.split(key)
                xc = common.device_train_view(args, ka, cxr, "data")
                xe = common.device_train_view(args, kb, enh, "Train_Mix")
                return train_step(params, opt_state, xc, xe, labels)

            store_train_step = jax.jit(store_train_step,
                                       donate_argnums=(0, 1))
        opt_state = tx.init(params)
        params = common.maybe_replicate(params, mesh, n_dev)
        opt_state = common.maybe_replicate(opt_state, mesh, n_dev)

        best = ckpt_mod.BestKeeper(sub_folder, mode="max")
        result = harness.DrawResult(ratio, draw)
        dt = common.compute_dtype(args)
        n_val, n_test = len(vl.ds), len(sl.ds)
        evaluate = make_evaluate(eval_step, args, mesh=mesh, n_dev=n_dev)

        # double-buffered device feed (pretrain main :425-442 equivalent)
        shard = common.batch_sharding(mesh, n_dev)

        k_aug_base = k_aug
        for epoch in range(args.start_epoch, args.epochs):
            # epoch-folded aug keys + pinned loader epoch (determinism
            # across --start-epoch), as in pretrain/finetune
            k_aug = jax.random.fold_in(k_aug_base, epoch)
            tl.set_epoch(epoch)
            ep_loss = metrics.AverageMeter("Loss", ":.4e")
            timer = profiler.StepTimer(steps_per_epoch,
                                       prefix=f"Epoch: [{epoch}]",
                                       extra_meters=[ep_loss])
            fetch = metrics.DeferredFetch(
                lambda val, n, idx: ep_loss.update(val, n))
            batch_iter = common.store_batch_iter(store, tl, shard)
            for i, batch in enumerate(batch_iter):
                timer.data_ready()
                # the fused store step derives BOTH branches' crop/aug
                # draws internally from one key; only the streaming and
                # sharded-store paths need a per-branch pair
                k_aug, ka = jax.random.split(k_aug)
                if single_dev_store:
                    idx = batch
                    params, opt_state, loss, _ = store_train_step(
                        params, opt_state, store.canvases[0],
                        store.canvases[1], store.labels, idx, ka)
                    n_b = int(idx.shape[0])
                else:
                    ka, kb = jax.random.split(ka)
                    cxr, enh, labels = batch
                    if store is not None:
                        # sharded store: reference-order views from the
                        # resident full canvases
                        xc = common.device_train_view(args, ka, cxr, "data")
                        xe = common.device_train_view(args, kb, enh,
                                                      "Train_Mix")
                    elif args.aug_device:
                        xc = common.stream_train_view(args, ka, cxr,
                                                      "data")
                        xe = common.stream_train_view(args, kb, enh,
                                                      "Train_Mix")
                    else:
                        xc, xe = cxr.astype(dt), enh.astype(dt)
                    params, opt_state, loss, _ = train_step(
                        params, opt_state, xc, xe, labels)
                    n_b = int(labels.shape[0])
                # one-step-lagged fetch (DeferredFetch): no per-step sync
                fetch.push(loss, n_b, i, sync=(i == 0))
                timer.step_done(i, args.print_freq)
            fetch.flush()
            val_auc, val_acc = evaluate(params, vl, n_total=n_val)
            if writer is not None:
                writer.add_scalar("train/loss", ep_loss.avg, epoch)
                writer.add_scalar("val/auc", val_auc, epoch)
                writer.add_scalar("val/acc", val_acc, epoch)
            print(f"[ratio {ratio} draw {draw}] epoch {epoch}: "
                  f"loss {ep_loss.avg:.4f} val auc {val_auc:.4f} "
                  f"acc {val_acc:.4f}")
            if best.update(val_auc, params):
                t_auc, t_acc = evaluate(params, sl, n_total=n_test)
                result.test_auc, result.test_acc = t_auc, t_acc

        # sanity check: the frozen branch ViTs — bodies AND heads, since
        # neither reaches the reference optimizer — must be bit-identical
        # to the loaded checkpoints after LP-style training (fusion main
        # :1013-1040 + :435-451)
        if frozen_snapshot is not None:
            for b in ("cxr", "enh"):
                harness.verify_frozen(params[b], frozen_snapshot[b],
                                      label=f"{b}.", exempt_head=False)
            print("=> fusion sanity check passed.")
        # return the per-draw train store's HBM reservation to the budget
        common.release_store(store)
        return result

    return train_one_draw


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.maybe_init_distributed(args)
    if args.resume:
        # matching the reference: its finetune resume path is fully
        # commented out and unreachable (finetune :400-429) — reject
        # loudly instead of silently restarting from scratch
        raise SystemExit("--resume is not implemented for fuse "
                         "(the reference's resume path is dead code too); "
                         "restart the draw or load via --pretrained")
    cfg = common.get_vit_arch(args)
    folder = storage.get_storage_folder(args.exp_name, "mfvit_ca",
                                        root=args.storage_root)
    harness.snapshot_args(folder, args)
    iterations = ({common.ratio_tag(r): args.draws for r in args.semi_ratios}
                  if args.draws else None)
    ratios = [common.ratio_tag(r) for r in args.semi_ratios]
    results = harness.run_draws(folder, ratios, train_one_draw_fn(args, cfg),
                                iterations=iterations)
    for r in results:
        print(f"ratio {r.ratio} draw {r.draw}: "
              f"test auc {r.test_auc:.4f} acc {r.test_acc:.4f}")
    return results


if __name__ == "__main__":
    main()
