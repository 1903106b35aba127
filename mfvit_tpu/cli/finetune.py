"""Linear-probe / full-finetune entry point.

TPU-native rebuild of the reference LP/FT main
(/root/reference/main_vit_covid_test_val_single_img_type_5draws_rev_v2loss_
v3structure_vitsmall.py, SURVEY §3.2): per (ratio, draw) — fresh ViT with a
new N(0, 0.01) head, optional MoCo checkpoint surgery, LP freeze (all but
head) unless ``--semi-supervised``, SGD/Adam with per-epoch cosine or
milestone LR, train+val each epoch, test on val-AUC improvement with
best-AUC and best-ACC checkpoints, and a final frozen-backbone sanity
check. Metrics: macro one-vs-rest ROC-AUC on raw logits + top-1.

Usage mirrors the README recipe:
  python -m mfvit_tpu.cli.finetune -a vit_small --lr 3 --batch-size 16 \
      --epochs 90 --optimizer sgd --cos --maintain-ratio --rotate \
      --aug-setting chexpert --pretrained <moco_ckpt> [--semi-supervised]
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
from mfvit_tpu.nn import vit as vit_mod
from mfvit_tpu.train import metrics, optim, profiler, steps


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("mfvit-finetune")
    common.add_common_args(p)
    p.add_argument("--optimizer", default="sgd",
                   choices=["sgd", "adam", "adamw", "lars"])
    p.add_argument("--pretrained", default="", type=str,
                   help="MoCo checkpoint (.pth.tar via torch surgery, or "
                        "orbax dir)")
    p.add_argument("--semi-supervised", dest="semi_supervised",
                   action="store_true",
                   help="full finetune (train the whole backbone)")
    p.add_argument("--folder", default="data",
                   help="image flavor folder (data | Train_Mix)")
    p.add_argument("--num-classes", type=int, default=3)
    common.add_dist_args(p)
    p.set_defaults(epochs=90, lr=3.0, batch_size=16)
    return p


def load_backbone(args, cfg) -> Optional[dict]:
    if not args.pretrained:
        return None
    if args.pretrained.endswith((".pth", ".pth.tar", ".pt")):
        return ckpt_mod.load_moco_pretrained_backbone(args.pretrained, cfg)
    # orbax: accept either a bare encoder tree or a pretrain checkpoint
    # ({'state': <moco state>, 'epoch': ...} — cli/pretrain.py) and do the
    # base-encoder extraction (the orbax twin of the torch
    # module.base_encoder surgery, finetune :326-333)
    tree = ckpt_mod.restore(args.pretrained)
    if isinstance(tree, dict) and "state" in tree:
        tree = tree["state"]
    if isinstance(tree, dict) and "base" in tree:
        tree = tree["base"]["encoder"]
    import jax.numpy as _jnp
    return jax.tree.map(_jnp.asarray, tree)


def make_evaluate(eval_step, args, *, mesh=None, n_dev: int = 1):
    """Per-draw ``evaluate(params, loader, *, n_total) ->
    (auc, acc, loss, logits, labels)`` (common.make_param_evaluate plus
    the eval CE loss the reference prints per phase)."""
    base = common.make_param_evaluate(args, [args.folder], eval_step,
                                      mesh=mesh, n_dev=n_dev)

    def evaluate(params, loader, *, n_total: int):
        res = base(params, loader, n_total=n_total)
        logits, labels = res["logits"], res["labels"]
        loss = float(np.mean(
            -np.take_along_axis(
                np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1)),
                labels[:, None], -1)))
        return res["auc"], res["acc"], loss, logits, labels

    return evaluate


def train_one_draw_fn(args, cfg):
    val_man, test_man = mf.eval_manifest_paths(args.covid_ds)
    # one HBM budget across ALL stores of the run; eval stores are
    # draw-independent (deterministic canvases, fixed manifests) so they
    # are built once and reused across the (ratio, draw) grid
    store_budget = common.StoreBudget(getattr(args, "device_store_mb", 0))
    get_eval_stores = common.lazy_eval_stores(args, val_man, test_man,
                                              args.folder,
                                              budget=store_budget)

    def train_one_draw(ratio, draw, sub_folder, writer):
        key = common.jax_key(args)
        k_init, k_head, k_aug = jax.random.split(
            jax.random.fold_in(key, draw), 3)

        params = vit_mod.init(k_init, cfg, num_classes=args.num_classes)
        backbone = load_backbone(args, cfg)
        if backbone is not None:
            head = params["head"]
            params = dict(backbone)
            params["head"] = head  # fresh N(0,.01) head (finetune :290-296)
        pretrained_snapshot = None
        mask = None
        if not args.semi_supervised:
            mask = optim.head_only_mask(params)
            pretrained_snapshot = jax.tree.map(np.asarray, params)

        train_man = (mf.split_manifest_path(args.covid_ds, ratio, draw)
                     if float(ratio) != 1.0 else
                     mf.split_manifest_path(args.covid_ds, 1, 0))
        tl = common.make_covid_loader(args, train_man, args.folder,
                                      training=True, seed=draw)
        vl = common.make_covid_loader(args, val_man, args.folder,
                                      training=False, seed=0)
        sl = common.make_covid_loader(args, test_man, args.folder,
                                      training=False, seed=0)
        mesh, n_dev = common.setup_mesh(args)
        # HBM-resident canvas store: epoch >= 2 trains with zero host
        # work and zero per-step H2D (falls back to streaming when
        # ineligible — see common.maybe_device_store). The TRAIN store
        # reserves budget first: training is the ~6x-hot feed, so when
        # --device-store-mb cannot hold everything it is the eval stores
        # that fall back to streaming, never the hot loop
        store = common.maybe_device_store(args, train_man, args.folder,
                                          n_dev=n_dev, mesh=mesh, seed=draw,
                                          budget=store_budget)
        if store is not None:
            tl = store
        # val is evaluated EVERY epoch — keep its canvases resident too.
        # Eval stores persist across the (ratio, draw) grid: built on
        # first use from whatever budget the draw-1 train store left
        ev, es = get_eval_stores()
        vl, sl = ev or vl, es or sl
        steps_per_epoch = max(len(tl), 1)

        init_lr = optim.scaled_init_lr(args.lr, args.batch_size,
                                       cos=args.cos, entry="finetune")
        sched = optim.finetune_lr(init_lr, args.epochs, cos=args.cos,
                                  schedule=args.schedule,
                                  steps_per_epoch=steps_per_epoch)
        tx = optim.build_optimizer(args.optimizer, sched,
                                   weight_decay=args.weight_decay,
                                   momentum=args.momentum,
                                   trainable_mask=mask)
        train_step, eval_step = steps.make_classifier_steps(
            cfg, tx, compute_dtype=common.compute_dtype(args),
            attn_backend=args.attn_backend, remat=args.remat)
        single_dev_store = store is not None and store.mesh is None
        if single_dev_store:
            # single-dispatch store path: gather + crop + aug + train
            # step in ONE jitted program per iteration
            def store_train_step(params, opt_state, table, lab_table,
                                 idx, key):
                canv = jnp.take(table, idx, axis=0)
                labels = jnp.take(lab_table, idx, axis=0)
                x = common.device_train_view(args, key, canv, args.folder)
                return train_step(params, opt_state, x, labels)

            store_train_step = jax.jit(store_train_step,
                                       donate_argnums=(0, 1))
        opt_state = tx.init(params)
        params = common.maybe_replicate(params, mesh, n_dev)
        opt_state = common.maybe_replicate(opt_state, mesh, n_dev)

        best = ckpt_mod.BestKeeper(sub_folder, mode="max")
        best_acc = ckpt_mod.BestKeeper(
            storage.get_storage_sub_folder(sub_folder.parent, ratio, draw,
                                           acc=True), mode="max")
        result = harness.DrawResult(ratio, draw)
        n_val = len(vl.ds)
        n_test = len(sl.ds)
        evaluate = make_evaluate(eval_step, args, mesh=mesh, n_dev=n_dev)

        # double-buffered device feed: batches are device_put one step
        # ahead so H2D overlaps the train step (the reference's pin_memory
        # + prefetch workers equivalent, pretrain main :425-442)
        shard = common.batch_sharding(mesh, n_dev)

        k_aug_base = k_aug
        for epoch in range(args.start_epoch, args.epochs):
            # epoch-folded aug keys + pinned loader epoch: a run started
            # at --start-epoch E replays the uninterrupted run's draws
            k_aug = jax.random.fold_in(k_aug_base, epoch)
            tl.set_epoch(epoch)
            ep_loss = metrics.AverageMeter("Loss", ":.4e")
            # batch/data timing lines at --print-freq cadence (the
            # reference hot-loop display contract, pretrain main :485-555)
            timer = profiler.StepTimer(steps_per_epoch,
                                       prefix=f"Epoch: [{epoch}]",
                                       extra_meters=[ep_loss])
            fetch = metrics.DeferredFetch(
                lambda val, n, idx: ep_loss.update(val, n))
            batch_iter = common.store_batch_iter(store, tl, shard)
            for i, batch in enumerate(batch_iter):
                timer.data_ready()
                k_aug, k_b = jax.random.split(k_aug)
                if single_dev_store:
                    idx = batch
                    params, opt_state, loss, _ = store_train_step(
                        params, opt_state, store.canvases, store.labels,
                        idx, k_b)
                    n_b = int(idx.shape[0])
                else:
                    canv, labels = batch
                    if store is not None:
                        # sharded store: reference-order view from the
                        # resident full canvas
                        x = common.device_train_view(args, k_b, canv,
                                                     args.folder)
                    elif args.aug_device:
                        x = common.stream_train_view(args, k_b, canv,
                                                     args.folder)
                    else:
                        x = canv.astype(common.compute_dtype(args))
                    params, opt_state, loss, _ = train_step(
                        params, opt_state, x, labels)
                    n_b = int(labels.shape[0])
                # one-step-lagged fetch (DeferredFetch): no per-step sync
                fetch.push(loss, n_b, i, sync=(i == 0))
                timer.step_done(i, args.print_freq)
            fetch.flush()
            val_auc, val_acc, val_loss, _, _ = evaluate(
                params, vl, n_total=n_val)
            if writer is not None:
                writer.add_scalar("train/loss", ep_loss.avg, epoch)
                writer.add_scalar("val/auc", val_auc, epoch)
                writer.add_scalar("val/acc", val_acc, epoch)
                writer.add_scalar("val/loss", val_loss, epoch)
            print(f"[ratio {ratio} draw {draw}] epoch {epoch}: "
                  f"train loss {ep_loss.avg:.4f} val auc {val_auc:.4f} "
                  f"acc {val_acc:.4f}")
            # test on val-AUC improvement, keep best-AUC / best-ACC ckpts
            if best.update(val_auc, params):
                t_auc, t_acc, _, _, _ = evaluate(params, sl,
                                                 n_total=n_test)
                result.test_auc = t_auc
                result.extra["test_acc_at_best_auc"] = t_acc
                if writer is not None:
                    writer.add_scalar("test/all_test_auc", t_auc, epoch)
                    writer.add_scalar("test/auc", t_auc, epoch)
            # acc-twin protocol: test ALSO on val-ACC improvement; the
            # all_test_acc matrix comes from THIS branch (finetune
            # :581-601) — result.test_acc is the acc-branch test acc
            if best_acc.update(val_acc, params, save_last=False):
                a_auc, a_acc, _, _, _ = evaluate(params, sl,
                                                 n_total=n_test)
                result.test_acc = a_acc
                result.extra["test_auc_at_best_acc"] = a_auc
                if writer is not None:
                    writer.add_scalar("test/all_test_acc", a_acc, epoch)

        # sanity check: frozen backbone identical to the loaded checkpoint
        # (finetune :841-866)
        if pretrained_snapshot is not None:
            harness.verify_frozen(params, pretrained_snapshot)
            print("=> sanity check passed.")
        # the draw's train store dies with this frame — return its HBM
        # reservation so the next draw's store fits the shared budget
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
        raise SystemExit("--resume is not implemented for finetune "
                         "(the reference's resume path is dead code too); "
                         "restart the draw or load via --pretrained")
    cfg = common.get_vit_arch(args)
    exp_type = "finetune" if args.semi_supervised else "linear_probe"
    folder = storage.get_storage_folder(args.exp_name, exp_type,
                                        root=args.storage_root)
    harness.snapshot_args(folder, args)
    iterations = ({r: args.draws for r in args.semi_ratios}
                  if args.draws else None)
    ratios = [common.ratio_tag(r) for r in args.semi_ratios]
    results = harness.run_draws(folder, ratios,
                                train_one_draw_fn(args, cfg),
                                iterations=iterations)
    # lr.jpg schedule curve (reference finetune :632-633); single-writer
    # on multi-process runs like every other artifact
    if not storage.is_primary():
        return results
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        init_lr = optim.scaled_init_lr(args.lr, args.batch_size,
                                       cos=args.cos, entry="finetune")
        sched = optim.finetune_lr(init_lr, args.epochs, cos=args.cos,
                                  schedule=args.schedule, steps_per_epoch=1)
        lrs = [float(sched(e)) for e in range(args.epochs)]
        plt.figure()
        plt.plot(lrs)
        plt.xlabel("epoch")
        plt.ylabel("lr")
        plt.savefig(str(folder / "lr.jpg"))
        plt.close()
    except Exception as e:  # pragma: no cover - plotting is best-effort
        print(f"lr.jpg skipped: {e}")
    for r in results:
        print(f"ratio {r.ratio} draw {r.draw}: "
              f"test auc {r.test_auc:.4f} acc {r.test_acc:.4f}")
    return results


if __name__ == "__main__":
    main()
