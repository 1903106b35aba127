"""MoCo pretraining entry point ("MoCo-COVID").

TPU-native rebuild of the reference pretrain main
(/root/reference/main_covid_mocov3based_single_img_type_5draws_mocov3structure_
mocov2loss_vitsmall.py, SURVEY §3.1): per (ratio, draw) — fresh MoCo state
(v3 structure; v2 queue loss by default, ``--loss v3_symmetric`` for the
builder_vit.py variant), LARS/AdamW/Adam, per-iteration cosine LR with
warmup, cosine momentum ramp (``--moco-m-cos``), two augmented views per
image, smallest-epoch-loss + final checkpoints. Data-parallel over the
device mesh with all-gathered queue keys (replacing DDP/NCCL).

Usage mirrors the README recipe:
  python -m mfvit_tpu.cli.pretrain -a vit_small -b 16 --optimizer=adamw \
      --lr=1.5e-4 --weight-decay=.1 --epochs=30 --warmup-epochs=4 \
      --stop-grad-conv1 --moco-m-cos --moco-t=.2 --aug-setting chexpert \
      --rotate 10 --cos
"""
from __future__ import annotations

import argparse
import math


import jax
import jax.numpy as jnp

from mfvit_tpu.cli import common
from mfvit_tpu.data import manifest as mf
from mfvit_tpu.exp import checkpoint as ckpt_mod
from mfvit_tpu.exp import harness, storage
from mfvit_tpu.parallel import mesh as pmesh
from mfvit_tpu.ssl import moco
from mfvit_tpu.train import metrics, optim, profiler


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("mfvit-pretrain")
    common.add_common_args(p)
    p.add_argument("--optimizer", default="lars",
                   choices=["lars", "adamw", "adam", "sgd"])
    p.add_argument("--warmup-epochs", default=10, type=int)
    p.add_argument("--moco-dim", default=256, type=int)
    p.add_argument("--moco-mlp-dim", default=4096, type=int)
    p.add_argument("--moco-m", default=0.99, type=float)
    p.add_argument("--moco-m-cos", action="store_true")
    p.add_argument("--moco-t", default=1.0, type=float)
    p.add_argument("--moco-k", default=65536, type=int,
                   help="queue length (v2 loss)")
    p.add_argument("--stop-grad-conv1", dest="stop_grad_conv1",
                   action="store_true")
    p.add_argument("--loss", default="v2_queue",
                   choices=["v2_queue", "v3_symmetric"])
    p.add_argument("--no-predictor-on-keys", dest="predictor_on_keys",
                   action="store_false",
                   help="the builder_..._noprediction_q variant")
    p.add_argument("--folder", default="data")
    p.add_argument("--pairing", default="same",
                   choices=["same", "enh_cxr"],
                   help="enh_cxr: cross-modal q=Enh / k=CXR views "
                        "(Dataset_covid_LEnh_RCXR_2norms, loader.py:201)")
    p.add_argument("--per-enh", dest="per_enh", type=float, default=1.0,
                   help="P(q is the Enh image) for --pairing enh_cxr "
                        "(the mix variant, loader.py:261-328)")
    p.add_argument("--save-epoch", type=int, default=30)
    p.add_argument("--pretrained-arms", dest="pretrained_arms", default="",
                   type=str,
                   help="local torchvision resnet .pth to initialize BOTH "
                        "MoCo towers (the reference fetches these by URL "
                        "and loads them via the builder's `pretrained` — "
                        "pretrain main :52-62, builder.py:37-44); resnet "
                        "archs only")
    common.add_dist_args(p)
    p.add_argument("--export-torch", action="store_true",
                   help="also write a reference-layout .pth.tar (module."
                        "base_encoder.* + projector head) consumable by "
                        "the PyTorch reference finetune --pretrained "
                        "surgery (ViT archs)")
    p.set_defaults(epochs=100, lr=0.6, batch_size=16)
    return p


def train_one_draw_fn(args, vit_cfg):
    # run-scoped HBM budget, like finetune/fuse: each draw's train store
    # reserves on entry and releases on exit
    store_budget = common.StoreBudget(getattr(args, "device_store_mb", 0))

    def train_one_draw(ratio, draw, sub_folder, writer):
        kw = dict(
            dim=args.moco_dim, mlp_dim=args.moco_mlp_dim, K=args.moco_k,
            T=args.moco_t, m=args.moco_m, loss=args.loss,
            predictor_on_keys=args.predictor_on_keys)
        if args.arch.startswith("resnet"):
            # MoCo_ResNet tower structure (builder...mocov2loss.py:202-225);
            # the reference pretrain main routes resnet archs through
            # torchvision models (pretrain main :52-62)
            cfg = moco.MoCoConfig.resnet(**kw)
        else:
            cfg = moco.MoCoConfig(stop_grad_conv1=args.stop_grad_conv1,
                                  **kw)

        # pretraining uses the UNLABELED split at fractional ratios
        # (pretrain main :377-380)
        if float(ratio) == 1.0:
            man = mf.split_manifest_path(args.covid_ds, 1, 0)
        else:
            man = mf.split_manifest_path(args.covid_ds, ratio, draw,
                                         labeled=False)
        byol = args.aug_setting in ("moco_v1", "moco_v2", "aug1", "aug2")
        fourch = args.in_chans == 4
        cross_modal = args.pairing == "enh_cxr"
        if cross_modal:
            if fourch or byol:
                raise ValueError("--pairing enh_cxr is a 3-channel "
                                 "chexpert-stack variant")
            tl = common.make_enh_cxr_ssl_loader(args, man, seed=draw)
        elif byol:
            if fourch:
                raise ValueError("--in-chans 4 requires --aug-setting "
                                 "chexpert (device-aug canvases)")
            tl = common.make_ssl_two_crops_loader(args, man, args.folder,
                                                  seed=draw)
        else:
            # TwoCropsTransform semantics: two independently cropped
            # canvases per sample (loader.py:13-22 +
            # image_transform.py:58-63); device aug then draws
            # independent flip/rotation per view
            tl = common.make_covid_loader(args, man, args.folder,
                                          training=True, fourch=fourch,
                                          ssl_two_views=True, seed=draw)
        host_transformed = byol or cross_modal or not args.aug_device
        steps_per_epoch = max(len(tl), 1)

        mesh, n_dev = common.setup_mesh(args)
        if cfg.loss == "v2_queue" and cfg.K % args.batch_size != 0:
            # not assert: the queue invariant must survive python -O
            raise ValueError(
                f"K={cfg.K} must be divisible by batch {args.batch_size}")

        store = None
        if not host_transformed:
            store = common.maybe_device_store(args, man, args.folder,
                                              fourch=fourch, n_dev=n_dev, mesh=mesh,
                                              seed=draw, budget=store_budget)
        if store is not None:
            tl = store
            steps_per_epoch = max(len(tl), 1)

        init_lr = optim.scaled_init_lr(args.lr, args.batch_size,
                                       cos=args.cos, entry="pretrain")
        sched = (optim.pretrain_cosine_lr(init_lr, args.epochs,
                                          args.warmup_epochs,
                                          steps_per_epoch)
                 if args.cos else
                 optim.finetune_lr(init_lr, args.epochs, cos=False,
                                   schedule=args.schedule,
                                   steps_per_epoch=steps_per_epoch))
        tx = optim.build_optimizer(args.optimizer, sched,
                                   weight_decay=args.weight_decay,
                                   momentum=args.momentum)

        key = jax.random.fold_in(common.jax_key(args), draw)
        state = moco.init(key, cfg, vit_cfg, in_chans=args.in_chans)
        if args.pretrained_arms:
            # arch compatibility already validated in main() (fail fast)
            state = ckpt_mod.resnet_arms_from_torchvision(
                state, args.pretrained_arms, vit_cfg)
            print(f"=> MoCo arms initialized from {args.pretrained_arms}")
        opt_state = tx.init({"base": state["base"],
                             "predictor": state["predictor"]})
        if n_dev > 1:
            step = pmesh.make_moco_parallel_step(
                cfg, vit_cfg, tx, mesh,
                compute_dtype=common.compute_dtype(args),
                remat=args.remat, attn_backend=args.attn_backend)
            state = pmesh.replicate(state, mesh)
            opt_state = pmesh.replicate(opt_state, mesh)
        elif store is not None:
            # single-dispatch store path: gather + crop + two-view aug +
            # MoCo step in ONE jitted program per iteration (per-step RPC
            # latency dominates remote-dispatch hosts; one call hides it)
            base_step = moco.make_pretrain_step(
                cfg, vit_cfg, tx, compute_dtype=common.compute_dtype(args),
                remat=args.remat, attn_backend=args.attn_backend)
            s_img_type = "4ch" if fourch else args.folder

            def store_step(state, opt_state, table, idx, key, m):
                canv = jnp.take(table, idx, axis=0)
                # each MoCo view draws its OWN flip/rotation/crop, in the
                # reference order (TwoCrops over the full stack,
                # loader.py:13-22 + image_transform.py:58-63)
                q, k_img = common.device_train_two_views(
                    args, key, canv, s_img_type)
                return base_step(state, opt_state, q, k_img, m)

            step = jax.jit(store_step, donate_argnums=(0, 1))
        else:
            step = jax.jit(moco.make_pretrain_step(
                cfg, vit_cfg, tx,
                compute_dtype=common.compute_dtype(args),
                remat=args.remat,
                attn_backend=args.attn_backend), donate_argnums=(0, 1))

        # resume: restores state + optimizer + epoch (the reference restores
        # epoch/model/optimizer/scaler — pretrain main :356-372)
        start_epoch = args.start_epoch
        if args.resume:
            ep0 = jnp.zeros((), jnp.int32)
            if jax.process_count() > 1:
                # restore target leaves must be global arrays on a
                # multi-host run (orbax restores with their shardings)
                ep0 = pmesh.replicate(ep0, mesh)
            like = {"state": state, "opt_state": opt_state, "epoch": ep0}
            ck = ckpt_mod.restore(args.resume, like=like)
            state, opt_state = ck["state"], ck["opt_state"]
            start_epoch = int(ck["epoch"]) + 1
            print(f"=> resumed from {args.resume} at epoch {start_epoch}")

        best_loss = math.inf
        k_aug_base = jax.random.fold_in(key, 1)
        result = harness.DrawResult(ratio, draw)
        ep_loss = metrics.AverageMeter("Loss", ":.4e")  # survives empty loop
        # double-buffered device feed: H2D overlaps the MoCo step (the
        # reference's pin_memory + prefetch workers, pretrain main :425-442)
        shard = common.batch_sharding(mesh, n_dev)
        for epoch in range(start_epoch, args.epochs):
            # fold (epoch) into the aug key stream so a resumed run
            # replays the SAME draws the uninterrupted run made for this
            # epoch (the host loader gets this via set_epoch)
            k_aug = jax.random.fold_in(k_aug_base, epoch)
            tl.set_epoch(epoch)  # resume replays this epoch's host order
            ep_loss = metrics.AverageMeter("Loss", ":.4e")
            # batch/data timing lines at --print-freq cadence, the
            # reference hot-loop display contract (pretrain main :485-555)
            timer = profiler.StepTimer(steps_per_epoch,
                                       prefix=f"Epoch: [{epoch}]",
                                       extra_meters=[ep_loss])

            def loss_sink(val, n, idx, _ep=epoch):
                ep_loss.update(val, n)
                if writer is not None and idx % args.print_freq == 0:
                    writer.add_scalar("pretrain/loss", val,
                                      _ep * steps_per_epoch + idx)

            fetch = metrics.DeferredFetch(loss_sink)
            single_dev_store = store is not None and store.mesh is None
            batch_iter = common.store_batch_iter(store, tl, shard)
            for i, batch in enumerate(batch_iter):
                timer.data_ready()
                it_epoch = epoch + i / steps_per_epoch
                m = (float(optim.moco_momentum(it_epoch, args.moco_m,
                                               args.epochs))
                     if args.moco_m_cos else args.moco_m)
                k_aug, k_b = jax.random.split(k_aug)
                if single_dev_store:
                    # single dispatch: gather/crop/aug/step in store_step
                    state, opt_state, loss = step(
                        state, opt_state, store.canvases, batch, k_b,
                        jnp.float32(m))
                    n_b = int(batch.shape[0])
                else:
                    if host_transformed:
                        q, k_img, _labels = (
                            b.astype(common.compute_dtype(args))
                            for b in batch)
                    else:
                        if store is not None:
                            # sharded store: ONE resident pre-crop canvas
                            # per sample; each view draws its own
                            # reference-order flip/rotation/crop
                            canv, _labels = batch
                            q, k_img = common.device_train_two_views(
                                args, k_b, canv,
                                "4ch" if fourch else args.folder)
                        else:
                            # streaming: two host-augmented canvases
                            # (reference order), or host-cropped under
                            # the crop-first ablation
                            canv_q, canv_k, _labels = batch
                            q, k_img = common.stream_train_two_views(
                                args, k_b, canv_q, canv_k,
                                "4ch" if fourch else args.folder)
                    state, opt_state, loss = step(state, opt_state, q,
                                                  k_img, jnp.float32(m))
                    n_b = int(q.shape[0])
                # one-step-lagged fetch: step i+1 dispatches while step
                # i's loss crosses back (DeferredFetch)
                fetch.push(loss, n_b, i, sync=(i == 0))
                timer.step_done(i, args.print_freq)
            fetch.flush()
            print(f"[ratio {ratio} draw {draw}] epoch {epoch}: "
                  f"loss {ep_loss.avg:.4f}")
            # smallest-epoch-loss checkpoint (pretrain :458-467) + final
            if ep_loss.avg < best_loss:
                best_loss = ep_loss.avg
                ckpt_mod.save(str(sub_folder / "checkpoint_best_loss"),
                              {"state": state, "epoch": epoch})
            if epoch == args.epochs - 1 or (epoch + 1) % args.save_epoch == 0:
                # resume-capable: carries the optimizer state too
                ckpt_mod.save(str(sub_folder / f"checkpoint_{epoch:04d}"),
                              {"state": state, "opt_state": opt_state,
                               "epoch": jnp.asarray(epoch, jnp.int32)})
        if args.export_torch:
            if args.arch.startswith("resnet"):
                print("--export-torch: resnet towers have no vits.py "
                      "layout; skipping torch export")
            elif storage.is_primary():
                # single-writer like the orbax saves' coordination and
                # the reference's rank-0 checkpointing (pretrain main
                # :469-471): a plain torch.save from every process would
                # race on the shared path (device_get is collective-free
                # — the state is fully replicated)
                ckpt_mod.save_moco_torch_checkpoint(
                    str(sub_folder / "checkpoint_torch.pth.tar"),
                    jax.device_get(state), vit_cfg,
                    epoch=args.epochs - 1, arch=args.arch)
        result.extra["final_loss"] = ep_loss.avg
        result.extra["best_loss"] = best_loss
        # return the per-draw train store's HBM reservation to the budget
        common.release_store(store)
        return result

    return train_one_draw


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.maybe_init_distributed(args)
    vit_cfg = common.get_arch(args)
    if args.export_torch and (getattr(vit_cfg, "conv_stem", False)
                              or not getattr(vit_cfg, "qkv_bias", True)
                              or args.in_chans != 3):
        # fail FAST: params_to_torch_vit handles the plain-ViT layout
        # only (patch['w'], biased qkv, 3-channel patch embed);
        # discovering that AFTER the full training grid would throw the
        # run away
        raise SystemExit(
            f"--export-torch does not support -a {args.arch} "
            f"--in-chans {args.in_chans}: the torch export writes the "
            "plain 3-channel vits.py layout (no conv-stem, biased qkv) "
            "the reference finetune surgery loads. Drop --export-torch "
            "or use a vit_small/vit_base/_ori arch with --in-chans 3.")
    if args.pretrained_arms and not args.arch.startswith("resnet"):
        # same fail-fast policy: argv-only check, so don't create the
        # experiment folder / loader / mesh before rejecting it
        raise SystemExit(
            "--pretrained-arms is resnet-only (the reference's "
            "torchvision URL table covers resnets, pretrain main "
            ":52-62); ViT pretraining starts from scratch")
    folder = storage.get_storage_folder(args.exp_name, "moco",
                                        root=args.storage_root)
    harness.snapshot_args(folder, args)
    iterations = ({common.ratio_tag(r): args.draws for r in args.semi_ratios}
                  if args.draws else None)
    ratios = [common.ratio_tag(r) for r in args.semi_ratios]
    return harness.run_draws(folder, ratios, train_one_draw_fn(args, vit_cfg),
                             iterations=iterations, tb_prefix="tb_pretrain")


if __name__ == "__main__":
    main()
