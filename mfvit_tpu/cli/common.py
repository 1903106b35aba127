"""Shared CLI plumbing for the entry points.

Argument surface mirrors the reference mains' argparse flags (pretrain
:65-174, finetune :58-158, fusion :63-168) minus the CUDA/DDP process
flags, which are replaced by mesh options (SURVEY §2.6: the TPU runtime is
single-controller — no ranks, no dist-url, no mp.spawn).
"""
from __future__ import annotations

import argparse
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.data import datasets, host_transforms as ht, pipeline
from mfvit_tpu.nn import vit as vit_mod


def add_common_args(p: argparse.ArgumentParser) -> None:
    from mfvit_tpu.nn import resnet as resnet_mod
    p.add_argument("-a", "--arch", default="vit_small",
                   choices=sorted(vit_mod.CONFIGS)
                   + sorted(resnet_mod.CONFIGS) + ["vit_test"])
    p.add_argument("-j", "--workers", default=8, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument("-b", "--batch-size", default=16, type=int)
    p.add_argument("--lr", "--learning-rate", default=0.6, type=float,
                   dest="lr")
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--wd", "--weight-decay", default=1e-6, type=float,
                   dest="weight_decay")
    p.add_argument("-p", "--print-freq", default=10, type=int)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--seed", default=None, type=int)
    p.add_argument("--exp-name", dest="exp_name", type=str, default="exp")
    p.add_argument("--storage-root", type=str, default=None,
                   help="experiment storage root (MFVIT_STORAGE_ROOT)")
    p.add_argument("--aug-setting", default="chexpert",
                   choices=["moco_v1", "moco_v2", "chexpert", "aug1", "aug2"])
    p.add_argument("--crop-min", dest="crop_min", default=0.08, type=float)
    p.add_argument("--img-size", dest="img_size", type=int, default=224)
    p.add_argument("--crop", dest="crop", type=int, default=224)
    p.add_argument("--maintain-ratio", dest="maintain_ratio",
                   action="store_true")
    p.add_argument("--rotate", dest="rotate", default=10, type=float,
                   nargs="?", const=1.0,
                   help="rotation degrees; bare flag = ±1° (the reference "
                        "finetune bool quirk, SURVEY §2.4)")
    p.add_argument("--cos", action="store_true")
    p.add_argument("--schedule", default=[12, 18, 24], nargs="*", type=int)
    p.add_argument("--covid-ds", dest="covid_ds", type=str,
                   default="create_covid_dataset",
                   help="folder with split manifests + val_ds/test_ds")
    p.add_argument("--semi-ratios", nargs="*", type=float, default=[1.0],
                   help="labeled fractions (ALL_SEMI_RATIO)")
    p.add_argument("--draws", type=int, default=None,
                   help="override #draws per ratio")
    p.add_argument("--attn-backend", default=None,
                   choices=[None, "auto", "pallas", "xla"],
                   help="attention kernel backend")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--aug-device", action="store_true", default=True,
                   help="device-fused augmentation (default)")
    p.add_argument("--aug-host", dest="aug_device", action="store_false",
                   help="full host-side torchvision-parity augmentation")
    p.add_argument("--aug-order", default="reference",
                   choices=["reference", "crop-first"],
                   help="training aug order for the streaming device feed:"
                        " 'reference' = flip->rotate->crop"
                        " (image_transform.py:58-63, fused at crop-gather"
                        " cost); 'crop-first' = the rotate-the-crop"
                        " ablation (PARITY.md divergence #7)")
    p.add_argument("--canvas-cache-mb", type=int, default=4096,
                   help="RAM budget for the decode+resize canvas cache "
                        "(epoch >= 2 skips PNG decode); 0 disables")
    p.add_argument("--no-canvas-cache", dest="canvas_cache",
                   action="store_false", default=True,
                   help="disable the host decode+resize cache")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize transformer blocks in the backward "
                        "(jax.checkpoint): ~1/3 more block FLOPs for "
                        "O(1)-in-depth activation HBM — the lever for "
                        "deep/large-batch configs (docs/PERF.md)")
    p.add_argument("--device-store-mb", type=int, default=2048,
                   help="total HBM budget shared by all device-resident "
                        "canvas stores of a run (train + val + test); "
                        "epochs then run host-free after a one-time fill. "
                        "0 disables. Training store: device-aug "
                        "square-resize (no --maintain-ratio) runs, "
                        "sharded over the mesh when multi-device; eval "
                        "stores: any resize policy")
    p.add_argument("--mesh-devices", type=int, default=None,
                   help="#devices in the data mesh (default: all)")
    p.add_argument("--in-chans", dest="in_chans", type=int, default=3,
                   choices=[3, 4],
                   help="4 = stacked CXR-gray + Enh input "
                        "(builder_4ch.py:36-41 variant)")


def get_arch(args):
    """Backbone config for -a: a ViTConfig, or a ResNetConfig for the
    torchvision-resnet MoCo arms the reference pretrain main accepts
    (pretrain main :52-62).

    The NETWORK input size is the post-crop size: the transform stack
    resizes the shorter side to --img-size then crops to --crop (reference
    image_transform.py:21-46); with crop != img_size the model must be
    built at crop or the pos-embed add fails downstream."""
    input_size = getattr(args, "crop", 0) or args.img_size
    if args.arch == "vit_test":  # tiny config for smoke tests
        return vit_mod.ViTConfig("vit_test", img_size=input_size,
                                 patch=16, dim=32, depth=2, heads=2)
    if args.arch.startswith("resnet"):
        from mfvit_tpu.nn import resnet as resnet_mod
        return resnet_mod.get_config(args.arch,
                                     in_chans=getattr(args, "in_chans", 3))
    return vit_mod.get_config(args.arch, input_size)


def get_vit_arch(args):
    """ViT-only entry points (finetune/fuse/infer). The reference accepts
    resnet archs and the 4-channel input only in the pretrain main
    (:52-62, builder_4ch.py); its finetune/fusion mains are ViT-only
    (finetune :51-52) — reject cleanly at the CLI instead of crashing
    deep inside model init."""
    if args.arch.startswith("resnet"):
        raise SystemExit(
            f"-a {args.arch}: resnet backbones are pretrain-only "
            "(the reference finetune/fusion mains are ViT-only)")
    if getattr(args, "in_chans", 3) != 3:
        raise SystemExit(
            "--in-chans 4 is a pretrain-only variant (builder_4ch.py); "
            "finetune/fuse/infer are 3-channel")
    return get_arch(args)


def compute_dtype(args):
    return jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32


def ratio_tag(ratio: float):
    from mfvit_tpu.data.manifest import ratio_tag as _rt
    return _rt(ratio)


def make_ssl_two_crops_loader(args, manifest_path: str, folder: str, *,
                              seed: int = 0) -> pipeline.BatchLoader:
    """Host two-crops loader for the BYOL/moco-v2 aug settings (pretrain
    main :388-412): each sample yields (q, k, label) with two independent
    draws of the aug1/aug2 stack. The chexpert setting instead streams
    canvases and draws both views on-device."""
    variant = {"moco_v1": "aug1", "aug1": "aug1",
               "moco_v2": "aug2", "aug2": "aug2"}[args.aug_setting]
    tf = ht.ByolTransform(img_size=args.img_size, crop_min=args.crop_min,
                          variant=variant, seed=seed)
    ds = datasets.CovidTwoCropsDataset(folder, manifest_path, tf)
    return pipeline.BatchLoader(ds, args.batch_size, shuffle=True, seed=seed,
                                drop_last=True, num_workers=args.workers)


def make_enh_cxr_ssl_loader(args, manifest_path: str, *,
                            seed: int = 0) -> pipeline.BatchLoader:
    """Cross-modal MoCo pairing (--pairing enh_cxr): q = Enh view, k = CXR
    view, each with its own full host transform stack and normalization
    (Dataset_covid_LEnh_RCXR_2norms, loader.py:201-258; ``--per-enh`` < 1
    gives the probabilistic mix variant :261-328). Host-transformed floats
    — the per-sample flavor choice means normalization cannot be deferred
    to the device."""
    def tf(img_type, seed_off):
        return ht.ChexpertTransform(
            img_size=args.img_size, crop=args.crop, img_type=img_type,
            training=True, maintain_ratio=args.maintain_ratio,
            rotate_deg=float(args.rotate), seed=seed + seed_off)
    decode = None
    if getattr(args, "canvas_cache", True) and args.canvas_cache_mb > 0:
        decode = ht.shared_decode_cache(
            args.img_size, args.maintain_ratio,
            args.canvas_cache_mb << 20)
    ds = datasets.CovidEnhCxrDataset(
        manifest_path, tf("data", 0), tf("Train_Mix", 1),
        per_enh=getattr(args, "per_enh", 1.0), seed=seed, decode=decode)
    return pipeline.BatchLoader(ds, args.batch_size, shuffle=True,
                                seed=seed, drop_last=True,
                                num_workers=args.workers)


class StoreBudget:
    """Shared HBM accounting for --device-store-mb: one budget covers
    every store CONCURRENTLY resident in a run (train + val + test), so a
    CLI cannot pin multiples of the configured limit. Per-draw train
    stores release their reservation when the draw ends
    (``release_store``) — the (ratio, draw) grid would otherwise exhaust
    the budget after the first draws and silently fall back to the ~6x
    slower streaming feed."""

    def __init__(self, mb: int):
        self.left = mb << 20

    def reserve(self, nbytes: int) -> bool:
        if nbytes > self.left:
            return False
        self.left -= nbytes
        return True

    def release(self, nbytes: int) -> None:
        self.left += nbytes


def _store_nbytes(n: int, side: int, chans: int, n_dev: int,
                  n_proc: int = 1) -> int:
    """HBM bytes a DeviceCanvasStore fill will actually pin ON THIS HOST:
    the sample count WRAP-PADDED to a multiple of the mesh size
    (fill_from_dataset pads the same way) times uint8 canvas bytes, plus
    the int64 label row per sample. On a multi-process mesh each host
    pins only its own contiguous row block (hostput.local_row_block), so
    the per-host reservation divides by the process count — charging the
    global table against each host's --device-store-mb would spuriously
    reject sharded stores that fit local HBM with room to spare."""
    padded = n if n_dev <= 1 or n % n_dev == 0 else n + n_dev - n % n_dev
    # ceil-divide: setup_mesh guarantees n_dev % n_proc == 0 today, but if
    # that invariant ever drifts the reservation must round UP, never
    # silently under-charge what fill_from_dataset will pin
    local = -(-padded // n_proc) if n_proc > 1 else padded
    return local * (side * side * chans + 8)


def release_store(store) -> None:
    """Return a per-draw store's HBM reservation to the shared budget.
    Safe on None and on stores created without a budget."""
    res = getattr(store, "budget_reservation", None)
    if res is not None:
        budget, nbytes = res
        budget.release(nbytes)
        store.budget_reservation = None


def store_batch_iter(store, tl, shard):
    """The per-epoch feed every CLI hot loop selects from:
    single-device store -> index batches consumed by the fused
    single-dispatch step; sharded store -> device-resident batches;
    streaming loader -> double-buffered device_put prefetch."""
    from mfvit_tpu.data import pipeline
    if store is not None:
        return (store.iter_index_batches() if store.mesh is None
                else iter(store))
    return pipeline.device_prefetch(iter(tl), sharding=shard)


def lazy_eval_stores(args, val_man: str, test_man: str, folder: str, *,
                     paired: bool = False, budget: StoreBudget = None):
    """Lazily-built (val, test) eval-store pair, shared by finetune and
    fuse. Eval stores are draw-independent (deterministic canvases,
    fixed manifests), so one pair is built on first use and reused
    across the whole (ratio, draw) grid. Callers take the per-draw TRAIN
    store's reservation from ``budget`` first — the hot loop must never
    lose the fast path to the comparatively cheap eval passes."""
    cache = {}

    def get():
        if "v" not in cache:
            cache["v"] = maybe_eval_device_store(
                args, val_man, folder, paired=paired, budget=budget)
            cache["s"] = maybe_eval_device_store(
                args, test_man, folder, paired=paired, budget=budget)
        return cache["v"], cache["s"]

    return get


def gpt_fusion_cfg(args, cfg):
    """GPTFusionConfig matched to the ViT branch dims — ONE construction
    shared by fuse (training) and infer (serving), so a ``--fusion-arch
    gpt`` checkpoint always restores into the exact pytree shape it was
    trained with."""
    import dataclasses

    from mfvit_tpu.models import gpt_fusion
    return dataclasses.replace(gpt_fusion.VIT_CONFIG, n_embd=cfg.dim,
                               n_layer=args.gpt_layers,
                               vert_anchors=cfg.grid,
                               horz_anchors=cfg.grid)


def _fill_decode_cache(args, maintain_ratio: bool):
    """Shared decode(+resize) cache for store FILL passes: the same
    per-policy cache the streaming loaders use, so draw >= 2's fill pass
    reads decoded canvases from RAM instead of re-decoding the split
    from disk (the fill prefix is deterministic and idempotent under
    CanvasTransform's re-resize)."""
    if getattr(args, "canvas_cache", True) and args.canvas_cache_mb > 0:
        return ht.shared_decode_cache(args.img_size, maintain_ratio,
                                      args.canvas_cache_mb << 20)
    return None


def host_reference_aug(args) -> bool:
    """True when the streaming training feed's augmentation runs on the
    HOST in the reference order (the default); False under the explicit
    ``--aug-order crop-first`` ablation."""
    return getattr(args, "aug_order", "reference") == "reference"


def stream_train_view(args, key, canv, img_type):
    """Training view for ONE streaming device-feed batch. Reference
    order (default): the host already applied flip -> rotate -> crop
    (CanvasTransform), so only normalization remains. crop-first
    ablation: the legacy split — flip/rotation of the host-cropped
    canvas on-device."""
    from mfvit_tpu.data import device_aug
    if host_reference_aug(args):
        return device_aug.augment_batch(key, canv, img_type=img_type,
                                        training=False,
                                        out_dtype=compute_dtype(args))
    return device_aug.augment_batch(key, canv, img_type=img_type,
                                    training=True,
                                    rotate_deg=float(args.rotate),
                                    out_dtype=compute_dtype(args))


def stream_train_two_views(args, key, canv_q, canv_k, img_type):
    """Two-view (MoCo q/k) twin of ``stream_train_view`` for the
    streaming SSL feed: the TwoCrops datasets emit two independently
    augmented canvases per sample."""
    from mfvit_tpu.data import device_aug
    if host_reference_aug(args):
        kq, kk = jax.random.split(key)
        q = device_aug.augment_batch(kq, canv_q, img_type=img_type,
                                     training=False,
                                     out_dtype=compute_dtype(args))
        k = device_aug.augment_batch(kk, canv_k, img_type=img_type,
                                     training=False,
                                     out_dtype=compute_dtype(args))
        return q, k
    return device_aug.augment_two_views(key, canv_q, canv_k,
                                        img_type=img_type,
                                        rotate_deg=float(args.rotate),
                                        out_dtype=compute_dtype(args))


def device_train_view(args, key, canv, img_type):
    """ONE reference-order training view — HFlip -> rotate about the full
    canvas center -> RandomCrop -> normalize (image_transform.py:58-63) —
    from a device-resident canvas. The store paths' augmentation: since
    the full pre-crop canvas lives in HBM, matching the reference's
    rotate-THEN-crop order costs nothing (the rotation and crop fuse into
    one gather), closing PARITY.md divergence #7 for these paths."""
    from mfvit_tpu.data import device_aug
    return device_aug.augment_train_canvas(
        key, canv, crop=min(args.crop or args.img_size, args.img_size),
        img_type=img_type, rotate_deg=float(args.rotate),
        out_dtype=compute_dtype(args))


def device_train_two_views(args, key, canv, img_type):
    """Two independent reference-order views from one resident canvas
    (TwoCropsTransform semantics for the SSL store paths)."""
    from mfvit_tpu.data import device_aug
    return device_aug.augment_two_views_canvas(
        key, canv, crop=min(args.crop or args.img_size, args.img_size),
        img_type=img_type, rotate_deg=float(args.rotate),
        out_dtype=compute_dtype(args))


def maybe_device_store(args, manifest_path: str, folder: str, *,
                       fourch: bool = False, paired: bool = False,
                       n_dev: int = 1, mesh=None, seed: int = 0,
                       budget: StoreBudget = None):
    """HBM-resident canvas store when eligible, else None.

    Eligible = device-aug square-resize policy (no --maintain-ratio:
    pre-crop canvases are fixed (img_size, img_size)), single device, and
    the whole dataset fits --device-store-mb. The host then decodes each
    image exactly once (fill pass); every epoch after that is on-device
    gather + random crop + fused augmentation with zero per-step H2D —
    the TPU-first replacement for the reference's num_workers=12 feed
    (pretrain main :425-442), measured transfer-bound on weak hosts
    (docs/PERF.md)."""
    from mfvit_tpu.data import device_store
    if (not args.aug_device or args.maintain_ratio
            or getattr(args, "device_store_mb", 0) <= 0):
        return None
    if n_dev > 1 and (mesh is None or args.batch_size % n_dev):
        return None
    chans = 4 if fourch else (6 if paired else 3)  # paired: 2 flavors
    fill_tf = ht.CanvasTransform(img_size=args.img_size, training=False,
                                 maintain_ratio=False, seed=seed)
    decode = _fill_decode_cache(args, False)
    if fourch:
        ds = datasets.Covid4chDataset(manifest_path, fill_tf,
                                      folder_cxr=folder, decode=decode)
    elif paired:
        ds = datasets.CovidPairedDataset(manifest_path, fill_tf, fill_tf,
                                         folder_cxr=folder, decode=decode)
    else:
        ds = datasets.CovidDataset(folder, manifest_path, fill_tf,
                                   decode=decode)
    if budget is None:
        budget = StoreBudget(args.device_store_mb)
    sharded = mesh is not None and n_dev > 1
    nbytes = _store_nbytes(len(ds), args.img_size, chans,
                           n_dev if mesh is not None else 1,
                           n_proc=jax.process_count() if sharded else 1)
    if not budget.reserve(nbytes):
        print("=> device canvas store: does not fit --device-store-mb "
              "budget; streaming feed for this draw")
        return None
    store = device_store.fill_from_dataset(
        ds, batch_size=args.batch_size, seed=seed,
        num_workers=args.workers, mesh=mesh if n_dev > 1 else None)
    # per-draw reservation: the CLI returns it via common.release_store
    # when the draw ends and the store's device arrays are dropped
    store.budget_reservation = (budget, nbytes)
    print(f"=> device canvas store: {store.n} samples "
          f"({store.nbytes >> 20} MB) resident in HBM; "
          "epochs run host-free")
    return store


def maybe_eval_device_store(args, manifest_path: str, folder: str, *,
                            paired: bool = False, seed: int = 0,
                            budget: StoreBudget = None):
    """Eval twin of maybe_device_store: deterministic post-center-crop
    canvases resident in HBM, fixed iteration order, wrap-padded final
    batch trimmed by the Evaluator via ``len(store.ds)``. Eligible for
    ANY resize policy (the eval center-crop is always fixed-size);
    finetune re-evaluates val EVERY epoch, so this removes the
    per-epoch host feed entirely. Table lives on the default device;
    multi-device eval re-shards per batch in the eval runner."""
    from mfvit_tpu.data import device_store
    if (not args.aug_device or getattr(args, "device_store_mb", 0) <= 0):
        return None
    if jax.process_count() > 1:
        # each process would pin the FULL eval table (the store fills with
        # mesh=None) and the multi-process eval runner treats every
        # process's batch as its LOCAL row block — identical full-table
        # batches would enter the global batch once PER PROCESS,
        # double-counting every sample and truncating the tail at the
        # n_total trim. The streaming eval feed slices rows per process
        # (BatchLoader process slicing) and stays correct.
        print("=> eval device canvas store: disabled on multi-process "
              "meshes; streaming eval feed")
        return None
    fill_tf = ht.CanvasTransform(img_size=args.img_size, crop=args.crop,
                                 training=False,
                                 maintain_ratio=args.maintain_ratio,
                                 seed=seed)
    decode = _fill_decode_cache(args, args.maintain_ratio)
    if paired:
        ds = datasets.CovidPairedDataset(manifest_path, fill_tf, fill_tf,
                                         folder_cxr=folder, decode=decode)
    else:
        ds = datasets.CovidDataset(folder, manifest_path, fill_tf,
                                   decode=decode)
    side = args.crop or args.img_size
    if budget is None:
        budget = StoreBudget(args.device_store_mb)
    if not budget.reserve(_store_nbytes(len(ds), side,
                                        6 if paired else 3, 1)):
        print("=> eval device canvas store: does not fit "
              "--device-store-mb budget; streaming eval feed")
        return None
    store = device_store.fill_from_dataset(
        ds, batch_size=args.batch_size, seed=seed, shuffle=False,
        drop_last=False, num_workers=args.workers)
    print(f"=> eval device canvas store: {store.n} samples "
          f"({store.nbytes >> 20} MB) resident")
    return store


def make_covid_loader(args, manifest_path: str, folder: str, *,
                      training: bool, paired: bool = False,
                      fourch: bool = False, ssl_two_views: bool = False,
                      batch_size: Optional[int] = None,
                      seed: int = 0) -> pipeline.BatchLoader:
    """Build a loader over a COVID manifest.

    Device-aug mode ('the TPU path'): datasets yield uint8 canvases; the
    caller applies device_aug.augment_batch inside its step. Host mode:
    full per-sample torchvision-parity transform on the host.
    ``fourch``: stacked CXR-gray + Enh 4-channel canvases
    (Dataset_covid_4ch, loader.py:182). ``ssl_two_views``: TwoCropsTransform
    semantics — each sample yields TWO independently cropped canvases
    (q, k, label) so each MoCo view gets its own crop window
    (loader.py:13-22; device-aug path only)."""
    bs = batch_size or args.batch_size
    # deterministic decode+resize prefix cached across epochs AND across
    # loaders/draws — one shared cache per policy (the reference leans on
    # num_workers=12 processes instead — pretrain main :425-442; on a
    # 1-CPU host the cache is what keeps the chip fed)
    decode = None
    if getattr(args, "canvas_cache", True) and args.canvas_cache_mb > 0:
        decode = ht.shared_decode_cache(
            args.img_size, args.maintain_ratio,
            args.canvas_cache_mb << 20)
    if args.aug_device:
        # streaming training canvases arrive FULLY augmented in the
        # reference flip->rotate->crop order (CanvasTransform fuses the
        # rotation into the crop gather); the device then only
        # normalizes (stream_train_view). --aug-order crop-first keeps
        # the old host-crop + device-rotate split as an ablation.
        host_ref = (training and host_reference_aug(args))
        def tf(seed_off):
            return ht.CanvasTransform(
                img_size=args.img_size, crop=args.crop, training=training,
                maintain_ratio=args.maintain_ratio,
                rotate_deg=float(args.rotate) if host_ref else 0.0,
                hflip=host_ref, seed=seed + seed_off)
        if ssl_two_views:
            if paired:
                raise ValueError("ssl_two_views is for the single-flavor "
                                 "and 4ch SSL paths")
            if fourch:
                ds = datasets.Covid4chTwoCropsDataset(manifest_path, tf(0),
                                                      folder_cxr=folder,
                                                      decode=decode)
            else:
                ds = datasets.CovidTwoCropsDataset(folder, manifest_path,
                                                   tf(0), decode=decode)
        elif fourch:
            ds = datasets.Covid4chDataset(manifest_path, tf(0),
                                          folder_cxr=folder, decode=decode)
        elif paired:
            ds = datasets.CovidPairedDataset(manifest_path, tf(0), tf(1),
                                             decode=decode)
        else:
            ds = datasets.CovidDataset(folder, manifest_path, tf(0),
                                       decode=decode)
    else:
        if fourch:
            raise ValueError("--in-chans 4 requires the device-aug path "
                             "(the reference has no host transform stack "
                             "for the 4ch variant either — no main invokes "
                             "builder_4ch)")
        def tf2(img_type, seed_off):
            return ht.ChexpertTransform(
                img_size=args.img_size, crop=args.crop, img_type=img_type,
                training=training, maintain_ratio=args.maintain_ratio,
                rotate_deg=float(args.rotate), seed=seed + seed_off)
        if ssl_two_views:
            # full host stack applied twice per sample — the literal
            # TwoCropsTransform composition (loader.py:13-22)
            ds = datasets.CovidTwoCropsDataset(folder, manifest_path,
                                               tf2(folder, 0),
                                               decode=decode)
        elif paired:
            ds = datasets.CovidPairedDataset(manifest_path, tf2("data", 0),
                                             tf2("Train_Mix", 1),
                                             decode=decode)
        else:
            ds = datasets.CovidDataset(folder, manifest_path,
                                       tf2(folder, 0), decode=decode)
    return pipeline.BatchLoader(ds, bs, shuffle=training, seed=seed,
                                drop_last=training,
                                pad_final=not training,
                                num_workers=args.workers)


def add_dist_args(p: argparse.ArgumentParser) -> None:
    """Multi-host rendezvous flags (the reference's --dist-url/
    --world-size/--rank DDP launch, pretrain main :99-110): start the
    SAME command on every host with its own --dist-process-id. Shared by
    all three training entry points since round 5 — the reference's
    finetune/fusion mains are single-GPU (finetune :94-110 commented
    out), so multi-host LP/FT/fusion exceeds the reference the same way
    the GPT-fusion CLI does."""
    p.add_argument("--dist-coordinator", default=None, type=str,
                   help="coordinator address host:port (omit on Cloud TPU "
                        "pods for auto-detection)")
    p.add_argument("--dist-num-processes", default=None, type=int)
    p.add_argument("--dist-process-id", default=None, type=int)
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed (implied by "
                        "--dist-coordinator)")


def maybe_init_distributed(args) -> bool:
    """Initialize ``jax.distributed`` when ANY rendezvous flag is set —
    a coordinator-auto-detected launch passing only
    --dist-num-processes/--dist-process-id must not degrade into N
    independent duplicate single-process runs. Returns True when the
    rendezvous ran."""
    if not (args.distributed or args.dist_coordinator is not None
            or args.dist_num_processes is not None
            or args.dist_process_id is not None):
        return False
    from mfvit_tpu.parallel import mesh as pmesh
    pmesh.init_distributed(args.dist_coordinator,
                           num_processes=args.dist_num_processes,
                           process_id=args.dist_process_id)
    primary_process_prints_only()
    return True


def setup_mesh(args):
    """Build the data mesh for a CLI run (--mesh-devices, default all).

    Returns (mesh, n_devices). With n > 1 the caller replicates params /
    optimizer state and shards batches — XLA then inserts the gradient
    all-reduce (the DDP equivalent, SURVEY §2.6).

    Multi-process (multi-host) runs — every process launched with
    ``jax.distributed`` initialized, the reference's multi-node DDP
    regime (pretrain main :99-110) — must span ALL global devices. All
    training entry points support it (round 5; the loader process
    slicing, global-array assembly and collective checkpoints are
    shared plumbing)."""
    import jax as _jax

    from mfvit_tpu.parallel import mesh as pmesh
    nproc = _jax.process_count()
    if nproc > 1:
        n = len(_jax.devices())
        if args.mesh_devices not in (None, n):
            raise SystemExit(
                f"--mesh-devices {args.mesh_devices} under "
                f"{nproc} processes: the multi-host mesh must span all "
                f"{n} global devices")
        mesh = pmesh.make_mesh(n)
        pmesh.assert_divisible(args.batch_size, mesh)
        return mesh, n
    if args.mesh_devices is None:
        # default: largest device count that divides the batch
        avail = len(_jax.devices())
        n = next(d for d in range(avail, 0, -1)
                 if args.batch_size % d == 0)
    else:
        n = args.mesh_devices
    mesh = pmesh.make_mesh(n)
    if n > 1:
        pmesh.assert_divisible(args.batch_size, mesh)
    return mesh, n


def primary_process_prints_only() -> None:
    """Silence ``print`` on non-primary processes — the reference does
    exactly this for non-rank-0 DDP workers (pretrain main :220-223).
    Writers/pickles are separately gated in exp.harness/storage."""
    import builtins
    if jax.process_count() > 1 and jax.process_index() != 0:
        builtins.print = lambda *a, **k: None


def batch_sharding(mesh, n_dev: int):
    """Sharding for device_prefetch: batch split over 'data' when the mesh
    is real, else None (single device — plain device_put)."""
    if n_dev <= 1:
        return None
    from mfvit_tpu.parallel import mesh as pmesh
    return pmesh.batch_sharded(mesh)


def maybe_shard(x, mesh, n_dev: int):
    if n_dev <= 1:
        return x
    from mfvit_tpu.parallel import mesh as pmesh
    return pmesh.shard_batch(x, mesh)


def maybe_replicate(tree, mesh, n_dev: int):
    if n_dev <= 1:
        return tree
    from mfvit_tpu.parallel import mesh as pmesh
    return pmesh.replicate(tree, mesh)


def make_eval_runner(args, img_types, forward, *, mesh=None, n_dev: int = 1):
    """Shared eval loop for the CLIs (finetune/fuse/infer) built on
    train.evaluator.Evaluator: device-aug each flavor in eval mode, run the
    jitted forward, trim pad_final wrapping, compute AUC/top-1.

    ``img_types``: one flavor per image field in the batch (all fields but
    the last, which is labels). ``forward(*imgs) -> logits``. With a
    multi-device mesh the eval batches are sharded over 'data' like the
    training batches (otherwise GSPMD replicates the forward on every
    device and eval gets no speedup).

    On a multi-PROCESS mesh each host's loader yields only its local row
    block (BatchLoader process slicing); the global batch is assembled
    with put_local_rows, and logits + labels are process_allgather'd back
    so every host computes the SAME epoch metrics — required for the
    best-val decisions that gate COLLECTIVE checkpoint saves (a
    divergent decision would deadlock the orbax collective)."""
    from mfvit_tpu.data import device_aug
    from mfvit_tpu.parallel.hostput import put_local_rows
    from mfvit_tpu.train.evaluator import Evaluator

    dt = compute_dtype(args)
    shard = batch_sharding(mesh, n_dev)
    multiproc = (shard is not None
                 and not shard.is_fully_addressable)
    if multiproc:
        from mfvit_tpu.parallel import mesh as pmesh
        # built ONCE: jit caches on the function object, so constructing
        # the lambda per batch would re-trace the all-gather every batch
        replicate_out = jax.jit(lambda t: t,
                                out_shardings=pmesh.replicated(mesh))

    def batch_forward(batch):
        *imgs, labels = batch
        xs = []
        for img, flavor in zip(imgs, img_types):
            if multiproc:
                x = put_local_rows(np.asarray(img), shard)
            else:
                x = maybe_shard(jnp.asarray(img), mesh, n_dev)
            if args.aug_device:
                xs.append(device_aug.augment_batch(
                    jax.random.PRNGKey(0), x,
                    img_type=flavor, training=False, out_dtype=dt))
            else:
                xs.append(x.astype(dt))
        logits = forward(*xs)
        if multiproc:
            from jax.experimental import multihost_utils

            # replicate on-device (ICI all-gather): a fully-replicated
            # global array is host-readable everywhere, unlike the
            # batch-sharded forward output
            logits = replicate_out(logits)
            labels = multihost_utils.process_allgather(
                np.asarray(labels), tiled=True)
        return logits, labels

    return Evaluator(batch_forward, metric_names=["auc", "acc"])


def make_param_evaluate(args, img_types, eval_step, *, mesh=None,
                        n_dev: int = 1):
    """Per-draw ``evaluate(params, loader, *, n_total) -> Evaluator result``
    over a params-taking ``eval_step(params, *imgs) -> logits``.

    Builds the eval runner ONCE — make_eval_runner constructs the
    multi-process all-gather jit at creation time ("built ONCE" above), so
    rebuilding it per evaluation would re-trace that gather every epoch.
    Params swap per call through a closure cell; the cell value is passed
    as a real argument to the jitted eval_step (never baked into a trace),
    so swapping is retrace-free."""
    cell = {"params": None}
    runner = make_eval_runner(
        args, img_types, lambda *xs: eval_step(cell["params"], *xs),
        mesh=mesh, n_dev=n_dev)

    def evaluate(params, loader, *, n_total: int):
        cell["params"] = params
        return runner.evaluate(loader, n_total=n_total)

    return evaluate


def host_rng(args) -> np.random.Generator:
    return np.random.default_rng(args.seed if args.seed is not None else 0)


def jax_key(args) -> jax.Array:
    return jax.random.PRNGKey(args.seed if args.seed is not None else 0)
