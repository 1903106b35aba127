"""Dataset flavors over manifests — indexable sample producers.

Functional equivalents of the reference's loader.py dataset classes
(/root/reference/moco_pretraining/moco/moco/loader.py), returning numpy
arrays ready for batching:

- ``CovidDataset``            <- Dataset_covid (:92-142)
- ``CovidPairedDataset``      <- the fusion main's dual-loader zip, rebuilt
                                 as one jointly-indexed dataset (SURVEY §3.3)
- ``Covid4chDataset``         <- Dataset_covid_4ch (:144-198)
- ``CovidEnhCxrDataset``      <- Dataset_covid_LEnh_RCXR_2norms (:201-258)
                                 (+ the ``per_enh`` mix variant :261-328)
- ``ChexpertDataset``         <- Dataset (:39-87) / Dataset_Mix* (:332-480)

Each dataset produces either fixed-size uint8 canvases (device-fused
augmentation path) or fully transformed float arrays (host parity path),
depending on the transform passed in. The MoCo two-view behavior
(TwoCropsTransform, loader.py:13-22) is split: the HOST applies the
transform twice per sample (two independent RandomCrop windows, matching
the reference's full-stack-twice semantics) via the TwoCrops datasets —
with a CanvasTransform for the device-aug path — and
``device_aug.augment_two_views`` then draws independent flip/rotation per
view on-device.
"""
from __future__ import annotations

import random
from typing import Callable, Optional, Tuple

import numpy as np

from mfvit_tpu.data import host_transforms as ht
from mfvit_tpu.data.manifest import (parse_chexpert, parse_covid,
                                     parse_covid_paired)

Transform = Callable[[np.ndarray], np.ndarray]

# context salt separating dataset-level mix/branch decisions from the
# transforms' augmentation streams (which use (epoch, idx[, view<=1])):
# the same (seed, ctx) hash MUST never feed both, or the first transform
# draw is bit-identical to the already-conditioned mix draw
_MIX_SALT = 0x6D6978  # "mix"


def _apply_tf(tf: Transform, img: np.ndarray, ctx):
    """Apply a transform, forwarding the per-sample determinism context
    ((epoch, index[, view])) when the transform is seeded — draws then
    depend only on (seed, ctx), independent of loader worker count. Plain
    callables and unseeded transforms are called as-is."""
    if getattr(tf, "seed", None) is not None:
        return tf(img, ctx)
    return tf(img)


class _EpochMixin:
    """Per-epoch augmentation context (BatchLoader calls ``set_epoch``
    each epoch — the reference analogue is DistributedSampler.set_epoch,
    pretrain main :450-451)."""

    _epoch: int = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch


class CovidDataset(_EpochMixin):
    """Single-flavor COVID dataset: (image, label)."""

    def __init__(self, folder: str, img_csv: str, transform: Transform,
                 decode: Optional[Transform] = None):
        self.manifest = parse_covid(img_csv, folder)
        self.transform = transform
        self.decode = decode or ht.decode_bgr

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.int32]:
        img = self.decode(self.manifest.paths[idx])
        return (_apply_tf(self.transform, img, (self._epoch, idx)),
                self.manifest.labels[idx])


class CovidTwoCropsDataset(_EpochMixin):
    """TwoCropsTransform semantics on the host (loader.py:13-22 +
    Dataset_covid :130-133): the SAME decoded image through the transform
    TWICE -> (q, k, label). Used for the BYOL/moco-v2 aug settings whose
    stacks run host-side, and — with a CanvasTransform — for the
    device-aug chexpert path, where each view gets its own host
    RandomCrop window and device_aug.augment_two_views then draws
    independent flip/rotation per view."""

    def __init__(self, folder: str, img_csv: str, transform: Transform,
                 decode: Optional[Transform] = None):
        self.manifest = parse_covid(img_csv, folder)
        self.transform = transform
        self.decode = decode or ht.decode_bgr

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, idx: int):
        img = self.decode(self.manifest.paths[idx])
        return (_apply_tf(self.transform, img, (self._epoch, idx, 0)),
                _apply_tf(self.transform, img, (self._epoch, idx, 1)),
                self.manifest.labels[idx])


class CovidPairedDataset(_EpochMixin):
    """Jointly-indexed CXR+Enh pairs: (img_cxr, img_enh, label).

    Per-branch transforms are independent (the reference applies separate
    augmentation per loader — fusion main :524-547/:615-643); pairing is by
    sample index, guaranteed by construction."""

    def __init__(self, img_csv: str, transform_cxr: Transform,
                 transform_enh: Transform, folder_cxr: str = "data",
                 folder_enh: str = "Train_Mix",
                 decode: Optional[Transform] = None):
        self.manifest = parse_covid_paired(img_csv, folder_cxr, folder_enh)
        self.transform_cxr = transform_cxr
        self.transform_enh = transform_enh
        self.decode = decode or ht.decode_bgr

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, idx: int):
        cxr = self.decode(self.manifest.paths[idx])
        enh = self.decode(self.manifest.paths_alt[idx])
        return (_apply_tf(self.transform_cxr, cxr, (self._epoch, idx)),
                _apply_tf(self.transform_enh, enh, (self._epoch, idx)),
                self.manifest.labels[idx])


class Covid4chDataset(_EpochMixin):
    """CXR gray channel + 3 Enh channels stacked to 4 (loader.py:182:
    ``np.concatenate((cxr, enh), axis=2)[:, :, 2:]``)."""

    def __init__(self, img_csv: str, transform: Transform,
                 folder_cxr: str = "data", folder_enh: str = "Train_Mix",
                 decode: Optional[Transform] = None):
        self.manifest = parse_covid_paired(img_csv, folder_cxr, folder_enh)
        self.transform = transform
        self.decode = decode or ht.decode_bgr

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, idx: int):
        cxr = self.decode(self.manifest.paths[idx])
        enh = self.decode(self.manifest.paths_alt[idx])
        img = np.concatenate((cxr, enh), axis=2)[:, :, 2:]
        return (_apply_tf(self.transform, img, (self._epoch, idx)),
                self.manifest.labels[idx])


class Covid4chTwoCropsDataset(_EpochMixin):
    """Two-view 4ch variant for SSL pretraining (builder_4ch's objective
    over Dataset_covid_4ch's stacked input, loader.py:144-198): the same
    stacked image through the transform twice -> (q, k, label), so each
    MoCo view gets its own crop window like TwoCropsTransform."""

    def __init__(self, img_csv: str, transform: Transform,
                 folder_cxr: str = "data", folder_enh: str = "Train_Mix",
                 decode: Optional[Transform] = None):
        self.manifest = parse_covid_paired(img_csv, folder_cxr, folder_enh)
        self.transform = transform
        self.decode = decode or ht.decode_bgr

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, idx: int):
        cxr = self.decode(self.manifest.paths[idx])
        enh = self.decode(self.manifest.paths_alt[idx])
        img = np.concatenate((cxr, enh), axis=2)[:, :, 2:]
        return (_apply_tf(self.transform, img, (self._epoch, idx, 0)),
                _apply_tf(self.transform, img, (self._epoch, idx, 1)),
                self.manifest.labels[idx])


class CovidEnhCxrDataset(_EpochMixin):
    """Cross-modal contrastive pairing: q = Enh view, k = CXR view, each
    with its own transform (Dataset_covid_LEnh_RCXR_2norms, :201-258).

    With ``per_enh < 1`` the Enh image is replaced by the CXR image (and
    its transform) with probability ``1 - per_enh`` (mix variant
    :261-328)."""

    def __init__(self, img_csv: str, transform_cxr: Transform,
                 transform_enh: Transform, per_enh: float = 1.0,
                 seed: Optional[int] = 0, folder_cxr: str = "data",
                 folder_enh: str = "Train_Mix",
                 decode: Optional[Transform] = None):
        self.manifest = parse_covid_paired(img_csv, folder_cxr, folder_enh)
        self.transform_cxr = transform_cxr
        self.transform_enh = transform_enh
        self.per_enh = per_enh
        self.seed = seed
        self._rng = random.Random(seed)
        self.decode = decode or ht.decode_bgr

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, idx: int):
        ctx = (self._epoch, idx)
        # salt the mix-decision stream (_MIX_SALT): an unsalted
        # (epoch, idx) context is the SAME Random the q-transform derives,
        # so the transform's first draw (hflip) would be bit-identical to
        # the already-conditioned mix draw — e.g. at per_enh=0.5 the CXR
        # query branch would never flip
        r = ht._rng_for(self.seed, self._rng, ctx + (_MIX_SALT,))
        cxr = self.decode(self.manifest.paths[idx])
        if self.per_enh >= 1.0 or r.random() <= self.per_enh:
            enh = self.decode(self.manifest.paths_alt[idx])
            q = _apply_tf(self.transform_enh, enh, ctx)
        else:
            q = _apply_tf(self.transform_cxr, cxr, ctx)
        k = _apply_tf(self.transform_cxr, cxr, ctx + (1,))
        return q, k, self.manifest.labels[idx]


class ChexpertDataset(_EpochMixin):
    """CheXpert CSV dataset with disease-column label lookup."""

    def __init__(self, folder: str, img_csv: str, transform: Transform,
                 disease_name: str, decode: Optional[Transform] = None):
        self.manifest = parse_chexpert(img_csv, folder, disease_name)
        self.transform = transform
        self.decode = decode or ht.decode_bgr

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, idx: int):
        img = self.decode(self.manifest.paths[idx])
        return (_apply_tf(self.transform, img, (self._epoch, idx)),
                self.manifest.labels[idx])


class ChexpertTwoCropsDataset(_EpochMixin):
    """The reference ``Dataset``'s ACTUAL return contract: the transform
    applied twice to the same decoded image -> (q, k, label)
    (loader.py:83-85 returns ``[image1, image2], label`` even for eval;
    the supervised mains then unpack and drop the second view —
    finetune :698). ``ChexpertDataset`` is the single-view variant those
    mains effectively consume; this one completes the L2 contract for
    SSL-style consumers of the CheXpert CSV manifests."""

    def __init__(self, folder: str, img_csv: str, transform: Transform,
                 disease_name: str, decode: Optional[Transform] = None):
        self.manifest = parse_chexpert(img_csv, folder, disease_name)
        self.transform = transform
        self.decode = decode or ht.decode_bgr

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, idx: int):
        img = self.decode(self.manifest.paths[idx])
        return (_apply_tf(self.transform, img, (self._epoch, idx, 0)),
                _apply_tf(self.transform, img, (self._epoch, idx, 1)),
                self.manifest.labels[idx])


class ChexpertMixDataset(_EpochMixin):
    """CheXpert paired CXR/Enh with probabilistic flavor swap.

    ``mode='norm1'`` (Dataset_Mix_norm1, loader.py:332-411): with
    probability ``per_enh`` the CXR image is REPLACED by the Enh image
    (both transformed with the CXR stack — the reference sets
    transform_enh = transform_cxr at init :344); otherwise Enh is replaced
    by CXR. ``mode='mix'`` (Dataset_Mix, :414-480): with probability
    ``1 - per_enh`` Enh is replaced by CXR (and its transform); otherwise
    the real Enh image + Enh transform are used. Returns (q, k, label)."""

    def __init__(self, folder_cxr: str, folder_enh: str, img_csv: str,
                 transform_cxr: Transform, transform_enh: Transform,
                 disease_name: str, per_enh: float, mode: str = "mix",
                 seed: Optional[int] = 0,
                 decode: Optional[Transform] = None):
        self.m_cxr = parse_chexpert(img_csv, folder_cxr, disease_name)
        self.m_enh = parse_chexpert(img_csv, folder_enh, disease_name)
        self.decode = decode or ht.decode_bgr
        self.transform_cxr = transform_cxr
        self.transform_enh = transform_enh
        self.per_enh = per_enh
        self.mode = mode
        self.seed = seed
        self._rng = random.Random(seed)

    def __len__(self):
        return len(self.m_cxr)

    def __getitem__(self, idx: int):
        ctx = (self._epoch, idx)
        # salted mix-decision stream — see CovidEnhCxrDataset.__getitem__
        r = ht._rng_for(self.seed, self._rng, ctx + (_MIX_SALT,))
        if self.mode == "norm1":
            # both views come from ONE flavor (the reference replaces the
            # other in place, loader.py:332-411) — decode only that one
            src = (self.m_enh if r.random() <= self.per_enh
                   else self.m_cxr)
            img = self.decode(src.paths[idx])
            q = _apply_tf(self.transform_cxr, img, ctx)
            k = _apply_tf(self.transform_cxr, img, ctx + (1,))  # norm1: one normalization (:344)
        else:
            cxr = self.decode(self.m_cxr.paths[idx])
            if r.random() < 1.0 - self.per_enh:
                q = _apply_tf(self.transform_cxr, cxr, ctx)
                k = _apply_tf(self.transform_cxr, cxr, ctx + (1,))
            else:
                enh = self.decode(self.m_enh.paths[idx])
                q = _apply_tf(self.transform_cxr, cxr, ctx)
                k = _apply_tf(self.transform_enh, enh, ctx + (1,))
        return q, k, self.m_cxr.labels[idx]
