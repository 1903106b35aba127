"""Host-side image preprocessing (decode, resize, crop) in numpy/PIL.

Two roles:

1. **Parity path** — reproduces the torchvision transform stack the
   reference composes in aihc_utils/image_transform.py:21-84 (Resize with
   shorter-side semantics, RandomHorizontalFlip, RandomRotation (NEAREST,
   expand=False), Random/CenterCrop, ToTensor+Normalize) so eval
   preprocessing is numerically identical and train augmentation is
   distribution-identical.
2. **Canvas producer for the device-fused path** — decode + maintain-ratio
   resize + long-axis crop to a fixed square uint8 canvas; the rest of the
   augmentation (flip/rotate/normalize) runs fused on-device
   (``mfvit_tpu.data.device_aug``) with static shapes.

Decode keeps cv2's BGR channel order deliberately: the reference pipes
``cv2.imread`` output into PIL without conversion (loader.py:124-127) and
its normalization stats are in that order.
"""
from __future__ import annotations

import dataclasses
import random
from typing import Optional, Tuple

import numpy as np

import cv2
from PIL import Image

from mfvit_tpu.data.constants import norm_stats


def decode_bgr(path: str) -> np.ndarray:
    """cv2 decode -> uint8 HWC, BGR order (reference loader.py:124)."""
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(f"cv2 could not decode {path!r}")
    return img


def resize_shorter(img: np.ndarray, size: int) -> np.ndarray:
    """torchvision ``Resize(int)``: scale the SHORTER side to ``size``,
    bilinear with antialias (PIL). image_transform.py:23-24."""
    h, w = img.shape[:2]
    if h <= w:
        nh, nw = size, max(1, int(size * w / h))
    else:
        nh, nw = max(1, int(size * h / w)), size
    if (nh, nw) == (h, w):
        return img
    return np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))


def resize_square(img: np.ndarray, size: int) -> np.ndarray:
    """torchvision ``Resize((size, size))`` (maintain_ratio=False path)."""
    return np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR))


def center_crop(img: np.ndarray, ch: int, cw: int) -> np.ndarray:
    """torchvision CenterCrop incl. zero-padding when smaller."""
    h, w = img.shape[:2]
    if ch > h or cw > w:
        pt = max(0, (ch - h) // 2)
        pl_ = max(0, (cw - w) // 2)
        pad = np.zeros((max(h, ch) + (ch - h) % 2 if ch > h else h,
                        max(w, cw) + (cw - w) % 2 if cw > w else w,
                        img.shape[2]), img.dtype)
        pad[pt:pt + h, pl_:pl_ + w] = img
        img, (h, w) = pad, pad.shape[:2]
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    return img[top:top + ch, left:left + cw]


def random_crop(img: np.ndarray, ch: int, cw: int,
                rng: random.Random) -> np.ndarray:
    h, w = img.shape[:2]
    top = rng.randint(0, h - ch) if h > ch else 0
    left = rng.randint(0, w - cw) if w > cw else 0
    return img[top:top + ch, left:left + cw]


def rotate(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """torchvision RandomRotation application: NEAREST, expand=False,
    rotate about center, zero fill (torchvision defaults; finetune passes
    ``--rotate`` as bool => ±1° — SURVEY §2.4 quirk, honored by callers)."""
    return np.asarray(
        Image.fromarray(img).rotate(angle_deg, resample=Image.NEAREST))


def to_float_chw_free(img: np.ndarray, mean, std) -> np.ndarray:
    """ToTensor+Normalize, but kept HWC float32 (TPU NHWC layout)."""
    x = img.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


@dataclasses.dataclass
class ChexpertTransform:
    """The full host-side reference stack (parity path).

    Mirrors ``get_transform_type(args, training, img_type)``
    (image_transform.py:50-84). ``rotate_deg`` accepts the reference's
    bool-flag quirk (True ≡ 1°).
    """

    img_size: int = 224
    crop: int = 224
    img_type: str = "data"
    training: bool = False
    maintain_ratio: bool = True
    rotate_deg: float = 10.0
    hflip: bool = True
    seed: Optional[int] = None
    normalize: bool = True

    def __post_init__(self):
        self._rng = random.Random(self.seed)
        self.mean, self.std = norm_stats(self.img_type)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.maintain_ratio:
            img = resize_shorter(img, self.img_size)
        else:
            img = resize_square(img, self.img_size)
        if self.training:
            if self.hflip and self._rng.random() < 0.5:
                img = img[:, ::-1]
            deg = float(self.rotate_deg)
            if deg:
                img = rotate(img, self._rng.uniform(-deg, deg))
            if self.crop:
                img = random_crop(img, self.crop, self.crop, self._rng)
        elif self.crop:
            img = center_crop(img, self.crop, self.crop)
        if self.normalize:
            return to_float_chw_free(img, self.mean, self.std)
        return np.ascontiguousarray(img)


@dataclasses.dataclass
class CanvasTransform:
    """Canvas producer for the device-fused augmentation path.

    Host does the variable-shape part only: decode + maintain-ratio resize
    + crop of the long axis to a fixed square (random position in training,
    center in eval). Flip/rotation/normalization then run fused on-device
    with static shapes (device_aug.augment_batch). Output: uint8
    (img_size, img_size, 3).
    """

    img_size: int = 224
    training: bool = False
    maintain_ratio: bool = True
    seed: Optional[int] = None

    def __post_init__(self):
        self._rng = random.Random(self.seed)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        s = self.img_size
        img = resize_shorter(img, s) if self.maintain_ratio else resize_square(img, s)
        if self.training:
            img = random_crop(img, s, s, self._rng)
        else:
            img = center_crop(img, s, s)
        return np.ascontiguousarray(img)
