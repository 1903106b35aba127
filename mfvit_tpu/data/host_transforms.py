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
import threading
from typing import Optional

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
    if img.shape[:2] == (size, size):
        return img
    return np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR))


class DecodeResizeCache:
    """RAM cache of the deterministic decode+resize prefix of every
    transform stack.

    The reference hides PNG-decode cost behind ``DataLoader(num_workers=
    12)`` worker PROCESSES (pretrain main :425-442); on a weak host that
    still re-decodes every image every epoch. Here the decode + resize
    prefix — identical across epochs — is cached as uint8 once, so from
    epoch 2 on the host only runs the cheap random crop/flip suffix (or
    nothing, on the device-aug path) and the TPU stays fed. The random
    augmentation suffix is NOT cached, preserving the per-epoch draw
    distribution exactly.

    Thread-safe (BatchLoader uses worker threads): lookups ride the GIL,
    inserts take a lock so the byte accounting cannot race (two threads
    passing the budget check together, or double-counting a path both
    decoded). Arrays are marked read-only before sharing. ``limit_bytes``
    caps growth — past it, images decode per-epoch as before (no
    eviction: epoch order is shuffled, so any fixed subset is as good as
    LRU)."""

    def __init__(self, img_size: int, maintain_ratio: bool = True,
                 limit_bytes: int = 4 << 30):
        self.img_size = img_size
        self.maintain_ratio = maintain_ratio
        self.limit_bytes = limit_bytes
        self._store: dict = {}
        self._bytes = 0
        self._lock = threading.Lock()

    def __call__(self, path: str) -> np.ndarray:
        img = self._store.get(path)
        if img is not None:
            return img
        img = decode_bgr(path)
        img = (resize_shorter(img, self.img_size) if self.maintain_ratio
               else resize_square(img, self.img_size))
        with self._lock:
            prev = self._store.get(path)
            if prev is not None:  # another thread decoded it first
                return prev
            if self._bytes + img.nbytes <= self.limit_bytes:
                img = np.ascontiguousarray(img)
                img.setflags(write=False)
                self._store[path] = img
                self._bytes += img.nbytes
        return img

    @property
    def nbytes(self) -> int:
        return self._bytes


# One cache per (decode+resize policy) per process: the prefix is
# deterministic, so every loader of a run — train/val/test, across all
# (ratio, draw) iterations — shares one instance. Per-loader caches would
# multiply the configured RAM budget by the loader count and re-decode
# the dataset every draw.
_shared_decode_caches: dict = {}


def shared_decode_cache(img_size: int, maintain_ratio: bool,
                        limit_bytes: int) -> DecodeResizeCache:
    key = (int(img_size), bool(maintain_ratio), int(limit_bytes))
    cache = _shared_decode_caches.get(key)
    if cache is None:
        cache = DecodeResizeCache(img_size, maintain_ratio,
                                  limit_bytes=limit_bytes)
        _shared_decode_caches[key] = cache
    return cache


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
    if ch > h or cw > w:
        # torchvision RandomCrop raises on undersized input (no silent
        # smaller-than-requested output)
        raise ValueError(f"random_crop: requested ({ch}, {cw}) from a "
                         f"({h}, {w}) image")
    top = rng.randint(0, h - ch) if h > ch else 0
    left = rng.randint(0, w - cw) if w > cw else 0
    return img[top:top + ch, left:left + cw]


def _rng_for(seed, shared_rng: random.Random, ctx):
    """Per-sample RNG derivation. With a seed AND a caller-supplied
    context (the loader threads (epoch, index)), draws depend only on
    (seed, ctx) — deterministic regardless of loader worker count,
    unlike a shared Mersenne state consumed by pool threads in scheduling
    order. Falls back to the shared sequential RNG otherwise."""
    if seed is None or ctx is None:
        return shared_rng
    # int-tuple hashes are deterministic across processes (PYTHONHASHSEED
    # only perturbs str/bytes hashing)
    return random.Random(hash((seed,) + tuple(ctx)))


def rotate(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """torchvision RandomRotation application: NEAREST, expand=False,
    rotate about center, zero fill (torchvision defaults; finetune passes
    ``--rotate`` as bool => ±1° — SURVEY §2.4 quirk, honored by callers)."""
    return np.asarray(
        Image.fromarray(img).rotate(angle_deg, resample=Image.NEAREST))


def rotate_crop_window(img: np.ndarray, angle_deg: float, top: int,
                       left: int, ch: int, cw: int) -> np.ndarray:
    """'Rotate the FULL image about its center (PIL NEAREST, zero fill),
    then crop the (ch, cw) window at (top, left)' — the host twin of
    device_aug._rotate_crop_nearest, bit-exact vs ``Image.rotate``
    followed by a slice BY CONSTRUCTION (it IS that composition). Lets
    the STREAMING training feed run the reference's flip -> rotate ->
    crop order (image_transform.py:58-63; PARITY.md divergence #7).

    Implementation note: PIL's C rotate + slice measures ~7x FASTER than
    a numpy fused window gather on this host (0.22 ms vs 1.6 ms at
    224x301), and replicating PIL's fixed-point coordinate accumulation
    in numpy bit-exactly is fragile — so the full-frame rotate is not a
    compromise, it is the better implementation. Channel counts beyond
    PIL's modes (the 4ch stacked input) rotate per-channel-group."""
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    if img.ndim == 3 and c not in (1, 3, 4):
        full = np.stack([rotate(np.ascontiguousarray(img[..., i]),
                                angle_deg) for i in range(c)], axis=-1)
    else:
        full = rotate(np.ascontiguousarray(img), angle_deg)
    return full[top:top + ch, left:left + cw]


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
        if self.training and self.crop > self.img_size:
            # after the resize the shorter side is img_size; torchvision
            # RandomCrop would raise on the undersized input — fail at
            # construction instead of producing wrong-sized batches
            raise ValueError(f"crop ({self.crop}) > img_size "
                             f"({self.img_size}) cannot be satisfied by "
                             "the training RandomCrop")

    def __call__(self, img: np.ndarray, ctx=None) -> np.ndarray:
        r = _rng_for(self.seed, self._rng, ctx)
        if self.maintain_ratio:
            img = resize_shorter(img, self.img_size)
        else:
            img = resize_square(img, self.img_size)
        if self.training:
            if self.hflip and r.random() < 0.5:
                img = img[:, ::-1]
            deg = float(self.rotate_deg)
            if deg:
                img = rotate(img, r.uniform(-deg, deg))
            if self.crop:
                img = random_crop(img, self.crop, self.crop, r)
        elif self.crop:
            img = center_crop(img, self.crop, self.crop)
        if self.normalize:
            return to_float_chw_free(img, self.mean, self.std)
        return np.ascontiguousarray(img)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def random_resized_crop(img: np.ndarray, size: int, rng: random.Random,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)) -> np.ndarray:
    """torchvision RandomResizedCrop: random area/aspect crop then bilinear
    resize to (size, size)."""
    import math
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = (math.log(ratio[0]), math.log(ratio[1]))
        ar = math.exp(rng.uniform(*log_r))
        cw = int(round(math.sqrt(target * ar)))
        ch = int(round(math.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            top = rng.randint(0, h - ch)
            left = rng.randint(0, w - cw)
            crop = img[top:top + ch, left:left + cw]
            return np.asarray(Image.fromarray(crop).resize(
                (size, size), Image.BILINEAR))
    # fallback: center crop at in-range aspect
    in_r = w / h
    if in_r < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_r > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    crop = center_crop(img, ch, cw)
    return np.asarray(Image.fromarray(crop).resize((size, size),
                                                   Image.BILINEAR))


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """SimCLR GaussianBlur (reference loader.py:25-34, PIL filter)."""
    from PIL import ImageFilter
    return np.asarray(Image.fromarray(img).filter(
        ImageFilter.GaussianBlur(radius=sigma)))


def solarize(img: np.ndarray, threshold: int = 128) -> np.ndarray:
    """BYOL Solarize (referenced as moco.loader.Solarize, pretrain :409)."""
    from PIL import ImageOps
    return np.asarray(ImageOps.solarize(Image.fromarray(img), threshold))


def color_jitter(img: np.ndarray, rng: random.Random, brightness=0.4,
                 contrast=0.4, saturation=0.2, hue=0.1) -> np.ndarray:
    """torchvision ColorJitter(0.4, 0.4, 0.2, 0.1): random factor per
    property, applied in random order."""
    from PIL import ImageEnhance
    pil = Image.fromarray(img)
    ops = []
    if brightness:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
    if contrast:
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
    if saturation:
        f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
    if hue:
        f = rng.uniform(-hue, hue)

        def hue_shift(im, f=f):
            hsv = np.asarray(im.convert("HSV")).copy()
            hsv[:, :, 0] = (hsv[:, :, 0].astype(np.int16)
                            + int(f * 255)) % 256
            return Image.fromarray(hsv, "HSV").convert("RGB")
        ops.append(hue_shift)
    rng.shuffle(ops)
    for op in ops:
        pil = op(pil)
    return np.asarray(pil)


@dataclasses.dataclass
class ByolTransform:
    """The reference's 'aug1'/'aug2' BYOL stacks (pretrain main :388-412):
    RandomResizedCrop(224, (crop_min, 1)) + ColorJitter(p=.8) +
    grayscale(p=.2) + GaussianBlur(p=1.0 aug1 / .1 aug2) +
    Solarize(p=.2, aug2 only) + HFlip + ImageNet normalize."""

    img_size: int = 224
    crop_min: float = 0.08
    variant: str = "aug1"  # aug1 | aug2
    seed: Optional[int] = None
    normalize: bool = True

    def __post_init__(self):
        self._rng = random.Random(self.seed)

    def __call__(self, img: np.ndarray, ctx=None) -> np.ndarray:
        r = _rng_for(self.seed, self._rng, ctx)
        img = random_resized_crop(img, self.img_size, r,
                                  scale=(self.crop_min, 1.0))
        if r.random() < 0.8:
            img = color_jitter(img, r)
        if r.random() < 0.2:
            gray = np.asarray(Image.fromarray(img).convert("L"))
            img = np.stack([gray] * 3, -1)
        blur_p = 1.0 if self.variant == "aug1" else 0.1
        if r.random() < blur_p:
            img = gaussian_blur(img, r.uniform(0.1, 2.0))
        if self.variant == "aug2" and r.random() < 0.2:
            img = solarize(img)
        if r.random() < 0.5:
            img = img[:, ::-1]
        if self.normalize:
            return to_float_chw_free(img, IMAGENET_MEAN, IMAGENET_STD)
        return np.ascontiguousarray(img)


@dataclasses.dataclass
class MoCoV3Transform:
    """``get_transform_type_mocov3`` (image_transform.py:87-124): train =
    RandomResizedCrop(img_size, (crop_min, 1)) + HFlip + RandomRotation;
    eval = Resize(256) + CenterCrop; per-flavor normalization."""

    img_size: int = 224
    crop: int = 224
    img_type: str = "data"
    training: bool = True
    crop_min: float = 0.08
    rotate_deg: float = 10.0
    maintain_ratio: bool = True
    seed: Optional[int] = None

    def __post_init__(self):
        self._rng = random.Random(self.seed)
        self.mean, self.std = norm_stats(self.img_type)

    def __call__(self, img: np.ndarray, ctx=None) -> np.ndarray:
        r = _rng_for(self.seed, self._rng, ctx)
        if self.training:
            img = random_resized_crop(img, self.img_size, r,
                                      scale=(self.crop_min, 1.0))
            if r.random() < 0.5:
                img = img[:, ::-1]
            if self.rotate_deg:
                img = rotate(img, r.uniform(-self.rotate_deg,
                                            self.rotate_deg))
        else:
            img = resize_shorter(img, 256) if self.maintain_ratio \
                else resize_square(img, 256)
            if self.crop:
                img = center_crop(img, self.crop, self.crop)
        return to_float_chw_free(img, self.mean, self.std)


@dataclasses.dataclass
class CanvasTransform:
    """Canvas producer for the device-fused augmentation path.

    Host does the variable-shape part: decode + maintain-ratio resize to
    ``img_size`` + crop to a fixed (crop, crop) square (random position
    in training, center in eval; crop defaults to img_size).

    With ``hflip``/``rotate_deg`` set (the STREAMING training feed), the
    host additionally runs the reference-order augmentation — HFlip ->
    rotate about the FULL resized canvas center -> RandomCrop
    (image_transform.py:58-63) — with the rotation+crop fused into one
    window gather (``rotate_crop_window``), so the emitted uint8 canvas
    is fully augmented and the device only normalizes. This closes
    PARITY.md divergence #7 for the streaming path too: previously it
    cropped here and rotated the crop on-device. Left at their defaults
    (no flip, no rotation) it is the plain crop-only canvas producer the
    store fill/eval paths use — and the explicit crop-first ablation
    (``--aug-order crop-first``).
    """

    img_size: int = 224
    crop: int = 0  # 0 => img_size
    training: bool = False
    maintain_ratio: bool = True
    rotate_deg: float = 0.0
    hflip: bool = False
    seed: Optional[int] = None

    def __post_init__(self):
        self._rng = random.Random(self.seed)
        if not self.crop:
            self.crop = self.img_size
        if self.training and self.crop > self.img_size:
            raise ValueError(f"crop ({self.crop}) > img_size "
                             f"({self.img_size}) cannot be satisfied by "
                             "the training RandomCrop")

    def __call__(self, img: np.ndarray, ctx=None) -> np.ndarray:
        r = _rng_for(self.seed, self._rng, ctx)
        s = self.img_size
        img = resize_shorter(img, s) if self.maintain_ratio else resize_square(img, s)
        if self.training and (self.hflip or self.rotate_deg):
            # reference order: flip -> rotate(full canvas) -> crop, with
            # the draw order of the torchvision stack (flip, angle,
            # top, left)
            if self.hflip and r.random() < 0.5:
                img = img[:, ::-1]
            deg = float(self.rotate_deg)
            angle = r.uniform(-deg, deg) if deg else 0.0
            h, w = img.shape[:2]
            if self.crop > h or self.crop > w:
                raise ValueError(f"CanvasTransform: crop {self.crop} > "
                                 f"canvas ({h}, {w})")
            top = r.randint(0, h - self.crop) if h > self.crop else 0
            left = r.randint(0, w - self.crop) if w > self.crop else 0
            if angle:
                img = rotate_crop_window(img, angle, top, left,
                                         self.crop, self.crop)
            else:
                img = img[top:top + self.crop, left:left + self.crop]
        elif self.training:
            img = random_crop(img, self.crop, self.crop, r)
        else:
            img = center_crop(img, self.crop, self.crop)
        return np.ascontiguousarray(img)
