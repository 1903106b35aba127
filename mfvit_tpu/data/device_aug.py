"""Device-fused batched augmentation (the TPU half of host+device preprocessing).

One jitted function takes a uint8 NHWC canvas batch straight from the host
loader and performs random horizontal flip, random small-angle rotation
(nearest-neighbor sampling, zero fill — matching torchvision
RandomRotation defaults used by the reference, image_transform.py:31) and
per-flavor normalization, entirely on-device in a single fused XLA program.
This replaces the reference's per-sample host-side torchvision stack
(aihc_utils/image_transform.py:21-84) for the training hot path; the exact
host PIL stack remains available for parity (host_transforms.ChexpertTransform).

All shapes are static; randomness comes from explicit jax.random keys
(replacing the reference's global ``random``/``torch.rand`` state)."""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from mfvit_tpu.data.constants import norm_stats


def _rotated_window_gather(imgs: jnp.ndarray, angles_rad: jnp.ndarray,
                           tops: jnp.ndarray, lefts: jnp.ndarray,
                           out_h: int, out_w: int) -> jnp.ndarray:
    """THE shared rotation core: sample the (out_h, out_w) window at
    (top, left) from each image rotated about its FULL-canvas center
    (nearest sampling, zero fill). ``_rotate_nearest`` is the full-frame
    special case, ``_rotate_crop_nearest`` the fused rotate-then-crop —
    both must stay bit-identical to PIL ``Image.rotate`` (positive angle =
    counter-clockwise), so the inverse-rotation coordinate math lives only
    here (verified against PIL in tests/test_data.py).

    imgs: (B, H, W, C) float32; angles_rad/tops/lefts: (B,)."""
    B, H, W, C = imgs.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = (jnp.arange(out_h, dtype=jnp.float32)[None, :, None]
          + tops.astype(jnp.float32)[:, None, None] - cy)    # (B,out_h,1)
    xx = (jnp.arange(out_w, dtype=jnp.float32)[None, None, :]
          + lefts.astype(jnp.float32)[:, None, None] - cx)   # (B,1,out_w)
    cos = jnp.cos(angles_rad)[:, None, None]                  # (B,1,1)
    sin = jnp.sin(angles_rad)[:, None, None]
    src_x = cos * xx - sin * yy + cx                          # (B,out_h,out_w)
    src_y = sin * xx + cos * yy + cy
    ix = jnp.round(src_x).astype(jnp.int32)
    iy = jnp.round(src_y).astype(jnp.int32)
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    lin = (jnp.clip(iy, 0, H - 1) * W
           + jnp.clip(ix, 0, W - 1)).reshape(B, out_h * out_w)
    flat = imgs.reshape(B, H * W, C)
    out = jnp.take_along_axis(flat, lin[:, :, None],
                              axis=1).reshape(B, out_h, out_w, C)
    return jnp.where(valid[..., None], out, 0.0)


def _rotate_nearest(imgs: jnp.ndarray, angles_rad: jnp.ndarray) -> jnp.ndarray:
    """Per-sample full-frame rotation about the image center (PIL
    ``Image.rotate`` convention): the zero-offset window gather."""
    B, H, W, _ = imgs.shape
    zeros = jnp.zeros((B,), jnp.float32)
    return _rotated_window_gather(imgs, angles_rad, zeros, zeros, H, W)


@functools.partial(jax.jit, static_argnames=("crop",))
def random_crop_batch(key, canvases: jnp.ndarray, crop: int) -> jnp.ndarray:
    """Per-sample uniform random crop on-device (torchvision RandomCrop
    semantics: top ~ U[0, H-crop], left ~ U[0, W-crop] inclusive — the
    host twin is host_transforms.random_crop). Used by the HBM-resident
    canvas store, where the pre-crop canvases never leave the device."""
    B, H, W, C = canvases.shape
    if crop > H or crop > W:
        raise ValueError(f"random_crop_batch: crop {crop} > canvas "
                         f"({H}, {W})")
    ky, kx = jax.random.split(key)
    tops = jax.random.randint(ky, (B,), 0, H - crop + 1)
    lefts = jax.random.randint(kx, (B,), 0, W - crop + 1)

    def one(img, t, left):
        return jax.lax.dynamic_slice(img, (t, left, 0), (crop, crop, C))

    return jax.vmap(one)(canvases, tops, lefts)


def _rotate_crop_nearest(imgs: jnp.ndarray, angles_rad: jnp.ndarray,
                         tops: jnp.ndarray, lefts: jnp.ndarray,
                         crop: int) -> jnp.ndarray:
    """Fused 'rotate the FULL canvas about its center (zero fill), then
    crop a (crop, crop) window at (top, left)' — evaluated by sampling
    only the window's source coordinates, so it costs the same gather as
    crop-then-rotate while reproducing the reference's rotate-then-crop
    semantics exactly (image_transform.py:58-63; PARITY.md divergence #7)."""
    return _rotated_window_gather(imgs, angles_rad, tops, lefts, crop, crop)


def _to_unit_flipped(key, canvases: jnp.ndarray, hflip: bool) -> jnp.ndarray:
    """uint8 -> [0,1] float32 with per-sample random horizontal flip."""
    x = canvases.astype(jnp.float32) / 255.0
    if hflip:
        flip = jax.random.bernoulli(key, 0.5, (x.shape[0],))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    return x


def _normalize(x: jnp.ndarray, img_type: str, out_dtype) -> jnp.ndarray:
    """Per-flavor mean/std normalization (image_transform.py constants)."""
    mean, std = norm_stats(img_type)
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("crop", "img_type", "rotate_deg", "hflip", "out_dtype"),
)
def augment_train_canvas(key, canvases: jnp.ndarray, *, crop: int,
                         img_type: str = "data", rotate_deg: float = 10.0,
                         hflip: bool = True,
                         out_dtype=jnp.float32) -> jnp.ndarray:
    """REFERENCE-ORDER training augmentation for device-resident full
    canvases: HFlip -> RandomRotation about the FULL canvas center ->
    RandomCrop -> normalize (image_transform.py:58-63). Used by the
    device-store paths, where the pre-crop canvas lives in HBM (the
    streaming feed runs the same order on the HOST —
    host_transforms.rotate_crop_window — so every training path follows
    the reference order; PARITY.md divergence #7 is closed everywhere).
    The rotation+crop pair fuses into a single gather
    (_rotate_crop_nearest): matching the reference order costs nothing."""
    B, H, W, C = canvases.shape
    if crop > H or crop > W:
        raise ValueError(f"augment_train_canvas: crop {crop} > canvas "
                         f"({H}, {W})")
    kf, kr, ky, kx = jax.random.split(key, 4)
    x = _to_unit_flipped(kf, canvases, hflip)
    tops = jax.random.randint(ky, (B,), 0, H - crop + 1)
    lefts = jax.random.randint(kx, (B,), 0, W - crop + 1)
    if rotate_deg:
        deg = jax.random.uniform(kr, (B,), minval=-rotate_deg,
                                 maxval=rotate_deg)
        x = _rotate_crop_nearest(x, jnp.deg2rad(deg), tops, lefts, crop)
    else:

        def one(img, t, left):
            return jax.lax.dynamic_slice(img, (t, left, 0), (crop, crop, C))

        x = jax.vmap(one)(x, tops, lefts)
    return _normalize(x, img_type, out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("crop", "img_type", "rotate_deg", "hflip", "out_dtype"),
)
def augment_two_views_canvas(key, canvases: jnp.ndarray, *, crop: int,
                             img_type: str = "data",
                             rotate_deg: float = 10.0, hflip: bool = True,
                             out_dtype=jnp.float32):
    """Two independent reference-order views from ONE device-resident
    canvas (TwoCropsTransform over the full stack, loader.py:13-22):
    each view draws its own flip, rotation AND crop window."""
    kq, kk = jax.random.split(key)
    q = augment_train_canvas(kq, canvases, crop=crop, img_type=img_type,
                             rotate_deg=rotate_deg, hflip=hflip,
                             out_dtype=out_dtype)
    k = augment_train_canvas(kk, canvases, crop=crop, img_type=img_type,
                             rotate_deg=rotate_deg, hflip=hflip,
                             out_dtype=out_dtype)
    return q, k


@functools.partial(
    jax.jit,
    static_argnames=("img_type", "training", "rotate_deg", "hflip", "out_dtype"),
)
def augment_batch(key, canvases: jnp.ndarray, *, img_type: str = "data",
                  training: bool = True, rotate_deg: float = 10.0,
                  hflip: bool = True, out_dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (B, S, S, C) canvases -> augmented normalized (B, S, S, C).

    Train: random hflip (p=.5) + random rotation U(-rotate_deg, rotate_deg)
    + normalize. Eval: normalize only.
    """
    if training:
        kf, kr = jax.random.split(key)
        x = _to_unit_flipped(kf, canvases, hflip)
        if rotate_deg:
            deg = jax.random.uniform(kr, (x.shape[0],), minval=-rotate_deg,
                                     maxval=rotate_deg)
            x = _rotate_nearest(x, jnp.deg2rad(deg))
    else:
        x = canvases.astype(jnp.float32) / 255.0
    return _normalize(x, img_type, out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("img_type", "rotate_deg", "hflip", "out_dtype"),
)
def augment_two_views(key, canvases: jnp.ndarray,
                      canvases_k: jnp.ndarray = None, *,
                      img_type: str = "data",
                      rotate_deg: float = 10.0, hflip: bool = True,
                      out_dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MoCo q/k two-view augmentation (TwoCropsTransform, loader.py:13-22).

    The reference applies the FULL per-view stack twice — each view gets
    its own RandomCrop window (image_transform.py:58-63). The host side of
    that is the TwoCrops datasets, which emit TWO independently cropped
    canvases per sample; pass them as ``canvases``/``canvases_k`` so q and
    k differ in crop as well as in the flip/rotation drawn here. With
    ``canvases_k`` omitted both views share one crop window (legacy
    shared-crop behavior, kept for ablation)."""
    kq, kk = jax.random.split(key)
    ck = canvases if canvases_k is None else canvases_k
    q = augment_batch(kq, canvases, img_type=img_type, training=True,
                      rotate_deg=rotate_deg, hflip=hflip, out_dtype=out_dtype)
    k = augment_batch(kk, ck, img_type=img_type, training=True,
                      rotate_deg=rotate_deg, hflip=hflip, out_dtype=out_dtype)
    return q, k
