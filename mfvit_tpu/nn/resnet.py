"""Functional ResNet backbones (NHWC, pure pytrees).

The reference uses torchvision resnets as the non-ViT arms of every MoCo
builder (builder.py:32-48, builder_vit_mocov3structure_mocov2loss.py:31-48
— ``resnet18``/``resnet50`` selected by ``-a``), optionally with a
4-channel input conv (builder_4ch.py:36-41), and as the CNN branch of the
ViT+CNN cross-attention fusion (model/crossvit.py:176: ``children()[:-2]``
feature extractor -> (B, 512, 7, 7) map). This module provides TPU-native
equivalents: NHWC layout, ``lax.conv_general_dilated`` on the MXU,
functional BatchNorm with explicit running-stat state and optional
cross-mesh ``pmean`` sync (the SyncBatchNorm stand-in, SURVEY §2.6).

API: ``init(key, cfg, num_classes)``; ``apply(params, x, cfg, training=...)
-> (out, new_params)`` where ``new_params`` carries updated BN stats.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import init as initzr

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    name: str = "resnet18"
    block: str = "basic"              # basic | bottleneck
    layers: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    in_chans: int = 3

    @property
    def expansion(self) -> int:
        return 1 if self.block == "basic" else 4

    @property
    def out_dim(self) -> int:
        return self.width * 8 * self.expansion


CONFIGS = {
    "resnet18": ResNetConfig("resnet18", "basic", (2, 2, 2, 2)),
    "resnet34": ResNetConfig("resnet34", "basic", (3, 4, 6, 3)),
    "resnet50": ResNetConfig("resnet50", "bottleneck", (3, 4, 6, 3)),
}


def get_config(name: str, in_chans: int = 3) -> ResNetConfig:
    cfg = CONFIGS[name]
    if in_chans != 3:
        cfg = dataclasses.replace(cfg, in_chans=in_chans)
    return cfg


# ------------------------------------------------------------- primitives

def _conv_init(key, kh, kw, cin, cout) -> Params:
    # He/Kaiming fan-out normal, torchvision's conv init
    std = (2.0 / (kh * kw * cout)) ** 0.5
    return {"w": std * jax.random.normal(key, (kh, kw, cin, cout))}


def _conv(p: Params, x: jnp.ndarray, stride: int = 1,
          padding: str | int | None = None) -> jnp.ndarray:
    if padding is None:
        # torch semantics: symmetric (k-1)//2 both sides (XLA's SAME pads
        # asymmetrically for stride 2, which shifts the grid by one pixel)
        padding = (p["w"].shape[0] - 1) // 2
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _bn_init(dim: int, zero_scale: bool = False) -> Params:
    return {"scale": (initzr.zeros if zero_scale else initzr.ones)((dim,)),
            "bias": initzr.zeros((dim,)),
            "mean": initzr.zeros((dim,)), "var": initzr.ones((dim,))}


def _bn(p: Params, x: jnp.ndarray, *, training: bool,
        momentum: float = 0.9, eps: float = 1e-5,
        axis_name: Optional[str] = None) -> Tuple[jnp.ndarray, Params]:
    xf = x.astype(jnp.float32)
    red = tuple(range(x.ndim - 1))
    if training:
        ex = jnp.mean(xf, red)
        ex2 = jnp.mean(jnp.square(xf), red)
        if axis_name is not None:
            ex = jax.lax.pmean(ex, axis_name)
            ex2 = jax.lax.pmean(ex2, axis_name)
        var = ex2 - jnp.square(ex)
        # unbiased running-var update (torch parity); the BATCH is
        # normalized with the biased variance, as torch does
        n = 1
        for d in x.shape[:-1]:
            n *= d
        if axis_name is not None:
            n = n * jax.lax.axis_size(axis_name)
        var_unb = var * (n / max(n - 1, 1))
        newp = dict(p, mean=momentum * p["mean"] + (1 - momentum) * ex,
                    var=momentum * p["var"] + (1 - momentum) * var_unb)
        mean = ex
    else:
        mean, var, newp = p["mean"], p["var"], p
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype), newp


# ------------------------------------------------------------------ init

def init(key, cfg: ResNetConfig, num_classes: int = 0,
         zero_init_residual: bool = False) -> Params:
    keys = iter(jax.random.split(key, 256))
    p: Params = {
        "stem": {"conv": _conv_init(next(keys), 7, 7, cfg.in_chans, cfg.width),
                 "bn": _bn_init(cfg.width)},
        "stages": [],
    }
    cin = cfg.width
    for stage, nblocks in enumerate(cfg.layers):
        cout = cfg.width * (2 ** stage)
        blocks: List[Params] = []
        for b in range(nblocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            blk: Params = {}
            if cfg.block == "basic":
                blk["conv1"] = _conv_init(next(keys), 3, 3, cin, cout)
                blk["bn1"] = _bn_init(cout)
                blk["conv2"] = _conv_init(next(keys), 3, 3, cout, cout)
                blk["bn2"] = _bn_init(cout, zero_scale=zero_init_residual)
                out_c = cout
            else:
                mid = cout
                out_c = cout * 4
                blk["conv1"] = _conv_init(next(keys), 1, 1, cin, mid)
                blk["bn1"] = _bn_init(mid)
                blk["conv2"] = _conv_init(next(keys), 3, 3, mid, mid)
                blk["bn2"] = _bn_init(mid)
                blk["conv3"] = _conv_init(next(keys), 1, 1, mid, out_c)
                blk["bn3"] = _bn_init(out_c, zero_scale=zero_init_residual)
            if stride != 1 or cin != out_c:
                blk["down_conv"] = _conv_init(next(keys), 1, 1, cin, out_c)
                blk["down_bn"] = _bn_init(out_c)
            blocks.append(blk)
            cin = out_c
        p["stages"].append(blocks)
    if num_classes > 0:
        w = initzr.normal(next(keys), (cfg.out_dim, num_classes), std=0.01)
        p["fc"] = {"w": w, "b": initzr.zeros((num_classes,))}
    return p


# ------------------------------------------------------------------ apply

def apply(params: Params, x: jnp.ndarray, cfg: ResNetConfig, *,
          training: bool = False, compute_dtype=jnp.bfloat16,
          axis_name: Optional[str] = None, return_featmap: bool = False,
          remat: bool = False):
    """Forward. Returns ``(out, new_params)``: out is logits (with fc) /
    pooled features, or the (B, H/32, W/32, C) feature map with
    ``return_featmap`` (the crossvit.py CNN-branch contract).

    ``remat=True`` wraps every residual block in ``jax.checkpoint`` —
    the backward recomputes each block's forward instead of holding its
    activations, the same HBM lever the ViT path exposes (identical
    gradients; tests/test_moco.py::test_remat_resnet_moco_step_matches)."""
    new = {"stages": []}
    x = x.astype(compute_dtype)
    x = _conv(params["stem"]["conv"], x, stride=2, padding=3)
    x, nbn = _bn(params["stem"]["bn"], x, training=training,
                 axis_name=axis_name)
    new["stem"] = {"conv": params["stem"]["conv"], "bn": nbn}
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])

    def run_block(x, blk, stride):
        nblk = dict(blk)
        identity = x
        if cfg.block == "basic":
            h = _conv(blk["conv1"], x, stride)
            h, nblk["bn1"] = _bn(blk["bn1"], h, training=training,
                                 axis_name=axis_name)
            h = jax.nn.relu(h)
            h = _conv(blk["conv2"], h)
            h, nblk["bn2"] = _bn(blk["bn2"], h, training=training,
                                 axis_name=axis_name)
        else:
            h = _conv(blk["conv1"], x)
            h, nblk["bn1"] = _bn(blk["bn1"], h, training=training,
                                 axis_name=axis_name)
            h = jax.nn.relu(h)
            h = _conv(blk["conv2"], h, stride)
            h, nblk["bn2"] = _bn(blk["bn2"], h, training=training,
                                 axis_name=axis_name)
            h = jax.nn.relu(h)
            h = _conv(blk["conv3"], h)
            h, nblk["bn3"] = _bn(blk["bn3"], h, training=training,
                                 axis_name=axis_name)
        if "down_conv" in blk:
            identity = _conv(blk["down_conv"], x, stride)
            identity, nblk["down_bn"] = _bn(
                blk["down_bn"], identity, training=training,
                axis_name=axis_name)
        return jax.nn.relu(h + identity), nblk

    block_fn = (jax.checkpoint(run_block, static_argnums=(2,))
                if remat else run_block)
    for si, stage in enumerate(params["stages"]):
        nstage = []
        for bi, blk in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            x, nblk = block_fn(x, blk, stride)
            nstage.append(nblk)
        new["stages"].append(nstage)

    if "fc" in params:
        new["fc"] = params["fc"]
    if return_featmap:
        return x, new
    feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    if "fc" in params:
        out = feat @ params["fc"]["w"] + params["fc"]["b"]
    else:
        out = feat
    return out, new
