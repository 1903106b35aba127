"""Int8 quantized inference path (W8A8, dynamic activation scales).

Serving-mode optimization for the MF-ViT CA inference benchmark: the v5e
MXU runs int8 x int8 -> int32 at twice the bf16 rate. Weights are
per-output-channel symmetric int8 (quantized once, offline); activations
are quantized per row (token) on the fly. LayerNorm, softmax, attention
and the classifier head stay in bf16/fp32 — accuracy loss is the usual
sub-1% of W8A8 ViT inference, and the default (parity) path is untouched.

No reference counterpart (the reference has no serving path at all); this
is the TPU-native answer to BASELINE.json's throughput target.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_weight(w: jnp.ndarray) -> Params:
    """fp32 (in, out) -> int8 weights + per-output-channel fp32 scales."""
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def quantized_linear(qp: Params, x: jnp.ndarray,
                     bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """W8A8 linear: dynamic per-row activation quant, int32 accumulation.

    x: (..., in) bf16/fp32 -> (..., out) in x.dtype.
    """
    xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127
                  ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qp["q"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * qp["s"]
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def quantize_linear_params(p: Params) -> Params:
    out: Params = {"wq": quantize_weight(p["w"].astype(jnp.float32))}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_vit_params(params: Params) -> Params:
    """Quantize a ViT param pytree's hot linears (qkv/proj/fc1/fc2 and the
    patch embedding). LN/cls/pos/head stay full precision."""
    q: Params = {
        # conv-stem patch embeds (vit_conv_*) stay full precision; only a
        # matmul patch embed is quantized
        "patch": (params["patch"] if "stem" in params["patch"]
                  else quantize_linear_params(params["patch"])),
        "cls": params["cls"],
        "norm": params["norm"],
        "blocks": [],
    }
    if "pos" in params:
        q["pos"] = params["pos"]
    for blk in params["blocks"]:
        q["blocks"].append({
            "norm1": blk["norm1"],
            "qkv": quantize_linear_params(blk["qkv"]),
            "proj": quantize_linear_params(blk["proj"]),
            "norm2": blk["norm2"],
            "mlp": {
                "fc1": quantize_linear_params(blk["mlp"]["fc1"]),
                "fc2": quantize_linear_params(blk["mlp"]["fc2"]),
            },
        })
    if "head" in params:
        q["head"] = params["head"]  # fp32 logits head stays exact
    return q
