"""Pure-functional NN primitives over explicit parameter pytrees.

Design: every layer is a pair of functions ``*_init(key, ...) -> params``
and an apply function ``f(params, x, ...) -> y``. Parameters live in fp32;
compute runs in a caller-chosen dtype (bf16 on TPU by default) with
numerically sensitive reductions (LayerNorm, softmax) kept in fp32.

These replace the reference's torch.nn building blocks
(/root/reference/moco_pretraining/moco/model/module.py — Residual, PreNorm,
FeedForward, Attention) with MXU-friendly matmul formulations.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import init as initzr

Params = Dict[str, Any]


# ---------------------------------------------------------------- linear

def linear_init(key, in_dim: int, out_dim: int, *, std: float = 0.02,
                dist: str = "trunc_normal", bias: bool = True) -> Params:
    if dist == "trunc_normal":
        w = initzr.trunc_normal(key, (in_dim, out_dim), std=std)
    elif dist == "xavier_uniform":
        w = initzr.xavier_uniform(key, (in_dim, out_dim))
    elif dist == "normal":
        w = initzr.normal(key, (in_dim, out_dim), std=std)
    elif dist == "zeros":
        w = initzr.zeros((in_dim, out_dim))
    else:
        raise ValueError(f"unknown init dist {dist!r}")
    p: Params = {"w": w}
    if bias:
        p["b"] = initzr.zeros((out_dim,))
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "wq" in p:  # int8-quantized serving params (ops/quant.py)
        from mfvit_tpu.ops.quant import quantized_linear
        return quantized_linear(p["wq"], x, p.get("b"))
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ------------------------------------------------------------- layernorm

def layernorm_init(dim: int) -> Params:
    return {"scale": initzr.ones((dim,)), "bias": initzr.zeros((dim,))}


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm with fp32 statistics regardless of compute dtype.

    eps=1e-6 matches both timm ViT blocks and the reference fusion model's
    explicit ``nn.LayerNorm(dim, eps=1e-6)`` (crossvit_..._sum.py:28-33).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


# ------------------------------------------------------------------ mlp

def mlp_init(key, dim: int, hidden: int, *, std: float = 0.02) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim, hidden, std=std),
        "fc2": linear_init(k2, hidden, dim, std=std),
    }


def mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Linear -> GELU -> Linear (timm ViT MLP; also the reference
    FeedForward module.py:23 minus dropout, which is 0 in all configs)."""
    h = linear(p["fc1"], x)
    h = jax.nn.gelu(h, approximate=False)
    return linear(p["fc2"], h)


# ------------------------------------------------------- batchnorm (1d)

def batchnorm_init(dim: int, affine: bool = True) -> Params:
    """BatchNorm1d state for the MoCo projector/predictor MLPs
    (builder_vit_mocov3structure_mocov2loss.py:215-226 uses
    Linear-BN-ReLU stacks). ``affine=False`` mirrors
    ``nn.BatchNorm1d(dim, affine=False)`` (":76 removed gamma"): no
    trainable scale/bias leaves at all."""
    p: Params = {
        "mean": initzr.zeros((dim,)),
        "var": initzr.ones((dim,)),
    }
    if affine:
        p["scale"] = initzr.ones((dim,))
        p["bias"] = initzr.zeros((dim,))
    return p


def batchnorm(p: Params, x: jnp.ndarray, *, training: bool,
              momentum: float = 0.9, eps: float = 1e-5,
              axis_name: str | None = None):
    """Functional BatchNorm1d over the batch axis.

    In training mode returns (y, new_state) where new_state carries updated
    running statistics; batch statistics are synchronized across the data
    mesh axis via pmean when ``axis_name`` is given (TPU-native replacement
    for the reference's SyncBatchNorm + BN batch-shuffle — SURVEY §2.6).
    """
    xf = x.astype(jnp.float32)
    if training:
        ex = jnp.mean(xf, axis=0)
        ex2 = jnp.mean(jnp.square(xf), axis=0)
        if axis_name is not None:
            ex = jax.lax.pmean(ex, axis_name)
            ex2 = jax.lax.pmean(ex2, axis_name)
        mean = ex
        var = ex2 - jnp.square(ex)
        # torch semantics: normalize the batch with the BIASED variance but
        # update running_var with the UNBIASED (n/(n-1)) estimator
        n = x.shape[0]
        if axis_name is not None:
            n = n * jax.lax.axis_size(axis_name)
        var_unb = var * (n / max(n - 1, 1))
        new_state = dict(
            p,
            mean=momentum * p["mean"] + (1 - momentum) * mean,
            var=momentum * p["var"] + (1 - momentum) * var_unb,
        )
    else:
        mean, var = p["mean"], p["var"]
        new_state = p
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in p:
        y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_state
