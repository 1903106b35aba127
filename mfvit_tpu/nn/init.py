"""Parameter initializers.

Replicates the init distributions the reference relies on (timm
``trunc_normal_`` std=0.02 — reference fusion model
/root/reference/moco_pretraining/moco/model/crossvit_..._sum.py:115-124 —
and MoCo-v3 ViT's xavier-uniform qkv/patch-embed init) as pure JAX
functions over explicit PRNG keys.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std: float = 0.02, dtype=jnp.float32):
    """Truncated normal on [-2*std, 2*std], matching timm's trunc_normal_."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """Glorot/Xavier uniform for 2-D weight matrices (in_dim, out_dim)."""
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal(key, shape, std: float = 0.01, dtype=jnp.float32):
    """Plain normal; the reference initializes classifier heads with
    ``weight.data.normal_(mean=0, std=0.01)`` (finetune main :290-296)."""
    return std * jax.random.normal(key, shape, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
