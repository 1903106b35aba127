"""Alt fusion A: ViT + CNN cross-attention (reference model/crossvit.py).

Single-image fusion: ViT-S tokens (small stream, 384) and a resnet
feature-map token grid (large stream, 512 at 7x7 — crossvit.py:176,216)
are fused by projecting the ViT CLS into the large dim (``f_sl``), running
one 1-query cross-attention over the CNN tokens, projecting back
(``g_ls``) and classifying with LayerNorm+Linear(384, 3)
(crossvit.py:95-104, :201-204, :232-244).

NOTE: the reference file is dead code that cannot even be instantiated —
``CrossAttention(large_dim, heads=..., dim_head=...)`` (crossvit.py:63)
passes kwargs that ``module.CrossAttention`` does not accept (module.py:
108 takes ``num_heads``), raising TypeError. We implement the evident
intent: a 1-query cross-attention with inner dim = heads*dim_head
(the module.py:36 ``Attention`` convention: fused in-projection without
bias, out-projection back to the stream dim).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import resnet as resnet_mod
from mfvit_tpu.nn import vit as vit_mod
from mfvit_tpu.nn.layers import layernorm, layernorm_init, linear, linear_init
from mfvit_tpu.ops.attention import cross_attention_1q

Params = Dict[str, Any]


def init(key, *, small_dim: int = 384, large_dim: int = 512, heads: int = 3,
         dim_head: int = 64, cross_attn_depth: int = 1,
         multi_scale_enc_depth: int = 1, num_classes: int = 3) -> Params:
    keys = jax.random.split(key, multi_scale_enc_depth + 2)
    inner = heads * dim_head
    encoders = []
    for e in range(multi_scale_enc_depth):
        lkeys = jax.random.split(keys[e], cross_attn_depth)
        layers = []
        for lk in lkeys:
            k1, k2, k3, k4, k5 = jax.random.split(lk, 5)
            layers.append({
                "f_sl": linear_init(k1, small_dim, large_dim),
                "g_ls": linear_init(k2, large_dim, small_dim),
                "norm": layernorm_init(large_dim),       # the PreNorm LN
                "to_qkv": linear_init(k3, large_dim, inner * 3, bias=False),
                "to_out": linear_init(k4, inner, large_dim),
            })
        encoders.append({"layers": layers})
    k_ln, k_head = jax.random.split(keys[-1])
    return {
        "encoders": encoders,
        "head_norm": layernorm_init(small_dim),
        "head": linear_init(k_head, small_dim, num_classes),
    }


def _ca_1q(layer: Params, x: jnp.ndarray, heads: int, dim_head: int):
    """PreNorm + 1-query cross-attention with inner projection dim."""
    B, N, C = x.shape
    xn = layernorm(layer["norm"], x, eps=1e-5)
    qkv = linear(layer["to_qkv"], xn)  # (B, N, 3*inner)
    inner = heads * dim_head
    q = qkv[:, 0:1, :inner]
    k = qkv[:, :, inner:2 * inner]
    v = qkv[:, :, 2 * inner:]
    def heads_split(t):
        return t.reshape(B, t.shape[1], heads, dim_head).transpose(0, 2, 1, 3)
    o = cross_attention_1q(heads_split(q), heads_split(k), heads_split(v),
                           scale=dim_head ** -0.5)
    o = o.transpose(0, 2, 1, 3).reshape(B, 1, inner)
    return linear(layer["to_out"], o)


def apply(params: Params, vit_tokens: jnp.ndarray,
          cnn_featmap: jnp.ndarray, *, heads: int = 3,
          dim_head: int = 64) -> jnp.ndarray:
    """vit_tokens (B, 197, 384), cnn_featmap (B, h, w, 512) ->
    logits (B, num_classes).

    Preserved reference quirk: layers do NOT chain. The reference forward
    (crossvit.py:78-105) never re-assigns ``xs`` inside the loop (the
    ``xs = torch.cat(...)`` update is commented out at :103) and returns
    only the last iteration's ``cal_out``, so with ``cross_attn_depth > 1``
    every layer re-reads the ORIGINAL ViT CLS and all but the last layer
    are dead compute — exactly as here (pinned by
    tests/test_alt_fusion.py::test_depth2_only_last_layer_reaches_output).
    """
    B, h, w, C = cnn_featmap.shape
    xl = cnn_featmap.reshape(B, h * w, C)  # 'b c h w -> b (h w) c' NHWC-nat.
    cal_out = None
    for enc in params["encoders"]:
        for layer in enc["layers"]:
            cls_small = vit_tokens[:, 0:1]
            cal_q = linear(layer["f_sl"], cls_small)       # (B, 1, large)
            cal_qkv = jnp.concatenate([cal_q, xl], axis=1)
            cal = cal_q + _ca_1q(layer, cal_qkv, heads, dim_head)
            cal_out = linear(layer["g_ls"], cal)           # (B, 1, small)
    x = layernorm(params["head_norm"], cal_out[:, 0].astype(jnp.float32),
                  eps=1e-5)  # torch nn.LayerNorm default (crossvit.py:201)
    return linear(params["head"], x)


def fused_forward(vit_params: Params, cnn_params: Params, fusion_params: Params,
                  img: jnp.ndarray, vit_cfg: vit_mod.ViTConfig,
                  cnn_cfg: resnet_mod.ResNetConfig, *,
                  compute_dtype=jnp.bfloat16, attn_backend=None):
    """Full single-image forward: both backbones + fusion head
    (crossvit.py Fus_CrossViT.forward :210-244)."""
    tokens, _ = vit_mod.apply(vit_params, img, vit_cfg,
                              compute_dtype=compute_dtype,
                              attn_backend=attn_backend,
                              return_features=True)
    featmap, _ = resnet_mod.apply(cnn_params, img, cnn_cfg, training=False,
                                  compute_dtype=compute_dtype,
                                  return_featmap=True)
    return apply(fusion_params, tokens, featmap)
