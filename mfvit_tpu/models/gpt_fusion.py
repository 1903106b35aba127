"""Alt fusion B: TransFuser-style GPT fusion (reference model/fuseattention.py).

Concatenate both streams' tokens into one joint sequence and run an
n-layer GPT over it: learnable zero-init joint positional embedding
(fuseattention.py:101-104), blocks = LN -> biased-QKV self-attention ->
LN -> MLP(ReLU) (:21-82), final LayerNorm (:117), split back (:209-210),
residual add onto the input features (:308-309), CLS (ViT) or
relu+avgpool (resnet) stream summaries, concat + SUM fuse (:323-327).
``TransFuser`` = Encoder + a single Linear head (:330-369).

Config mirrors ``config/config.py``'s GlobalConfig GPT fields (n_embd=384,
n_layer=8, n_head=4, block_exp=3, 14x14 anchors for ViT; the res18 twin is
512/7x7 — config_res18.py:31-43). The CARLA driving fields the reference
carries (PID controller etc., config.py:44-59) are vestigial and dropped.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import init as initzr
from mfvit_tpu.nn.layers import layernorm, layernorm_init, linear, linear_init

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class GPTFusionConfig:
    """The GPT-relevant slice of the reference GlobalConfig
    (config/config.py:31-43 'vit' preset; config_res18.py for 'res')."""
    arch: str = "vit"        # 'vit' | 'res'
    n_embd: int = 384        # 512 for res18
    n_head: int = 4
    block_exp: int = 3
    n_layer: int = 8
    vert_anchors: int = 14   # 7 for res18
    horz_anchors: int = 14
    seq_len: int = 1
    n_views: int = 1
    use_pos_embed: bool = True

    @property
    def joint_len(self) -> int:
        base = (self.n_views + 1) * self.seq_len * \
            self.vert_anchors * self.horz_anchors
        # ViT streams carry their CLS tokens: +2 (fuseattention.py:104)
        return base + 2 if self.arch == "vit" else base


VIT_CONFIG = GPTFusionConfig()
RES18_CONFIG = GPTFusionConfig(arch="res", n_embd=512, vert_anchors=7,
                               horz_anchors=7)


def init(key, cfg: GPTFusionConfig, num_classes: int = 3) -> Params:
    keys = jax.random.split(key, cfg.n_layer + 2)
    blocks = []
    for i in range(cfg.n_layer):
        bk = jax.random.split(keys[i], 6)
        d = cfg.n_embd
        blocks.append({
            "ln1": layernorm_init(d),
            # separate biased q/k/v projections (fuseattention.py:30-33)
            "q": linear_init(bk[0], d, d, dist="normal", std=0.02),
            "k": linear_init(bk[1], d, d, dist="normal", std=0.02),
            "v": linear_init(bk[2], d, d, dist="normal", std=0.02),
            "proj": linear_init(bk[3], d, d, dist="normal", std=0.02),
            "ln2": layernorm_init(d),
            "fc1": linear_init(bk[4], d, cfg.block_exp * d,
                               dist="normal", std=0.02),
            "fc2": linear_init(bk[5], cfg.block_exp * d, d,
                               dist="normal", std=0.02),
        })
    p: Params = {
        "blocks": blocks,
        "ln_f": layernorm_init(cfg.n_embd),
        "head": linear_init(keys[-1], cfg.n_embd, num_classes,
                            dist="normal", std=0.02),
    }
    if cfg.use_pos_embed:
        p["pos_emb"] = initzr.zeros((1, cfg.joint_len, cfg.n_embd))
    return p


def _self_attention(blk: Params, x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    B, T, C = x.shape
    hd = C // n_head
    def split(t):
        return t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)
    q, k, v = split(linear(blk["q"], x)), split(linear(blk["k"], x)), \
        split(linear(blk["v"], x))
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
    y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
    return linear(blk["proj"], y)


def gpt_apply(params: Params, joint: jnp.ndarray,
              cfg: GPTFusionConfig) -> jnp.ndarray:
    """GPT over the joint token sequence (B, L, C) -> (B, L, C)."""
    x = joint
    if "pos_emb" in params:
        x = x + params["pos_emb"].astype(x.dtype)
    for blk in params["blocks"]:
        x = x + _self_attention(blk, layernorm(blk["ln1"], x, eps=1e-5),
                                cfg.n_head)
        h = linear(blk["fc1"], layernorm(blk["ln2"], x, eps=1e-5))
        x = x + linear(blk["fc2"], jax.nn.relu(h))
    return layernorm(params["ln_f"], x, eps=1e-5)


def encode_vit(params: Params, cxr_tokens: jnp.ndarray,
               enh_tokens: jnp.ndarray, cfg: GPTFusionConfig) -> jnp.ndarray:
    """ViT-arch fusion: joint GPT over both token streams, residual add,
    CLS pool, concat+sum (fuseattention.py:188-209, :308-327)."""
    B, N, C = cxr_tokens.shape
    joint = jnp.concatenate([cxr_tokens, enh_tokens], axis=1)
    out = gpt_apply(params, joint, cfg)
    cxr_out, enh_out = out[:, :N], out[:, N:]
    cxr = cxr_tokens + cxr_out
    enh = enh_tokens + enh_out
    fused = jnp.stack([cxr[:, 0], enh[:, 0]], axis=1)  # (B, 2, C)
    return jnp.sum(fused, axis=1)


def encode_res(params: Params, cxr_map: jnp.ndarray, enh_map: jnp.ndarray,
               cfg: GPTFusionConfig) -> jnp.ndarray:
    """ResNet-arch fusion: adaptive-avgpool both maps to the anchor grid,
    GPT over the joint grid tokens, residual, relu + global pool, sum."""
    B, H, W, C = cxr_map.shape
    va, ha = cfg.vert_anchors, cfg.horz_anchors

    def pool_anchors(x):
        # adaptive average pool HxW -> va x ha (H, W divisible in practice)
        x = x.reshape(B, va, H // va, ha, W // ha, C)
        return x.mean(axis=(2, 4))

    cxr_t = pool_anchors(cxr_map).reshape(B, va * ha, C)
    enh_t = pool_anchors(enh_map).reshape(B, va * ha, C)
    out = gpt_apply(params, jnp.concatenate([cxr_t, enh_t], 1), cfg)
    cxr_out = out[:, :va * ha].reshape(B, va, ha, C)
    enh_out = out[:, va * ha:].reshape(B, va, ha, C)
    # residual add back onto the pooled grid, relu, global average
    cxr = jax.nn.relu(cxr_t.reshape(B, va, ha, C) + cxr_out).mean((1, 2))
    enh = jax.nn.relu(enh_t.reshape(B, va, ha, C) + enh_out).mean((1, 2))
    return cxr + enh


def apply(params: Params, cxr_features: jnp.ndarray,
          enh_features: jnp.ndarray, cfg: GPTFusionConfig) -> jnp.ndarray:
    """TransFuser forward -> logits (B, num_classes)."""
    if cfg.arch == "vit":
        fused = encode_vit(params, cxr_features, enh_features, cfg)
    else:
        fused = encode_res(params, cxr_features, enh_features, cfg)
    return linear(params["head"], fused.astype(jnp.float32))
