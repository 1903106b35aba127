"""MF-ViT CA — cross-attention fusion of two ViT token streams.

Reimplements the reference's ``Fus_CrossViT`` + ``MultiScaleTransformerEncoder``
(/root/reference/moco_pretraining/moco/model/
crossvit_2vits_2additionaloutputs_changenormlayer_location_removeextralclayer_
changemodelinputlocation_std002_sum.py — "the fusion model") with the same
math, replicated quirks included:

- Per cross-attn layer and per direction: PreNorm(LayerNorm eps=1e-5) ->
  CrossAttention (wq/wk/wv bias-free, heads=3 so head_dim=128, out proj with
  bias), where the query is the *other-normed* CLS token only; the residual
  adds the UN-normed CLS (fusion model :50-63 ``cal_out = cal_q + cross_attn(
  cal_qkv)``); then the [fused-CLS, own-patches] sequence passes a
  LayerNorm(eps=1e-6) (fusion model :28,:33).
- With ``multi_scale_enc_depth > 1`` every encoder is applied to the ORIGINAL
  token streams and only the last output is kept (fusion model :137-138) —
  replicated for checkpoint parity; default depth is 1.
- Outer residual fuse ``cxr_fus = cxr_ftrs + cxr_ca`` (:141-142), CLS pool,
  bare Linear(384, 3) heads, stacked and summed (:144-155).
- Init: trunc_normal(std=0.02) on all Linear weights, zero bias (:115-124).

TPU-native difference (documented, fp32-equivalent): each ViT branch is run
ONCE returning (tokens, logits) — the reference runs ``features3D`` and the
full classifier as two separate forwards per branch (:128-135, see SURVEY
§3.4) — and the whole fused forward is one jitted graph.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import vit as vit_mod
from mfvit_tpu.nn.layers import layernorm, layernorm_init, linear, linear_init
from mfvit_tpu.ops.attention import cross_attention_1q

Params = Dict[str, Any]


def _ca_init(key, dim: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "norm": layernorm_init(dim),  # the PreNorm LN (eps=1e-5)
        "wq": linear_init(ks[0], dim, dim, bias=False),
        "wk": linear_init(ks[1], dim, dim, bias=False),
        "wv": linear_init(ks[2], dim, dim, bias=False),
        "proj": linear_init(ks[3], dim, dim),
    }


def init(key, num_classes: int = 3, dim: int = 384, heads: int = 3,
         cross_attn_depth: int = 1, multi_scale_enc_depth: int = 1) -> Params:
    keys = jax.random.split(key, multi_scale_enc_depth + 2)
    encoders = []
    for e in range(multi_scale_enc_depth):
        lkeys = jax.random.split(keys[e], cross_attn_depth)
        layers = []
        for l in range(cross_attn_depth):
            k1, k2 = jax.random.split(lkeys[l])
            layers.append({
                # 'l' direction: Enh-CLS attends over CXR patches;
                # 's' direction: CXR-CLS attends over Enh patches.
                "ca_l": _ca_init(k1, dim),
                "ln_l": layernorm_init(dim),
                "ca_s": _ca_init(k2, dim),
                "ln_s": layernorm_init(dim),
            })
        encoders.append({"layers": layers})
    return {
        "encoders": encoders,
        "head_cxr": linear_init(keys[-2], dim, num_classes),
        "head_enh": linear_init(keys[-1], dim, num_classes),
    }


def _cross_attn_block(p: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """PreNorm + 1-query CrossAttention. x: (B, N, C) with the query CLS at
    position 0. Returns (B, 1, C)."""
    B, N, C = x.shape
    d = C // heads
    xn = layernorm(p["norm"], x, eps=1e-5)
    q = linear(p["wq"], xn[:, 0:1]).reshape(B, 1, heads, d).transpose(0, 2, 1, 3)
    k = linear(p["wk"], xn).reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    v = linear(p["wv"], xn).reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    o = cross_attention_1q(q, k, v, scale=d ** -0.5)
    o = o.transpose(0, 2, 1, 3).reshape(B, 1, C)
    return linear(p["proj"], o)


def encode(params: Params, cxr_tokens: jnp.ndarray, enh_tokens: jnp.ndarray,
           heads: int = 3):
    """Run the multi-scale cross-attention encoder stack.

    Returns (cxr_ca, enh_ca) full token sequences (B, N, C).
    """
    cxr_ca = enh_ca = None
    for enc in params["encoders"]:
        xs, xl = cxr_tokens, enh_tokens  # each encoder sees the originals
        for lay in enc["layers"]:
            s_cls, s_patch = xs[:, 0:1], xs[:, 1:]
            l_cls, l_patch = xl[:, 0:1], xl[:, 1:]
            # Enh CLS over CXR patches
            cal = l_cls + _cross_attn_block(
                lay["ca_l"], jnp.concatenate([l_cls, s_patch], axis=1), heads)
            xl_new = layernorm(lay["ln_l"],
                               jnp.concatenate([cal, l_patch], axis=1), eps=1e-6)
            # CXR CLS over Enh patches (uses pre-update l_patch, as reference)
            cal = s_cls + _cross_attn_block(
                lay["ca_s"], jnp.concatenate([s_cls, l_patch], axis=1), heads)
            xs_new = layernorm(lay["ln_s"],
                               jnp.concatenate([cal, s_patch], axis=1), eps=1e-6)
            xs, xl = xs_new, xl_new
        cxr_ca, enh_ca = xs, xl
    return cxr_ca, enh_ca


def apply(params: Params, cxr_tokens: jnp.ndarray, enh_tokens: jnp.ndarray,
          heads: int = 3, attn_backend: str | None = None) -> jnp.ndarray:
    """Fusion head: tokens -> summed dual-head logits (B, num_classes) fp32.

    On TPU with the reference default config (depth-1 encoder, lane-aligned
    head_dim) the whole head runs as ONE Pallas kernel emitting just the two
    fused CLS rows — the only rows ``apply`` consumes (fusion model
    :141-155); the XLA path below materializes full fused sequences and is
    kept for general configs and as the parity reference."""
    from mfvit_tpu.ops import attention as attn_ops
    from mfvit_tpu.ops import fused_fusion as ff

    backend = attn_ops._resolve(attn_backend)
    encs = params["encoders"]
    dim = cxr_tokens.shape[-1]
    if (backend in ("pallas", "pallas_interpret")
            and ff.supported(len(encs[-1]["layers"]), len(encs), heads, dim)
            and (cxr_tokens.shape[0] % 8 == 0
                 or backend == "pallas_interpret")):
        flat = ff._flatten_layer(encs[-1]["layers"][0])
        cxr_cls, enh_cls = ff.fused_fusion_cls(
            cxr_tokens, enh_tokens, flat, heads,
            backend == "pallas_interpret")
        return (linear(params["head_cxr"], cxr_cls)
                + linear(params["head_enh"], enh_cls))
    cxr_ca, enh_ca = encode(params, cxr_tokens, enh_tokens, heads)
    cxr_fus = cxr_tokens + cxr_ca
    enh_fus = enh_tokens + enh_ca
    cxr_cls = cxr_fus[:, 0].astype(jnp.float32)
    enh_cls = enh_fus[:, 0].astype(jnp.float32)
    return linear(params["head_cxr"], cxr_cls) + linear(params["head_enh"], enh_cls)


def fused_forward(vit_params_cxr: Params, vit_params_enh: Params,
                  fusion_params: Params, img_cxr: jnp.ndarray,
                  img_enh: jnp.ndarray, cfg: vit_mod.ViTConfig, *,
                  heads: int = 3, compute_dtype=jnp.bfloat16,
                  attn_backend: str | None = None, remat: bool = False):
    """The full MF-ViT CA forward: one pass per ViT branch producing both
    tokens and branch logits, then cross-attention fusion.

    Returns (fused_logits, logits_cxr, logits_enh) — the training/eval
    decision logits are their sum (reference fusion main :862-870).
    """
    cxr_tokens, logits_cxr = vit_mod.apply(
        vit_params_cxr, img_cxr, cfg, compute_dtype=compute_dtype,
        attn_backend=attn_backend, return_features=True, remat=remat)
    enh_tokens, logits_enh = vit_mod.apply(
        vit_params_enh, img_enh, cfg, compute_dtype=compute_dtype,
        attn_backend=attn_backend, return_features=True, remat=remat)
    fused = apply(fusion_params, cxr_tokens, enh_tokens, heads,
                  attn_backend=attn_backend)
    return fused, logits_cxr, logits_enh
