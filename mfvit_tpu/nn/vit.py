"""ViT backbone (MoCo-v3 flavor), pure-functional, TPU-first.

Reimplements the reference's external ``vits`` / ``vits_returnftrs`` modules
(imported but not vendored — /root/reference/main_covid_...vitsmall.py:39,
main_vit_covid_..._crossvit_....py:44; see SURVEY.md §2.7). Contract:

- ``vit_small``: ViT-S/16 MoCo-v3 style — 224px, 16px patches (14x14=196
  patches + CLS), width 384, depth 12, 12 heads, MLP ratio 4, fixed 2-D
  sin-cos position embedding, optional ``stop_grad_conv1``.
- ``apply(..., return_features=True)`` additionally returns all post-norm
  tokens (B, 197, 384) — the ``features3D`` the fusion model consumes
  (crossvit_..._sum.py:80-83,:128) — from the SAME forward pass, fixing the
  reference's double forward per branch (SURVEY §3.4).

TPU-native choices: NHWC image layout; the stride-16 patch conv is
expressed as reshape + one large matmul (exactly equivalent math) so it
lands on the MXU; compute dtype is caller-selected (bf16 by default) with
fp32 LayerNorm/softmax/logits.
"""
from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Any, Dict

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import init as initzr
from mfvit_tpu.nn import posembed
from mfvit_tpu.nn.layers import layernorm, layernorm_init, linear, linear_init, mlp, mlp_init
from mfvit_tpu.ops import attention as attn_ops
from mfvit_tpu.ops.attention import mhsa_from_packed
from mfvit_tpu.ops.fused_attn import (fused_attention_block,
                                      fused_attention_block_large,
                                      qblocked_supported)
from mfvit_tpu.ops.fused_attn import supported as fused_attn_supported
from mfvit_tpu.ops.fused_mlp import fused_mlp_block, fused_mlp_block_final_ln

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    name: str = "vit_small"
    img_size: int = 224
    patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    learned_pos: bool = False  # MoCo-v3 uses fixed sincos; *_ori learns it
    conv_stem: bool = False    # MoCo-v3 vit_conv_*: 4x(conv3x3 s2+BN+ReLU)+1x1
    qkv_bias: bool = True      # vit_conv_* sets qkv_bias=False

    @property
    def grid(self) -> int:
        return self.img_size // self.patch

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


# Architectures accepted by the reference mains (-a flag; finetune :51-52).
CONFIGS = {
    "vit_small": ViTConfig("vit_small", dim=384, depth=12, heads=12),
    "vit_base": ViTConfig("vit_base", dim=768, depth=12, heads=12),
    # timm-original ViT-S (6 heads, learned pos embed) — 'vit_small_ori'
    "vit_small_ori": ViTConfig("vit_small_ori", dim=384, depth=12, heads=6,
                               learned_pos=True),
    "vit_base_ori": ViTConfig("vit_base_ori", dim=768, depth=12, heads=12,
                              learned_pos=True),
    # MoCo-v3 ConvStem variants (one block dropped to offset the stem cost,
    # qkv bias off) — names accepted by the reference mains (finetune :51-52)
    "vit_conv_small": ViTConfig("vit_conv_small", dim=384, depth=11,
                                heads=12, conv_stem=True, qkv_bias=False),
    "vit_conv_base": ViTConfig("vit_conv_base", dim=768, depth=11,
                               heads=12, conv_stem=True, qkv_bias=False),
}


def get_config(name: str, img_size: int = 224) -> ViTConfig:
    cfg = CONFIGS[name]
    if img_size != cfg.img_size:
        cfg = dataclasses.replace(cfg, img_size=img_size)
    return cfg


# ------------------------------------------------------------------- init

def init(key, cfg: ViTConfig, num_classes: int = 0,
         head_init_std: float = 0.01, in_chans: int = 3) -> Params:
    """Build the fp32 parameter pytree.

    Follows MoCo-v3 ViT init: the fused qkv matrix is xavier-uniform with
    Q, K, V treated as SEPARATE matrices (vits.py: ``val = sqrt(6. /
    (shape[0]//3 + shape[1]))`` -> limit sqrt(3/dim), sqrt(2)x larger than
    naive xavier over (dim, 3*dim)); patch projection xavier-uniform; CLS
    token normal(std=1e-6); classifier head N(0, 0.01) to match the
    reference finetune head init (finetune main :290-296). ``in_chans=4``
    supports the stacked CXR+Enh input variant (builder_4ch.py:36-41).
    """
    keys = jax.random.split(key, cfg.depth + 4)
    if cfg.conv_stem:
        # ConvStem ("Early convolutions help transformers see better"):
        # 4x conv3x3/s2 (C: in->dim/8->dim/4->dim/2->dim... doubling from
        # dim//8) with BN+ReLU, then 1x1 conv to dim.
        skeys = jax.random.split(keys[0], 5)
        stem = []
        cin, cout = in_chans, cfg.dim // 8
        for l in range(4):
            std = (2.0 / (9 * cout)) ** 0.5
            stem.append({
                "conv": {"w": std * jax.random.normal(
                    skeys[l], (3, 3, cin, cout))},
                "bn": {"scale": initzr.ones((cout,)),
                       "bias": initzr.zeros((cout,)),
                       "mean": initzr.zeros((cout,)),
                       "var": initzr.ones((cout,))},
            })
            cin, cout = cout, cout * 2
        proj_std = (2.0 / cfg.dim) ** 0.5
        patch = {"stem": stem,
                 "proj": {"w": proj_std * jax.random.normal(
                     skeys[4], (1, 1, cin, cfg.dim)),
                     "b": initzr.zeros((cfg.dim,))}}
    else:
        patch_in = cfg.patch * cfg.patch * in_chans
        patch = linear_init(keys[0], patch_in, cfg.dim, dist="xavier_uniform")
    p: Params = {
        "patch": patch,
        # MoCo-v3 vits.py: nn.init.normal_(self.cls_token, std=1e-6)
        "cls": initzr.normal(keys[1], (1, 1, cfg.dim), std=1e-6),
        "norm": layernorm_init(cfg.dim),
        "blocks": [],
    }
    if cfg.learned_pos:
        p["pos"] = initzr.trunc_normal(keys[2], (1, cfg.seq_len, cfg.dim), std=0.02)
    for i in range(cfg.depth):
        bk = jax.random.split(keys[3 + i], 4)
        # qkv: xavier bound over the per-matrix fan (vits.py treats
        # Q/K/V separately): limit sqrt(6/(dim+dim))
        import math as _math
        qkv_limit = _math.sqrt(6.0 / (cfg.dim + cfg.dim))
        qkv = {"w": jax.random.uniform(bk[0], (cfg.dim, 3 * cfg.dim),
                                       jnp.float32, -qkv_limit, qkv_limit)}
        if cfg.qkv_bias:
            qkv["b"] = initzr.zeros((3 * cfg.dim,))
        p["blocks"].append({
            "norm1": layernorm_init(cfg.dim),
            "qkv": qkv,
            "proj": linear_init(bk[1], cfg.dim, cfg.dim),
            "norm2": layernorm_init(cfg.dim),
            "mlp": mlp_init(bk[2], cfg.dim, cfg.dim * cfg.mlp_ratio),
        })
    if num_classes > 0:
        p["head"] = linear_init(keys[-1], cfg.dim, num_classes,
                                dist="normal", std=head_init_std)
    return p


def head_init(key, cfg: ViTConfig, num_classes: int, std: float = 0.01) -> Params:
    """Fresh classifier head (checkpoint surgery replaces `.head` — finetune
    main :289-296)."""
    return linear_init(key, cfg.dim, num_classes, dist="normal", std=std)


# ------------------------------------------------------------------ apply

def patchify(imgs: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, patch*patch*C), row-major patch order with
    (ph, pw, c) feature order inside each patch."""
    B, H, W, C = imgs.shape
    gh, gw = H // patch, W // patch
    x = imgs.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, gh * gw, patch * patch * C)


def patch_embed(p: Params, imgs: jnp.ndarray, patch: int) -> jnp.ndarray:
    """patchify + projection as ONE two-axis dot_general over free views:
    (B, gh, patch, gw, patch*C) x (patch, patch*C, dim) -> (B, gh, gw, dim).

    Mathematically identical to ``linear(p, patchify(imgs, patch))`` but
    skips the physical patchify transpose of the ~600 MB image batch — XLA
    folds the axis shuffle into the GEMM's operand pipeline (11.7 -> 6.9
    ms per ViT-S stem at B=2048 on v5e; tools/bench_stem.py)."""
    B, H, W, C = imgs.shape
    gh, gw = H // patch, W // patch
    x5 = imgs.reshape(B, gh, patch, gw, patch * C)
    dim = p["w"].shape[1]
    w3 = p["w"].reshape(patch, patch * C, dim).astype(imgs.dtype)
    x = jax.lax.dot_general(x5, w3, (((2, 4), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    x = (x + p["b"]).astype(imgs.dtype)
    return x.reshape(B, gh * gw, dim)


def _conv_stem(p: Params, imgs: jnp.ndarray, *, training: bool = False,
               axis_name: str | None = None):
    """MoCo-v3 ConvStem forward. ``training=True`` runs BatchNorm with
    batch statistics and returns updated running stats (the reference
    trains these BNs under DDP+SyncBN during MoCo pretraining; the
    running stats are state threaded through moco's aux, like the resnet
    towers). Eval uses the stored running stats. Returns (tokens,
    new_patch_params)."""
    from mfvit_tpu.nn.resnet import _bn

    x = imgs
    new_stem = []
    for layer in p["stem"]:
        x = jax.lax.conv_general_dilated(
            x, layer["conv"]["w"].astype(x.dtype), (2, 2),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        y, new_bn = _bn(layer["bn"], x, training=training,
                        axis_name=axis_name)
        x = jax.nn.relu(y).astype(x.dtype)
        new_stem.append(dict(layer, bn=new_bn))
    x = jax.lax.conv_general_dilated(
        x, p["proj"]["w"].astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + p["proj"]["b"].astype(x.dtype)
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C), dict(p, stem=new_stem)


def apply(params: Params, imgs: jnp.ndarray, cfg: ViTConfig, *,
          compute_dtype=jnp.bfloat16, attn_backend: str | None = None,
          stop_grad_conv1: bool = False, return_features: bool = False,
          bn_training: bool = False, bn_axis_name: str | None = None,
          remat: bool = False):
    """Forward pass.

    Returns logits (B, num_classes) fp32 if the params carry a head, else
    the CLS embedding (B, dim). With ``return_features=True`` returns
    ``(tokens, out)`` where tokens are ALL post-norm tokens (B, N+1, dim).
    ``bn_training=True`` (ConvStem archs only) runs the stem BatchNorms
    with batch statistics and appends the updated patch params as a final
    return element — MoCo threads them through its state like the resnet
    towers' BN stats.

    ``remat=True`` wraps every transformer block in ``jax.checkpoint``:
    the backward recomputes each block's forward instead of holding its
    activations, trading ~1/3 more block FLOPs for O(1)-in-depth
    activation memory — the standard TPU HBM lever for deep/large-batch
    configs (measured budget in docs/PERF.md). Gradients are identical
    math (tests/test_vit.py::test_remat_gradients_match).
    """
    B = imgs.shape[0]
    patch_p = params["patch"]
    if stop_grad_conv1 and not cfg.conv_stem:
        # MoCo-v3 applies --stop-grad-conv1 only to the plain PatchEmbed
        # projection; ConvStem archs train their full stem (vits.py
        # gates on isinstance(patch_embed, PatchEmbed))
        patch_p = jax.tree.map(jax.lax.stop_gradient, patch_p)
    new_patch_p = patch_p
    if cfg.conv_stem:
        x, new_patch_p = _conv_stem(
            patch_p, imgs.astype(compute_dtype),
            training=bn_training, axis_name=bn_axis_name)  # (B, N, dim)
    elif "wq" in patch_p:
        x = patchify(imgs.astype(compute_dtype), cfg.patch)
        x = linear(patch_p, x)  # int8-quantized patch projection
    else:
        x = patch_embed(patch_p, imgs.astype(compute_dtype), cfg.patch)
    cls = jnp.broadcast_to(params["cls"].astype(compute_dtype), (B, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    if cfg.learned_pos:
        pos = params["pos"]
    else:
        pos = posembed.sincos_2d(cfg.grid, cfg.grid, cfg.dim)
    x = (x.astype(jnp.float32) + pos).astype(compute_dtype)

    scale = cfg.head_dim ** -0.5
    backend = attn_ops._resolve(attn_backend)
    pallas_path = backend in ("pallas", "pallas_interpret")
    interp = backend == "pallas_interpret"
    # qkv8 (int8 serving) blocks route on their own flag: the bf16 VMEM
    # gates just below size the BF16 kernels' score buffers and must not
    # disable the int8 kernels, which carry their own calibrated planner
    # (fused_int8._i8_cb via attn_kernel_ok) and an N-independent
    # row-tiled MLP. Only the big-batch compile gate further down also
    # applies to int8.
    i8_pallas = pallas_path
    inner_backend = attn_backend
    use_large_attn = False
    if pallas_path and not fused_attn_supported(
            cfg.seq_len, cfg.dim, cfg.heads):
        if qblocked_supported(cfg.seq_len, cfg.dim, cfg.heads):
            # long sequences (img-size >= 384): query-blocked scores keep
            # the attention half in Pallas (XLA attention is ~5x slower
            # in this layout); backward is XLA recompute
            use_large_attn = True
        elif not interp:
            # VMEM-infeasible even blocked: unfused XLA math (interpret
            # mode has no VMEM limits and keeps the standard kernel)
            pallas_path = False
            inner_backend = "xla"
    # big-dim archs at per-device batch >= 128 fail TPU compile on the
    # kernel path (measured boundary: vit_base B=64 compiles, B=128 does
    # not — docs/PERF.md "Known pre-existing limit"); downgrade to the XLA
    # path like the VMEM gate above. B here is the TRACE batch: the global
    # batch under GSPMD jit (our classifier/fusion multi-device paths
    # shard 'data' over every device, so per-device = B / device_count) or
    # already per-device inside shard_map (where the division
    # under-estimates — harmless unless a shard_map leg runs >=128x
    # device_count images per device). MFVIT_NO_ATTN_FALLBACK=1 disables
    # the gate (tools/check_vitbase_b256_compile.py measures the raw
    # kernel-path boundary with it).
    per_dev_b = B // max(jax.device_count(), 1)
    if (i8_pallas and not interp and cfg.dim > 512 and per_dev_b >= 128
            and not os.environ.get("MFVIT_NO_ATTN_FALLBACK")):
        warnings.warn(
            f"pallas backend with dim={cfg.dim} and per-device batch "
            f"~{per_dev_b} fails TPU compile; falling back to XLA "
            "attention for this step (docs/PERF.md) — shard to <=64 "
            "images/device to use the Pallas kernels", stacklevel=2)
        pallas_path = False
        i8_pallas = False
        inner_backend = "xla"
    last_i = len(params["blocks"]) - 1

    def run_block(x, blk, bi):
        if "qkv8" in blk:
            # int8 W8A8 serving path (ops/fused_int8.py): quantization
            # happens in-kernel on VMEM tiles; int8 MXU at 2x bf16.
            # Attention-half fallback chain: (1) the int8 full-scores
            # kernel (calibrated _i8_cb planner), (2) the query-blocked
            # bf16 kernel on dequantized weights (long sequences at big
            # dims, e.g. vit_base at img >= 384, blow the int8 kernel's
            # in-VMEM fp32 score buffers but fit the blocked one), (3)
            # unfused XLA dequant math. The MLP kernel is row-tiled
            # (N-independent VMEM) so it needs no VMEM gate and still
            # runs in both composite fallbacks — i8_pallas, not
            # pallas_path, so the bf16 kernels' VMEM gates can't strand a
            # quantized tree on full-dequant XLA (tests/test_quant.py::
            # test_int8_composite_fallback).
            from mfvit_tpu.ops import fused_int8 as fi8
            if i8_pallas and fi8.attn_kernel_ok(
                    cfg.seq_len, cfg.dim, cfg.heads, interp):
                x = fi8.fused_attention_block_i8(
                    x, blk["norm1"]["scale"], blk["norm1"]["bias"],
                    blk["qkv8"]["q"], blk["qkv8"]["s"], blk["qkv8"]["b"],
                    blk["proj8"]["q"], blk["proj8"]["s"], blk["proj8"]["b"],
                    cfg.heads, scale, interp)
            elif i8_pallas and qblocked_supported(
                    cfg.seq_len, cfg.dim, cfg.heads):
                # the int8 full-scores kernel blew VMEM, but the
                # query-blocked bf16 kernel fits (e.g. vit_small_ori@512,
                # where _i8_cb rejects at N=1025 but QB=64 fits): W8
                # storage, kernel compute on dequantized weights (dequant
                # is a tiny XLA op on the (D,3D)/(D,D) weights ahead of
                # the pallas_call). vit_base@384 rejects BOTH kernel
                # tiers and lands on the XLA fallback below
                x = fused_attention_block_large(
                    x, blk["norm1"]["scale"], blk["norm1"]["bias"],
                    fi8.dequant_w(blk["qkv8"]), blk["qkv8"]["b"],
                    fi8.dequant_w(blk["proj8"]), blk["proj8"]["b"],
                    cfg.heads, scale, interp)
            else:
                h = layernorm(blk["norm1"], x)
                qkv = linear({"w": fi8.dequant_w(blk["qkv8"]),
                              "b": blk["qkv8"]["b"]}, h)
                # "xla", not inner_backend: this branch only triggers when
                # the sequence is too long for the in-VMEM score buffers,
                # which rules out the plain Pallas MHSA kernel too
                attn = mhsa_from_packed(qkv, cfg.heads, scale,
                                        backend="xla")
                x = x + linear({"w": fi8.dequant_w(blk["proj8"]),
                                "b": blk["proj8"]["b"]}, attn)
            if i8_pallas:
                return fi8.fused_mlp_block_i8(
                    x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                    blk["fc18"]["q"], blk["fc18"]["s"], blk["fc18"]["b"],
                    blk["fc28"]["q"], blk["fc28"]["s"], blk["fc28"]["b"],
                    interp)
            mlpp = {"fc1": {"w": fi8.dequant_w(blk["fc18"]),
                            "b": blk["fc18"]["b"]},
                    "fc2": {"w": fi8.dequant_w(blk["fc28"]),
                            "b": blk["fc28"]["b"]}}
            return x + mlp(mlpp, layernorm(blk["norm2"], x))
        if pallas_path and "wq" not in blk["qkv"]:
            # One fused kernel: LN1 + qkv GEMM + MHSA + proj + residual
            # (2.35 vs 4.31 ms for the unfused chain — docs/PERF.md).
            bqkv = blk["qkv"].get(
                "b", jnp.zeros((3 * cfg.dim,), jnp.float32))
            attn_fn = (fused_attention_block_large if use_large_attn
                       else fused_attention_block)
            x = attn_fn(
                x, blk["norm1"]["scale"], blk["norm1"]["bias"],
                blk["qkv"]["w"], bqkv, blk["proj"]["w"], blk["proj"]["b"],
                cfg.heads, scale, backend == "pallas_interpret")
        else:
            h = layernorm(blk["norm1"], x)
            qkv = linear(blk["qkv"], h)  # (B, N, 3*dim)
            attn = mhsa_from_packed(qkv, cfg.heads, scale,
                                    backend=inner_backend)
            x = x + linear(blk["proj"], attn)
        if pallas_path and "wq" not in blk["mlp"]["fc1"]:
            if bi == last_i and cfg.dim <= 512:
                # last block: the model's final LayerNorm folds into the
                # kernel epilogue — one less HBM round-trip of the tokens.
                # Gated to ViT-S-class dims: at vit_base the variant's
                # backward call site makes XLA pin the big-dim dx-kernel
                # outputs in VMEM (S(1)), blowing the 16 MB scoped budget
                x = fused_mlp_block_final_ln(
                    x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                    blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"],
                    blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"],
                    params["norm"]["scale"], params["norm"]["bias"],
                    interp)
            else:
                # fused LN+fc1+GELU+fc2+residual kernel (120 vs 80 TF/s
                # on v5e — docs/PERF.md)
                x = fused_mlp_block(
                    x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                    blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"],
                    blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"],
                    interp)
        else:
            x = x + mlp(blk["mlp"], layernorm(blk["norm2"], x))
        return x

    # whether the final LayerNorm folded into the last block's kernel is
    # static in the params structure/config — compute it outside the
    # (possibly remat-wrapped) block body
    lb = params["blocks"][last_i] if last_i >= 0 else {}
    final_ln_done = (last_i >= 0 and pallas_path and "qkv8" not in lb
                     and "wq" not in lb.get("mlp", {}).get("fc1", {})
                     and cfg.dim <= 512)
    block_fn = (jax.checkpoint(run_block, static_argnums=(2,))
                if remat else run_block)
    for bi, blk in enumerate(params["blocks"]):
        x = block_fn(x, blk, bi)

    tokens = x if final_ln_done else layernorm(params["norm"], x)
    cls_out = tokens[:, 0].astype(jnp.float32)
    if "head" in params:
        out = linear(params["head"], cls_out)  # fp32 logits
    else:
        out = cls_out
    rets = (tokens, out) if return_features else (out,)
    if bn_training and cfg.conv_stem:
        rets = rets + (new_patch_p,)
    return rets if len(rets) > 1 else rets[0]
