"""Jitted train/eval step factories.

Each factory closes over static config and returns pure jitted functions
``(params, opt_state, batch...) -> (params, opt_state, aux)``. Under a
``jax.sharding.Mesh`` with batch inputs sharded over the 'data' axis and
replicated params, jit/XLA inserts the gradient all-reduce automatically —
the TPU-native replacement for DDP's NCCL allreduce (SURVEY §2.6).

Replicates the reference training semantics:
- CE loss on fp32 logits (finetune :716, fusion :873);
- fusion decision logits = fused + cxr + enh (fusion main :862-870);
- linear-probe freezing via the optimizer mask (steps never mutate frozen
  leaves — the property sanity_check() asserts).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mfvit_tpu.models import fusion as fusion_mod
from mfvit_tpu.nn import vit as vit_mod

Params = Any


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy on fp32 logits, integer labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


# ------------------------------------------------------------ classifier

def make_classifier_steps(cfg: vit_mod.ViTConfig,
                          tx: optax.GradientTransformation, *,
                          compute_dtype=jnp.bfloat16,
                          attn_backend: Optional[str] = None,
                          stop_grad_conv1: bool = False,
                          remat: bool = False
                          ) -> Tuple[Callable, Callable]:
    """(train_step, eval_step) for the single-stream ViT classifier
    (LP/FT entry point, SURVEY §3.2). ``remat`` rematerializes the
    transformer blocks in the backward (jax.checkpoint) — the HBM lever
    for deep/large-batch configs; eval never differentiates so it stays
    un-wrapped."""

    def loss_fn(params, imgs, labels):
        logits = vit_mod.apply(params, imgs, cfg, compute_dtype=compute_dtype,
                               attn_backend=attn_backend,
                               stop_grad_conv1=stop_grad_conv1,
                               remat=remat)
        return softmax_ce(logits, labels), logits

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, imgs, labels):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, imgs, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits

    @jax.jit
    def eval_step(params, imgs):
        return vit_mod.apply(params, imgs, cfg, compute_dtype=compute_dtype,
                             attn_backend=attn_backend)

    return train_step, eval_step


# --------------------------------------------------------------- fusion

def make_fusion_forward(cfg: vit_mod.ViTConfig, *, heads: int = 3,
                        compute_dtype=jnp.bfloat16,
                        attn_backend: Optional[str] = None,
                        fusion_arch: str = "ca", gpt_cfg=None,
                        frozen: bool = False,
                        remat: bool = False) -> Callable:
    """``forward(params, img_cxr, img_enh) -> (fused, logits_cxr,
    logits_enh)`` — the ONE MF-ViT forward shared by training, eval and
    serving (cli/infer.py); the decision logits are the sum of the three
    outputs (fusion main :868). Keeping a single definition means a
    checkpoint always serves with exactly the math that selected it as
    model_best.

    ``frozen=True`` stops gradients at the token/feature boundary (the
    LP fusion protocol); it routes through the generic per-branch path
    since the fused CA kernel has no stop-gradient seam."""
    if fusion_arch not in ("ca", "gpt"):
        raise ValueError(f"unknown fusion_arch {fusion_arch!r}")
    if fusion_arch == "gpt":
        from mfvit_tpu.models import gpt_fusion
        if gpt_cfg is None:
            gpt_cfg = gpt_fusion.VIT_CONFIG

    def head_apply(fus_params, tok_c, tok_e):
        if fusion_arch == "gpt":
            from mfvit_tpu.models import gpt_fusion
            return gpt_fusion.apply(fus_params, tok_c, tok_e, gpt_cfg)
        return fusion_mod.apply(fus_params, tok_c, tok_e, heads,
                                attn_backend=attn_backend)

    def forward_generic(params, img_cxr, img_enh):
        from mfvit_tpu.nn.layers import linear

        def branch(p, img):
            body = {k: v for k, v in p.items() if k != "head"}
            tokens, cls = vit_mod.apply(
                body, img, cfg, compute_dtype=compute_dtype,
                attn_backend=attn_backend, return_features=True,
                remat=remat)
            if frozen:
                tokens = jax.lax.stop_gradient(tokens)
                cls = jax.lax.stop_gradient(cls)
            return tokens, linear(p["head"], cls)

        tok_c, lc = branch(params["cxr"], img_cxr)
        tok_e, le = branch(params["enh"], img_enh)
        fused = head_apply(params["fus"], tok_c, tok_e)
        return fused, lc, le

    def forward(params, img_cxr, img_enh):
        if fusion_arch == "ca" and not frozen:
            return fusion_mod.fused_forward(
                params["cxr"], params["enh"], params["fus"], img_cxr,
                img_enh, cfg, heads=heads, compute_dtype=compute_dtype,
                attn_backend=attn_backend, remat=remat)
        return forward_generic(params, img_cxr, img_enh)

    return forward


def make_fusion_steps(cfg: vit_mod.ViTConfig,
                      tx: optax.GradientTransformation, *,
                      heads: int = 3, compute_dtype=jnp.bfloat16,
                      attn_backend: Optional[str] = None,
                      freeze_backbones: bool = False,
                      fusion_arch: str = "ca",
                      gpt_cfg=None,
                      remat: bool = False) -> Tuple[Callable, Callable]:
    """(train_step, eval_step) for MF-ViT CA.

    ``params`` is ``{"cxr": vit_params, "enh": vit_params, "fus":
    fusion_params}``. The training/eval decision logits are
    ``fused + logits_cxr + logits_enh`` (fusion main :868).

    ``fusion_arch="gpt"`` swaps the CLS cross-attention head for the
    TransFuser-style joint-sequence GPT (reference model/fuseattention.py,
    never wired to a main there); ``params["fus"]`` is then a
    ``gpt_fusion`` pytree and ``gpt_cfg`` its GPTFusionConfig. The
    decision-logit protocol (fused + cxr + enh) is kept so both heads are
    drop-in interchangeable under the same CLI.

    ``freeze_backbones`` is the LP fusion mode: gradients stop at the
    token/feature boundary, so XLA never builds the backward through the
    two ViT bodies — the step costs one forward plus the tiny head
    backward instead of ~3 forwards. The reference's EFFECTIVE trainable
    set is the Fus_CrossViT parameters only (fusion main :435-451; the
    branch ViTs — bodies and heads — are never registered submodules,
    fusion model :80-83), enforced here by the optimizer mask
    (cli/fuse.fusion_trainable_mask); the surviving gradients are
    identical to the unfrozen formulation."""

    forward = make_fusion_forward(
        cfg, heads=heads, compute_dtype=compute_dtype,
        attn_backend=attn_backend, fusion_arch=fusion_arch,
        gpt_cfg=gpt_cfg, remat=remat)
    forward_frozen = make_fusion_forward(
        cfg, heads=heads, compute_dtype=compute_dtype,
        attn_backend=attn_backend, fusion_arch=fusion_arch,
        gpt_cfg=gpt_cfg, frozen=True, remat=remat)

    def loss_fn(params, img_cxr, img_enh, labels):
        fwd = forward_frozen if freeze_backbones else forward
        fused, lc, le = fwd(params, img_cxr, img_enh)
        out = fused + lc + le
        return softmax_ce(out, labels), out

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, img_cxr, img_enh, labels):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, img_cxr, img_enh, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, out

    @jax.jit
    def eval_step(params, img_cxr, img_enh):
        fused, lc, le = forward(params, img_cxr, img_enh)
        return fused + lc + le

    return train_step, eval_step
