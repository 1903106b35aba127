"""MoCo self-supervised objectives — v3 structure, v2-queue or v3-symmetric loss.

Functional re-design of the reference builders
(/root/reference/moco_pretraining/moco/moco/):

- ``builder_vit_mocov3structure_mocov2loss.py`` (the objective the pretrain
  main actually uses, :16-199): base + momentum encoders each topped by a
  3-layer projector, a shared 2-layer predictor, a 65,536-entry normalized
  negative queue, InfoNCE with labels=0, per-step EMA with caller-supplied
  momentum. ``predictor_on_keys=True`` replicates keys ALSO passing the
  predictor (:174); False gives the ``_noprediction_q`` variant (:175 of the
  twin file).
- ``builder_vit.py`` (MoCo-v3 proper, :82-115): no queue, symmetric loss
  ``ctr(q1,k2)+ctr(q2,k1)`` with in-batch negatives from the global batch
  and rank-offset labels, scaled by 2*T.

TPU-native state/communication design (SURVEY §2.6):
- everything is an explicit donated pytree: params, EMA params, queue,
  queue_ptr — no buffers or in-place ops;
- cross-device negatives/queue keys use ``jax.lax.all_gather`` over a mesh
  axis (under shard_map/pmap); gradients ride jit's automatic all-reduce;
- no BN batch-shuffle: projector/predictor BatchNorms use GLOBAL batch
  statistics via ``pmean`` (the SyncBatchNorm equivalent MoCo-v3 itself
  uses — pretrain main :297 — making the v2-era shuffle unnecessary);
- EMA update and queue append are pure tree ops inside the jitted step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mfvit_tpu.nn import vit as vit_mod
from mfvit_tpu.nn.layers import batchnorm, batchnorm_init, linear, linear_init

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MoCoConfig:
    dim: int = 256            # output embedding dim (pretrain --moco-dim)
    mlp_dim: int = 4096       # projector/predictor hidden dim
    K: int = 65536            # queue length (builder...mocov2loss.py:25)
    T: float = 0.2            # temperature (README recipe --moco-t=.2)
    m: float = 0.99           # base EMA momentum (--moco-m)
    loss: str = "v2_queue"    # 'v2_queue' | 'v3_symmetric'
    predictor_on_keys: bool = True  # :174 vs the _noprediction_q variant
    stop_grad_conv1: bool = True    # README recipe --stop-grad-conv1
    # projector/predictor structure. Defaults = MoCo_ViT of the v3-structure
    # builders (3-layer BN projector, 2-layer BN predictor); MoCo_ResNet
    # uses 2/2 (builder...mocov2loss.py:202-225); the v2-classic builder.py
    # has a bias-ful BN-free 2-layer 'mlp head' and NO predictor (:52-64).
    projector_layers: int = 3
    predictor_layers: int = 2
    projector_bn: bool = True
    predictor_last_bn: bool = True
    use_predictor: bool = True

    @staticmethod
    def vit(**kw) -> "MoCoConfig":
        return MoCoConfig(**kw)

    @staticmethod
    def resnet(**kw) -> "MoCoConfig":
        kw.setdefault("projector_layers", 2)
        kw.setdefault("predictor_last_bn", False)
        kw.setdefault("stop_grad_conv1", False)
        return MoCoConfig(**kw)

    @staticmethod
    def v2_classic(mlp: bool = True, **kw) -> "MoCoConfig":
        """builder.py's original MoCo-v2: dim=128, K=65536, m=.999, T=.07,
        optional 2-layer BN-free mlp head, no predictor, keys straight from
        the momentum encoder."""
        kw.setdefault("dim", 128)
        kw.setdefault("T", 0.07)
        kw.setdefault("m", 0.999)
        kw.setdefault("projector_layers", 2 if mlp else 1)
        kw.setdefault("projector_bn", False)
        kw.setdefault("use_predictor", False)
        kw.setdefault("predictor_on_keys", False)
        kw.setdefault("stop_grad_conv1", False)
        return MoCoConfig(**kw)


# ---------------------------------------------------------- MLP (BN-ReLU)

def _mlp_init(key, num_layers: int, in_dim: int, mlp_dim: int, out_dim: int,
              last_bn: bool = True, use_bn: bool = True) -> Params:
    """SimCLR-style MLP stack: Linear(bias=False) + BN + ReLU per hidden
    layer; final Linear(bias=False) + affine-free BN if ``last_bn``
    (builder...mocov2loss.py:62-78). With ``use_bn=False`` this becomes the
    v2-classic bias-ful BN-free mlp head (builder.py:52-64): Linear + ReLU
    per hidden layer, bare final Linear."""
    keys = jax.random.split(key, num_layers)
    layers = []
    for l in range(num_layers):
        d1 = in_dim if l == 0 else mlp_dim
        d2 = out_dim if l == num_layers - 1 else mlp_dim
        layer: Params = {"lin": linear_init(keys[l], d1, d2, bias=not use_bn,
                                            dist="trunc_normal")}
        if l < num_layers - 1:
            if use_bn:
                layer["bn"] = batchnorm_init(d2)  # BN implies ReLU after
            else:
                layer["relu_marker"] = initzr_zeros_marker()
        elif last_bn and use_bn:
            # affine-free: running stats only, no gamma/beta (":76 removed
            # gamma" — nn.BatchNorm1d(dim2, affine=False))
            layer["bn_noaffine"] = batchnorm_init(d2, affine=False)
        layers.append(layer)
    return {"layers": layers}


def initzr_zeros_marker():
    """Zero-size float leaf marking a plain ReLU layer (keeps the pytree
    grad-compatible, unlike a bool)."""
    return jnp.zeros((0,), jnp.float32)


def _mlp_apply(p: Params, x: jnp.ndarray, *, training: bool,
               axis_name: Optional[str]) -> Tuple[jnp.ndarray, Params]:
    new_layers = []
    for layer in p["layers"]:
        x = linear(layer["lin"], x)
        nl = dict(layer)
        if "bn" in layer:
            x, nl["bn"] = batchnorm(layer["bn"], x, training=training,
                                    axis_name=axis_name)
            x = jax.nn.relu(x)
        elif "relu_marker" in layer:
            x = jax.nn.relu(x)
        elif "bn_noaffine" in layer:
            x, nl["bn_noaffine"] = batchnorm(
                layer["bn_noaffine"], x, training=training,
                axis_name=axis_name)
        new_layers.append(nl)
    return x, {"layers": new_layers}


# ------------------------------------------------------------------ init

def _backbone_init(key, backbone_cfg, in_chans: int = 3):
    if isinstance(backbone_cfg, vit_mod.ViTConfig):
        return vit_mod.init(key, backbone_cfg, num_classes=0,
                            in_chans=in_chans)
    import dataclasses as _dc

    from mfvit_tpu.nn import resnet as resnet_mod
    if backbone_cfg.in_chans != in_chans:
        backbone_cfg = _dc.replace(backbone_cfg, in_chans=in_chans)
    return resnet_mod.init(key, backbone_cfg, num_classes=0)


def _backbone_dim(backbone_cfg) -> int:
    if isinstance(backbone_cfg, vit_mod.ViTConfig):
        return backbone_cfg.dim
    return backbone_cfg.out_dim


def init(key, cfg: MoCoConfig, backbone_cfg, in_chans: int = 3) -> Params:
    """Build the full MoCo state pytree for a ViT or ResNet backbone.

    The momentum tower starts as a copy of the base tower
    (builder...mocov2loss.py:52-54); the queue starts L2-normalized random
    (:57-58). ``in_chans=4`` gives the builder_4ch stacked-input variant
    (builder_4ch.py:36-41)."""
    k_enc, k_proj, k_pred, k_queue = jax.random.split(key, 4)
    encoder = _backbone_init(k_enc, backbone_cfg, in_chans)
    width = _backbone_dim(backbone_cfg)
    projector = _mlp_init(k_proj, cfg.projector_layers, width, cfg.mlp_dim,
                          cfg.dim, use_bn=cfg.projector_bn)
    base = {"encoder": encoder, "projector": projector}
    queue = jax.random.normal(k_queue, (cfg.dim, cfg.K), jnp.float32)
    queue = queue / jnp.linalg.norm(queue, axis=0, keepdims=True)
    state = {
        "base": base,
        "momentum": jax.tree.map(jnp.copy, base),
        "queue": queue,
        "queue_ptr": jnp.zeros((), jnp.int32),
    }
    if cfg.use_predictor:
        state["predictor"] = _mlp_init(
            k_pred, cfg.predictor_layers, cfg.dim, cfg.mlp_dim, cfg.dim,
            last_bn=cfg.predictor_last_bn, use_bn=cfg.projector_bn)
    else:
        state["predictor"] = {"layers": []}  # identity
    return state


# -------------------------------------------------------------- encoding

def _encode(tower: Params, imgs: jnp.ndarray, cfg: MoCoConfig,
            backbone_cfg, *, training: bool,
            axis_name: Optional[str], compute_dtype,
            stop_grad_conv1: bool,
            remat: bool = False,
            attn_backend: Optional[str] = None) -> Tuple[jnp.ndarray, Params]:
    if isinstance(backbone_cfg, vit_mod.ViTConfig):
        if backbone_cfg.conv_stem and training:
            # ConvStem BNs train with batch stats; the updated running
            # stats thread through aux like the resnet towers' BN state
            feats, new_patch = vit_mod.apply(
                tower["encoder"], imgs, backbone_cfg,
                compute_dtype=compute_dtype,
                stop_grad_conv1=stop_grad_conv1, attn_backend=attn_backend,
                bn_training=training, bn_axis_name=axis_name, remat=remat)
            new_enc = dict(tower["encoder"], patch=new_patch)
        else:
            feats = vit_mod.apply(
                tower["encoder"], imgs, backbone_cfg,
                compute_dtype=compute_dtype, attn_backend=attn_backend,
                stop_grad_conv1=stop_grad_conv1, remat=remat)  # (B, w) fp32
            new_enc = tower["encoder"]
    else:
        from mfvit_tpu.nn import resnet as resnet_mod
        feats, new_enc = resnet_mod.apply(
            tower["encoder"], imgs, backbone_cfg, training=training,
            compute_dtype=compute_dtype, axis_name=axis_name, remat=remat)
    z, new_proj = _mlp_apply(tower["projector"], feats, training=training,
                             axis_name=axis_name)
    return z, {"encoder": new_enc, "projector": new_proj}


def _ema_update(momentum: Params, base: Params, m) -> Params:
    """EMA over PARAMETERS only (builder :84-89 iterates ``parameters()``):
    BN running ``mean``/``var`` buffers keep the momentum tower's own
    values — they evolve from its own key forwards, not from the base."""

    def walk(pk, pq, key=None):
        if isinstance(pk, dict):
            return {k: walk(pk[k], pq[k], k) for k in pk}
        if isinstance(pk, (list, tuple)):
            t = [walk(a, b) for a, b in zip(pk, pq)]
            return type(pk)(t) if isinstance(pk, list) else tuple(t)
        if key in ("mean", "var"):
            return pk
        return pk * m + jax.lax.stop_gradient(pq) * (1.0 - m)

    return walk(momentum, base)


def _l2norm(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)


def _gather(x: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    """concat_all_gather (builder...mocov2loss.py:229-240): global batch of
    keys, no gradient."""
    if axis_name is None:
        return x
    g = jax.lax.all_gather(x, axis_name)          # (ndev, B, C)
    return g.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------- losses

def forward_v2_queue(state: Params, im_q: jnp.ndarray, im_k: jnp.ndarray,
                     m, cfg: MoCoConfig, vit_cfg: vit_mod.ViTConfig, *,
                     axis_name: Optional[str] = None,
                     compute_dtype=jnp.bfloat16, remat: bool = False,
                     attn_backend: Optional[str] = None):
    """One pretraining forward with the v2 queue loss.

    Returns (loss, aux) where aux carries the new state pieces (EMA-updated
    momentum tower, updated queue/ptr, BN running stats) and the logits/
    labels for metrics — mirroring MoCo.forward (builder...:154-199)."""
    # EMA update of the momentum tower FIRST, as the reference does (:169)
    new_momentum = _ema_update(state["momentum"], state["base"], m)

    # queries: base encoder -> projector -> predictor -> normalize (:164-165)
    # remat applies to the QUERY pass only: the key/momentum pass is
    # under stop_gradient, so its activations are never held for a
    # backward anyway
    zq, new_base = _encode(state["base"], im_q, cfg, vit_cfg, training=True,
                           axis_name=axis_name, compute_dtype=compute_dtype,
                           stop_grad_conv1=cfg.stop_grad_conv1, remat=remat,
                           attn_backend=attn_backend)
    q, new_pred = _mlp_apply(state["predictor"], zq, training=True,
                             axis_name=axis_name)
    q = _l2norm(q)

    # keys: momentum tower, no grad; optionally through the predictor (:174)
    zk, new_momentum = _encode(new_momentum, im_k, cfg, vit_cfg,
                               training=True, axis_name=axis_name,
                               compute_dtype=compute_dtype,
                               stop_grad_conv1=False,
                               attn_backend=attn_backend)
    if cfg.predictor_on_keys:
        # torch BN updates running stats under ``no_grad`` when the module
        # is in training mode, so the reference's key pass (:174) advances
        # the predictor's BN statistics a second time (after the query
        # pass). Apply the post-query-pass tree and keep its stat update;
        # normalization itself uses batch stats either way.
        zk, new_pred = _mlp_apply(new_pred, zk, training=True,
                                  axis_name=axis_name)
    k = jax.lax.stop_gradient(_l2norm(zk))

    # logits vs positive key and the queue (:183-191)
    queue = jax.lax.stop_gradient(state["queue"])
    l_pos = jnp.einsum("nc,nc->n", q, k)[:, None]
    l_neg = jnp.einsum("nc,ck->nk", q, queue)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / cfg.T
    labels = jnp.zeros(logits.shape[0], jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(logp[:, 0])
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)

    # dequeue/enqueue with ALL-GATHERED keys (:91-105)
    keys_all = _gather(k, axis_name)
    bs = keys_all.shape[0]
    if cfg.K % bs != 0:
        # the reference asserts this inside the objective (:99); a clamped
        # dynamic_update_slice would otherwise silently overwrite the queue
        # TAIL instead of wrapping. Shapes are static, so this raises at
        # trace time — same effect as the reference's runtime assert.
        raise ValueError(
            f"queue length K={cfg.K} must be divisible by the global key "
            f"batch ({bs}); the ring enqueue assumes K % batch == 0")
    ptr = state["queue_ptr"]
    new_queue = jax.lax.dynamic_update_slice(
        state["queue"], keys_all.T.astype(state["queue"].dtype), (0, ptr))
    new_ptr = (ptr + bs) % cfg.K

    aux = {
        "base": new_base, "momentum": new_momentum, "predictor": new_pred,
        "queue": new_queue, "queue_ptr": new_ptr,
        "logits": logits, "labels": labels,
    }
    return loss, aux


def _contrastive_v3(q: jnp.ndarray, k: jnp.ndarray, T: float,
                    axis_name: Optional[str]) -> jnp.ndarray:
    """Symmetric-loss half (builder_vit.py:82-92): in-batch negatives from
    the globally gathered keys, rank-offset positive labels, *2T scale."""
    q = _l2norm(q)
    k = jax.lax.stop_gradient(_l2norm(k))
    k_all = _gather(k, axis_name)
    logits = (q @ k_all.T) / T
    n = q.shape[0]
    rank = jax.lax.axis_index(axis_name) if axis_name is not None else 0
    labels = jnp.arange(n, dtype=jnp.int32) + n * rank
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
    loss = loss * 2.0 * T
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss


def forward_v3_symmetric(state: Params, x1: jnp.ndarray, x2: jnp.ndarray,
                         m, cfg: MoCoConfig, vit_cfg: vit_mod.ViTConfig, *,
                         axis_name: Optional[str] = None,
                         compute_dtype=jnp.bfloat16, remat: bool = False,
                         attn_backend: Optional[str] = None):
    """MoCo-v3 symmetric objective (builder_vit.py:94-115): both views pass
    both towers; loss = ctr(q1,k2) + ctr(q2,k1). Queue unused."""
    new_momentum = _ema_update(state["momentum"], state["base"], m)

    def q_branch(tower, pred, imgs):
        z, nt = _encode(tower, imgs, cfg, vit_cfg, training=True,
                        axis_name=axis_name, compute_dtype=compute_dtype,
                        stop_grad_conv1=cfg.stop_grad_conv1, remat=remat,
                        attn_backend=attn_backend)
        out, npred = _mlp_apply(pred, z, training=True, axis_name=axis_name)
        return out, nt, npred

    q1, new_base, new_pred = q_branch(state["base"], state["predictor"], x1)
    q2, new_base, new_pred = q_branch(new_base, new_pred, x2)
    k1, new_momentum = _encode(new_momentum, x1, cfg, vit_cfg, training=True,
                               axis_name=axis_name,
                               compute_dtype=compute_dtype,
                               stop_grad_conv1=False,
                               attn_backend=attn_backend)
    k2, new_momentum = _encode(new_momentum, x2, cfg, vit_cfg, training=True,
                               axis_name=axis_name,
                               compute_dtype=compute_dtype,
                               stop_grad_conv1=False,
                               attn_backend=attn_backend)
    loss = (_contrastive_v3(q1, k2, cfg.T, axis_name) +
            _contrastive_v3(q2, k1, cfg.T, axis_name))
    aux = {"base": new_base, "momentum": new_momentum, "predictor": new_pred,
           "queue": state["queue"], "queue_ptr": state["queue_ptr"],
           "logits": None, "labels": None}
    return loss, aux


def forward(state, im_q, im_k, m, cfg: MoCoConfig,
            vit_cfg: vit_mod.ViTConfig, **kw):
    if cfg.loss == "v2_queue":
        return forward_v2_queue(state, im_q, im_k, m, cfg, vit_cfg, **kw)
    if cfg.loss == "v3_symmetric":
        return forward_v3_symmetric(state, im_q, im_k, m, cfg, vit_cfg, **kw)
    raise ValueError(f"unknown loss {cfg.loss!r}")


# ------------------------------------------------------------- train step

def make_pretrain_step(cfg: MoCoConfig, vit_cfg: vit_mod.ViTConfig, tx, *,
                       axis_name: Optional[str] = None,
                       compute_dtype=jnp.bfloat16, remat: bool = False,
                       attn_backend: Optional[str] = None):
    """Build the jitted MoCo pretraining step.

    Gradients flow to the base tower + predictor only; the momentum tower,
    queue and BN stats are state threaded through ``aux``. K %% global batch
    == 0 is asserted by the queue invariant test at mesh-build time
    (builder...:99)."""

    def loss_fn(grad_params, state, im_q, im_k, m):
        st = dict(state, base=grad_params["base"],
                  predictor=grad_params["predictor"])
        loss, aux = forward(st, im_q, im_k, m, cfg, vit_cfg,
                            axis_name=axis_name, compute_dtype=compute_dtype,
                            remat=remat, attn_backend=attn_backend)
        return loss, aux

    def step(state, opt_state, im_q, im_k, m):
        grad_params = {"base": state["base"], "predictor": state["predictor"]}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            grad_params, state, im_q, im_k, m)
        if axis_name is not None:
            # the DDP all-reduce: per-device grads are of the LOCAL batch
            # (grad-of-pmean only scales by 1/n); without this, replicated
            # params silently diverge across the mesh
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, grad_params)
        new_gp = optax.apply_updates(grad_params, updates)
        # merge: gradient-updated base/predictor keep the BN running stats
        # computed in aux (stats are not gradient leaves: same values, but
        # aux's copies carry the forward's running-stat update)
        new_state = {
            "base": _merge_bn(new_gp["base"], aux["base"]),
            "predictor": _merge_bn(new_gp["predictor"], aux["predictor"]),
            "momentum": aux["momentum"],
            "queue": aux["queue"],
            "queue_ptr": aux["queue_ptr"],
        }
        return new_state, opt_state, loss

    return step


def _merge_bn(grad_updated: Params, stat_updated: Params) -> Params:
    """Take parameter leaves from the gradient-updated tree but BN running
    ``mean``/``var`` from the forward-updated tree."""

    def walk(g, s, key=None):
        if isinstance(g, dict):
            return {k: walk(g[k], s[k], k) for k in g}
        if isinstance(g, (list, tuple)):
            return type(g)(walk(a, b) for a, b in zip(g, s))
        if key in ("mean", "var"):
            return s
        return g

    return walk(grad_updated, stat_updated)
