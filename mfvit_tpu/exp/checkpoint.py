"""Checkpointing: orbax save/restore + PyTorch-interop key mapping.

Native checkpoints are orbax pytrees. For parity with the reference, a
converter loads the reference's ``.pth.tar`` torch checkpoints into our
parameter pytrees, reproducing the reference's checkpoint surgery:

- MoCo pretrain ckpt -> classifier: strip the ``module.base_encoder.``
  prefix, drop the projector MLP that replaced ``head``, assert that ONLY
  ``head.weight``/``head.bias`` are left missing (finetune main :312-337);
- finetuned per-branch ckpts -> fusion: strict full load (fusion main
  :337-390).

Policy helpers mirror the reference's artifacts: best-val-AUC
``model_best`` in ``train_{s}_{it}/``, best-val-ACC twin in the ``_acc``
folder, and ``last_checkpoint`` (finetune :567-624, :829-839).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

Params = Any


# ----------------------------------------------------------------- orbax

def save(path: str, tree: Params) -> None:
    """Write one logical checkpoint.

    Multi-process (multi-host mesh): every process calls this — orbax
    coordinates a single write (each process persists only its
    addressable shards; replicated arrays are written once). This is the
    safe replacement for the reference's rank-0-only ``torch.save``
    (pretrain main :469-471): a host-side gather of non-fully-addressable
    arrays would crash, and uncoordinated writers would race the
    directory commit."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ck:
        if jax.process_count() > 1:
            # global (process-spanning) jax.Arrays stay as-is — orbax
            # writes each process's shards. Host-local leaves (python
            # scalars, numpy, single-device arrays like an epoch counter)
            # become numpy: identical on every process by construction,
            # written once by the primary.
            tree = jax.tree.map(
                lambda x: x if isinstance(x, jax.Array)
                and not x.is_fully_addressable else np.asarray(x),
                tree)
            ck.save(path, tree, force=True)
        else:
            ck.save(path, jax.tree.map(np.asarray, tree), force=True)


def restore(path: str, like: Optional[Params] = None) -> Params:
    """Restore a checkpoint; with ``like``, arrays come back with the
    template leaves' dtypes — and, on a multi-process mesh, with their
    shardings (orbax reads each process's shards from the shared
    filesystem; no broadcast needed)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ck:
        if like is None:
            return ck.restore(path)
        if jax.process_count() > 1:
            return ck.restore(path, target=like)
        like_np = jax.tree.map(np.asarray, like)
        out = ck.restore(path, target=like_np)
    return jax.tree.map(jnp.asarray, out)


class BestKeeper:
    """Track a metric and save best/last checkpoints (reference policy)."""

    def __init__(self, folder: str, mode: str = "max",
                 best_name: str = "model_best", last_name: str = "last_checkpoint"):
        self.folder = str(folder)
        self.mode = mode
        self.best: Optional[float] = None
        self.best_name = best_name
        self.last_name = last_name

    def update(self, metric: float, tree: Params, *,
               save_last: bool = True) -> bool:
        """Save ``last`` (optional) and, on improvement, ``best``.
        Returns True when the metric improved."""
        if save_last:
            save(os.path.join(self.folder, self.last_name), tree)
        if not np.isfinite(metric):
            # a NaN metric (e.g. AUC over a single-class val split) must
            # never become 'best': NaN comparisons are all False, which
            # would lock model_best at the NaN epoch forever
            return False
        better = (self.best is None or not np.isfinite(self.best) or
                  (metric > self.best if self.mode == "max" else metric < self.best))
        if better:
            self.best = metric
            save(os.path.join(self.folder, self.best_name), tree)
        return better


# ------------------------------------------------------------ torch side

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth.tar`` and return a flat numpy state dict
    (handles the ``{'state_dict': ...}`` wrapper the mains save —
    pretrain :461-479)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Keep only keys under ``prefix``, with it removed (the reference's
    ``k[len('module.base_encoder.'):]`` surgery — finetune :326-333)."""
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ------------------------------------------------- torch ViT -> our pytree

def torch_vit_to_params(sd: Dict[str, np.ndarray], cfg, *,
                        expect_head: bool = True) -> Params:
    """Map a MoCo-v3 ``vits.py`` ViT state dict to our vit.py pytree.

    Layout notes: torch Linear stores (out, in) -> transposed; the
    patch-embed conv (out, in, kh, kw) is re-expressed for our
    patchify+matmul formulation as (kh*kw*in, out), matching patchify's
    (ph, pw, c) within-patch feature order (vit.py:126-133).
    """
    def t(name):
        return jnp.asarray(sd[name])

    conv = np.asarray(sd["patch_embed.proj.weight"])  # (D, C, P, P)
    D, C, P, _ = conv.shape
    patch_w = jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(P * P * C, D))
    params: Params = {
        "patch": {"w": patch_w, "b": t("patch_embed.proj.bias")},
        "cls": t("cls_token"),
        "norm": {"scale": t("norm.weight"), "bias": t("norm.bias")},
        "blocks": [],
    }
    if "pos_embed" in sd and cfg.learned_pos:
        params["pos"] = t("pos_embed")
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        params["blocks"].append({
            "norm1": {"scale": t(b + "norm1.weight"), "bias": t(b + "norm1.bias")},
            "qkv": {"w": t(b + "attn.qkv.weight").T, "b": t(b + "attn.qkv.bias")},
            "proj": {"w": t(b + "attn.proj.weight").T, "b": t(b + "attn.proj.bias")},
            "norm2": {"scale": t(b + "norm2.weight"), "bias": t(b + "norm2.bias")},
            "mlp": {
                "fc1": {"w": t(b + "mlp.fc1.weight").T, "b": t(b + "mlp.fc1.bias")},
                "fc2": {"w": t(b + "mlp.fc2.weight").T, "b": t(b + "mlp.fc2.bias")},
            },
        })
    if expect_head and "head.weight" in sd and sd["head.weight"].ndim == 2:
        params["head"] = {"w": t("head.weight").T, "b": t("head.bias")}
    return params


def load_moco_pretrained_backbone(path: str, cfg) -> Params:
    """MoCo ckpt -> headless classifier backbone, asserting the surgery
    leaves exactly the head missing (finetune :337)."""
    sd = strip_prefix(load_torch_state_dict(path), "module.base_encoder.")
    # drop the projector MLP that replaced `head` during pretraining
    sd = {k: v for k, v in sd.items() if not k.startswith("head.")}
    params = torch_vit_to_params(sd, cfg, expect_head=False)
    if "head" in params:  # not assert: must survive python -O
        raise ValueError("MoCo surgery left a classifier head in place")
    return params


# ---------------------------------------------- torch resnet -> pytree

def torch_resnet_to_params(sd: Dict[str, np.ndarray], cfg,
                           expect_fc: bool = True) -> Params:
    """Map a torchvision resnet state dict to our nn/resnet.py pytree
    (the reference loads torchvision checkpoints for the resnet MoCo arms
    via load_state_dict_from_url — pretrain main :40, :52-62).

    Conv weights (out, in, kh, kw) -> HWIO; BN running stats carried over.
    """
    def conv(name):
        return {"w": jnp.asarray(np.asarray(sd[name]).transpose(2, 3, 1, 0))}

    def bn(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"]),
                "mean": jnp.asarray(sd[prefix + ".running_mean"]),
                "var": jnp.asarray(sd[prefix + ".running_var"])}

    p: Params = {"stem": {"conv": conv("conv1.weight"), "bn": bn("bn1")},
                 "stages": []}
    for stage_i, nblocks in enumerate(cfg.layers):
        stage = []
        for b in range(nblocks):
            pre = f"layer{stage_i + 1}.{b}."
            blk: Params = {
                "conv1": conv(pre + "conv1.weight"), "bn1": bn(pre + "bn1"),
                "conv2": conv(pre + "conv2.weight"), "bn2": bn(pre + "bn2"),
            }
            if cfg.block == "bottleneck":
                blk["conv3"] = conv(pre + "conv3.weight")
                blk["bn3"] = bn(pre + "bn3")
            if pre + "downsample.0.weight" in sd:
                blk["down_conv"] = conv(pre + "downsample.0.weight")
                blk["down_bn"] = bn(pre + "downsample.1")
            stage.append(blk)
        p["stages"].append(stage)
    if expect_fc and "fc.weight" in sd:
        p["fc"] = {"w": jnp.asarray(np.asarray(sd["fc.weight"]).T),
                   "b": jnp.asarray(sd["fc.bias"])}
    return p


def resnet_arms_from_torchvision(state: Params, path: str, cfg) -> Params:
    """Initialize BOTH MoCo towers' resnet encoders from a torchvision
    checkpoint (the reference pretrain downloads these by URL and passes
    ``pretrained`` into the builder, which loads encoder_q and lets
    encoder_k copy it — pretrain main :40, :52-62; builder.py:37-44).
    Here the checkpoint is a local ``.pth``/``.pth.tar`` state dict.

    4-channel variant: the reference's builder_4ch REPLACES ``conv1``
    with a fresh 4-channel conv AFTER the pretrained load
    (builder_4ch.py:36-41), so the pretrained stem conv is discarded —
    replicated by keeping the freshly initialized stem conv when
    ``cfg.in_chans != 3``."""
    import dataclasses as _dc
    sd = load_torch_state_dict(path)
    conv_cfg = cfg if cfg.in_chans == 3 else _dc.replace(cfg, in_chans=3)
    pre = torch_resnet_to_params(sd, conv_cfg, expect_fc=False)
    pre.pop("fc", None)  # classifier head never transfers into MoCo arms
    if cfg.in_chans != 3:
        pre = dict(pre, stem=dict(pre["stem"],
                                  conv=state["base"]["encoder"]["stem"]["conv"]))
    out = dict(state)
    for tower in ("base", "momentum"):
        if set(pre) - set(state[tower]["encoder"]):
            raise ValueError("torchvision checkpoint does not match the "
                             f"{tower} encoder pytree")
        # per-tower COPIES: aliased buffers across towers would make the
        # donating jitted step pass the same buffer twice
        graft = jax.tree.map(jnp.copy, pre)
        out[tower] = dict(state[tower],
                          encoder=dict(state[tower]["encoder"], **graft))
    return out


# ----------------------------------------------- torch fusion -> pytree

def torch_fusion_to_params(sd: Dict[str, np.ndarray],
                           multi_scale_enc_depth: int = 1,
                           cross_attn_depth: int = 1) -> Params:
    """Map the reference ``Fus_CrossViT`` fusion-head weights (the
    multi_scale_transformers + mlp_head_* part of
    crossvit_..._sum.py:88-113) to our fusion.py pytree."""
    def t(name):
        return jnp.asarray(sd[name])

    encoders = []
    for e in range(multi_scale_enc_depth):
        base = f"multi_scale_transformers.{e}."
        layers = []
        for l in range(cross_attn_depth):
            # ModuleList layout per layer (crossvit_..._sum.py:22-33 +
            # unpack order :41-42): 0 = PreNorm(CA) used for the CXR/small
            # direction, 1 = LayerNorm n_l (Enh), 2 = PreNorm(CA) for the
            # Enh/large direction, 3 = LayerNorm n_s (CXR).
            def ca(which):
                p = f"{base}cross_attn_layers.{l}.{which}."
                return {
                    "norm": {"scale": t(p + "norm.weight"),
                             "bias": t(p + "norm.bias")},
                    "wq": {"w": t(p + "fn.wq.weight").T},
                    "wk": {"w": t(p + "fn.wk.weight").T},
                    "wv": {"w": t(p + "fn.wv.weight").T},
                    "proj": {"w": t(p + "fn.proj.weight").T,
                             "b": t(p + "fn.proj.bias")},
                }

            def ln(which):
                p = f"{base}cross_attn_layers.{l}.{which}."
                return {"scale": t(p + "weight"), "bias": t(p + "bias")}

            layers.append({
                "ca_s": ca("0"), "ln_l": ln("1"),
                "ca_l": ca("2"), "ln_s": ln("3"),
            })
        encoders.append({"layers": layers})
    return {
        "encoders": encoders,
        "head_cxr": {"w": t("mlp_head_cxr.0.weight").T,
                     "b": t("mlp_head_cxr.0.bias")},
        "head_enh": {"w": t("mlp_head_enh.0.weight").T,
                     "b": t("mlp_head_enh.0.bias")},
    }


# --------------------------------------------- pytree -> torch (export)
# Exact inverses of the import converters above: a user can take a
# TPU-trained model BACK to the PyTorch reference (e.g. feed a TPU MoCo
# pretrain into the reference finetune main's --pretrained surgery,
# finetune :312-337). Round-trip identity is tested in
# tests/test_torch_parity.py.

def params_to_torch_vit(params: Params, cfg) -> Dict[str, np.ndarray]:
    """Our vit.py pytree -> MoCo-v3 ``vits.py`` state-dict arrays
    (inverse of torch_vit_to_params)."""
    def a(x):
        return np.asarray(x)

    D = cfg.dim
    P = cfg.patch
    pw = a(params["patch"]["w"])              # (P*P*C, D)
    C = pw.shape[0] // (P * P)
    sd: Dict[str, np.ndarray] = {
        "patch_embed.proj.weight":
            pw.reshape(P, P, C, D).transpose(3, 2, 0, 1),
        "patch_embed.proj.bias": a(params["patch"]["b"]),
        "cls_token": a(params["cls"]),
        "norm.weight": a(params["norm"]["scale"]),
        "norm.bias": a(params["norm"]["bias"]),
    }
    if cfg.learned_pos and "pos" in params:
        sd["pos_embed"] = a(params["pos"])
    else:
        # MoCo-v3's vits.py registers the FIXED sincos table as an
        # nn.Parameter(requires_grad=False), so it lives in the torch
        # state_dict — and the reference finetune surgery asserts
        # missing_keys == {head.weight, head.bias} after its
        # strict=False load (finetune :336-337). An export without
        # pos_embed would fail that assert on a real vits model.
        from mfvit_tpu.nn import posembed
        sd["pos_embed"] = a(posembed.sincos_2d(cfg.grid, cfg.grid, D))
    for i, blk in enumerate(params["blocks"]):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = a(blk["norm1"]["scale"])
        sd[b + "norm1.bias"] = a(blk["norm1"]["bias"])
        sd[b + "attn.qkv.weight"] = a(blk["qkv"]["w"]).T
        sd[b + "attn.qkv.bias"] = a(blk["qkv"]["b"])
        sd[b + "attn.proj.weight"] = a(blk["proj"]["w"]).T
        sd[b + "attn.proj.bias"] = a(blk["proj"]["b"])
        sd[b + "norm2.weight"] = a(blk["norm2"]["scale"])
        sd[b + "norm2.bias"] = a(blk["norm2"]["bias"])
        sd[b + "mlp.fc1.weight"] = a(blk["mlp"]["fc1"]["w"]).T
        sd[b + "mlp.fc1.bias"] = a(blk["mlp"]["fc1"]["b"])
        sd[b + "mlp.fc2.weight"] = a(blk["mlp"]["fc2"]["w"]).T
        sd[b + "mlp.fc2.bias"] = a(blk["mlp"]["fc2"]["b"])
    if "head" in params:
        sd["head.weight"] = a(params["head"]["w"]).T
        sd["head.bias"] = a(params["head"]["b"])
    return sd


def fusion_params_to_torch(params: Params) -> Dict[str, np.ndarray]:
    """Our fusion.py pytree -> reference ``Fus_CrossViT`` fusion-head
    state-dict arrays (inverse of torch_fusion_to_params)."""
    def a(x):
        return np.asarray(x)

    sd: Dict[str, np.ndarray] = {}
    for e, enc in enumerate(params["encoders"]):
        base = f"multi_scale_transformers.{e}."
        for l, lay in enumerate(enc["layers"]):
            for which, ca_key in (("0", "ca_s"), ("2", "ca_l")):
                ca = lay[ca_key]
                p = f"{base}cross_attn_layers.{l}.{which}."
                sd[p + "norm.weight"] = a(ca["norm"]["scale"])
                sd[p + "norm.bias"] = a(ca["norm"]["bias"])
                sd[p + "fn.wq.weight"] = a(ca["wq"]["w"]).T
                sd[p + "fn.wk.weight"] = a(ca["wk"]["w"]).T
                sd[p + "fn.wv.weight"] = a(ca["wv"]["w"]).T
                sd[p + "fn.proj.weight"] = a(ca["proj"]["w"]).T
                sd[p + "fn.proj.bias"] = a(ca["proj"]["b"])
            for which, ln_key in (("1", "ln_l"), ("3", "ln_s")):
                p = f"{base}cross_attn_layers.{l}.{which}."
                sd[p + "weight"] = a(lay[ln_key]["scale"])
                sd[p + "bias"] = a(lay[ln_key]["bias"])
    sd["mlp_head_cxr.0.weight"] = a(params["head_cxr"]["w"]).T
    sd["mlp_head_cxr.0.bias"] = a(params["head_cxr"]["b"])
    sd["mlp_head_enh.0.weight"] = a(params["head_enh"]["w"]).T
    sd["mlp_head_enh.0.bias"] = a(params["head_enh"]["b"])
    return sd


def _mlp_params_to_torch_seq(mlp: Params, prefix: str,
                             sd: Dict[str, np.ndarray]) -> None:
    """Our ssl.moco MLP pytree -> the reference _build_mlp Sequential
    numbering (builder...mocov2loss.py:62-78: Linear[,BN,ReLU] per hidden
    layer, final Linear[,affine-free BN])."""
    idx = 0
    for layer in mlp["layers"]:
        sd[f"{prefix}{idx}.weight"] = np.asarray(layer["lin"]["w"]).T
        if "b" in layer["lin"]:
            sd[f"{prefix}{idx}.bias"] = np.asarray(layer["lin"]["b"])
        idx += 1
        if "bn" in layer:
            bn = layer["bn"]
            sd[f"{prefix}{idx}.weight"] = np.asarray(bn["scale"])
            sd[f"{prefix}{idx}.bias"] = np.asarray(bn["bias"])
            sd[f"{prefix}{idx}.running_mean"] = np.asarray(bn["mean"])
            sd[f"{prefix}{idx}.running_var"] = np.asarray(bn["var"])
            idx += 2  # BN, ReLU
        elif "relu_marker" in layer:
            idx += 1  # ReLU
        elif "bn_noaffine" in layer:
            bn = layer["bn_noaffine"]
            sd[f"{prefix}{idx}.running_mean"] = np.asarray(bn["mean"])
            sd[f"{prefix}{idx}.running_var"] = np.asarray(bn["var"])
            idx += 1


def save_moco_torch_checkpoint(path: str, state: Params, cfg,
                               epoch: int = 0, arch: str = "vit_small"
                               ) -> None:
    """Export a MoCo pretrain state as a reference-layout ``.pth.tar``
    (``module.base_encoder.*`` + projector Sequential grafted as
    ``head.*``, momentum tower, predictor, queue) so the REFERENCE
    finetune main can consume a TPU pretrain via its --pretrained
    surgery (finetune :312-337; ckpt dict layout pretrain :461-479)."""
    import torch

    sd: Dict[str, np.ndarray] = {}
    for tower, name in (("base", "base_encoder"),
                        ("momentum", "momentum_encoder")):
        pre = f"module.{name}."
        for k, v in params_to_torch_vit(state[tower]["encoder"],
                                        cfg).items():
            sd[pre + k] = v
        _mlp_params_to_torch_seq(state[tower]["projector"],
                                 pre + "head.", sd)
    _mlp_params_to_torch_seq(state["predictor"], "module.predictor.", sd)
    sd["module.queue"] = np.asarray(state["queue"])
    sd["module.queue_ptr"] = np.asarray(
        state["queue_ptr"]).reshape(1).astype(np.int64)
    torch.save({"epoch": int(epoch), "arch": arch,
                "state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
               path)
