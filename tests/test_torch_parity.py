"""Numerical parity against PyTorch (fp32): our JAX ViT vs an equivalent
torch ViT, and our fusion head vs the REFERENCE Fus_CrossViT imported from
/root/reference (with timm stubbed), weights carried across by the
exp.checkpoint converters. This is the 'fp32 logits matching the PyTorch
reference' requirement of BASELINE.json's north star."""
import math
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# whole-module: every test here round-trips through real torch models
# (some over 30-60 optimizer steps) — parity tier, not the quick loop
pytestmark = pytest.mark.slow

import torch
import torch.nn as nn

from mfvit_tpu.exp import checkpoint as ckpt
from mfvit_tpu.models import fusion
from mfvit_tpu.nn import posembed, vit

torch.manual_seed(0)

TINY = vit.ViTConfig("tiny", img_size=32, patch=8, dim=32, depth=2, heads=2)


# ------------------------------- minimal torch ViT (MoCo-v3 semantics) --

class TorchBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, dim * mlp_ratio)
        self.fc2 = nn.Linear(dim * mlp_ratio, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        a = a.softmax(-1)
        x = x + self.proj((a @ v).transpose(1, 2).reshape(B, N, C))
        x = x + self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))
        return x


class TorchViT(nn.Module):
    """Equivalent of MoCo-v3 vits.py ViT (fixed sincos pos embed)."""

    def __init__(self, cfg, num_classes=3):
        super().__init__()
        self.cfg = cfg
        self.patch_conv = nn.Conv2d(3, cfg.dim, cfg.patch, stride=cfg.patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, cfg.dim) * 0.02)
        pe = np.asarray(posembed.sincos_2d(cfg.grid, cfg.grid, cfg.dim))
        self.register_buffer("pos_embed", torch.tensor(pe))
        self.blocks = nn.ModuleList(
            [TorchBlock(cfg.dim, cfg.heads) for _ in range(cfg.depth)])
        self.norm = nn.LayerNorm(cfg.dim, eps=1e-6)
        self.head = nn.Linear(cfg.dim, num_classes)

    def forward(self, x):  # x: (B, 3, H, W)
        B = x.shape[0]
        x = self.patch_conv(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
        x = x + self.pos_embed
        for b in self.blocks:
            x = b(x)
        return self.head(self.norm(x)[:, 0])

    def state_dict_vits_names(self, include_head=True):
        """Rename to the MoCo-v3 vits.py key layout the converter expects.
        ``include_head=False`` supports the MoCo builders, which delete
        ``.head`` and graft a projector Sequential in its place."""
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch_conv.weight.detach().numpy()
        sd["patch_embed.proj.bias"] = self.patch_conv.bias.detach().numpy()
        sd["cls_token"] = self.cls_token.detach().numpy()
        for i, b in enumerate(self.blocks):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = b.norm1.weight.detach().numpy()
            sd[p + "norm1.bias"] = b.norm1.bias.detach().numpy()
            sd[p + "attn.qkv.weight"] = b.qkv.weight.detach().numpy()
            sd[p + "attn.qkv.bias"] = b.qkv.bias.detach().numpy()
            sd[p + "attn.proj.weight"] = b.proj.weight.detach().numpy()
            sd[p + "attn.proj.bias"] = b.proj.bias.detach().numpy()
            sd[p + "norm2.weight"] = b.norm2.weight.detach().numpy()
            sd[p + "norm2.bias"] = b.norm2.bias.detach().numpy()
            sd[p + "mlp.fc1.weight"] = b.fc1.weight.detach().numpy()
            sd[p + "mlp.fc1.bias"] = b.fc1.bias.detach().numpy()
            sd[p + "mlp.fc2.weight"] = b.fc2.weight.detach().numpy()
            sd[p + "mlp.fc2.bias"] = b.fc2.bias.detach().numpy()
        sd["norm.weight"] = self.norm.weight.detach().numpy()
        sd["norm.bias"] = self.norm.bias.detach().numpy()
        if include_head:
            sd["head.weight"] = self.head.weight.detach().numpy()
            sd["head.bias"] = self.head.bias.detach().numpy()
        return sd


def _vit_logits_match_torch(cfg, batch=2, rtol=1e-4, atol=1e-5):
    tm = TorchViT(cfg).eval()
    params = ckpt.torch_vit_to_params(tm.state_dict_vits_names(), cfg)
    img = np.random.default_rng(0).normal(
        size=(batch, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(img).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(vit.apply(params, jnp.asarray(img), cfg,
                                compute_dtype=jnp.float32,
                                attn_backend="xla"))
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol)


def test_vit_small_full_size_logits_match_torch():
    """Full-size spot check (VERDICT r2 #5): fp32 ViT-S/16 @224 — the
    197-token sincos table and 14x14 grid at the production config
    (SURVEY §2.2 model contract) vs the torch twin."""
    # atol 1e-4: 12 blocks of fp32 accumulation at dim 384
    _vit_logits_match_torch(vit.get_config("vit_small"), atol=1e-4)


def test_vit_logits_match_torch():
    tm = TorchViT(TINY).eval()
    params = ckpt.torch_vit_to_params(tm.state_dict_vits_names(), TINY)
    img = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(img).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(vit.apply(params, jnp.asarray(img), TINY,
                                compute_dtype=jnp.float32,
                                attn_backend="xla"))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


# ------------------------------------- reference CrossAttention parity --

def _reference_modules():
    sys.path.insert(0, "/root/reference/moco_pretraining/moco")
    from model import module as ref_module
    return ref_module


def test_cross_attention_block_matches_reference():
    ref_module = _reference_modules()
    dim, heads, N, B = 32, 2, 17, 3
    pre = ref_module.PreNorm(
        dim, ref_module.CrossAttention(dim, num_heads=heads)).eval()

    sd = {k: v.detach().numpy() for k, v in pre.state_dict().items()}
    p = {
        "norm": {"scale": jnp.asarray(sd["norm.weight"]),
                 "bias": jnp.asarray(sd["norm.bias"])},
        "wq": {"w": jnp.asarray(sd["fn.wq.weight"]).T},
        "wk": {"w": jnp.asarray(sd["fn.wk.weight"]).T},
        "wv": {"w": jnp.asarray(sd["fn.wv.weight"]).T},
        "proj": {"w": jnp.asarray(sd["fn.proj.weight"]).T,
                 "b": jnp.asarray(sd["fn.proj.bias"])},
    }
    x = np.random.default_rng(1).normal(size=(B, N, dim)).astype(np.float32)
    with torch.no_grad():
        ref = pre(torch.tensor(x)).numpy()
    ours = np.asarray(fusion._cross_attn_block(p, jnp.asarray(x), heads))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


# ----------------------------------- reference Fus_CrossViT head parity --

def _import_reference_fusion():
    """Import the reference fusion model with timm stubbed out."""
    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        def trunc_normal_(tensor, std=1.0):
            with torch.no_grad():
                tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
            return tensor

        layers.trunc_normal_ = trunc_normal_
        layers.DropPath = nn.Identity
        layers.to_2tuple = lambda x: (x, x)
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    sys.path.insert(0, "/root/reference/moco_pretraining/moco")
    import importlib
    mod = importlib.import_module(
        "model.crossvit_2vits_2additionaloutputs_changenormlayer_location_"
        "removeextralclayer_changemodelinputlocation_std002_sum")
    return mod


class _FakeViT(nn.Module):
    """Stands in for vits_returnftrs: .features3D returns fixed tokens,
    __call__ returns fixed logits."""

    def __init__(self, tokens, logits):
        super().__init__()
        self._tokens = torch.tensor(tokens)
        self._logits = torch.tensor(logits)

    def features3D(self, x):
        return self._tokens

    def forward(self, x):
        return self._logits


@pytest.mark.parametrize("N", [17, 197])
def test_fusion_head_matches_reference(N):
    # N=197 is the full-size spot check: the real ViT-S/16 @224 token
    # count, exercising the padding-mask/concat shapes at production dims
    mod = _import_reference_fusion()
    rng = np.random.default_rng(2)
    B, dim = 2, 384
    tok_cxr = rng.normal(size=(B, N, dim)).astype(np.float32)
    tok_enh = rng.normal(size=(B, N, dim)).astype(np.float32)
    logit = rng.normal(size=(B, 3)).astype(np.float32)

    ref_model = mod.Fus_CrossViT(
        _FakeViT(tok_cxr, logit), _FakeViT(tok_enh, logit)).eval()
    dummy = torch.zeros(B, 3, 224, 224)
    with torch.no_grad():
        ref_fused, _, _ = ref_model(ref_model.vit_features_cxr.__self__,
                                    ref_model.vit_features_enh.__self__,
                                    dummy, dummy)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    fparams = ckpt.torch_fusion_to_params(sd)
    ours = np.asarray(fusion.apply(fparams, jnp.asarray(tok_cxr),
                                   jnp.asarray(tok_enh), heads=3))
    np.testing.assert_allclose(ours, ref_fused.numpy(), rtol=1e-4, atol=1e-5)


# ----------------------------------------------- checkpoint surgery -----

def test_moco_checkpoint_surgery(tmp_path):
    tm = TorchViT(TINY)
    sd = {"module.base_encoder." + k: torch.tensor(v)
          for k, v in tm.state_dict_vits_names().items()
          if not k.startswith("head.")}
    # projector MLP standing in for the replaced head (must be dropped)
    sd["module.base_encoder.head.0.weight"] = torch.zeros(8, TINY.dim)
    sd["module.momentum_encoder.cls_token"] = torch.zeros(1, 1, TINY.dim)
    path = tmp_path / "checkpoint.pth.tar"
    torch.save({"epoch": 3, "state_dict": sd}, path)

    params = ckpt.load_moco_pretrained_backbone(str(path), TINY)
    assert "head" not in params
    np.testing.assert_allclose(
        np.asarray(params["cls"]), tm.cls_token.detach().numpy())
    assert len(params["blocks"]) == TINY.depth


class _TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + idt)


class _TorchResNet18(nn.Module):
    """Minimal torchvision-compatible resnet18 (same state-dict names)."""

    def __init__(self, num_classes=3):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin = 64
        for li, (cout, stride) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)]):
            blocks = nn.Sequential(_TorchBasicBlock(cin, cout, stride),
                                   _TorchBasicBlock(cout, cout, 1))
            setattr(self, f"layer{li + 1}", blocks)
            cin = cout
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.nn.functional.max_pool2d(x, 3, 2, 1)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        x = x.mean((2, 3))
        return self.fc(x)


def test_resnet18_logits_match_torch():
    from mfvit_tpu.nn import resnet
    tm = _TorchResNet18().eval()
    # randomize BN stats so running-stat transfer is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    cfg = resnet.get_config("resnet18")
    params = ckpt.torch_resnet_to_params(sd, cfg)
    img = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(img).permute(0, 3, 1, 2)).numpy()
    ours, _ = resnet.apply(params, jnp.asarray(img), cfg,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_fuse_branch_torch_checkpoint_loading(tmp_path):
    """Cross-stage flow: a finetuned torch single-branch ckpt loads
    strictly into a fusion branch (fusion main :337-390)."""
    from mfvit_tpu.cli import fuse as fuse_cli
    tm = TorchViT(TINY).eval()
    sd = {k: torch.tensor(v) for k, v in tm.state_dict_vits_names().items()}
    path = tmp_path / "model_best.pth.tar"
    torch.save({"epoch": 5, "state_dict": sd}, path)

    params = fuse_cli.load_branch(str(path), TINY, ratio=1, draw=0)
    assert "head" in params
    img = np.random.default_rng(3).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(img).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(vit.apply(params, jnp.asarray(img), TINY,
                                compute_dtype=jnp.float32,
                                attn_backend="xla"))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # 'module.'-prefixed variant (DDP-saved) also loads
    sd2 = {"module." + k: v for k, v in sd.items()}
    path2 = tmp_path / "ddp.pth.tar"
    torch.save({"state_dict": sd2}, path2)
    params2 = fuse_cli.load_branch(str(path2), TINY, ratio=1, draw=0)
    np.testing.assert_array_equal(np.asarray(params2["cls"]),
                                  np.asarray(params["cls"]))


# ------------------------------- one-step optimizer/gradient parity -----
# BASELINE's "Top-1 within 0.2%" rides on the training dynamics, not just
# the forward: one full train step (CE loss + optimizer) must move every
# parameter exactly as torch does (finetune :716-718, moco/optimizer.py).

def _vit_step_inputs():
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 1])
    return imgs, labels


def _assert_params_close(ours, ref, rtol=1e-4, atol=1e-6):
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ours),
            jax.tree_util.tree_leaves_with_path(ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=f"param {jax.tree_util.keystr(pa)}")


def test_sgd_train_step_matches_torch():
    """Two SGD(momentum+wd) steps on the TINY ViT classifier: per-leaf
    updated parameters match torch (finetune :716-718 optimizer setup)."""
    from mfvit_tpu.train import optim, steps

    torch.manual_seed(1)
    tm = TorchViT(TINY)
    # deep-copy: on CPU jnp.asarray may alias the torch storage, which
    # opt.step() then mutates in place
    params = jax.tree.map(
        jnp.copy, ckpt.torch_vit_to_params(tm.state_dict_vits_names(), TINY))
    imgs, labels = _vit_step_inputs()
    lr, wd, mom = 0.1, 1e-4, 0.9

    opt = torch.optim.SGD(tm.parameters(), lr=lr, momentum=mom,
                          weight_decay=wd)
    ce = nn.CrossEntropyLoss()
    for _ in range(2):
        opt.zero_grad()
        out = tm(torch.tensor(imgs).permute(0, 3, 1, 2))
        ce(out, torch.tensor(labels)).backward()
        opt.step()
    ref_params = ckpt.torch_vit_to_params(tm.state_dict_vits_names(), TINY)

    tx = optim.build_optimizer("sgd", lr, weight_decay=wd, momentum=mom)
    train_step, _ = steps.make_classifier_steps(
        TINY, tx, compute_dtype=jnp.float32, attn_backend="xla")
    opt_state = tx.init(params)
    xj, yj = jnp.asarray(imgs), jnp.asarray(labels)
    for _ in range(2):
        params, opt_state, loss, _ = train_step(params, opt_state, xj, yj)

    _assert_params_close(params, ref_params)


def test_lars_step_matches_reference_optimizer():
    """Two LARS steps on the TINY ViT vs the REFERENCE LARS imported from
    /root/reference (moco/optimizer.py:10-43), identical weights/batch."""
    from mfvit_tpu.train import optim, steps

    sys.path.insert(0, "/root/reference/moco_pretraining/moco")
    from moco.optimizer import LARS as RefLARS

    torch.manual_seed(2)
    tm = TorchViT(TINY)
    params = jax.tree.map(
        jnp.copy, ckpt.torch_vit_to_params(tm.state_dict_vits_names(), TINY))
    imgs, labels = _vit_step_inputs()
    lr, wd = 0.05, 1e-4

    opt = RefLARS(tm.parameters(), lr=lr, weight_decay=wd, momentum=0.9)
    ce = nn.CrossEntropyLoss()
    for _ in range(2):
        opt.zero_grad()
        out = tm(torch.tensor(imgs).permute(0, 3, 1, 2))
        ce(out, torch.tensor(labels)).backward()
        opt.step()
    ref_params = ckpt.torch_vit_to_params(tm.state_dict_vits_names(), TINY)

    tx = optim.build_optimizer("lars", lr, weight_decay=wd, momentum=0.9)
    train_step, _ = steps.make_classifier_steps(
        TINY, tx, compute_dtype=jnp.float32, attn_backend="xla")
    opt_state = tx.init(params)
    xj, yj = jnp.asarray(imgs), jnp.asarray(labels)
    for _ in range(2):
        params, opt_state, loss, _ = train_step(params, opt_state, xj, yj)

    _assert_params_close(params, ref_params)


def test_fusion_head_gradients_match_reference():
    """Gradients of the fused logits w.r.t. every fusion-head parameter
    match the reference Fus_CrossViT's autograd (fusion model :50-155)."""
    mod = _import_reference_fusion()
    rng = np.random.default_rng(4)
    B, N, dim = 2, 17, 384
    tok_cxr = rng.normal(size=(B, N, dim)).astype(np.float32)
    tok_enh = rng.normal(size=(B, N, dim)).astype(np.float32)
    logit = rng.normal(size=(B, 3)).astype(np.float32)

    ref_model = mod.Fus_CrossViT(
        _FakeViT(tok_cxr, logit), _FakeViT(tok_enh, logit)).train()
    dummy = torch.zeros(B, 3, 224, 224)
    fused, _, _ = ref_model(ref_model.vit_features_cxr.__self__,
                            ref_model.vit_features_enh.__self__,
                            dummy, dummy)
    (fused ** 2).sum().backward()
    grad_sd = {k: p.grad.detach().numpy()
               for k, p in ref_model.named_parameters()
               if p.grad is not None}
    ref_grads = ckpt.torch_fusion_to_params(grad_sd)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    fparams = ckpt.torch_fusion_to_params(sd)

    def loss(fp):
        out = fusion.apply(fp, jnp.asarray(tok_cxr), jnp.asarray(tok_enh),
                           heads=3)
        return jnp.sum(out ** 2)

    ours = jax.grad(loss)(fparams)
    _assert_params_close(ours, ref_grads, rtol=2e-4, atol=2e-5)


def test_loss_curve_matches_torch_over_five_steps():
    """Five SGD steps on identical weights/batches: the per-step training
    LOSS CURVE matches torch — the learning-dynamics evidence behind
    BASELINE's 'Top-1 within 0.2%' (finetune :716-718)."""
    from mfvit_tpu.train import optim, steps

    torch.manual_seed(5)
    tm = TorchViT(TINY)
    params = jax.tree.map(
        jnp.copy, ckpt.torch_vit_to_params(tm.state_dict_vits_names(), TINY))
    rng = np.random.default_rng(6)
    batches = [(rng.normal(size=(4, 32, 32, 3)).astype(np.float32),
                rng.integers(0, 3, 4)) for _ in range(5)]
    lr, wd, mom = 0.1, 1e-4, 0.9

    opt = torch.optim.SGD(tm.parameters(), lr=lr, momentum=mom,
                          weight_decay=wd)
    ce = nn.CrossEntropyLoss()
    ref_losses = []
    for imgs, labels in batches:
        opt.zero_grad()
        loss = ce(tm(torch.tensor(imgs).permute(0, 3, 1, 2)),
                  torch.tensor(labels))
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    tx = optim.build_optimizer("sgd", lr, weight_decay=wd, momentum=mom)
    train_step, _ = steps.make_classifier_steps(
        TINY, tx, compute_dtype=jnp.float32, attn_backend="xla")
    opt_state = tx.init(params)
    our_losses = []
    for imgs, labels in batches:
        params, opt_state, loss, _ = train_step(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(labels))
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4, atol=1e-5)


def test_lp_long_horizon_matches_torch():
    """LONG-horizon linear-probe parity (VERDICT r3 #4a): 60 SGD-momentum
    steps across 5 epochs with the per-EPOCH cosine LR crossing four epoch
    boundaries, reference LP protocol (freeze all but head + model.eval,
    finetune :283-287, :682-685, :870-881). Asserts the full 60-point loss
    curve, final head params, and bit-frozen backbone."""
    from mfvit_tpu.train import optim, steps

    torch.manual_seed(31)
    tm = TorchViT(TINY).eval()
    params = jax.tree.map(
        jnp.copy, ckpt.torch_vit_to_params(tm.state_dict_vits_names(), TINY))
    epochs, spe, bs = 5, 12, 4
    init_lr, wd, mom = 0.3, 1e-4, 0.9
    rng = np.random.default_rng(32)
    batches = [(rng.normal(size=(bs, 32, 32, 3)).astype(np.float32),
                rng.integers(0, 3, bs)) for _ in range(epochs * spe)]

    for n, p in tm.named_parameters():
        p.requires_grad = n.startswith("head")
    opt = torch.optim.SGD([p for p in tm.parameters() if p.requires_grad],
                          lr=init_lr, momentum=mom, weight_decay=wd)
    ce = nn.CrossEntropyLoss()
    ref_losses = []
    for e in range(epochs):
        # the reference's per-epoch cosine adjust (finetune :870-881)
        for g in opt.param_groups:
            g["lr"] = init_lr * 0.5 * (1.0 + math.cos(math.pi * e / epochs))
        for imgs, labels in batches[e * spe:(e + 1) * spe]:
            opt.zero_grad()
            loss = ce(tm(torch.tensor(imgs).permute(0, 3, 1, 2)),
                      torch.tensor(labels))
            loss.backward()
            opt.step()
            ref_losses.append(float(loss))

    mask = optim.head_only_mask(params)
    tx = optim.build_optimizer(
        "sgd", optim.finetune_lr(init_lr, epochs, cos=True,
                                 steps_per_epoch=spe),
        weight_decay=wd, momentum=mom, trainable_mask=mask)
    train_step, _ = steps.make_classifier_steps(
        TINY, tx, compute_dtype=jnp.float32, attn_backend="xla")
    frozen_before = jax.device_get(
        {k: v for k, v in params.items() if k != "head"})
    opt_state = tx.init(params)
    our_losses = []
    for imgs, labels in batches:
        params, opt_state, loss, _ = train_step(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(labels))
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4, atol=1e-5)
    # atol 3e-5: fp32 accumulation over 60 momentum updates (measured
    # max drift 1.1e-5 on 1/96 head weights)
    _assert_params_close(
        params["head"],
        ckpt.torch_vit_to_params(tm.state_dict_vits_names(), TINY)["head"],
        rtol=1e-4, atol=3e-5)
    # the sanity_check property: frozen leaves bit-identical after 60 steps
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                {k: v for k, v in params.items() if k != "head"}),
            jax.tree_util.tree_leaves_with_path(frozen_before)):
        np.testing.assert_array_equal(
            np.asarray(a), b, err_msg=jax.tree_util.keystr(pa))


def test_fusion_long_horizon_matches_torch():
    """LONG-horizon fusion-stage parity vs the ACTUAL reference
    Fus_CrossViT: 24 SGD-momentum steps across 3 epochs with the
    per-epoch cosine crossing two epoch boundaries, under the reference
    protocol — the optimizer holds ONLY ``model.parameters()`` of
    Fus_CrossViT (the branch ViTs are stored as bound ``features3D``
    methods, fusion model :80-83, so they are NOT registered submodules
    and never update; fusion main :435-451), and the training loss is
    CE over the summed three logits (fusion main :868-873). Completes
    the three-stage trajectory story: LP (test_lp_long_horizon...),
    MoCo (test_moco_long_horizon...), and now the fusion finetune."""
    import optax

    from mfvit_tpu.train import optim

    mod = _import_reference_fusion()
    rng = np.random.default_rng(41)
    B, N, dim, num_classes = 4, 9, 384, 3
    epochs, spe = 3, 8
    # lr sized for a stable (non-chaotic) trajectory: at 0.05 the tiny
    # head diverges on both sides and amplifies fp32 noise past rtol
    init_lr, wd, mom = 0.005, 1e-4, 0.9
    batches = [
        (rng.normal(size=(B, N, dim)).astype(np.float32),
         rng.normal(size=(B, N, dim)).astype(np.float32),
         rng.normal(size=(B, num_classes)).astype(np.float32),
         rng.normal(size=(B, num_classes)).astype(np.float32),
         rng.integers(0, num_classes, B))
        for _ in range(epochs * spe)]

    torch.manual_seed(41)
    fake_c = _FakeViT(batches[0][0], batches[0][2])
    fake_e = _FakeViT(batches[0][1], batches[0][3])
    ref_model = mod.Fus_CrossViT(fake_c, fake_e).train()
    # .copy(): detach().numpy() aliases the live parameters, which the
    # torch SGD loop below mutates in place
    sd0 = {k: v.detach().numpy().copy()
           for k, v in ref_model.state_dict().items()}
    # the reference optimizer set: exactly the Fus_CrossViT parameters
    parameters = [p for p in ref_model.parameters() if p.requires_grad]
    opt = torch.optim.SGD(parameters, lr=init_lr, momentum=mom,
                          weight_decay=wd)
    ce = nn.CrossEntropyLoss()
    dummy = torch.zeros(B, 3, 224, 224)
    ref_losses = []
    for e in range(epochs):
        # per-epoch cosine (fusion main :1044-1053)
        for g in opt.param_groups:
            g["lr"] = init_lr * 0.5 * (1.0 + math.cos(math.pi * e / epochs))
        for tc, te, xc, xe, y in batches[e * spe:(e + 1) * spe]:
            fake_c._tokens, fake_c._logits = torch.tensor(tc), torch.tensor(xc)
            fake_e._tokens, fake_e._logits = torch.tensor(te), torch.tensor(xe)
            opt.zero_grad()
            fused, out_c, out_e = ref_model(fake_c, fake_e, dummy, dummy)
            loss = ce(fused + out_c + out_e, torch.tensor(y).long())
            loss.backward()
            opt.step()
            ref_losses.append(float(loss.detach()))

    fparams = jax.tree.map(jnp.copy, ckpt.torch_fusion_to_params(sd0))
    tx = optim.build_optimizer(
        "sgd", optim.finetune_lr(init_lr, epochs, cos=True,
                                 steps_per_epoch=spe),
        weight_decay=wd, momentum=mom)
    opt_state = tx.init(fparams)

    @jax.jit
    def step(fp, os_, tc, te, xc, xe, y):
        def loss_fn(fp):
            out = fusion.apply(fp, tc, te, heads=3) + xc + xe
            logp = jax.nn.log_softmax(out, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(fp)
        updates, os_ = tx.update(grads, os_, fp)
        return optax.apply_updates(fp, updates), os_, loss

    our_losses = []
    for tc, te, xc, xe, y in batches:
        fparams, opt_state, loss = step(
            fparams, opt_state, jnp.asarray(tc), jnp.asarray(te),
            jnp.asarray(xc), jnp.asarray(xe), jnp.asarray(y))
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4, atol=1e-5)
    final_ref = ckpt.torch_fusion_to_params(
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()})
    # atol 3e-5: fp32 accumulation over 24 momentum updates (same
    # sizing as the LP long-horizon test)
    _assert_params_close(fparams, final_ref, rtol=1e-4, atol=3e-5)


# ----------------------- MoCo objective parity vs the REFERENCE builder --
# THE pretraining objective (SURVEY §2.3): forward_v2_queue must match the
# actual builder_vit_mocov3structure_mocov2loss.MoCo_ViT imported from
# /root/reference — logits, loss, EMA update, and queue ring — on identical
# weights and batches (fp32, single-process gloo 'DDP').

def _init_single_process_dist(tmp_path):
    import torch.distributed as dist
    if dist.is_initialized():
        return
    dist.init_process_group(
        "gloo", init_method=f"file://{tmp_path}/dist_init",
        world_size=1, rank=0)


def _torch_mlp_to_params(seq):
    """torch Sequential from MoCo's _build_mlp -> our ssl.moco MLP pytree
    ({'layers': [{'lin', 'bn'|'bn_noaffine'?}, ...]})."""
    layers = []
    cur = None
    for m in seq:
        if isinstance(m, nn.Linear):
            if cur is not None:
                layers.append(cur)
            cur = {"lin": {"w": jnp.asarray(m.weight.detach().numpy().T)}}
            if m.bias is not None:
                cur["lin"]["b"] = jnp.asarray(m.bias.detach().numpy())
        elif isinstance(m, nn.ReLU):
            # BN-free stack (v2-classic): plain ReLU between Linears
            if "bn" not in cur:
                cur["relu_marker"] = jnp.zeros((0,), jnp.float32)
        elif isinstance(m, nn.BatchNorm1d):
            bn = {"mean": jnp.asarray(m.running_mean.numpy()),
                  "var": jnp.asarray(m.running_var.numpy())}
            if m.affine:
                bn["scale"] = jnp.asarray(m.weight.detach().numpy())
                bn["bias"] = jnp.asarray(m.bias.detach().numpy())
                cur["bn"] = bn
            else:
                cur["bn_noaffine"] = bn
    layers.append(cur)
    return {"layers": layers}


def _moco_tower_to_params(torch_vit, cfg):
    return {
        "encoder": ckpt.torch_vit_to_params(
            torch_vit.state_dict_vits_names(include_head=False), cfg,
            expect_head=False),
        "projector": _torch_mlp_to_params(torch_vit.head),
    }


@pytest.mark.parametrize("predictor_on_keys", [True, False])
def test_moco_v2queue_matches_reference_builder(tmp_path, predictor_on_keys):
    """forward_v2_queue vs the reference MoCo_ViT (and its
    _noprediction_q twin): identical weights/batch -> same logits, loss,
    EMA'd momentum tower, and queue contents."""
    import importlib

    from mfvit_tpu.ssl import moco

    _init_single_process_dist(tmp_path)
    # the reference hardcodes .cuda() on the shuffle permutation and the
    # labels — run it CPU-only by stubbing Tensor.cuda
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        sys.path.insert(0, "/root/reference/moco_pretraining/moco")
        name = ("moco.builder_vit_mocov3structure_mocov2loss"
                + ("" if predictor_on_keys else "_noprediction_q"))
        mod = importlib.import_module(name)

        torch.manual_seed(7)
        dim, mlp_dim, T, m = 16, 32, 0.2, 0.97
        args = types.SimpleNamespace(arch="vit_small")
        ref = mod.MoCo_ViT(lambda num_classes: TorchViT(TINY, num_classes),
                           args, dim=dim, mlp_dim=mlp_dim, T=T)
        # make the EMA non-trivial: momentum tower must differ from base
        with torch.no_grad():
            for p in ref.momentum_encoder.parameters():
                p.add_(0.01 * torch.randn_like(p))

        cfg = moco.MoCoConfig(dim=dim, mlp_dim=mlp_dim, K=ref.K, T=T,
                              predictor_on_keys=predictor_on_keys,
                              stop_grad_conv1=False)
        state = {
            "base": _moco_tower_to_params(ref.base_encoder, TINY),
            "momentum": _moco_tower_to_params(ref.momentum_encoder, TINY),
            "predictor": _torch_mlp_to_params(ref.predictor),
            # np.copy: on CPU jnp.asarray aliases the torch storage, and
            # the reference's _dequeue_and_enqueue mutates it in place
            "queue": jnp.asarray(np.copy(ref.queue.numpy())),
            "queue_ptr": jnp.zeros((), jnp.int32),
        }

        rng = np.random.default_rng(8)
        im_q = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
        im_k = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
        tq = torch.tensor(im_q).permute(0, 3, 1, 2)
        tk = torch.tensor(im_k).permute(0, 3, 1, 2)

        logits_t, labels_t = ref(tq, tk, m)
        loss_t = nn.CrossEntropyLoss()(logits_t, labels_t)

        loss_j, aux = moco.forward_v2_queue(
            state, jnp.asarray(im_q), jnp.asarray(im_k), m, cfg, TINY,
            compute_dtype=jnp.float32)

        np.testing.assert_allclose(
            np.asarray(aux["logits"]), logits_t.detach().numpy(),
            rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
        # queue ring updated identically (reference enqueues in place)
        np.testing.assert_allclose(np.asarray(aux["queue"]),
                                   ref.queue.numpy(), rtol=1e-4, atol=1e-4)
        assert int(aux["queue_ptr"]) == int(ref.queue_ptr)
        # EMA'd momentum tower parameters match (spot-check via converter)
        ema_ref = _moco_tower_to_params(ref.momentum_encoder, TINY)
        _assert_params_close(aux["momentum"]["encoder"],
                             ema_ref["encoder"], rtol=1e-5, atol=1e-6)
    finally:
        torch.Tensor.cuda = orig_cuda


def test_moco_v3symmetric_matches_reference_builder(tmp_path):
    """forward_v3_symmetric vs the reference builder_vit.MoCo_ViT: same
    weights/views -> same symmetric loss and EMA'd momentum tower."""
    import importlib

    from mfvit_tpu.ssl import moco

    _init_single_process_dist(tmp_path)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        sys.path.insert(0, "/root/reference/moco_pretraining/moco")
        mod = importlib.import_module("moco.builder_vit")

        torch.manual_seed(9)
        dim, mlp_dim, T, m = 16, 32, 0.2, 0.95
        args = types.SimpleNamespace(arch="vit_small")
        ref = mod.MoCo_ViT(lambda num_classes: TorchViT(TINY, num_classes),
                           args, dim=dim, mlp_dim=mlp_dim, T=T)
        with torch.no_grad():
            for p in ref.momentum_encoder.parameters():
                p.add_(0.01 * torch.randn_like(p))

        cfg = moco.MoCoConfig(dim=dim, mlp_dim=mlp_dim, T=T,
                              loss="v3_symmetric", stop_grad_conv1=False)
        state = {
            "base": _moco_tower_to_params(ref.base_encoder, TINY),
            "momentum": _moco_tower_to_params(ref.momentum_encoder, TINY),
            "predictor": _torch_mlp_to_params(ref.predictor),
            "queue": jnp.zeros((dim, cfg.K)),
            "queue_ptr": jnp.zeros((), jnp.int32),
        }

        rng = np.random.default_rng(10)
        x1 = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
        x2 = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
        loss_t = ref(torch.tensor(x1).permute(0, 3, 1, 2),
                     torch.tensor(x2).permute(0, 3, 1, 2), m)

        loss_j, aux = moco.forward_v3_symmetric(
            state, jnp.asarray(x1), jnp.asarray(x2), m, cfg, TINY,
            compute_dtype=jnp.float32)
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)
        ema_ref = _moco_tower_to_params(ref.momentum_encoder, TINY)
        _assert_params_close(aux["momentum"]["encoder"],
                             ema_ref["encoder"], rtol=1e-5, atol=1e-6)
    finally:
        torch.Tensor.cuda = orig_cuda


def test_moco_v2classic_matches_reference_builder(tmp_path):
    """MoCoConfig.v2_classic vs the reference builder.py MoCo (resnet18,
    2-layer bias-ful BN-free mlp head, no predictor, fixed m): same
    logits/loss/queue."""
    import importlib

    from mfvit_tpu.nn import resnet
    from mfvit_tpu.ssl import moco

    _init_single_process_dist(tmp_path)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        sys.path.insert(0, "/root/reference/moco_pretraining/moco")
        mod = importlib.import_module("moco.builder")

        torch.manual_seed(11)
        # builder.py's mlp surgery keys on __class__.__name__ == 'ResNet'
        ResNet = type("ResNet", (_TorchResNet18,), {})
        dim, K, m, T = 16, 32, 0.999, 0.07
        ref = mod.MoCo(lambda num_classes: ResNet(num_classes),
                       dim=dim, K=K, m=m, T=T, mlp=True)
        with torch.no_grad():
            for p in ref.encoder_k.parameters():
                p.add_(0.01 * torch.randn_like(p))

        rcfg = resnet.get_config("resnet18")
        # the reference mlp hidden dim IS the backbone width (fc
        # in_features = 512), not the v3-style 4096
        cfg = moco.MoCoConfig.v2_classic(dim=dim, K=K, m=m, T=T,
                                         mlp_dim=512)

        def tower(enc):
            sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()
                  if "num_batches_tracked" not in k and not k.startswith("fc.")}
            return {"encoder": ckpt.torch_resnet_to_params(
                        sd, rcfg, expect_fc=False),
                    "projector": _torch_mlp_to_params(enc.fc)}

        state = {
            "base": tower(ref.encoder_q),
            "momentum": tower(ref.encoder_k),
            "predictor": {"layers": []},
            "queue": jnp.asarray(np.copy(ref.queue.numpy())),
            "queue_ptr": jnp.zeros((), jnp.int32),
        }

        rng = np.random.default_rng(12)
        im_q = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
        im_k = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
        logits_t, labels_t = ref(torch.tensor(im_q).permute(0, 3, 1, 2),
                                 torch.tensor(im_k).permute(0, 3, 1, 2))
        loss_t = nn.CrossEntropyLoss()(logits_t, labels_t)

        loss_j, aux = moco.forward_v2_queue(
            state, jnp.asarray(im_q), jnp.asarray(im_k), m, cfg, rcfg,
            compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(aux["logits"]), logits_t.detach().numpy(),
            rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(aux["queue"]),
                                   ref.queue.numpy(), rtol=1e-3, atol=1e-3)
    finally:
        torch.Tensor.cuda = orig_cuda


# ---------- MoCo TRAIN-STEP parity: backward through THE objective -------
# Two full optimizer steps of the imported reference builder (torch
# autograd + torch.optim) vs moco.make_pretrain_step on identical weights
# and batches: per-leaf base + predictor parameters, the EMA'd momentum
# tower, and BN running stats must all match. This proves the gradient
# path through projector/predictor BatchNorms, stop_grad placement, and
# predictor-on-keys (builder...mocov2loss.py:154-199, trained at pretrain
# main :533-548).

@pytest.mark.parametrize("opt_name,predictor_on_keys", [
    ("sgd", True), ("adamw", True), ("sgd", False)])
def test_moco_train_step_matches_torch(tmp_path, opt_name, predictor_on_keys):
    import importlib

    import optax

    from mfvit_tpu.ssl import moco

    _init_single_process_dist(tmp_path)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        sys.path.insert(0, "/root/reference/moco_pretraining/moco")
        name = ("moco.builder_vit_mocov3structure_mocov2loss"
                + ("" if predictor_on_keys else "_noprediction_q"))
        mod = importlib.import_module(name)

        torch.manual_seed(21)
        dim, mlp_dim, T, m = 16, 32, 0.2, 0.97
        args = types.SimpleNamespace(arch="vit_small")
        ref = mod.MoCo_ViT(lambda num_classes: TorchViT(TINY, num_classes),
                           args, dim=dim, mlp_dim=mlp_dim, T=T)
        with torch.no_grad():
            for p in ref.momentum_encoder.parameters():
                p.add_(0.01 * torch.randn_like(p))

        cfg = moco.MoCoConfig(dim=dim, mlp_dim=mlp_dim, K=ref.K, T=T,
                              predictor_on_keys=predictor_on_keys,
                              stop_grad_conv1=False)
        state = {
            "base": _moco_tower_to_params(ref.base_encoder, TINY),
            "momentum": _moco_tower_to_params(ref.momentum_encoder, TINY),
            "predictor": _torch_mlp_to_params(ref.predictor),
            "queue": jnp.asarray(np.copy(ref.queue.numpy())),
            "queue_ptr": jnp.zeros((), jnp.int32),
        }
        # the converters hand out numpy VIEWS of torch storage and CPU jax
        # aliases them zero-copy; torch's optimizer mutates params in place,
        # so deep-copy every leaf before stepping both sides
        state = jax.tree.map(
            lambda a: jnp.asarray(np.copy(np.asarray(a))), state)

        # optimizer over trainable params only (momentum tower has
        # requires_grad=False), like the pretrain main's model.parameters()
        train_params = [p for p in ref.parameters() if p.requires_grad]
        if opt_name == "sgd":
            opt_t = torch.optim.SGD(train_params, lr=0.05, momentum=0.9)
            tx = optax.sgd(0.05, momentum=0.9)
        else:
            opt_t = torch.optim.AdamW(train_params, lr=1e-3, weight_decay=0.1)
            tx = optax.adamw(1e-3, weight_decay=0.1)

        step = moco.make_pretrain_step(cfg, TINY, tx,
                                       compute_dtype=jnp.float32)
        opt_state = tx.init({"base": state["base"],
                             "predictor": state["predictor"]})
        crit = nn.CrossEntropyLoss()

        def jax_loss(gp, st, iq, ik):
            s2 = dict(st, base=gp["base"], predictor=gp["predictor"])
            loss, _ = moco.forward_v2_queue(
                s2, iq, ik, m, cfg, TINY, compute_dtype=jnp.float32)
            return loss

        rng = np.random.default_rng(22)
        ref.train()
        for it in range(2):
            im_q = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
            im_k = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
            logits_t, labels_t = ref(torch.tensor(im_q).permute(0, 3, 1, 2),
                                     torch.tensor(im_k).permute(0, 3, 1, 2),
                                     m)
            loss_t = crit(logits_t, labels_t)
            opt_t.zero_grad()
            loss_t.backward()

            if it == 0:
                # THE backward check: per-leaf gradients through the
                # v2-queue objective (projector/predictor BNs, stop_grad
                # placement, predictor-on-keys) vs torch autograd. Reuse
                # the param converters on a grad-filled clone so the
                # naming logic stays in one place.
                import copy as _copy
                gclone = _copy.deepcopy(ref)
                for pc, po in zip(gclone.parameters(), ref.parameters()):
                    pc.data = (po.grad if po.grad is not None
                               else torch.zeros_like(po)).clone()
                for buf in gclone.buffers():
                    buf.zero_()  # BN running stats carry no gradient
                tgrads = {
                    "base": _moco_tower_to_params(gclone.base_encoder, TINY),
                    "predictor": _torch_mlp_to_params(gclone.predictor),
                }
                jgrads = jax.grad(jax_loss)(
                    {"base": state["base"], "predictor": state["predictor"]},
                    state, jnp.asarray(im_q), jnp.asarray(im_k))
                _assert_params_close(jgrads["base"], tgrads["base"],
                                     rtol=1e-3, atol=2e-4)
                _assert_params_close(jgrads["predictor"],
                                     tgrads["predictor"],
                                     rtol=1e-3, atol=2e-4)

            opt_t.step()
            state, opt_state, loss_j = step(
                state, opt_state, jnp.asarray(im_q), jnp.asarray(im_k), m)
            # the step-2 loss is computed from the step-1-updated state on
            # both sides, so rtol 1e-5 here pins params/EMA/queue threading
            np.testing.assert_allclose(float(loss_j), float(loss_t),
                                       rtol=1e-5, atol=1e-6)

        # Param compare after two optimizer steps. Gradients are asserted
        # tightly above; this checks the optimizer update + state merge.
        # atol 3e-3 on the gradient-updated towers: step-2 gradients sit
        # at slightly-perturbed params, where an isolated ReLU kink or
        # softmax sign flip (measured: 1/6144 elements at 5e-4 under SGD)
        # and AdamW's sqrt-normalized update on near-zero grads (+-lr =
        # 2e-3 diffs on ~15/96 bias elements) are intrinsic float noise,
        # not semantics — semantic errors show up at >=1e-1 across whole
        # leaves. A double AdamW sign flip can reach ~4*lr = 4e-3, so the
        # adamw case gets 5e-3. The momentum tower is the EMA of PRE-step
        # base params, which attenuates that noise by (1-m); it must
        # match tightly.
        tower_atol = 5e-3 if opt_name == "adamw" else 3e-3
        _assert_params_close(state["base"],
                             _moco_tower_to_params(ref.base_encoder, TINY),
                             rtol=1e-3, atol=tower_atol)
        _assert_params_close(state["predictor"],
                             _torch_mlp_to_params(ref.predictor),
                             rtol=1e-3, atol=tower_atol)
        _assert_params_close(
            state["momentum"],
            _moco_tower_to_params(ref.momentum_encoder, TINY),
            rtol=1e-4, atol=5e-4)
    finally:
        torch.Tensor.cuda = orig_cuda


def test_moco_long_horizon_queue_wrap_mcos_matches_torch(tmp_path):
    """LONG-horizon MoCo v2-queue parity (VERDICT r3 #4b): 32 optimizer
    steps vs the imported reference builder with K=32 so the queue pointer
    WRAPS four times, and the --moco-m-cos momentum ramp active (per-iter
    fractional-epoch cosine, pretrain :514, :626-629). Asserts the full
    loss curve, final towers/queue, and that optim.moco_momentum equals
    the reference's adjust_moco_momentum formula."""
    import importlib

    from mfvit_tpu.ssl import moco
    from mfvit_tpu.train import optim

    _init_single_process_dist(tmp_path)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        sys.path.insert(0, "/root/reference/moco_pretraining/moco")
        mod = importlib.import_module(
            "moco.builder_vit_mocov3structure_mocov2loss")

        torch.manual_seed(41)
        dim, mlp_dim, T, m0 = 16, 32, 0.2, 0.9
        n_steps, bs, spe, epochs = 32, 4, 8, 4
        K = 32  # ptr wraps at step 8; 4 full wraps over the run
        args = types.SimpleNamespace(arch="vit_small")
        ref = mod.MoCo_ViT(lambda num_classes: TorchViT(TINY, num_classes),
                           args, dim=dim, mlp_dim=mlp_dim, T=T)
        ref.K = K
        ref.register_buffer("queue", torch.randn(dim, K))
        ref.queue = nn.functional.normalize(ref.queue, dim=0)
        ref.register_buffer("queue_ptr", torch.zeros(1, dtype=torch.long))
        with torch.no_grad():
            for p in ref.momentum_encoder.parameters():
                p.add_(0.01 * torch.randn_like(p))

        cfg = moco.MoCoConfig(dim=dim, mlp_dim=mlp_dim, K=K, T=T,
                              stop_grad_conv1=False)
        state = {
            "base": _moco_tower_to_params(ref.base_encoder, TINY),
            "momentum": _moco_tower_to_params(ref.momentum_encoder, TINY),
            "predictor": _torch_mlp_to_params(ref.predictor),
            "queue": jnp.asarray(np.copy(ref.queue.numpy())),
            "queue_ptr": jnp.zeros((), jnp.int32),
        }
        state = jax.tree.map(
            lambda a: jnp.asarray(np.copy(np.asarray(a))), state)

        # Tolerance design (measured): with lr=0 (pure structural path —
        # queue ring over 4 wraps, EMA m-cos ramp, BN stats) the two
        # frameworks stay glued at rel<=4e-5 for all 32 steps. With ANY
        # nonzero lr, isolated ReLU/softmax kink flips inject O(1)
        # per-element gradient jumps whose effect is lr-INDEPENDENT and
        # compounds ~10x/step once seeded — intrinsic fp32 physics, not
        # semantics. lr=2e-5 keeps the first 12 steps at rel<=2e-5
        # (asserted tightly) and the full horizon at rel<=6e-3.
        train_params = [p for p in ref.parameters() if p.requires_grad]
        opt_t = torch.optim.SGD(train_params, lr=2e-5, momentum=0.9)
        tx = __import__("optax").sgd(2e-5, momentum=0.9)
        step = moco.make_pretrain_step(cfg, TINY, tx,
                                       compute_dtype=jnp.float32)
        opt_state = tx.init({"base": state["base"],
                             "predictor": state["predictor"]})
        crit = nn.CrossEntropyLoss()

        def ref_adjust_moco_momentum(epoch):
            # pretrain main :626-629, verbatim formula
            return 1.0 - 0.5 * (
                1.0 + math.cos(math.pi * epoch / epochs)) * (1.0 - m0)

        rng = np.random.default_rng(42)
        ref.train()
        ref_losses, our_losses = [], []
        for it in range(n_steps):
            efrac = (it // spe) + (it % spe) / spe  # pretrain :514
            m = ref_adjust_moco_momentum(efrac)
            np.testing.assert_allclose(
                optim.moco_momentum(efrac, m0, epochs), m, rtol=1e-12)
            im_q = rng.normal(size=(bs, 32, 32, 3)).astype(np.float32)
            im_k = rng.normal(size=(bs, 32, 32, 3)).astype(np.float32)
            logits_t, labels_t = ref(torch.tensor(im_q).permute(0, 3, 1, 2),
                                     torch.tensor(im_k).permute(0, 3, 1, 2),
                                     m)
            loss_t = crit(logits_t, labels_t)
            opt_t.zero_grad()
            loss_t.backward()
            opt_t.step()
            ref_losses.append(float(loss_t))
            state, opt_state, loss_j = step(
                state, opt_state, jnp.asarray(im_q), jnp.asarray(im_k),
                jnp.float32(m))
            our_losses.append(float(loss_j))

        # four full queue wraps: pointer back at 0 on both sides
        assert int(state["queue_ptr"]) == 0
        assert int(ref.queue_ptr) == 0
        np.testing.assert_allclose(our_losses[:12], ref_losses[:12],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(our_losses, ref_losses,
                                   rtol=2e-2, atol=1e-3)
        np.testing.assert_allclose(np.asarray(state["queue"]),
                                   ref.queue.numpy(), rtol=1e-2, atol=1e-3)
        # atol 5e-3: isolated kink-flipped elements reach ~5e-4 on weights
        # and ~1.4e-3 on BN running means (64 accumulated batch-stat
        # snapshots) over the horizon — measured, single-element; semantic
        # errors show up at >=1e-1 across whole leaves
        _assert_params_close(state["base"],
                             _moco_tower_to_params(ref.base_encoder, TINY),
                             rtol=1e-3, atol=5e-3)
        _assert_params_close(
            state["momentum"],
            _moco_tower_to_params(ref.momentum_encoder, TINY),
            rtol=1e-3, atol=5e-3)
    finally:
        torch.Tensor.cuda = orig_cuda


# ---------------------------- export: pytree -> torch (interop round-trip)

def test_vit_export_roundtrip():
    """params_to_torch_vit is the exact inverse of the proven-correct
    import converter: import(export(p)) == p bit-for-bit."""
    params = vit.init(jax.random.PRNGKey(0), TINY, num_classes=3)
    sd = ckpt.params_to_torch_vit(params, TINY)
    back = ckpt.torch_vit_to_params(sd, TINY)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_fusion_export_roundtrip():
    params = fusion.init(jax.random.PRNGKey(1), num_classes=3, dim=32,
                         heads=2)
    sd = ckpt.fusion_params_to_torch(params)
    back = ckpt.torch_fusion_to_params(sd)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_moco_export_feeds_reference_finetune_surgery(tmp_path):
    """A TPU MoCo pretrain exported with save_moco_torch_checkpoint is
    consumable by the reference finetune --pretrained surgery (module.
    base_encoder. strip + projector-head drop, finetune :312-337) — the
    recovered backbone equals the exported base encoder, and the torch
    file itself round-trips through torch.load."""
    from mfvit_tpu.ssl import moco

    cfg = moco.MoCoConfig(dim=8, mlp_dim=16, K=32, T=0.2,
                          stop_grad_conv1=False)
    state = moco.init(jax.random.PRNGKey(2), cfg, TINY)
    path = str(tmp_path / "moco_tpu.pth.tar")
    ckpt.save_moco_torch_checkpoint(path, state, TINY, epoch=7)

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 7
    assert "module.base_encoder.cls_token" in loaded["state_dict"]
    assert "module.queue" in loaded["state_dict"]

    backbone = ckpt.load_moco_pretrained_backbone(path, TINY)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                state["base"]["encoder"])[0],
            jax.tree_util.tree_flatten_with_path(backbone)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
