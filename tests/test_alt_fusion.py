"""Alternative fusion heads: ViT+CNN cross-attention (crossvit.py) and
TransFuser GPT fusion (fuseattention.py), plus the resnet backbone."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfvit_tpu.models import crossvit_cnn, gpt_fusion
from mfvit_tpu.nn import resnet, vit

TINY_VIT = vit.ViTConfig("t", img_size=32, patch=16, dim=32, depth=1, heads=2)


def test_resnet_backbone_shapes(rng):
    cfg = resnet.get_config("resnet18")
    p = resnet.init(rng, cfg, num_classes=3)
    x = jax.random.normal(rng, (2, 64, 64, 3))
    logits, _ = resnet.apply(p, x, cfg, compute_dtype=jnp.float32)
    assert logits.shape == (2, 3)
    fm, _ = resnet.apply(p, x, cfg, return_featmap=True,
                         compute_dtype=jnp.float32)
    assert fm.shape == (2, 2, 2, 512)  # 64/32
    # BN running stats update in training
    _, newp = resnet.apply(p, x, cfg, training=True,
                           compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(newp["stem"]["bn"]["mean"]),
                           np.asarray(p["stem"]["bn"]["mean"]))


def test_resnet50_bottleneck(rng):
    cfg = resnet.get_config("resnet50")
    p = resnet.init(rng, cfg, num_classes=0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    feats, _ = resnet.apply(p, x, cfg, compute_dtype=jnp.float32)
    assert feats.shape == (1, 2048)


@pytest.mark.slow
def test_crossvit_cnn_fusion(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    fp = crossvit_cnn.init(k1, small_dim=32, large_dim=64, heads=2,
                           dim_head=8, num_classes=3)
    tokens = jax.random.normal(k2, (2, 5, 32))
    featmap = jax.random.normal(k3, (2, 2, 2, 64))
    logits = crossvit_cnn.apply(fp, tokens, featmap, heads=2, dim_head=8)
    assert logits.shape == (2, 3)
    # differentiable end to end
    g = jax.grad(lambda p: jnp.sum(
        crossvit_cnn.apply(p, tokens, featmap, heads=2, dim_head=8) ** 2))(fp)
    assert np.isfinite(
        np.asarray(g["encoders"][0]["layers"][0]["f_sl"]["w"]).sum())


def test_depth2_only_last_layer_reaches_output(rng):
    """Preserved reference quirk (crossvit.py:78-105): the cross-attn loop
    never re-assigns xs (the update at :103 is commented out), so with
    cross_attn_depth=2 the output depends ONLY on the last layer — the
    first layer's params get exactly zero gradient."""
    k1, k2, k3 = jax.random.split(rng, 3)
    fp = crossvit_cnn.init(k1, small_dim=32, large_dim=64, heads=2,
                           dim_head=8, cross_attn_depth=2, num_classes=3)
    tokens = jax.random.normal(k2, (2, 5, 32))
    featmap = jax.random.normal(k3, (2, 2, 2, 64))
    base = crossvit_cnn.apply(fp, tokens, featmap, heads=2, dim_head=8)

    # mutating layer 0 must not change the logits
    import copy
    fp2 = copy.deepcopy(fp)
    fp2["encoders"][0]["layers"][0]["f_sl"]["w"] = (
        fp2["encoders"][0]["layers"][0]["f_sl"]["w"] + 7.0)
    out2 = crossvit_cnn.apply(fp2, tokens, featmap, heads=2, dim_head=8)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out2))

    # and layer 0 gets zero gradient while layer 1 gets nonzero
    g = jax.grad(lambda p: jnp.sum(
        crossvit_cnn.apply(p, tokens, featmap, heads=2, dim_head=8) ** 2))(fp)
    l0 = np.abs(np.asarray(g["encoders"][0]["layers"][0]["f_sl"]["w"])).sum()
    l1 = np.abs(np.asarray(g["encoders"][0]["layers"][1]["f_sl"]["w"])).sum()
    assert l0 == 0.0 and l1 > 0.0


def test_gpt_fusion_vit_arch(rng):
    cfg = gpt_fusion.GPTFusionConfig(arch="vit", n_embd=32, n_head=2,
                                     n_layer=2, vert_anchors=2,
                                     horz_anchors=2)
    p = gpt_fusion.init(rng, cfg, num_classes=3)
    # joint_len = 2*2*2 + 2 = 10 -> two 5-token streams
    assert p["pos_emb"].shape == (1, 10, 32)
    cxr = jax.random.normal(rng, (2, 5, 32))
    enh = jax.random.normal(rng, (2, 5, 32))
    logits = gpt_fusion.apply(p, cxr, enh, cfg)
    assert logits.shape == (2, 3)


def test_gpt_fusion_res_arch(rng):
    cfg = gpt_fusion.GPTFusionConfig(arch="res", n_embd=16, n_head=2,
                                     n_layer=1, vert_anchors=2,
                                     horz_anchors=2)
    p = gpt_fusion.init(rng, cfg, num_classes=3)
    cxr = jax.random.normal(rng, (2, 4, 4, 16))
    enh = jax.random.normal(rng, (2, 4, 4, 16))
    logits = gpt_fusion.apply(p, cxr, enh, cfg)
    assert logits.shape == (2, 3)


def test_gpt_fusion_reference_configs():
    assert gpt_fusion.VIT_CONFIG.joint_len == 2 * 196 + 2  # 14x14 + CLS x2
    assert gpt_fusion.RES18_CONFIG.joint_len == 2 * 49
    assert gpt_fusion.RES18_CONFIG.n_embd == 512


def test_gpt_fusion_matches_reference_fuseattention():
    """gpt_apply vs the ACTUAL reference fuseattention.GPT imported from
    /root/reference (torchvision stubbed — only Encoder needs it):
    identical weights and token streams -> identical joint-GPT outputs
    (fuseattention.py:84-210, eval mode so dropouts are identity)."""
    import sys
    import types

    import torch

    stubbed = "torchvision" not in sys.modules
    if stubbed:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    sys.path.insert(0, "/root/reference/moco_pretraining/moco")
    try:
        from model import fuseattention as ref_fa
    finally:
        if stubbed:
            # don't leak the stub: it would defeat importorskip elsewhere
            del sys.modules["torchvision"], sys.modules["torchvision.models"]

    torch.manual_seed(15)
    B, n_embd, n_head, n_layer, anchors = 2, 32, 2, 2, 4
    args = types.SimpleNamespace(arch="vit_small", pos_embed=True)
    config = types.SimpleNamespace(n_views=1)
    ref = ref_fa.GPT(n_embd=n_embd, n_head=n_head, block_exp=3,
                     n_layer=n_layer, vert_anchors=anchors,
                     horz_anchors=anchors, seq_len=1, embd_pdrop=0.0,
                     attn_pdrop=0.0, resid_pdrop=0.0, args=args,
                     config=config).eval()
    with torch.no_grad():  # zero-init pos_emb would make the test vacuous
        ref.pos_emb.normal_(0, 0.02)

    cfg = gpt_fusion.GPTFusionConfig(
        arch="vit", n_embd=n_embd, n_head=n_head, block_exp=3,
        n_layer=n_layer, vert_anchors=anchors, horz_anchors=anchors)

    def lin(mod):
        return {"w": jnp.asarray(mod.weight.detach().numpy().T),
                "b": jnp.asarray(mod.bias.detach().numpy())}

    def ln(mod):
        return {"scale": jnp.asarray(mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    params = {
        "pos_emb": jnp.asarray(ref.pos_emb.detach().numpy()),
        "ln_f": ln(ref.ln_f),
        "blocks": [{
            "ln1": ln(b.ln1), "ln2": ln(b.ln2),
            "q": lin(b.attn.query), "k": lin(b.attn.key),
            "v": lin(b.attn.value), "proj": lin(b.attn.proj),
            "fc1": lin(b.mlp[0]), "fc2": lin(b.mlp[2]),
        } for b in ref.blocks],
    }

    rng = np.random.default_rng(16)
    N = anchors * anchors + 1  # 17 tokens per stream -> joint 34
    cxr = rng.normal(size=(B, N, n_embd)).astype(np.float32)
    enh = rng.normal(size=(B, N, n_embd)).astype(np.float32)
    with torch.no_grad():
        out_c, out_e = ref(torch.tensor(cxr), torch.tensor(enh))
    ref_joint = np.concatenate([out_c.numpy(), out_e.numpy()], axis=1)

    joint = jnp.concatenate([jnp.asarray(cxr), jnp.asarray(enh)], axis=1)
    ours = np.asarray(gpt_fusion.gpt_apply(params, joint, cfg))
    np.testing.assert_allclose(ours, ref_joint, rtol=1e-4, atol=1e-5)
