import jax
import jax.numpy as jnp
import numpy as np

from mfvit_tpu.models import fusion
from mfvit_tpu.nn import vit


def test_fusion_head_shapes(rng):
    p = fusion.init(rng, num_classes=3, dim=384)
    cxr = jax.random.normal(jax.random.PRNGKey(1), (2, 197, 384))
    enh = jax.random.normal(jax.random.PRNGKey(2), (2, 197, 384))
    out = fusion.apply(p, cxr, enh)
    assert out.shape == (2, 3)
    assert out.dtype == jnp.float32


def test_fusion_is_sum_of_dual_heads(rng):
    """fused = head_cxr(CLS(cxr_fus)) + head_enh(CLS(enh_fus))."""
    p = fusion.init(rng, num_classes=3)
    cxr = jax.random.normal(jax.random.PRNGKey(1), (2, 197, 384))
    enh = jax.random.normal(jax.random.PRNGKey(2), (2, 197, 384))
    cxr_ca, enh_ca = fusion.encode(p, cxr, enh)
    cls_c = np.asarray((cxr + cxr_ca))[:, 0]
    cls_e = np.asarray((enh + enh_ca))[:, 0]
    hc = cls_c @ np.asarray(p["head_cxr"]["w"]) + np.asarray(p["head_cxr"]["b"])
    he = cls_e @ np.asarray(p["head_enh"]["w"]) + np.asarray(p["head_enh"]["b"])
    np.testing.assert_allclose(np.asarray(fusion.apply(p, cxr, enh)), hc + he,
                               atol=1e-5, rtol=1e-5)


def test_patch_tokens_pass_through_with_norm(rng):
    """Only the CLS position is cross-attended; patch positions of the output
    are LayerNorm of the input patches (reference re-cats own patches)."""
    p = fusion.init(rng, num_classes=3)
    cxr = jax.random.normal(jax.random.PRNGKey(3), (1, 9, 384))
    enh = jax.random.normal(jax.random.PRNGKey(4), (1, 9, 384))
    cxr_ca, _ = fusion.encode(p, cxr, enh)
    # fresh-init LN is identity-scaled: normed patches, not raw patches
    xf = np.asarray(cxr)[0, 1:]
    mu = xf.mean(-1, keepdims=True)
    sd = np.sqrt(((xf - mu) ** 2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(np.asarray(cxr_ca)[0, 1:], (xf - mu) / sd,
                               atol=1e-4, rtol=1e-4)


def test_fused_forward_end_to_end(rng):
    cfg = vit.get_config("vit_small", img_size=32)  # tiny spatial for speed
    k1, k2, k3 = jax.random.split(rng, 3)
    vp_c = vit.init(k1, cfg, num_classes=3)
    vp_e = vit.init(k2, cfg, num_classes=3)
    fp = fusion.init(k3, num_classes=3)
    img = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 32, 3))
    fused, lc, le = fusion.fused_forward(vp_c, vp_e, fp, img, img, cfg,
                                         compute_dtype=jnp.float32)
    assert fused.shape == lc.shape == le.shape == (2, 3)
    # decision logits = fused + branch logits (reference fusion main :868)
    decision = fused + lc + le
    assert np.isfinite(np.asarray(decision)).all()
    # branch logits must equal a standalone ViT forward (single-pass fusion
    # fixes the reference double-forward without changing numbers)
    lc_ref = vit.apply(vp_c, img, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lc_ref),
                               atol=1e-6, rtol=1e-6)


def test_fused_forward_full_size_composed_parity(rng):
    """Full-size spot check (VERDICT r2 #5): the single-pass fused MF-ViT
    CA forward at the production config (ViT-S/16 @224, N=197) equals the
    composed path (standalone ViT tokens+logits -> fusion head) in fp32.
    Together with the full-size torch-parity tests of each component this
    closes the real-shape chain (SURVEY §2.2)."""
    cfg = vit.get_config("vit_small")
    k1, k2, k3 = jax.random.split(rng, 3)
    vp_c = vit.init(k1, cfg, num_classes=3)
    vp_e = vit.init(k2, cfg, num_classes=3)
    fp = fusion.init(k3, num_classes=3)
    img_c = jax.random.normal(jax.random.PRNGKey(11), (2, 224, 224, 3))
    img_e = jax.random.normal(jax.random.PRNGKey(12), (2, 224, 224, 3))
    fused, lc, le = fusion.fused_forward(vp_c, vp_e, fp, img_c, img_e, cfg,
                                         compute_dtype=jnp.float32,
                                         attn_backend="xla")
    tok_c, lc_ref = vit.apply(vp_c, img_c, cfg, compute_dtype=jnp.float32,
                              attn_backend="xla", return_features=True)
    tok_e, le_ref = vit.apply(vp_e, img_e, cfg, compute_dtype=jnp.float32,
                              attn_backend="xla", return_features=True)
    fused_ref = fusion.apply(fp, tok_c, tok_e, heads=3, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lc_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(le), np.asarray(le_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(fused_ref),
                               rtol=1e-5, atol=1e-5)
