"""Golden-value regression: fixed seed -> recorded fp32 logits (CPU/XLA
path). Catches unintended numeric drift in the model math across
refactors. Regenerate deliberately (and note why) if the math changes:
  python -c "...see git history of this file..."
"""
import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.models import fusion
from mfvit_tpu.nn import vit

# Regenerated 2026-08-17: vit.init now matches MoCo-v3 vits.py exactly
# (qkv xavier bound over the per-matrix fan = sqrt(3/dim), CLS token
# normal(std=1e-6) instead of trunc_normal(0.02)) — a deliberate
# init-parity fix, not numeric drift in the model math.
GOLDEN_VIT = np.array([
    [-0.04716959223151207, -0.07544247806072235, -0.0040445635095238686],
    [-0.12429721653461456, 0.01549664419144392, 0.10771092772483826]])
GOLDEN_FUSED = np.array([
    [-0.09786687791347504, -0.2903493642807007, 0.43848717212677],
    [-0.46936529874801636, -0.24124327301979065, 0.30901283025741577]])


def test_golden_logits():
    cfg = vit.ViTConfig("g", img_size=32, patch=16, dim=32, depth=2, heads=2)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(42), 3)
    vp = vit.init(k1, cfg, num_classes=3)
    fp = fusion.init(k2, num_classes=3, dim=32, heads=2)
    img = jax.random.normal(k3, (2, 32, 32, 3))
    logits = vit.apply(vp, img, cfg, compute_dtype=jnp.float32,
                       attn_backend="xla")
    np.testing.assert_allclose(np.asarray(logits), GOLDEN_VIT,
                               rtol=1e-5, atol=1e-6)
    fused, lc, le = fusion.fused_forward(vp, vp, fp, img, img, cfg, heads=2,
                                         compute_dtype=jnp.float32,
                                         attn_backend="xla")
    np.testing.assert_allclose(np.asarray(fused + lc + le), GOLDEN_FUSED,
                               rtol=1e-5, atol=1e-6)
