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

GOLDEN_VIT = np.array([
    [-0.014143640175461769, -0.08462328463792801, -0.021885765716433525],
    [-0.024859586730599403, 0.015461243689060211, 0.03353291004896164]])
GOLDEN_FUSED = np.array([
    [-0.08485689759254456, -0.16199424862861633, 0.32581454515457153],
    [-0.25197914242744446, -0.271626353263855, 0.1494489163160324]])


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
