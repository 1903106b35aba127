"""Parity tests for the fused fusion-head kernel (ops/fused_fusion.py):
interpreter-mode kernel vs the XLA formulation, values AND gradients, plus
the routed fusion.apply fast path vs the general path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfvit_tpu.models import fusion
from mfvit_tpu.ops import fused_fusion as ff

B, N, D, HEADS = 4, 17, 384, 3


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    kp, kc, ke = jax.random.split(key, 3)
    params = fusion.init(kp, num_classes=3, dim=D, heads=HEADS)
    tok_c = jax.random.normal(kc, (B, N, D), jnp.float32)
    tok_e = jax.random.normal(ke, (B, N, D), jnp.float32)
    return params, tok_c, tok_e


def test_kernel_matches_xla_math(setup):
    params, tok_c, tok_e = setup
    flat = ff._flatten_layer(params["encoders"][0]["layers"][0])
    ref_c, ref_e = ff._cls_xla(tok_c, tok_e, flat, HEADS)
    got_c, got_e = ff.fused_fusion_cls(tok_c, tok_e, flat, HEADS, True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(ref_e),
                               rtol=1e-5, atol=1e-5)


def test_cls_xla_matches_general_encode(setup):
    """The CLS-only formulation == full-sequence encode + residual + pool
    (the math identity the kernel rides on)."""
    params, tok_c, tok_e = setup
    flat = ff._flatten_layer(params["encoders"][0]["layers"][0])
    cls_c, cls_e = ff._cls_xla(tok_c, tok_e, flat, HEADS)
    cxr_ca, enh_ca = fusion.encode(params, tok_c, tok_e, HEADS)
    ref_c = (tok_c + cxr_ca)[:, 0]
    ref_e = (tok_e + enh_ca)[:, 0]
    np.testing.assert_allclose(np.asarray(cls_c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls_e), np.asarray(ref_e),
                               rtol=1e-5, atol=1e-5)


def test_apply_fast_path_matches_general(setup):
    params, tok_c, tok_e = setup
    fast = fusion.apply(params, tok_c, tok_e, HEADS,
                        attn_backend="pallas_interpret")
    ref = fusion.apply(params, tok_c, tok_e, HEADS, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_apply_fast_path_bf16(setup):
    params, tok_c, tok_e = setup
    tc = tok_c.astype(jnp.bfloat16)
    te = tok_e.astype(jnp.bfloat16)
    fast = fusion.apply(params, tc, te, HEADS,
                        attn_backend="pallas_interpret")
    ref = fusion.apply(params, tc, te, HEADS, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_gradients_match_general_path(setup):
    """grad through the custom_vjp fast path == grad of the general XLA
    path, for the token streams and every fusion parameter."""
    params, tok_c, tok_e = setup

    def loss(p, tc, te, backend):
        out = fusion.apply(p, tc, te, HEADS, attn_backend=backend)
        return jnp.sum(out ** 2)

    g_fast = jax.grad(loss, argnums=(0, 1, 2))(
        params, tok_c, tok_e, "pallas_interpret")
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(
        params, tok_c, tok_e, "xla")
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_fast),
            jax.tree_util.tree_leaves_with_path(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"grad {jax.tree_util.keystr(pa)}")


def test_unsupported_configs_fall_back():
    """Non-default configs (depth>1, non-lane-aligned head_dim) must route
    through the general path, not the kernel."""
    assert not ff.supported(2, 1, 3, 384)   # cross_attn_depth=2
    assert not ff.supported(1, 2, 3, 384)   # multi_scale_enc_depth=2
    assert not ff.supported(1, 1, 6, 384)   # head_dim=64, not lane-aligned
    assert ff.supported(1, 1, 3, 384)
    key = jax.random.PRNGKey(1)
    params = fusion.init(key, num_classes=3, dim=D, heads=HEADS,
                         cross_attn_depth=2)
    tok = jax.random.normal(key, (2, N, D), jnp.float32)
    out = fusion.apply(params, tok, tok, HEADS,
                       attn_backend="pallas_interpret")
    ref = fusion.apply(params, tok, tok, HEADS, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
