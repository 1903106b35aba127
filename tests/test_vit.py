import jax
import jax.numpy as jnp
import numpy as np

from mfvit_tpu.nn import vit
from mfvit_tpu.nn.posembed import sincos_2d


def test_sincos_shape_and_cls_row():
    pe = sincos_2d(14, 14, 384)
    assert pe.shape == (1, 197, 384)
    assert np.all(np.asarray(pe)[0, 0] == 0.0)  # CLS row is zeros
    # each token row interleaves sin/cos bands with unit amplitude
    assert np.all(np.abs(np.asarray(pe)) <= 1.0 + 1e-6)


def test_vit_small_forward_shapes(rng):
    cfg = vit.get_config("vit_small")
    params = vit.init(rng, cfg, num_classes=3)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    logits = vit.apply(params, imgs, cfg, compute_dtype=jnp.float32)
    assert logits.shape == (2, 3)
    assert logits.dtype == jnp.float32
    tokens, logits2 = vit.apply(params, imgs, cfg, compute_dtype=jnp.float32,
                                return_features=True)
    assert tokens.shape == (2, 197, 384)  # features3D contract
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-6, rtol=1e-6)


def test_vit_param_count(rng):
    """ViT-S/16 backbone ~21.6M params + head."""
    cfg = vit.get_config("vit_small")
    params = vit.init(rng, cfg, num_classes=0)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 21_000_000 < n < 22_500_000, n


def test_headless_returns_cls_embedding(rng):
    cfg = vit.get_config("vit_small")
    params = vit.init(rng, cfg, num_classes=0)
    imgs = jnp.zeros((1, 224, 224, 3))
    out = vit.apply(params, imgs, cfg, compute_dtype=jnp.float32)
    assert out.shape == (1, 384)


def test_stop_grad_conv1_blocks_patch_grads(rng):
    cfg = vit.get_config("vit_small", img_size=32)
    params = vit.init(rng, cfg, num_classes=3)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))

    def loss(p, sg):
        return vit.apply(p, imgs, cfg, compute_dtype=jnp.float32,
                         stop_grad_conv1=sg).sum()

    g = jax.grad(loss)(params, True)
    assert float(jnp.abs(g["patch"]["w"]).max()) == 0.0
    g2 = jax.grad(loss)(params, False)
    assert float(jnp.abs(g2["patch"]["w"]).max()) > 0.0


def test_patchify_roundtrip():
    imgs = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    p = vit.patchify(imgs, 4)
    assert p.shape == (2, 4, 48)
    # first patch = top-left 4x4 block, (ph, pw, c) order
    expect = np.asarray(imgs)[0, :4, :4, :].reshape(-1)
    np.testing.assert_array_equal(np.asarray(p)[0, 0], expect)


def test_vit_conv_stem_forward(rng):
    """vit_conv_* ConvStem variants (MoCo-v3 names the reference accepts)."""
    cfg = vit.ViTConfig("conv_t", img_size=32, patch=16, dim=32, depth=2,
                        heads=2, conv_stem=True, qkv_bias=False)
    params = vit.init(rng, cfg, num_classes=3)
    assert "stem" in params["patch"] and len(params["patch"]["stem"]) == 4
    assert "b" not in params["blocks"][0]["qkv"]
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                    attn_backend="xla")
    assert out.shape == (2, 3)
    # registered configs
    c = vit.get_config("vit_conv_small")
    assert c.depth == 11 and c.conv_stem and not c.qkv_bias
    # gradients flow (stem BN stats are inference-mode constants)
    g = jax.grad(lambda p: jnp.sum(vit.apply(
        p, img, cfg, compute_dtype=jnp.float32, attn_backend="xla") ** 2))(params)
    assert np.abs(np.asarray(
        g["patch"]["stem"][0]["conv"]["w"])).max() > 0


def test_vit_learned_pos_variant(rng):
    """vit_small_ori-style learned position embedding path."""
    cfg = vit.ViTConfig("ori_t", img_size=32, patch=16, dim=32, depth=1,
                        heads=2, learned_pos=True)
    params = vit.init(rng, cfg, num_classes=3)
    assert "pos" in params and params["pos"].shape == (1, cfg.seq_len, 32)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                    attn_backend="xla")
    assert out.shape == (2, 3)
    g = jax.grad(lambda p: jnp.sum(vit.apply(
        p, img, cfg, compute_dtype=jnp.float32, attn_backend="xla") ** 2))(params)
    assert np.abs(np.asarray(g["pos"])).max() > 0  # learned => has grads


def test_patch_embed_matches_patchify_linear(rng):
    """The two-axis dot_general patch embed == patchify + linear (the
    formulation that skips the physical image transpose)."""
    from mfvit_tpu.nn.layers import linear
    for C in (3, 4):
        p = {"w": jax.random.normal(rng, (8 * 8 * C, 48)) * 0.05,
             "b": jax.random.normal(jax.random.PRNGKey(1), (48,)) * 0.1}
        imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, C))
        ref = linear(p, vit.patchify(imgs, 8))
        got = vit.patch_embed(p, imgs, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_vit_pallas_parity_at_nonstandard_img_size(rng):
    """The fused kernel path handles non-224 sizes (N = 101 here, an
    odd sequence length padded to 128 lanes) identically to XLA math."""
    cfg = vit.get_config("vit_small", img_size=160)
    assert cfg.seq_len == 101
    params = vit.init(rng, cfg, num_classes=3)
    img = jax.random.normal(jax.random.PRNGKey(5), (2, 160, 160, 3))
    a = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                  attn_backend="xla")
    b = vit.apply(params, img, cfg, compute_dtype=jnp.float32,
                  attn_backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-3)


def test_qkv_init_matches_mocov3_bound(rng):
    """vits.py treats Q/K/V separately: uniform limit sqrt(6/(2*dim)),
    sqrt(2)x larger than naive xavier over (dim, 3*dim)."""
    cfg = vit.get_config("vit_small")
    p = vit.init(rng, cfg)
    w = np.asarray(p["blocks"][0]["qkv"]["w"])
    limit = np.sqrt(6.0 / (2 * cfg.dim))
    assert np.abs(w).max() <= limit + 1e-6
    assert np.abs(w).max() > limit * 0.9  # actually fills the range
    assert float(np.abs(np.asarray(p["cls"])).max()) < 1e-4  # std=1e-6


def test_conv_stem_bn_trains_under_moco(rng):
    """vit_conv_* ConvStem BNs run batch stats in MoCo training and the
    running stats thread through the state (previously frozen at init)."""
    from mfvit_tpu.ssl import moco

    cfg = vit.ViTConfig("t", img_size=32, patch=16, dim=32, depth=1,
                        heads=2, conv_stem=True, qkv_bias=False)
    mcfg = moco.MoCoConfig(dim=8, mlp_dim=16, K=16, stop_grad_conv1=True)
    state = moco.init(rng, mcfg, cfg)
    q = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    loss, aux = moco.forward_v2_queue(state, q, q, 0.99, mcfg, cfg,
                                      compute_dtype=jnp.float32)
    before = np.asarray(
        state["base"]["encoder"]["patch"]["stem"][0]["bn"]["mean"])
    after = np.asarray(
        aux["base"]["encoder"]["patch"]["stem"][0]["bn"]["mean"])
    assert not np.allclose(before, after)
    # momentum tower stats evolve from its own forward too
    after_m = np.asarray(
        aux["momentum"]["encoder"]["patch"]["stem"][0]["bn"]["mean"])
    assert not np.allclose(before, after_m)


def test_remat_gradients_match(rng):
    """``remat=True`` (jax.checkpoint per transformer block) is pure
    recompute: identical fp32 gradients and logits, and the jaxpr carries
    the remat marker (the O(1)-in-depth activation-memory lever the
    --remat CLI flag exposes; HBM numbers in docs/PERF.md)."""
    cfg = vit.ViTConfig("t", img_size=32, patch=8, dim=32, depth=3, heads=2)
    params = vit.init(rng, cfg, num_classes=3)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    labels = jnp.asarray([0, 1, 2, 1])

    def loss(p, remat):
        logits = vit.apply(p, imgs, cfg, compute_dtype=jnp.float32,
                           attn_backend="xla", remat=remat)
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], -1))

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-7)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g1),
                               jax.tree_util.tree_leaves_with_path(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pa))
    # the checkpointing is actually in the graph (not silently dropped)
    jaxpr = str(jax.make_jaxpr(lambda p: loss(p, True))(params))
    assert "remat" in jaxpr or "checkpoint" in jaxpr
    assert "remat" not in str(
        jax.make_jaxpr(lambda p: loss(p, False))(params))


def test_remat_moco_step_matches(rng):
    """The MoCo pretrain step with remat reproduces the plain step's loss
    and updated state (query-pass remat; the no-grad key pass is
    unaffected)."""
    import optax

    from mfvit_tpu.ssl import moco

    cfg = vit.ViTConfig("t", img_size=32, patch=16, dim=32, depth=2,
                        heads=2)
    mcfg = moco.MoCoConfig(dim=8, mlp_dim=16, K=16, stop_grad_conv1=False)
    state = moco.init(rng, mcfg, cfg)
    q = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    k = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 3))
    tx = optax.sgd(0.01, momentum=0.9)
    outs = []
    for remat in (False, True):
        st = jax.tree.map(jnp.copy, state)
        step = moco.make_pretrain_step(mcfg, cfg, tx,
                                       compute_dtype=jnp.float32,
                                       remat=remat)
        ost = tx.init({"base": st["base"], "predictor": st["predictor"]})
        st, ost, loss = step(st, ost, q, k, 0.99)
        outs.append((float(loss), st))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-7)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(outs[1][1]["base"]),
            jax.tree_util.tree_leaves_with_path(outs[0][1]["base"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pa))


def test_bigdim_large_batch_falls_back_to_xla(rng, monkeypatch):
    """vit_base-class dims at per-device batch >= 128 downgrade from the
    Pallas kernels to the XLA path at trace time (the measured TPU
    compile boundary — docs/PERF.md 'Known pre-existing limit'): on one
    device the B=64 trace carries pallas_call and the B=128 trace must
    not; the production GSPMD shape (global B sharded to 64/device over
    the whole mesh) keeps the kernels; MFVIT_NO_ATTN_FALLBACK=1 disables
    the gate for raw boundary measurement."""
    import pytest

    cfg = vit.get_config("vit_base")
    params = vit.init(rng, cfg, num_classes=3)

    def trace(B):
        imgs = jax.ShapeDtypeStruct((B, 224, 224, 3), jnp.bfloat16)
        return str(jax.make_jaxpr(
            lambda p, im: vit.apply(p, im, cfg, attn_backend="pallas")
        )(params, imgs))

    monkeypatch.setattr(vit.jax, "device_count", lambda: 1)
    assert "pallas_call" in trace(64)
    with pytest.warns(UserWarning, match="falling back to XLA"):
        assert "pallas_call" not in trace(128)
    monkeypatch.setenv("MFVIT_NO_ATTN_FALLBACK", "1")
    assert "pallas_call" in trace(128)
    monkeypatch.delenv("MFVIT_NO_ATTN_FALLBACK")

    # production multi-chip shape: global B=512 over 8 devices = 64/chip
    monkeypatch.setattr(vit.jax, "device_count", lambda: 8)
    assert "pallas_call" in trace(512)
    with pytest.warns(UserWarning, match="falling back to XLA"):
        assert "pallas_call" not in trace(1024)
