"""MoCo objective tests: state shapes, EMA, queue ring buffer, both losses,
multi-device collectives on the 8-way CPU mesh (SURVEY §4)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mfvit_tpu.nn import vit
from mfvit_tpu.ssl import moco
from mfvit_tpu.train import optim

TINY = vit.ViTConfig("tiny", img_size=32, patch=16, dim=32, depth=1, heads=2)
CFG = moco.MoCoConfig(dim=16, mlp_dim=32, K=64, T=0.2, stop_grad_conv1=True)


@pytest.fixture(scope="module")
def state():
    return moco.init(jax.random.PRNGKey(0), CFG, TINY)


def test_init_shapes(state):
    assert state["queue"].shape == (CFG.dim, CFG.K)
    norms = np.linalg.norm(np.asarray(state["queue"]), axis=0)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # momentum tower starts as a copy of base (builder :52-54)
    for a, b in zip(jax.tree_util.tree_leaves(state["base"]),
                    jax.tree_util.tree_leaves(state["momentum"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v2_queue_forward_and_ring(state):
    imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    loss, aux = moco.forward_v2_queue(state, imgs, imgs, 0.99, CFG, TINY,
                                      compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    assert aux["logits"].shape == (8, 1 + CFG.K)
    assert int(aux["queue_ptr"]) == 8
    # enqueued keys live in the first 8 columns, L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(aux["queue"][:, :8]), axis=0), 1.0,
        rtol=1e-5)
    # ring wrap: advancing K/8 times returns ptr to 0
    st = dict(state)
    for _ in range(CFG.K // 8):
        _, aux2 = moco.forward_v2_queue(st, imgs, imgs, 0.99, CFG, TINY,
                                        compute_dtype=jnp.float32)
        st = {**st, "queue": aux2["queue"], "queue_ptr": aux2["queue_ptr"]}
    assert int(st["queue_ptr"]) == 0


def test_ema_update_direction(state):
    imgs = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    m = 0.5
    loss, aux = moco.forward_v2_queue(state, imgs, imgs, m, CFG, TINY,
                                      compute_dtype=jnp.float32)
    # with identical towers at init, EMA leaves values unchanged
    qkv_before = np.asarray(state["momentum"]["encoder"]["blocks"][0]["qkv"]["w"])
    qkv_after = np.asarray(aux["momentum"]["encoder"]["blocks"][0]["qkv"]["w"])
    np.testing.assert_allclose(qkv_before, qkv_after, rtol=1e-6)


def test_v3_symmetric_forward(state):
    cfg3 = moco.MoCoConfig(dim=16, mlp_dim=32, K=64, T=0.2,
                           loss="v3_symmetric")
    imgs = jax.random.normal(jax.random.PRNGKey(3), (8, 32, 32, 3))
    loss, aux = moco.forward_v3_symmetric(state, imgs, imgs, 0.99, cfg3, TINY,
                                          compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    # queue untouched in v3
    np.testing.assert_array_equal(np.asarray(aux["queue"]),
                                  np.asarray(state["queue"]))


def test_pretrain_step_runs_and_threads_state(state):
    tx = optim.build_optimizer("adamw", 1e-3, weight_decay=0.1)
    step = jax.jit(moco.make_pretrain_step(CFG, TINY, tx,
                                           compute_dtype=jnp.float32))
    opt_state = tx.init({"base": state["base"],
                         "predictor": state["predictor"]})
    key = jax.random.PRNGKey(4)
    st = state
    for i in range(6):
        key, k1, k2 = jax.random.split(key, 3)
        imq = jax.random.normal(k1, (8, 32, 32, 3))
        imk = imq + 0.05 * jax.random.normal(k2, imq.shape)
        st, opt_state, loss = step(st, opt_state, imq, imk,
                                   jnp.float32(0.99))
        assert np.isfinite(float(loss))
    assert int(st["queue_ptr"]) == (6 * 8) % CFG.K
    # base tower moved; momentum tower lags behind base (EMA), no longer
    # equal to base but changed from init
    b = np.asarray(st["base"]["encoder"]["blocks"][0]["qkv"]["w"])
    m = np.asarray(st["momentum"]["encoder"]["blocks"][0]["qkv"]["w"])
    b0 = np.asarray(state["base"]["encoder"]["blocks"][0]["qkv"]["w"])
    assert not np.array_equal(b, b0)
    assert not np.array_equal(m, b)
    assert not np.array_equal(m, b0)


def test_v3_symmetric_training_learns(state):
    """Without a queue, repeated batches are a valid contrastive task —
    loss must decrease under gradient descent."""
    cfg3 = moco.MoCoConfig(dim=16, mlp_dim=32, K=64, T=0.2,
                           loss="v3_symmetric", stop_grad_conv1=False)
    tx = optim.build_optimizer("adamw", 5e-4, weight_decay=0.0)
    step = jax.jit(moco.make_pretrain_step(cfg3, TINY, tx,
                                           compute_dtype=jnp.float32))
    opt_state = tx.init({"base": state["base"],
                         "predictor": state["predictor"]})
    imq = jax.random.normal(jax.random.PRNGKey(11), (8, 32, 32, 3))
    imk = imq + 0.05 * jax.random.normal(jax.random.PRNGKey(12), imq.shape)
    st, losses = state, []
    for _ in range(8):
        st, opt_state, loss = step(st, opt_state, imq, imk, jnp.float32(0.99))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_stop_grad_conv1(state):
    """--stop-grad-conv1: no gradient reaches the patch projection."""
    imgs = jax.random.normal(jax.random.PRNGKey(6), (4, 32, 32, 3))

    def loss_fn(gp):
        st = dict(state, base=gp["base"], predictor=gp["predictor"])
        loss, _ = moco.forward_v2_queue(st, imgs, imgs, 0.99, CFG, TINY,
                                        compute_dtype=jnp.float32)
        return loss

    grads = jax.grad(loss_fn)({"base": state["base"],
                               "predictor": state["predictor"]})
    patch_g = np.asarray(grads["base"]["encoder"]["patch"]["w"])
    np.testing.assert_array_equal(patch_g, 0.0)
    qkv_g = np.asarray(grads["base"]["encoder"]["blocks"][0]["qkv"]["w"])
    assert np.abs(qkv_g).max() > 0


def test_multi_device_gather_and_queue(state):
    """8-way data-parallel pretraining forward under shard_map: the queue
    receives the GLOBAL batch of keys (concat_all_gather semantics,
    builder :91-105) and loss matches the single-device computation."""
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.array(devs[:8]), ("data",))
    B = 16  # global batch; 2 per device

    imq = jax.random.normal(jax.random.PRNGKey(7), (B, 32, 32, 3))
    imk = jax.random.normal(jax.random.PRNGKey(8), (B, 32, 32, 3))

    def fwd(state, q, k):
        loss, aux = moco.forward_v2_queue(state, q, k, 0.99, CFG, TINY,
                                          axis_name="data",
                                          compute_dtype=jnp.float32)
        return loss, aux["queue"], aux["queue_ptr"]

    sharded = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False)
    loss_d, queue_d, ptr_d = jax.jit(sharded)(state, imq, imk)
    assert int(ptr_d) == B
    # single-device reference (no BN-stat divergence: projector BN uses
    # pmean-synced batch stats, so global == local-batch stats only when
    # batches match; compare queue contents against single-device run)
    loss_s, aux_s = moco.forward_v2_queue(state, imq, imk, 0.99, CFG, TINY,
                                          compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(loss_d), float(loss_s), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(queue_d[:, :B]),
                               np.asarray(aux_s["queue"][:, :B]),
                               atol=2e-4)


def test_last_bn_is_affine_free(state):
    """The projector/predictor final BN must have NO trainable scale/bias
    (reference nn.BatchNorm1d(dim, affine=False) — builder :76)."""
    last = state["base"]["projector"]["layers"][-1]
    assert "bn_noaffine" in last
    assert set(last["bn_noaffine"].keys()) == {"mean", "var"}


def test_ema_excludes_bn_running_stats(state):
    """EMA covers parameters only; momentum-tower BN stats evolve from its
    own forwards (reference iterates parameters() — builder :84-89)."""
    # make base and momentum BN stats differ
    st = jax.tree.map(jnp.copy, state)
    st["base"]["projector"]["layers"][0]["bn"]["mean"] = \
        st["base"]["projector"]["layers"][0]["bn"]["mean"] + 5.0
    mom_mean_before = np.asarray(
        st["momentum"]["projector"]["layers"][0]["bn"]["mean"])
    new_mom = moco._ema_update(st["momentum"], st["base"], 0.5)
    # weights moved toward base
    w_b = np.asarray(st["base"]["projector"]["layers"][0]["lin"]["w"])
    w_m = np.asarray(st["momentum"]["projector"]["layers"][0]["lin"]["w"])
    np.testing.assert_allclose(
        np.asarray(new_mom["projector"]["layers"][0]["lin"]["w"]),
        0.5 * w_m + 0.5 * w_b, rtol=1e-6)
    # BN running mean did NOT move toward base's +5 offset
    np.testing.assert_array_equal(
        np.asarray(new_mom["projector"]["layers"][0]["bn"]["mean"]),
        mom_mean_before)


def test_v2_queue_rejects_indivisible_batch(state):
    """K %% batch must hold INSIDE the objective (builder :99 asserts it
    there): a violating batch raises at trace time instead of silently
    clamping the ring enqueue onto the queue tail."""
    imgs = jnp.ones((3, 32, 32, 3))  # K=64, 64 % 3 != 0
    with pytest.raises(ValueError, match="divisible"):
        moco.forward_v2_queue(state, imgs, imgs, 0.99, CFG, TINY,
                              compute_dtype=jnp.float32)
    tx = optax.sgd(0.1)
    step = moco.make_pretrain_step(CFG, TINY, tx, compute_dtype=jnp.float32)
    opt_state = tx.init({"base": state["base"],
                         "predictor": state["predictor"]})
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(step)(state, opt_state, imgs, imgs, 0.99)


def test_predictor_on_keys_updates_predictor_bn_stats(state):
    """torch BN updates running stats under no_grad in training mode, so
    the reference's key pass through the predictor (:174) advances the
    predictor BN statistics a SECOND time after the query pass; the
    rebuilt objective must thread that update into aux."""
    rng = np.random.default_rng(3)
    im_q = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    im_k = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    _, aux = moco.forward_v2_queue(state, im_q, im_k, 0.99, CFG, TINY,
                                   compute_dtype=jnp.float32)
    # replicate by hand: query pass stats, then key pass stats on top
    zq, _ = moco._encode(state["base"], im_q, CFG, TINY, training=True,
                         axis_name=None, compute_dtype=jnp.float32,
                         stop_grad_conv1=CFG.stop_grad_conv1)
    _, pred_q = moco._mlp_apply(state["predictor"], zq, training=True,
                                axis_name=None)
    mom = moco._ema_update(state["momentum"], state["base"], 0.99)
    zk, _ = moco._encode(mom, im_k, CFG, TINY, training=True,
                         axis_name=None, compute_dtype=jnp.float32,
                         stop_grad_conv1=False)
    _, pred_qk = moco._mlp_apply(pred_q, zk, training=True, axis_name=None)
    # compare running VAR: the predictor's input comes out of the
    # projector's affine-free BN, so its batch MEAN is degenerately ~0
    np.testing.assert_allclose(
        np.asarray(aux["predictor"]["layers"][0]["bn"]["var"]),
        np.asarray(pred_qk["layers"][0]["bn"]["var"]), rtol=1e-6)
    # and it is NOT the single-pass (query-only) value
    assert not np.allclose(
        np.asarray(aux["predictor"]["layers"][0]["bn"]["var"]),
        np.asarray(pred_q["layers"][0]["bn"]["var"]))


def test_remat_resnet_moco_step_matches():
    """--remat is not a silent no-op for ResNet arms: the MoCo step with
    per-residual-block rematerialization reproduces the plain step's loss
    and updated params, and the remat marker is in the trace."""
    import numpy as np

    from mfvit_tpu.nn import resnet
    from mfvit_tpu.train import optim

    rcfg = resnet.get_config("resnet18")
    cfg = moco.MoCoConfig(dim=8, mlp_dim=16, K=16)
    st0 = moco.init(jax.random.PRNGKey(0), cfg, rcfg)
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    k = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    tx = optim.build_optimizer("sgd", 0.1)
    outs = []
    for remat in (False, True):
        st = jax.tree.map(jnp.copy, st0)
        step = moco.make_pretrain_step(cfg, rcfg, tx,
                                       compute_dtype=jnp.float32,
                                       remat=remat)
        ost = tx.init({"base": st["base"], "predictor": st["predictor"]})
        st, ost, loss = step(st, ost, q, k, 0.99)
        outs.append((float(loss), st))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-6)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(outs[1][1]["base"]),
            jax.tree_util.tree_leaves_with_path(outs[0][1]["base"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))
    # the checkpointing really is in the trace
    def loss_fn(p, remat):
        s = dict(st0, base=p)
        out, _ = moco.forward(s, q, k, 0.99, cfg, rcfg,
                              compute_dtype=jnp.float32, remat=remat)
        return out
    assert "remat" in str(jax.make_jaxpr(
        lambda p: loss_fn(p, True))(st0["base"]))
