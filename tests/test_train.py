"""Train subsystem tests: LARS math, schedules, LP freezing, jitted steps,
metric parity with sklearn."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mfvit_tpu.nn import vit
from mfvit_tpu.models import fusion
from mfvit_tpu.train import metrics, optim, steps

TINY = vit.ViTConfig("tiny", img_size=32, patch=16, dim=32, depth=2, heads=2)


# ------------------------------------------------------------------ LARS

def test_lars_matches_reference_math():
    # Reference semantics (moco/optimizer.py): ndim>1 params get
    # wd + trust scaling; <=1-D get the raw grad; then mu=mu*mom+dp,
    # p -= lr*mu.
    lr, wd, mom, tc = 0.1, 0.01, 0.9, 0.001
    params = {"w": jnp.array([[1.0, 2.0], [3.0, 4.0]]), "b": jnp.array([0.5])}
    grads = {"w": jnp.array([[0.1, 0.2], [0.3, 0.4]]), "b": jnp.array([1.0])}
    tx = optim.lars(lr, wd, mom, tc)
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)

    w, gw = np.array(params["w"]), np.array(grads["w"])
    dp = gw + wd * w
    q = tc * np.linalg.norm(w) / np.linalg.norm(dp)
    np.testing.assert_allclose(np.array(updates["w"]), -lr * (dp * q), rtol=1e-6)
    np.testing.assert_allclose(np.array(updates["b"]), -lr * 1.0, rtol=1e-6)

    # second step accumulates momentum
    updates2, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.array(updates2["b"]),
                               -lr * (mom * 1.0 + 1.0), rtol=1e-6)


def test_lars_zero_param_norm_uses_unit_trust():
    tx = optim.lars(1.0, 0.1, 0.0, 0.001)
    params = {"w": jnp.zeros((2, 2))}
    grads = {"w": jnp.ones((2, 2))}
    updates, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_allclose(np.array(updates["w"]), -np.ones((2, 2)))


# ------------------------------------------------------------- schedules

def test_scaled_init_lr_rules():
    assert optim.scaled_init_lr(1.5e-4, 16, cos=True, entry="pretrain") == \
        pytest.approx(1.5e-4 * 4)           # lr*bs/4, pretrain :288
    assert optim.scaled_init_lr(3.0, 16, cos=True, entry="finetune") == \
        pytest.approx(3.0 * 2)              # lr*bs/8, finetune :345
    assert optim.scaled_init_lr(3.0, 16, cos=False, entry="finetune") == 3.0


def test_pretrain_cosine_warmup():
    s = optim.pretrain_cosine_lr(1.0, epochs=30, warmup_epochs=4,
                                 steps_per_epoch=10)
    assert float(s(0)) == 0.0
    assert float(s(20)) == pytest.approx(0.5)    # epoch 2 of 4 warmup
    assert float(s(40)) == pytest.approx(1.0)    # end of warmup
    assert float(s(170)) == pytest.approx(0.5)   # midpoint of cosine
    assert float(s(300)) == pytest.approx(0.0, abs=1e-6)


def test_finetune_schedules():
    cos = optim.finetune_lr(2.0, epochs=90, cos=True, steps_per_epoch=5)
    assert float(cos(0)) == pytest.approx(2.0)
    assert float(cos(45 * 5)) == pytest.approx(1.0)
    step = optim.finetune_lr(1.0, epochs=90, cos=False, schedule=[30, 60],
                             steps_per_epoch=1)
    assert float(step(29)) == pytest.approx(1.0)
    assert float(step(30)) == pytest.approx(0.1)
    assert float(step(60)) == pytest.approx(0.01)


def test_moco_momentum_ramp():
    assert float(optim.moco_momentum(0.0, 0.99, 30)) == pytest.approx(0.99)
    assert float(optim.moco_momentum(30.0, 0.99, 30)) == pytest.approx(1.0)
    assert float(optim.moco_momentum(15.0, 0.99, 30)) == pytest.approx(0.995)


# ----------------------------------------------------------- LP freezing

def test_head_only_mask_and_freeze(rng):
    params = vit.init(rng, TINY, num_classes=3)
    mask = optim.head_only_mask(params)
    leaves_mask = jax.tree_util.tree_leaves(mask)
    leaves = jax.tree_util.tree_leaves(params)
    assert len(leaves_mask) == len(leaves)
    assert sum(leaves_mask) == 2  # head w + b only

    tx = optim.build_optimizer("sgd", 0.1, weight_decay=1e-4,
                               trainable_mask=mask)
    train_step, _ = steps.make_classifier_steps(TINY, tx,
                                                compute_dtype=jnp.float32,
                                                attn_backend="xla")
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    labels = jnp.array([0, 1, 2, 0])
    before = jax.tree.map(lambda x: np.array(x), params)
    state = tx.init(params)
    params2, state, loss, logits = train_step(params, state, imgs, labels)
    # sanity_check equivalent: body bit-identical, head moved
    for blk_b, blk_a in zip(before["blocks"], params2["blocks"]):
        np.testing.assert_array_equal(blk_b["qkv"]["w"], np.array(blk_a["qkv"]["w"]))
    np.testing.assert_array_equal(before["patch"]["w"],
                                  np.array(params2["patch"]["w"]))
    assert not np.array_equal(before["head"]["w"], np.array(params2["head"]["w"]))


# ---------------------------------------------------------------- steps

def test_classifier_training_reduces_loss(rng):
    params = vit.init(rng, TINY, num_classes=3)
    tx = optim.build_optimizer("sgd", 0.05)
    train_step, eval_step = steps.make_classifier_steps(
        TINY, tx, compute_dtype=jnp.float32, attn_backend="xla")
    imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.array([0, 1, 2, 0, 1, 2, 0, 1])
    state = tx.init(params)
    losses = []
    for _ in range(10):
        params, state, loss, _ = train_step(params, state, imgs, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    logits = eval_step(params, imgs)
    assert logits.shape == (8, 3) and logits.dtype == jnp.float32


def test_fusion_step_runs_and_learns(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    params = {
        "cxr": vit.init(k1, TINY, num_classes=3),
        "enh": vit.init(k2, TINY, num_classes=3),
        "fus": fusion.init(k3, num_classes=3, dim=TINY.dim, heads=2),
    }
    tx = optim.build_optimizer("adam", 1e-3)
    train_step, eval_step = steps.make_fusion_steps(
        TINY, tx, heads=2, compute_dtype=jnp.float32, attn_backend="xla")
    imgs = jax.random.normal(jax.random.PRNGKey(5), (4, 32, 32, 3))
    labels = jnp.array([0, 1, 2, 0])
    state = tx.init(params)
    first = None
    for i in range(8):
        params, state, loss, out = train_step(params, state, imgs, imgs, labels)
        if first is None:
            first = float(loss)
    assert float(loss) < first
    assert eval_step(params, imgs, imgs).shape == (4, 3)


def test_gpt_fusion_step_runs_and_learns(rng):
    """--fusion-arch gpt: TransFuser-style head under the same step factory
    (reference model/fuseattention.py; decision protocol kept as
    fused + cxr + enh)."""
    import dataclasses

    from mfvit_tpu.models import gpt_fusion

    gcfg = dataclasses.replace(gpt_fusion.VIT_CONFIG, n_embd=TINY.dim,
                               n_head=2, n_layer=2,
                               vert_anchors=TINY.grid,
                               horz_anchors=TINY.grid)
    k1, k2, k3 = jax.random.split(rng, 3)
    params = {
        "cxr": vit.init(k1, TINY, num_classes=3),
        "enh": vit.init(k2, TINY, num_classes=3),
        "fus": gpt_fusion.init(k3, gcfg, num_classes=3),
    }
    tx = optim.build_optimizer("adam", 1e-3)
    train_step, eval_step = steps.make_fusion_steps(
        TINY, tx, compute_dtype=jnp.float32, attn_backend="xla",
        fusion_arch="gpt", gpt_cfg=gcfg)
    imgs = jax.random.normal(jax.random.PRNGKey(5), (4, 32, 32, 3))
    labels = jnp.array([0, 1, 2, 0])
    state = tx.init(params)
    first = None
    for _ in range(8):
        params, state, loss, out = train_step(params, state, imgs, imgs,
                                              labels)
        if first is None:
            first = float(loss)
    assert float(loss) < first
    assert eval_step(params, imgs, imgs).shape == (4, 3)


def test_gpt_fusion_frozen_bodies_stay_frozen(rng):
    """freeze_backbones + head-only mask: ViT bodies bit-identical after
    GPT-fusion LP training (sanity_check contract, fusion main :1013-1040)."""
    import dataclasses

    from mfvit_tpu.models import gpt_fusion

    gcfg = dataclasses.replace(gpt_fusion.VIT_CONFIG, n_embd=TINY.dim,
                               n_head=2, n_layer=1,
                               vert_anchors=TINY.grid,
                               horz_anchors=TINY.grid)
    k1, k2, k3 = jax.random.split(rng, 3)
    params = {
        "cxr": vit.init(k1, TINY, num_classes=3),
        "enh": vit.init(k2, TINY, num_classes=3),
        "fus": gpt_fusion.init(k3, gcfg, num_classes=3),
    }
    mask = {
        "cxr": optim.head_only_mask(params["cxr"]),
        "enh": optim.head_only_mask(params["enh"]),
        "fus": jax.tree.map(lambda _: True, params["fus"]),
    }
    before = {b: jax.tree.map(np.asarray, params[b]) for b in ("cxr", "enh")}
    tx = optim.build_optimizer("sgd", 1e-2, trainable_mask=mask)
    train_step, _ = steps.make_fusion_steps(
        TINY, tx, compute_dtype=jnp.float32, attn_backend="xla",
        fusion_arch="gpt", gpt_cfg=gcfg, freeze_backbones=True)
    imgs = jax.random.normal(jax.random.PRNGKey(5), (4, 32, 32, 3))
    labels = jnp.array([0, 1, 2, 0])
    state = tx.init(params)
    for _ in range(2):
        params, state, loss, _ = train_step(params, state, imgs, imgs,
                                            labels)
    for b in ("cxr", "enh"):
        body_now = {k: v for k, v in params[b].items() if k != "head"}
        body_was = {k: v for k, v in before[b].items() if k != "head"}
        jax.tree.map(lambda a, c: np.testing.assert_array_equal(
            np.asarray(a), c), body_now, body_was)
        head_same = np.allclose(np.asarray(params[b]["head"]["w"]),
                                before[b]["head"]["w"])
        assert not head_same  # heads did train


# --------------------------------------------------------------- metrics

def test_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(200, 3))
    labels = rng.integers(0, 3, 200)
    ours = metrics.macro_ovr_auc(logits, labels)
    skl = np.mean([roc_auc_score((labels == c).astype(int), logits[:, c])
                   for c in range(3)])
    assert ours == pytest.approx(skl, abs=1e-10)
    # with ties
    logits_t = np.round(logits, 1)
    ours_t = metrics.macro_ovr_auc(logits_t, labels)
    skl_t = np.mean([roc_auc_score((labels == c).astype(int), logits_t[:, c])
                     for c in range(3)])
    assert ours_t == pytest.approx(skl_t, abs=1e-10)


def test_prf1_matches_sklearn():
    from sklearn.metrics import precision_recall_fscore_support
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(100, 3))
    labels = rng.integers(0, 3, 100)
    ours = metrics.precision_recall_f1(logits, labels)
    p, r, f, _ = precision_recall_fscore_support(
        labels, logits.argmax(-1), average="macro", zero_division=0)
    assert ours["precision"] == pytest.approx(p)
    assert ours["recall"] == pytest.approx(r)
    assert ours["f1"] == pytest.approx(f)


def test_meters():
    m = metrics.AverageMeter("loss", ":.2f")
    m.update(1.0, n=2)
    m.update(2.0, n=2)
    assert m.avg == pytest.approx(1.5)
    pm = metrics.ProgressMeter(100, [m], prefix="Epoch: [0]")
    pm.display(5)  # smoke
    assert metrics.top1_acc(np.eye(3), np.array([0, 1, 2])) == 1.0
    assert metrics.topk_acc(np.array([[0.1, 0.9, 0.5]]), np.array([2]), k=2) == 1.0


def test_evaluator_metrics_match_reference_module():
    """topk_acc / compute_auc_binary / recursive combiner utilities match
    the ACTUAL reference training_tools modules imported from
    /root/reference (evaluator.py:60-75, combiner.py:13-33)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference/moco_pretraining/moco")
    from scipy.special import softmax
    from training_tools import combiner as ref_combiner
    from training_tools import evaluator as ref_eval

    from mfvit_tpu.train import evaluator as our_eval
    from mfvit_tpu.train import metrics

    rng = np.random.default_rng(13)
    logits = rng.normal(size=(40, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 40)

    for k in (1, 2):
        ref = float(ref_eval.topk_acc(torch.tensor(logits),
                                      torch.tensor(labels), k))
        ours = metrics.topk_acc(logits, labels, k=k)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    blogits = rng.normal(size=(40, 2)).astype(np.float32)
    blabels = rng.integers(0, 2, 40)
    ref_auc = ref_eval.compute_auc_binary(torch.tensor(blogits),
                                          torch.tensor(blabels))
    our_auc = metrics.binary_auc(softmax(blogits, axis=1)[:, 1], blabels)
    np.testing.assert_allclose(our_auc, ref_auc, rtol=1e-10)

    # combiner: same nested accumulate/concat behavior
    items = [{"a": rng.normal(size=(2, 3)), "n": {"b": rng.normal(size=2)}}
             for _ in range(3)]
    from collections import defaultdict
    acc_ref, acc_ours = defaultdict(list), {}
    for it in items:
        ref_combiner.recursive_append(
            acc_ref, {k: torch.tensor(v) if k != "n" else
                      {"b": torch.tensor(v["b"])} for k, v in it.items()})
        our_eval.recursive_append(acc_ours, it)
    ref_out = ref_combiner.recursive_concat(acc_ref)
    our_out = our_eval.recursive_concat(acc_ours)
    np.testing.assert_allclose(our_out["a"], np.asarray(ref_out["a"]))
    np.testing.assert_allclose(our_out["n"]["b"], np.asarray(ref_out["n"]["b"]))


def test_meters_match_reference_module():
    """AverageMeter math and formatting vs the ACTUAL reference
    training_tools/meters.py (the 'Loss' newline quirk included)."""
    import sys

    sys.path.insert(0, "/root/reference/moco_pretraining/moco")
    from training_tools import meters as ref_meters

    from mfvit_tpu.train.metrics import AverageMeter

    for name in ("Loss", "Acc@1"):
        ref = ref_meters.AverageMeter(name, ":6.4f")
        ours = AverageMeter(name, ":6.4f")
        for v, n in ((0.5, 2), (1.25, 3), (0.125, 1)):
            ref.update(v, n)
            ours.update(v, n)
        assert ours.avg == ref.avg and ours.sum == ref.sum
        assert ours.count == ref.count
        assert str(ours) == str(ref)


def test_metric_fns_respect_num_classes():
    """Evaluator METRIC_FNS pass the logit width everywhere — a 5-class
    problem must not be macro-averaged over 3 classes."""
    from mfvit_tpu.train.evaluator import METRIC_FNS

    rng = np.random.default_rng(20)
    labels = rng.integers(0, 5, 60)
    logits = np.full((60, 5), -5.0, np.float32)
    # classes 0-2 perfect; 3 and 4 always swapped
    pred = np.where(labels == 3, 4, np.where(labels == 4, 3, labels))
    logits[np.arange(60), pred] = 5.0
    f1 = METRIC_FNS["f1"](logits, labels)
    recall = METRIC_FNS["recall"](logits, labels)
    assert f1 < 0.95 and recall < 0.95  # the 3-class default reported 1.0


def test_pretrain_cosine_lr_warmup_equals_epochs():
    from mfvit_tpu.train import optim

    sched = optim.pretrain_cosine_lr(0.1, epochs=10, warmup_epochs=10,
                                     steps_per_epoch=5)
    assert np.isfinite(float(sched(50)))  # was ZeroDivisionError / NaN


def test_nan_logits_give_nan_auc():
    from mfvit_tpu.train import metrics

    logits = np.full((8, 3), np.nan, np.float32)
    labels = np.arange(8) % 3
    assert np.isnan(metrics.macro_ovr_auc(logits, labels, 3))


def test_evaluator_rejects_empty_loader():
    from mfvit_tpu.train.evaluator import Evaluator

    ev = Evaluator(lambda b: b, metric_names=("auc",))
    with pytest.raises(ValueError, match="empty loader"):
        ev.evaluate([])


def test_batchnorm_unbiased_running_var():
    """torch parity: batch normalized with biased variance, running_var
    updated with the unbiased (n/(n-1)) estimator."""
    import torch

    from mfvit_tpu.nn.layers import batchnorm, batchnorm_init

    rng = np.random.default_rng(21)
    x = rng.normal(size=(10, 6)).astype(np.float32)
    p = batchnorm_init(6)
    y, newp = batchnorm(p, jnp.asarray(x), training=True, momentum=0.9)

    tbn = torch.nn.BatchNorm1d(6, momentum=0.1)
    ty = tbn(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(newp["var"]),
                               tbn.running_var.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(newp["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)


def test_fusion_freeze_backbones_matches_masked_step(rng):
    """LP fusion mode: freeze_backbones stops gradients at the feature
    boundary (reference fusion main :297-313 requires_grad=False). The
    resulting update must EQUAL the mask-only formulation's — identical
    trainable gradients, frozen leaves untouched — while XLA skips the
    whole ViT-body backward."""
    k1, k2, k3 = jax.random.split(rng, 3)
    params = {
        "cxr": vit.init(k1, TINY, num_classes=3),
        "enh": vit.init(k2, TINY, num_classes=3),
        "fus": fusion.init(k3, num_classes=3, dim=TINY.dim, heads=2),
    }
    mask = {
        "cxr": optim.head_only_mask(params["cxr"]),
        "enh": optim.head_only_mask(params["enh"]),
        "fus": jax.tree.map(lambda _: True, params["fus"]),
    }
    imgs = jax.random.normal(jax.random.PRNGKey(6), (4, 32, 32, 3))
    labels = jnp.array([0, 1, 2, 0])

    outs = {}
    for frozen in (False, True):
        tx = optim.build_optimizer("sgd", 0.1, trainable_mask=mask)
        p = jax.tree.map(jnp.copy, params)
        train_step, _ = steps.make_fusion_steps(
            TINY, tx, heads=2, compute_dtype=jnp.float32,
            attn_backend="xla", freeze_backbones=frozen)
        p, _, loss, out = train_step(p, tx.init(p), imgs, imgs, labels)
        outs[frozen] = (p, float(loss), np.asarray(out))

    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-6)
    np.testing.assert_allclose(outs[True][2], outs[False][2], rtol=1e-5,
                               atol=1e-6)
    flat_t, _ = jax.tree_util.tree_flatten_with_path(outs[True][0])
    flat_f, _ = jax.tree_util.tree_flatten_with_path(outs[False][0])
    for (path, a), (_, b) in zip(flat_t, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))
    # frozen body leaves are bit-identical to the originals
    body = {k: v for k, v in outs[True][0]["cxr"].items() if k != "head"}
    orig = {k: v for k, v in params["cxr"].items() if k != "head"}
    for a, b in zip(jax.tree.leaves(body), jax.tree.leaves(orig)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_deferred_fetch_counts_every_step_once():
    """DeferredFetch: one-step lag, sync passthrough on demand, flush
    drains the tail — every (value, n, idx) hits the sink exactly once
    and in order."""
    seen = []
    f = metrics.DeferredFetch(lambda v, n, i: seen.append((v, n, i)))
    f.push(jnp.float32(1.0), 4, 0, sync=True)   # step 0: immediate
    assert seen == [(1.0, 4, 0)]
    f.push(jnp.float32(2.0), 4, 1)              # deferred
    assert seen == [(1.0, 4, 0)]
    f.push(jnp.float32(3.0), 4, 2)              # flushes step 1
    assert seen == [(1.0, 4, 0), (2.0, 4, 1)]
    f.flush()
    assert seen == [(1.0, 4, 0), (2.0, 4, 1), (3.0, 4, 2)]
    f.flush()  # idempotent
    assert len(seen) == 3
