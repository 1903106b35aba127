"""Computation shared by the multi-host worker (tests/_dist_train_worker.py)
and the single-process reference run in tests/test_parallel.py. No
environment side effects — safe to import from the pytest process."""
import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.data import pipeline
from mfvit_tpu.nn import vit
from mfvit_tpu.parallel import mesh as pmesh
from mfvit_tpu.ssl import moco
from mfvit_tpu.train import optim, steps

TINY = vit.ViTConfig("tiny", img_size=32, patch=16, dim=32, depth=1, heads=2)
N_SAMPLES, BATCH = 16, 8
MOCO_CFG_KW = dict(dim=16, mlp_dim=32, K=32, T=0.2)


class SyntheticDataset:
    """Deterministic per-index samples — every process regenerates the
    same values, standing in for a shared filesystem manifest."""

    def __len__(self):
        return N_SAMPLES

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + int(i))
        img = rng.standard_normal((32, 32, 3)).astype(np.float32)
        return img, np.int32(i % 3)


def run_training(mesh, *, process_index: int = 0, process_count: int = 1):
    """The exact computation compared across the 2-process and
    single-process runs: one supervised epoch + one MoCo v2-queue step."""
    shard = pmesh.batch_sharded(mesh)

    # ---- supervised: per-process feed -> global sharded batches
    tl = pipeline.BatchLoader(SyntheticDataset(), BATCH, shuffle=True,
                              seed=0, drop_last=True, num_workers=2,
                              process_index=process_index,
                              process_count=process_count)
    params = pmesh.replicate(vit.init(jax.random.PRNGKey(0), TINY,
                                      num_classes=3), mesh)
    tx = optim.build_optimizer("sgd", 0.05)
    opt_state = pmesh.replicate(tx.init(jax.device_get(params)), mesh)
    train_step, _ = steps.make_classifier_steps(
        TINY, tx, compute_dtype=jnp.float32, attn_backend="xla")
    sup_losses = []
    tl.set_epoch(0)
    for imgs, labels in pipeline.device_prefetch(iter(tl), sharding=shard):
        params, opt_state, loss, _ = train_step(params, opt_state, imgs,
                                                labels)
        sup_losses.append(float(loss))  # replicated scalar: host-readable

    # ---- MoCo v2-queue step (cross-process all_gather/pmean when the
    # mesh spans processes)
    cfg = moco.MoCoConfig(**MOCO_CFG_KW)
    state = moco.init(jax.random.PRNGKey(1), cfg, TINY)
    tx2 = optim.build_optimizer("sgd", 0.1)
    opt2 = tx2.init({"base": state["base"], "predictor": state["predictor"]})
    step = pmesh.make_moco_parallel_step(cfg, TINY, tx2, mesh,
                                         compute_dtype=jnp.float32)
    state = pmesh.replicate(state, mesh)
    opt2 = pmesh.replicate(opt2, mesh)
    imq = pmesh.shard_batch(np.asarray(
        np.random.default_rng(7).standard_normal((BATCH, 32, 32, 3)),
        np.float32), mesh)
    imk = pmesh.shard_batch(np.asarray(
        np.random.default_rng(8).standard_normal((BATCH, 32, 32, 3)),
        np.float32), mesh)
    state, opt2, moco_loss = step(state, opt2, imq, imk, jnp.float32(0.99))
    return params, sup_losses, state, float(moco_loss)
