"""Subprocess worker for the REAL multi-host training test (VERDICT r3 #1).

Two of these processes (2 virtual CPU devices each) rendezvous into one
4-device mesh and run the full multi-host path end-to-end:

  per-process data feed (BatchLoader process slicing + global-batch
  assembly via jax.make_array_from_process_local_data)
  -> one supervised classifier epoch (2 steps)
  -> one MoCo v2-queue pretraining step (shard_map all_gather/pmean
     across the process boundary)
  -> orbax multi-process checkpoint save + restore round-trip

Process 0 dumps the resulting losses/params to an npz; the parent test
(tests/test_parallel.py::test_multihost_training_matches_single_process)
re-runs the identical computation single-process on a 4-device mesh and
asserts equality — the reference contract being replicated is multi-node
DDP pretraining producing the same math as single-node (pretrain main
:99-110, :201-236, :309, :469-471).
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mfvit_tpu.exp import checkpoint as ckpt_mod  # noqa: E402
from mfvit_tpu.parallel import mesh as pmesh  # noqa: E402

from _dist_common import run_training  # noqa: E402


def main():
    pid, nproc, addr, tmpdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    pmesh.init_distributed(addr, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    mesh = pmesh.make_mesh(2 * nproc)

    params, sup_losses, state, moco_loss = run_training(
        mesh, process_index=pid, process_count=nproc)

    # ---- multi-process checkpoint: save (collective) + restore + compare
    ckpt_path = os.path.join(tmpdir, "dist_ckpt")
    tree = {"state": state,
            "step": pmesh.replicate(jnp.asarray(1, jnp.int32), mesh)}
    ckpt_mod.save(ckpt_path, tree)
    like = {"state": jax.tree.map(jnp.zeros_like, state),
            "step": pmesh.replicate(jnp.asarray(0, jnp.int32), mesh)}
    back = ckpt_mod.restore(ckpt_path, like=like)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(back)):
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data))

    if pid == 0:
        # params/queue are replicated -> host-readable on any process
        leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]
        np.savez(os.path.join(tmpdir, "result.npz"),
                 sup_losses=np.asarray(sup_losses, np.float64),
                 moco_loss=np.float64(moco_loss),
                 queue=np.asarray(state["queue"]),
                 queue_ptr=np.asarray(state["queue_ptr"]),
                 **{f"p{i}": l for i, l in enumerate(leaves)})
    print(f"DIST TRAIN OK {pid}", flush=True)


if __name__ == "__main__":
    main()
