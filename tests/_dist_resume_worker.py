"""Subprocess worker: multi-host preemption/resume determinism.

Phase 1 runs the REAL pretrain CLI on a 2-process mesh for 2 of 3
planned epochs (the preempted run: its collective orbax checkpoint for
epoch 1 is on disk when it stops). Phase 2 restarts with ``--resume``
from that checkpoint and trains through epoch 2. Phase 3 runs the
uninterrupted 3-epoch job. The parent test asserts the resumed
trajectory's final loss equals the uninterrupted run's on BOTH hosts —
extending the single-process resume-determinism guarantee
(tests/test_exp.py::test_pretrain_resume) to collective checkpoints
(reference contract: pretrain main :356-372 restore + DDP).

jax.distributed is initialized once by the first CLI call's --dist-*
flags; the later calls run on the already-initialized 2-process runtime
(no flags — re-initializing would error), exactly like consecutive jobs
inside one pod allocation.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, addr, root = (sys.argv[1], sys.argv[2], sys.argv[3],
                              sys.argv[4])
    from mfvit_tpu.cli import pretrain
    base = [
        "-a", "vit_test", "--img-size", "32", "--crop", "32",
        "--maintain-ratio", "--compute-dtype", "float32",
        "--attn-backend", "xla", "-j", "1", "--seed", "0",
        "--covid-ds", os.path.join(root, "create_covid_dataset"),
        "--storage-root", os.path.join(root, "exp_dist_resume"),
        # constant LR (no --cos): the cosine horizon depends on --epochs,
        # which legitimately differs between the 2-epoch preempted run
        # and the 3-epoch comparison (same note as the single-process
        # resume test)
        "-b", "8", "--warmup-epochs", "0", "--lr", "1e-3",
        "--optimizer", "adamw", "--moco-dim", "8", "--moco-mlp-dim", "16",
        "--moco-k", "16", "--save-epoch", "1", "--semi-ratios", "1"]

    # phase 1: the "preempted" run — stops with checkpoint_0001 on disk
    pretrain.main(base + [
        "--dist-coordinator", addr, "--dist-num-processes", nproc,
        "--dist-process-id", pid,
        "--epochs", "2", "--exp-name", "phase1"])
    exp_root = os.path.join(root, "exp_dist_resume")
    phase1 = next(d for d in sorted(os.listdir(exp_root))
                  if d.startswith("phase1"))
    ck = os.path.join(exp_root, phase1, "train_1_0", "checkpoint_0001")
    assert os.path.exists(ck), ck

    # phase 2: restart from the collective checkpoint, finish epoch 2
    resumed = pretrain.main(base + ["--resume", ck, "--epochs", "3",
                                    "--exp-name", "resumed"])
    # phase 3: the uninterrupted 3-epoch run
    full = pretrain.main(base + ["--epochs", "3", "--exp-name", "full3"])

    sys.stdout.write(
        f"DIST RESUME OK {pid} "
        f"resumed={resumed[0].extra['final_loss']:.17g} "
        f"full={full[0].extra['final_loss']:.17g}\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
