"""Subprocess worker: the REAL pretrain CLI on a 2-process mesh.

Each process hosts 2 virtual CPU devices; the pretrain entry point is
invoked exactly as it would be on one host of a multi-host pod —
``--dist-coordinator`` flags mirroring the reference's tcp:// DDP launch
(pretrain main :99-110). Exercises end-to-end: coordinated storage-folder
choice (broadcast), per-process manifest feed / sharded device store
fill, the shard_map MoCo step across the process boundary, collective
orbax checkpointing, and rank-0-only artifact writes.
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
    results = pretrain.main([
        "-a", "vit_test", "--img-size", "32", "--crop", "32",
        "--compute-dtype", "float32", "--attn-backend", "xla",
        "-j", "2", "--seed", "0",
        "--dist-coordinator", addr, "--dist-num-processes", nproc,
        "--dist-process-id", pid,
        "--covid-ds", os.path.join(root, "create_covid_dataset"),
        "--storage-root", os.path.join(root, "exp_dist"),
        "--exp-name", "dist",
        "-b", "8", "--epochs", "2", "--warmup-epochs", "1", "--cos",
        "--lr", "1e-3", "--optimizer", "adamw", "--wd", "0.1",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--moco-t", "0.2", "--moco-m-cos", "--semi-ratios", "1"])
    assert len(results) == 1, results
    final_loss = results[0].extra["final_loss"]
    # print is rank-0-silenced by the CLI itself; report via stdout.write
    sys.stdout.write(f"DIST PRETRAIN OK {pid} loss={final_loss:.17g}\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
