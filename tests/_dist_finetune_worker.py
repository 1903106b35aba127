"""Subprocess worker: the REAL finetune CLI on a 2-process mesh.

Round 5 extended the multi-host plumbing (loader process slicing,
global-array assembly, collective orbax checkpoints, rank-0 artifacts)
from pretrain to the finetune/fuse entry points — this worker drives the
finetune CLI exactly as one host of a pod would, including the
multi-process EVAL path (per-host local batches -> put_local_rows ->
replicated logits + allgathered labels so both hosts make the same
best-val checkpoint decisions). Exceeds the reference, whose finetune
main is single-GPU (finetune :94-110 commented out).
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
    from mfvit_tpu.cli import finetune
    results = finetune.main([
        "-a", "vit_test", "--img-size", "32", "--crop", "32",
        "--maintain-ratio", "--compute-dtype", "float32",
        "--attn-backend", "xla", "-j", "2", "--seed", "0",
        "--dist-coordinator", addr, "--dist-num-processes", nproc,
        "--dist-process-id", pid,
        "--covid-ds", os.path.join(root, "create_covid_dataset"),
        "--storage-root", os.path.join(root, "exp_dist_ft"),
        "--exp-name", "distft",
        "-b", "8", "--epochs", "2", "--cos", "--lr", "0.1",
        "--optimizer", "sgd", "--semi-ratios", "1"])
    assert len(results) == 1, results
    r = results[0]
    sys.stdout.write(f"DIST FT OK {pid} auc={r.test_auc:.17g} "
                     f"acc={r.test_acc:.17g}\n")
    sys.stdout.flush()

    # fuse leg on the same 2-process runtime (already rendezvoused):
    # exercises the PAIRED multi-process eval — two image fields per
    # batch assembled with put_local_rows, replicated logits — and the
    # fusion-only optimizer mask under a cross-process mesh
    from mfvit_tpu.cli import fuse
    fresults = fuse.main([
        "-a", "vit_test", "--img-size", "32", "--crop", "32",
        "--maintain-ratio", "--compute-dtype", "float32",
        "--attn-backend", "xla", "-j", "2", "--seed", "0",
        "--covid-ds", os.path.join(root, "create_covid_dataset"),
        "--storage-root", os.path.join(root, "exp_dist_fuse"),
        "--exp-name", "distfuse",
        "-b", "8", "--epochs", "1", "--cos", "--lr", "0.01",
        "--optimizer", "sgd", "--fusion-heads", "2",
        "--semi-ratios", "1"])
    fr = fresults[0]
    sys.stdout.write(f"DIST FUSE OK {pid} auc={fr.test_auc:.17g} "
                     f"acc={fr.test_acc:.17g}\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
