"""Benchmark: MF-ViT CA paired-inference throughput on one chip.

Measures the flagship path from BASELINE.json — two ViT-S/16 branches over
paired CXR+Enh 224px images, CLS cross-attention fusion, summed dual heads,
one jitted forward (bf16 compute, fp32 logits, Pallas attention on TPU) —
and prints ONE JSON line:
  {"metric": ..., "value": pairs/sec, "unit": ..., "vs_baseline": ...}

``vs_baseline`` is the ratio against the driver-set target of 5,000
CXR+Enh pairs/sec/chip (BASELINE.md; the reference publishes no throughput
numbers of its own).

The measurement runs in a CHILD subprocess with a timeout and retries:
the axon tunnel intermittently wedges with ``jax.devices()`` blocking
forever inside the chip-claim leg (observed rounds 2-4), and a wedged
claim can only be abandoned by killing the process. The parent stays
jax-free so it can never hang; a transient wedge costs a retry instead
of the whole benchmark run.
"""
import json
import os
import signal
import subprocess
import sys
import time

TARGET_PAIRS_PER_SEC = 5000.0
_CHILD_FLAG = "MFVIT_BENCH_CHILD"
_ATTEMPTS = 4            # worst case ~4x10min probes + 3x2min waits
_CHILD_TIMEOUT_S = 600   # TPU run is ~2-3 min incl. compile; 10 min = wedged
_RETRY_SLEEP_S = 120


def bench(batch: int, iters: int = 20, warmup: int = 2) -> float:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mfvit_tpu.models import fusion
    from mfvit_tpu.nn import vit

    cfg = vit.get_config("vit_small")
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    vp_c = vit.init(k1, cfg, num_classes=3)
    vp_e = vit.init(k2, cfg, num_classes=3)
    fp = fusion.init(k3, num_classes=3)
    img_c = jax.random.normal(k4, (batch, 224, 224, 3), jnp.bfloat16)
    img_e = jax.random.normal(k4, (batch, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def fwd(vp_c, vp_e, fp, a, b):
        fused, lc, le = fusion.fused_forward(vp_c, vp_e, fp, a, b, cfg)
        return fused + lc + le

    # Every iteration's (batch, 3) logits are fetched to host: through the
    # axon tunnel, execution is deferred until a result is consumed, so
    # block_until_ready alone under-measures; the tiny D2H also mirrors
    # real inference (logits must reach the host). Fetches lag dispatch by
    # one iteration (classic serving pipeline) so host dispatch latency
    # overlaps device compute — all work is still forced.
    for _ in range(warmup):
        np.asarray(fwd(vp_c, vp_e, fp, img_c, img_e))
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        out = fwd(vp_c, vp_e, fp, img_c, img_e)
        if pending is not None:
            np.asarray(pending)
        pending = out
    np.asarray(pending)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def child_main():
    import jax

    platform = jax.devices()[0].platform
    batches = [512, 1024, 2048] if platform == "tpu" else [8]
    best = 0.0
    best_b = 0
    for b in batches:
        try:
            v = bench(b)
        except Exception as e:  # OOM at large batch etc.
            print(f"# batch {b} failed: {type(e).__name__}", file=sys.stderr)
            continue
        print(f"# batch {b}: {v:.0f} pairs/sec", file=sys.stderr)
        if v > best:
            best, best_b = v, b
    print(json.dumps({
        "metric": "mfvit_ca_paired_inference_throughput",
        "value": round(best, 1),
        "unit": f"CXR+Enh pairs/sec/chip (batch {best_b}, {platform})",
        "vs_baseline": round(best / TARGET_PAIRS_PER_SEC, 4),
    }))


def _run_child(cmd, env, timeout=_CHILD_TIMEOUT_S):
    """Run one measurement child in ITS OWN SESSION; (code, out, err), or
    None if it wedged past ``timeout``.

    start_new_session + killpg, not subprocess.run(timeout=...): run()
    kills only the direct child and then blocks draining the pipes —
    which never close if the wedged child forked any helper that
    inherited stdout/stderr — so the 'parent can never hang' guarantee
    would fail in exactly the scenario it exists for. Killing the whole
    process group closes every inherited pipe end; the post-kill drain is
    still time-bounded in case a grandchild escaped the session."""
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True,
                            start_new_session=True)
    try:
        out, err = proc.communicate(timeout=timeout)
        return proc.returncode, out, err
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        try:
            # surface whatever the wedged child managed to emit (the
            # '# batch N' progress lines pinpoint where it stalled)
            _, err = proc.communicate(timeout=30)
            if err:
                sys.stderr.write(err)
        except subprocess.TimeoutExpired:
            pass  # escaped grandchild still holds the pipes; leak them
        return None


def main():
    if os.environ.get(_CHILD_FLAG):
        child_main()
        return
    env = dict(os.environ, **{_CHILD_FLAG: "1"})
    cmd = [sys.executable, "-u", os.path.abspath(__file__)]
    for attempt in range(1, _ATTEMPTS + 1):
        res = _run_child(cmd, env)
        if res is None:
            print(f"# attempt {attempt}: child hung >{_CHILD_TIMEOUT_S}s "
                  f"(wedged TPU claim) — killed", file=sys.stderr)
        else:
            code, out, err = res
            sys.stderr.write(err)
            if code == 0 and out.strip():
                sys.stdout.write(out)
                return
            print(f"# attempt {attempt}: child exit {code}",
                  file=sys.stderr)
        if attempt < _ATTEMPTS:
            time.sleep(_RETRY_SLEEP_S)
    print(f"# all {_ATTEMPTS} attempts failed", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
