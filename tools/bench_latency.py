"""Serving LATENCY of the MF-ViT CA fused forward at small batch sizes.

bench.py measures pipelined throughput (fetch lags dispatch); a serving
deployment also cares about single-request latency: dispatch -> compute ->
logits on host, fully synchronous per request. This reports median and p99
wall latency per batch size over many requests.

Through the axon tunnel every dispatch+fetch round trip carries ~33 ms of
RPC latency that a co-located host does not pay (docs/PERF.md measurement
notes) — the per-batch DELTAS are the hardware numbers; the floor is the
tunnel.

Run: ./tools_tpurun.sh tools/bench_latency.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.models import fusion
from mfvit_tpu.nn import vit


def main():
    cfg = vit.get_config("vit_small")
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    vp_c = vit.init(k1, cfg, num_classes=3)
    vp_e = vit.init(k2, cfg, num_classes=3)
    fp = fusion.init(k3, num_classes=3)

    @jax.jit
    def fwd(vp_c, vp_e, fp, a, b):
        fused, lc, le = fusion.fused_forward(vp_c, vp_e, fp, a, b, cfg)
        return fused + lc + le

    rows = []
    for batch in (1, 8, 32, 128, 512):
        img_c = jax.random.normal(k4, (batch, 224, 224, 3), jnp.bfloat16)
        img_e = jax.random.normal(k4, (batch, 224, 224, 3), jnp.bfloat16)
        for _ in range(3):  # warm compile + caches
            np.asarray(fwd(vp_c, vp_e, fp, img_c, img_e))
        lats = []
        for _ in range(30):
            t0 = time.perf_counter()
            np.asarray(fwd(vp_c, vp_e, fp, img_c, img_e))
            lats.append((time.perf_counter() - t0) * 1e3)
        lats = np.asarray(lats)
        rows.append({"batch": batch,
                     "median_ms": round(float(np.median(lats)), 2),
                     "p99_ms": round(float(np.percentile(lats, 99)), 2)})
        print(f"# batch {batch:4d}: median {rows[-1]['median_ms']:8.2f} ms  "
              f"p99 {rows[-1]['p99_ms']:8.2f} ms  "
              f"({batch / np.median(lats) * 1e3:.0f} pairs/s sync)")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
