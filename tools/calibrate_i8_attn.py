"""On-chip VMEM calibration for the int8 fused attention kernel.

Compiles ``fused_attention_block_i8`` across (N, D, heads, CB) corners and
prints pass/fail, to calibrate the ``_i8_cb`` planning budget the same way
the bf16 kernel's ``_fwd_cb`` budget was calibrated (docs/PERF.md "Budget
calibrated on-chip"). Probes run 2-step grids; scoped VMEM grows with
grid length (docs/PERF.md round-5), so corners near the budget edge must
also pass the production-batch probes in
``tools/calibrate_qblocked_bigbatch.py`` (its ``probe_i8`` section —
577/384/6 @ CB=1, the largest accepted est, passed at B=64).
Run: ``./tools_tpurun.sh tools/calibrate_i8_attn.py``.
"""
import traceback

import jax
import jax.numpy as jnp

from mfvit_tpu.ops import fused_int8 as fi8


def probe(N, D, heads, CB):
    key = jax.random.PRNGKey(0)
    # B = 2*CB so the grid has 2 steps: single-step grids skip Mosaic's
    # io double-buffering and UNDER-measure by one in+out tile pair vs
    # the real batched compile (caught by the qblocked calibration,
    # docs/PERF.md round-5)
    x = jax.random.normal(key, (2 * CB, N, D), jnp.bfloat16)
    ln = jnp.ones((D,), jnp.float32)
    w = fi8.quantize_weight_cols(jax.random.normal(key, (D, 3 * D)) * 0.02)
    p = fi8.quantize_weight_cols(jax.random.normal(key, (D, D)) * 0.02)
    b3 = jnp.zeros((3 * D,), jnp.float32)
    bd = jnp.zeros((D,), jnp.float32)
    try:
        # force_cb bypasses the _i8_cb planner so the probe compiles the
        # kernel at exactly this CB on the chip — otherwise corners the
        # current budget rejects would FAIL at trace time with the
        # planner's ValueError and the budget could never be re-calibrated
        # downward, and "CB=2" probes the planner re-plans to CB=1 would
        # mislabel the result
        out = fi8.fused_attention_block_i8(
            x, ln, jnp.zeros_like(ln), w["q"], w["s"], b3,
            p["q"], p["s"], bd, heads, (D // heads) ** -0.5,
            force_cb=CB)
        out.block_until_ready()
        print(f"N={N:4d} D={D:4d} H={heads:2d} CB={CB}: OK "
              f"(|out|max {float(jnp.abs(out).max()):.3f})")
        return True
    except Exception as e:  # noqa: BLE001 - calibration probe
        msg = str(e).split("\n")[0][:110]
        print(f"N={N:4d} D={D:4d} H={heads:2d} CB={CB}: FAIL {msg}")
        if "RESOURCE_EXHAUSTED" not in str(e) and "vmem" not in str(e).lower():
            traceback.print_exc(limit=2)
        return False


if __name__ == "__main__":
    print("devices:", jax.devices())
    import sys
    corners = [(197, 384, 6), (197, 768, 12), (257, 768, 12),
               (401, 384, 6), (577, 384, 6), (577, 768, 12)]
    if len(sys.argv) > 1 and sys.argv[1] == "boundary":
        # finer corners between the pass/fail extremes of the first sweep
        corners = [(385, 768, 12), (449, 768, 12), (513, 768, 12),
                   (769, 384, 6), (897, 384, 6)]
    for (N, D, H) in corners:
        for CB in (2, 1):
            probe(N, D, H, CB)
