"""On-chip VMEM calibration for the query-blocked bf16 attention kernel.

Compiles ``_impl_qblocked`` across (N, D, heads, QB) corners with a FORCED
query-block size (bypassing the ``_qblocked_qb`` planner, which would
otherwise raise at trace time for any corner the current budget rejects)
and prints pass/fail plus a correctness check against the unfused XLA
math. Probes run at B=2: a B=1 probe has a single-step grid, where Mosaic
skips double-buffering the io blocks and the measurement UNDER-reads by
one in+out tile pair (~2 MB at vit_base dims) vs the real batched
compile. B=2 is still NOT decisive — scoped VMEM keeps growing with grid
length (577/768/12 @ QB=32 passes here but OOMs at B=64), so acceptance
corners must also pass ``tools/calibrate_qblocked_bigbatch.py``.
Run: ``./tools_tpurun.sh tools/calibrate_qblocked.py``.
"""
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from mfvit_tpu.nn.layers import layernorm
from mfvit_tpu.ops import fused_attn as fa


def xla_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, scale):
    B, N, D = x.shape
    h = layernorm({"scale": ln_s, "bias": ln_b}, x.astype(jnp.float32))
    qkv = (h @ wqkv + bqkv).reshape(B, N, 3, heads, D // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, -1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, D)
    return x.astype(jnp.float32) + o @ wproj + bproj


def probe(N, D, heads, QB):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (2, N, D), jnp.bfloat16)
    ln = jnp.ones((D,), jnp.float32)
    wqkv = 0.05 * jax.random.normal(ks[1], (D, 3 * D), jnp.float32)
    wproj = 0.05 * jax.random.normal(ks[2], (D, D), jnp.float32)
    b3 = jnp.zeros((3 * D,), jnp.float32)
    bd = jnp.zeros((D,), jnp.float32)
    scale = (D // heads) ** -0.5
    Np = -(-N // 128) * 128
    est = (4 * D * D * 2 + 3 * D * Np * 2 + D * Np * 4 + 6 * Np * D * 2
           + heads * QB * Np * 8) / fa._MB
    try:
        out = fa._impl_qblocked(x, ln, jnp.zeros_like(ln), wqkv, b3, wproj,
                                bd, heads, scale, False, force_qb=QB)
        out.block_until_ready()
        ref = xla_ref(x, ln, jnp.zeros_like(ln), wqkv, b3, wproj, bd,
                      heads, scale)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        rel = err / max(1.0, float(jnp.abs(ref).max()))
        ok = "OK " if rel < 5e-2 else "BAD"
        print(f"N={N:5d} D={D:4d} H={heads:2d} QB={QB:3d} est={est:5.1f}MB:"
              f" {ok} (rel {rel:.1e})")
        return True
    except Exception as e:  # noqa: BLE001 - calibration probe
        msg = str(e).split("\n")[0][:100]
        print(f"N={N:5d} D={D:4d} H={heads:2d} QB={QB:3d} est={est:5.1f}MB:"
              f" FAIL {msg}")
        if "RESOURCE_EXHAUSTED" not in str(e) and "500" not in str(e):
            traceback.print_exc(limit=2)
        return False


if __name__ == "__main__":
    print("devices:", jax.devices())
    np.set_printoptions(precision=3)
    corners = [
        (577, 384, 12, 128),   # vit_small@384 — shipped corner (13.8 MB)
        (325, 768, 12, 128),   # vit_base@288 — max accepted est (15.2 MB)
        (1025, 384, 6, 64),    # vit_small_ori@512 — the unlock (13.8 MB)
        (577, 768, 12, 32),    # vit_base@384 — rejected (16.7 MB; B=64
                               #   measured 18.21M scoped vs 16M limit)
        (1025, 768, 12, 32),   # vit_base@512 — rejected (24.8 MB)
    ]
    if len(sys.argv) > 1 and sys.argv[1] == "boundary":
        # finer corners around the budget edge
        corners = [
            (1025, 384, 6, 128),   # 17.0 MB est
            (769, 768, 12, 32),    # 21.5 MB est
        ]
    for (N, D, H, QB) in corners:
        probe(N, D, H, QB)
