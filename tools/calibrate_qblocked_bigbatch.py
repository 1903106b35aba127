"""Production-batch probes for the query-blocked kernel: scoped-VMEM use
was observed to differ between a 2-step grid and a 64-step grid (the
vit_base@384 B=64 compile OOMed at 18.21M scoped while the same corner's
B=2 probe passed), so the budget must be validated at real batch sizes.
Run: ``./tools_tpurun.sh tools/calibrate_qblocked_bigbatch.py``.
"""
import jax
import jax.numpy as jnp

from mfvit_tpu.ops import fused_attn as fa


def probe(B, N, D, heads, QB):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (B, N, D), jnp.bfloat16)
    ln = jnp.ones((D,), jnp.float32)
    wqkv = 0.05 * jax.random.normal(ks[1], (D, 3 * D), jnp.float32)
    wproj = 0.05 * jax.random.normal(ks[2], (D, D), jnp.float32)
    b3 = jnp.zeros((3 * D,), jnp.float32)
    bd = jnp.zeros((D,), jnp.float32)
    scale = (D // heads) ** -0.5
    try:
        out = fa._impl_qblocked(x, ln, jnp.zeros_like(ln), wqkv, b3, wproj,
                                bd, heads, scale, False, force_qb=QB)
        out.block_until_ready()
        print(f"B={B:3d} N={N:5d} D={D:4d} H={heads:2d} QB={QB:3d}: OK")
        return True
    except Exception as e:  # noqa: BLE001 - calibration probe
        print(f"B={B:3d} N={N:5d} D={D:4d} H={heads:2d} QB={QB:3d}: "
              f"FAIL {str(e).splitlines()[0][:90]}")
        return False


def probe_i8(B, N, D, heads, CB):
    """Long-grid probe of the int8 attention kernel's edge corners (its
    own calibration tool probes 2-step grids, which the bf16 lesson shows
    can under-read)."""
    from mfvit_tpu.ops import fused_int8 as fi8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, D), jnp.bfloat16)
    ln = jnp.ones((D,), jnp.float32)
    w = fi8.quantize_weight_cols(jax.random.normal(key, (D, 3 * D)) * 0.02)
    p = fi8.quantize_weight_cols(jax.random.normal(key, (D, D)) * 0.02)
    try:
        out = fi8.fused_attention_block_i8(
            x, ln, jnp.zeros_like(ln), w["q"], w["s"],
            jnp.zeros((3 * D,), jnp.float32), p["q"], p["s"],
            jnp.zeros((D,), jnp.float32), heads, (D // heads) ** -0.5,
            force_cb=CB)
        out.block_until_ready()
        print(f"i8 B={B:3d} N={N:4d} D={D:4d} H={heads:2d} CB={CB}: OK")
        return True
    except Exception as e:  # noqa: BLE001 - calibration probe
        print(f"i8 B={B:3d} N={N:4d} D={D:4d} H={heads:2d} CB={CB}: "
              f"FAIL {str(e).splitlines()[0][:90]}")
        return False


if __name__ == "__main__":
    print("devices:", jax.devices())
    corners = [
        (64, 577, 768, 12, 32),    # the observed B=64 OOM corner
        (64, 577, 384, 12, 128),   # accepted: vit_small@384
        (64, 325, 768, 12, 128),   # accepted: vit_base@288 (max est)
        (32, 1025, 384, 6, 64),    # accepted: vit_small_ori@512
    ]
    for (B, N, D, H, QB) in corners:
        probe(B, N, D, H, QB)
    i8_corners = [
        (64, 577, 384, 6, 1),      # vit_small@384 int8 — est 16.3 MB,
                                   #   the largest accepted _i8_cb est
        (64, 401, 384, 6, 2),      # vit_small@320 int8 — est 12.0 MB
    ]
    for (B, N, D, H, CB) in i8_corners:
        probe_i8(B, N, D, H, CB)
