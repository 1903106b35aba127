"""Subprocess worker for the real multi-process init_distributed test.

Each worker hosts 2 virtual CPU devices and joins a localhost coordinator
(the reference's tcp:// DDP rendezvous equivalent, pretrain main
:235-236). It asserts the GLOBAL device view and performs one
cross-process psum. Invoked by tests/test_parallel.py.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from mfvit_tpu.parallel import mesh as pmesh  # noqa: E402


def main():
    pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    pmesh.init_distributed(addr, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc, jax.device_count()
    # one collective across processes: psum over the global pmap axis
    local = jnp.arange(2, dtype=jnp.float32) + 10.0 * pid
    out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(local)
    # global values across 2 procs x 2 devices: [0,1,10,11] -> 22
    expect = sum(float(10.0 * p + d) for p in range(nproc) for d in range(2))
    assert float(out[0]) == expect, (float(out[0]), expect)
    print(f"DIST OK {pid}", flush=True)


if __name__ == "__main__":
    main()
