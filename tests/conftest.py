"""Test configuration: force CPU with 8 virtual devices so the multi-chip
sharding paths (SURVEY §4: simulated-8-device CPU tests) run anywhere."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compilation cache: deep CPU graphs (resnets, the MoCo
# step) take 10-30s to compile and the suite re-compiles them in every
# process — including the 2-process dist workers, which inherit these env
# vars through _spawn_dist_workers. The cache is keyed by program+options
# so it is correctness-neutral. Survives across suite runs (suite-time
# budget, VERDICT r4 #7).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/mfvit_jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-selects jax_platforms="axon,cpu"
# via jax.config, overriding the env var — override it back for tests.
jax.config.update("jax_platforms", "cpu")

# The env vars above only reach jax.config when they're present at
# INTERPRETER startup (jax reads os.getenv once, at config-module import).
# Under the axon PYTHONPATH, sitecustomize imports jax before this file
# runs, so the env-var route silently latches cache_dir=None and the cache
# never initializes in the pytest process itself (the subprocess dist
# workers were the only writers — they inherit the env at exec). Set the
# config directly; it is read lazily at the first compile.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", float(
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", int(
    os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
