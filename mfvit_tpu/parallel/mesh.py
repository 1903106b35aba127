"""Device mesh setup and sharding helpers — the TPU-native replacement for
the reference's DDP/NCCL layer (SURVEY §2.6).

The reference's entire distribution story is 1-D data parallelism:
``mp.spawn`` one process per GPU, ``dist.init_process_group('nccl')``,
``DistributedDataParallel`` gradient all-reduce, ``DistributedSampler``
batch splitting (pretrain main :201-236, :297-312, :436). Here the same
program runs single-controller over a ``jax.sharding.Mesh``:

- a 1-D ``data`` axis (optionally a ``model`` axis for wider meshes —
  unused by ViT-S which fits on one chip, kept for parity demos);
- params/state replicated (``P()``), batches sharded over ``data``;
- gradient all-reduce falls out of jit's partitioner for the supervised
  steps, and is explicit (``pmean`` inside ``shard_map``) for the MoCo
  step whose loss needs per-device collectives (all_gather negatives,
  synced-BN pmean);
- collectives ride ICI; no rendezvous server, no rank bookkeeping.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfvit_tpu.ssl import moco as moco_mod
from mfvit_tpu.nn import vit as vit_mod
from mfvit_tpu.parallel.hostput import put_global  # noqa: F401 (re-export)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host (DCN / multi-slice) initialization.

    The TPU-native replacement for the reference's TCP rendezvous
    (``dist.init_process_group('nccl', init_method='tcp://...')`` —
    pretrain main :235-236): on Cloud TPU pods ``jax.distributed.initialize``
    auto-discovers the coordinator; explicit args cover DCN setups. After
    this, ``jax.devices()`` spans all hosts and the same mesh code works
    unchanged (collectives ride ICI within a slice, DCN across).

    All three args are forwarded verbatim (each may independently be
    ``None`` — jax fills gaps by cluster auto-detection), so an explicit
    ``--dist-process-id`` is never silently dropped just because the
    coordinator is auto-discovered."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices (all by default).

    With more than one axis name the devices are reshaped so the trailing
    axes get size 1 unless specified via a tuple n_devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if isinstance(n_devices, int):
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    else:
        shape = tuple(n_devices)
    total = int(np.prod(shape))
    arr = np.array(devs[:total]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree replicated on every mesh device."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: put_global(x, s), tree)


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Split the leading (batch) dim of every leaf over the mesh axis."""
    s = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: put_global(x, s), tree)


def assert_divisible(global_batch: int, mesh: Mesh, axis: str = "data"):
    n = mesh.shape[axis]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh axis "
            f"{axis!r} of size {n}")


# ---------------------------------------------------------- MoCo wrapper

def make_moco_parallel_step(cfg: moco_mod.MoCoConfig,
                            vit_cfg: vit_mod.ViTConfig, tx, mesh: Mesh, *,
                            axis: str = "data",
                            compute_dtype=jnp.bfloat16,
                            remat: bool = False,
                            attn_backend: str | None = None):
    """shard_map the MoCo pretrain step over the data axis.

    State and optimizer state are replicated; images are sharded on the
    batch dim. Inside, the step uses ``all_gather`` for queue keys /
    negatives and ``pmean`` for loss+BN stats, so every device computes an
    identical state update (replication preserved by construction).

    Also asserts the reference's queue invariant ``K % global_batch == 0``
    (builder...mocov2loss.py:99) at trace time.
    """
    inner = moco_mod.make_pretrain_step(cfg, vit_cfg, tx, axis_name=axis,
                                        compute_dtype=compute_dtype,
                                        remat=remat,
                                        attn_backend=attn_backend)

    def step(state, opt_state, im_q, im_k, m):
        if cfg.loss == "v2_queue" and cfg.K % im_q.shape[0] != 0:
            # not assert: the queue invariant must survive python -O
            raise ValueError(
                f"global batch {im_q.shape[0]} must divide the queue "
                f"length K={cfg.K} (builder reference :99)")
        wrapped = shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False)
        return wrapped(state, opt_state, im_q, im_k, m)

    return jax.jit(step, donate_argnums=(0, 1))


# NOTE: a jit_data_parallel helper used to live here; it was unused by
# every CLI (the factory steps in train.steps are already jitted and
# shard correctly when fed sharded arrays) and was removed — supervised
# data parallelism is "replicate params, shard the batch, call the
# factory step" with no wrapper.
