"""Host->device placement that is multi-process (multi-host) safe.

Leaf module (jax/numpy only) so the data pipeline can use it without
importing model code. On a single-process mesh these helpers reduce to
``jax.device_put``; on a mesh spanning processes (the reference's
multi-node DDP regime, pretrain main :99-110) they build global
``jax.Array``s from per-process pieces — the blessed JAX multihost
idioms, standing in for DistributedSampler's per-rank slicing plus
NCCL's implicit global view.
"""
from __future__ import annotations

import numpy as np

import jax


def put_global(x, sharding):
    """Place a HOST-GLOBAL value under ``sharding``.

    Every process calls this with the SAME global value; each puts only
    the index slices its own devices own and the global jax.Array is
    assembled from the per-device pieces — the host never ships rows
    that land on another process's chips. Works for replicated (P())
    and batch-sharded (P('data')) specs alike."""
    if sharding is None or sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    dbs = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, dbs)


def put_local_rows(local, sharding):
    """Assemble a row-sharded global array from each process's LOCAL
    contiguous row block (process p holds rows [p*N/P, (p+1)*N/P)).
    Single-process: plain sharded device_put."""
    if sharding is None or sharding.is_fully_addressable:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))


def local_row_block(n_rows: int):
    """This process's contiguous row range [start, stop) of a
    'data'-sharded table of ``n_rows`` global rows. jax orders the
    global device list by process, so contiguous blocks line up with
    each process's addressable shards."""
    nproc = jax.process_count()
    if n_rows % nproc:
        raise ValueError(f"{n_rows} rows not divisible by "
                         f"{nproc} processes")
    per = n_rows // nproc
    p = jax.process_index()
    return p * per, (p + 1) * per
