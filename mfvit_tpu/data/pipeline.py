"""Host input pipeline: threaded decode, batch assembly, device prefetch.

TPU-native replacement for the reference's
``DataLoader(num_workers=12, pin_memory=True, drop_last=True)`` +
``DistributedSampler`` stack (pretrain main :425-442): worker THREADS
(cv2/PIL release the GIL during decode/resize) assemble whole numpy
batches, a small queue keeps batches ready ahead of the training step, and
``device_prefetch`` overlays H2D transfer with compute by keeping the next
batch in flight — the double-buffered host->HBM feed from BASELINE.json's
north star. Sharded transfer over a mesh data axis replaces the
per-process batch split.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

import jax


def _collate(samples: Sequence) -> tuple:
    """Stack a list of per-sample tuples field-wise."""
    fields = list(zip(*[s if isinstance(s, tuple) else (s,) for s in samples]))
    return tuple(np.stack(f) for f in fields)


class BatchLoader:
    """Iterable over epochs of batches from an indexable dataset.

    Deterministic order: epoch ``e`` shuffles with ``seed + e`` (the
    functional analogue of ``DistributedSampler.set_epoch`` — pretrain main
    :450-451). ``pad_final`` pads the last short batch by wrapping (batch
    shape stays static for XLA) and reports the real count.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 3, pad_final: bool = False,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        assert not (drop_last and pad_final)
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_final = pad_final
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.epoch = 0
        # Multi-process (multi-host) input sharding, the DistributedSampler
        # equivalent (pretrain main :309, :436): the GLOBAL shuffle and
        # batching are computed identically on every process (same seed),
        # then process p decodes only the contiguous sub-batch that lands
        # on its own devices. Contiguity matters: jax orders the global
        # device list by process, so rows [p*B/P, (p+1)*B/P) of a
        # 'data'-axis-sharded global batch are exactly process p's
        # addressable shards (assembled by device_prefetch via
        # jax.make_array_from_process_local_data).
        # Defaulting from the jax runtime (rather than per call site)
        # means a loader built on a multi-host run can never silently
        # feed every process the full duplicated global batch; pass
        # explicit values only to override (tests, ablation).
        if process_count is None:
            process_count = jax.process_count()
        if process_index is None:
            process_index = jax.process_index() if process_count > 1 else 0
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(
                    f"batch {batch_size} not divisible by process_count "
                    f"{process_count}")
            if not (drop_last or pad_final):
                raise ValueError("multi-process loading needs a static "
                                 "batch shape: drop_last or pad_final")

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch used by the NEXT iteration's shuffle and
        augmentation context. Training loops call this every epoch so a
        run resumed at epoch E replays exactly the order/draws the
        uninterrupted run used for E (the reference analogue is
        DistributedSampler.set_epoch, pretrain main :450-451)."""
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator:
        idx = self._epoch_indices()
        if hasattr(self.ds, "set_epoch"):
            # per-epoch augmentation context (worker-count-independent
            # determinism — datasets._EpochMixin)
            self.ds.set_epoch(self.epoch)
        self.epoch += 1
        n = len(idx)
        batches = []
        for s in range(0, n, self.bs):
            chunk = idx[s:s + self.bs]
            if len(chunk) < self.bs:
                if self.drop_last:
                    break
                if self.pad_final:
                    # wrap-and-tile: fills the batch even when the whole
                    # dataset is smaller than batch_size (static shape)
                    reps = -(-(self.bs - len(chunk)) // max(len(idx), 1))
                    pad = np.tile(idx, reps)[: self.bs - len(chunk)]
                    chunk = np.concatenate([chunk, pad])
            if self.process_count > 1:
                # slice AFTER global batching so the assembled global batch
                # is identical to a single-process run over the same seed
                local = self.bs // self.process_count
                chunk = chunk[self.process_index * local:
                              (self.process_index + 1) * local]
            batches.append(chunk)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.ds.__getitem__, b))
                        q.put(_collate(samples))
                q.put(None)
            except BaseException as e:  # noqa: BLE001
                # propagate into the consumer — a dead producer without a
                # sentinel would block q.get() forever (a corrupt image
                # would silently hang the training job)
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)


def device_prefetch(it: Iterator, *, sharding=None, depth: int = 2):
    """Move batches to device ahead of consumption (double buffering).

    ``sharding`` is an optional ``jax.sharding.Sharding`` (e.g. batch split
    over the mesh 'data' axis) applied to every array in the batch — the
    TPU-side replacement for DistributedSampler's per-rank slicing.

    When the sharding spans multiple PROCESSES (multi-host mesh), each
    process's iterator must yield only its local sub-batch (a BatchLoader
    with process_index/process_count set); the local pieces are assembled
    into one global sharded jax.Array via
    ``jax.make_array_from_process_local_data`` — no host ever holds the
    global batch.
    """
    from mfvit_tpu.parallel.hostput import put_local_rows

    def put(batch):
        return jax.tree.map(lambda x: put_local_rows(x, sharding), batch)

    buf = []
    for batch in it:
        buf.append(put(batch))
        if len(buf) >= depth:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
