"""Tracing / profiling hooks.

The reference's only observability is wall-clock AverageMeters
(SURVEY §5 'Tracing': batch_time/data_time prints). The rebuild adds:

- ``StepTimer``: batch_time / data_time meters, same display contract as
  the reference hot loops (pretrain main :485-555);
- ``trace()``: a ``jax.profiler`` trace context writing a TensorBoard-
  loadable profile (XLA device traces, HLO cost breakdowns);
- ``annotate()``: named TraceAnnotation spans visible in the profile.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

from mfvit_tpu.train.metrics import AverageMeter, ProgressMeter


class StepTimer:
    """Tracks data-wait and step wall-clock like the reference's
    batch_time/data_time meters."""

    def __init__(self, num_batches: int, prefix: str = "",
                 extra_meters=()):
        self.batch_time = AverageMeter("Time", ":6.3f")
        self.data_time = AverageMeter("Data", ":6.3f")
        self.progress = ProgressMeter(
            num_batches,
            [self.batch_time, self.data_time, *extra_meters],
            prefix=prefix)
        self._end = time.time()

    def data_ready(self):
        self.data_time.update(time.time() - self._end)

    def step_done(self, i: int, print_freq: int = 0):
        self.batch_time.update(time.time() - self._end)
        self._end = time.time()
        if print_freq and i % print_freq == 0:
            self.progress.display(i)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span annotation inside an active trace."""
    return jax.profiler.TraceAnnotation(name)
