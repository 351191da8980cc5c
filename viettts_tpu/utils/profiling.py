"""Profiling and timing utilities.

The reference has no tracing/profiling at all (SURVEY §5); these hooks give
trainers and the benchmark a consistent way to capture device traces and
wall-clock timings.

* ``trace(logdir)``: context manager around ``jax.profiler.trace`` —
  produces a TensorBoard-loadable device trace.  Enable in trainers with
  ``VIETTTS_PROFILE_DIR=/tmp/trace python -m viettts_tpu.train.acoustic ...``.
* ``StepTimer``: rolling steps/sec with jitted-dispatch awareness (syncs
  via ``block_until_ready`` on a provided leaf before reading the clock).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax

PROFILE_ENV = "VIETTTS_PROFILE_DIR"


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a device trace if a log dir is given (or set via
    VIETTTS_PROFILE_DIR); no-op otherwise."""
    logdir = logdir or os.environ.get(PROFILE_ENV)
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    def __init__(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1, sync_leaf=None) -> None:
        if sync_leaf is not None:
            jax.block_until_ready(sync_leaf)
        self._steps += n

    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else float("nan")

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0
