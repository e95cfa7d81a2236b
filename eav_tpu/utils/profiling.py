"""Profiling / observability helpers (SURVEY.md §5 tracing row — absent in
the reference, which only prints progress).

- :class:`Throughput`: fenced samples/sec meter. On the axon TPU platform
  ``block_until_ready`` is unreliable, so fencing materializes a small
  representative output to host.
- :func:`trace`: ``jax.profiler`` trace context around a region (viewable in
  TensorBoard / xprof).
- :func:`debug_nans`: context manager toggling ``jax_debug_nans`` — the
  framework's numeric-sanitizer story (JAX is functional, so the classic
  race-detection surface of the reference's DataParallel doesn't exist; the
  native ingest queue is exercised under threads in tests/test_native.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


def fence(x) -> None:
    """Reliable device fence: materialize (a leaf of) ``x`` to host."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.tree.leaves(x)[0])


class Throughput:
    """Measure steady-state samples/sec of a step function.

    >>> meter = Throughput()
    >>> with meter.measure(n_samples=batch * steps):
    ...     for _ in range(steps): out = step(...)
    ...     fence(out)
    >>> meter.samples_per_sec
    """

    def __init__(self):
        self.samples_per_sec: Optional[float] = None
        self.wall_clock_s: Optional[float] = None

    @contextlib.contextmanager
    def measure(self, n_samples: int) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.wall_clock_s = time.perf_counter() - t0
        self.samples_per_sec = n_samples / self.wall_clock_s


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace around a region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
