"""Tracing / profiling as first-class tooling.

The reference's profiling is vestigial — commented-out per-module
wall-clock collection (reference models.py:21,115-116,156) and ad-hoc
timing prints in eval paths (main.py:699,722,846).  SURVEY §5 calls for
jax.profiler traces + per-phase timing as first-class; this module
provides both:

  * ``trace(logdir)``: context manager around ``jax.profiler`` — captures
    a TensorBoard-viewable device trace of everything inside.
  * ``PhaseTimer``: named-phase wall-clock accumulator with honest device
    synchronization on this platform (value materialization — see
    BENCH_NOTES on why block_until_ready is not a sync point here).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "profile", create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace into ``logdir`` (TensorBoard's
    profile plugin / Perfetto can open it)."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion of all computations producing ``tree``.

    On the axon remote platform ``block_until_ready`` can return before
    remote execution finishes; summing a leaf to a host float is the
    reliable barrier."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        float(jax.numpy.sum(leaves[0].astype(jax.numpy.float32)))


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    Usage:
        timer = PhaseTimer()
        with timer.phase("collect"):
            batch = ds.collect(...)
        with timer.phase("step", sync_tree=state):
            state, metrics = train_step(...)
        print(timer.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_tree is not None:
                sync(sync_tree)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["phase timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total, n = self.totals[name], self.counts[name]
            lines.append(
                f"  {name:<20s} total {total:8.2f}s  x{n:<6d} "
                f"avg {1e3 * total / max(n, 1):8.2f}ms")
        return "\n".join(lines)
