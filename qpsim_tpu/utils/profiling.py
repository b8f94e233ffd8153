"""Profiling and observability helpers.

The reference has no tracing/profiling at all (SURVEY §5 — its only
observability is a progress callback).  This module provides:

* :func:`trace` — context manager around ``jax.profiler`` emitting an
  xprof/TensorBoard-compatible trace directory;
* :func:`annotate` — named trace regions that show up inside the trace;
* :class:`PhaseTimer` — lightweight host-side wall-clock accounting per
  phase, for quick CLI-level "where did the time go" summaries without a
  trace viewer.  Pass ``block_on=`` the phase's output to make the timing
  honest on asynchronous backends — the timer then forces a scalar off the
  device (``block_until_ready`` alone does not reliably synchronise over
  remote-device transports); without it a phase records dispatch time only.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax

__all__ = ["trace", "annotate", "PhaseTimer"]


@contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


def _force_sync(tree) -> None:
    """Force a scalar off the device — the reliable sync on every transport
    (``block_until_ready`` does not synchronise over remote-device tunnels;
    see bench.py::_sync)."""
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        float(jnp.sum(jnp.abs(jnp.ravel(leaves[0])[:1])))


class PhaseTimer:
    """Accumulate wall-clock per named phase.

    Usage::

        timer = PhaseTimer()
        with timer.phase("collisions", block_on=lambda: (q, ph)):
            q, ph = collision_step(q, ph)
        ...
        print(timer.report())

    ``block_on`` may be the device value(s) the phase produces or a
    zero-argument callable returning them (use a callable when the value is
    assigned inside the block); the timer forces a scalar off the device so
    the recorded time covers the device work.  Without it, a phase of
    asynchronous dispatches records host time only.
    """

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextmanager
    def phase(self, name: str, *, block_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                _force_sync(block_on() if callable(block_on) else block_on)
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def report(self) -> str:
        if not self.totals:
            return "(no phases timed)"
        grand = sum(self.totals.values())
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:24s} {total * 1e3:10.2f} ms total  "
                f"{total / max(1, n) * 1e3:8.3f} ms/call  x{n:<6d} "
                f"{100 * total / max(grand, 1e-12):5.1f}%"
            )
        lines.append(f"{'TOTAL':24s} {grand * 1e3:10.2f} ms")
        return "\n".join(lines)

    def as_dict(self) -> dict[str, dict[str, float]]:
        return {
            name: {"total_s": self.totals[name], "calls": self.counts[name]}
            for name in self.totals
        }
