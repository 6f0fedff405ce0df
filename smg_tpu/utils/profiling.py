"""Tracing / profiling instrumentation.

The reference has none (SURVEY section 5.1: `time` only for sleeps). This
module is the greenfield observability layer:

- `trace(dir)`         — context manager around jax.profiler traces
  (open the result in XProf/TensorBoard);
- `annotate(name)`     — TraceAnnotation for labelling device regions;
- `PhaseTimer`         — wall-clock per-phase accumulator for the host
  loop (observe / score / select / update / execute), with a summary
  suitable for the run log.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with profiling.trace('logs/trace'): ...`"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region in the device trace."""
    return jax.profiler.TraceAnnotation(name)


def readback(out) -> None:
    """Force a device->host transfer that depends on `out`.

    jax.block_until_ready on this platform (axon tunnel) can return
    before execution completes — a timed physics loop once "measured"
    776M scene-steps/s that way (400x reality, caught by checksum).
    Transferring one element of the first few leaves can only happen
    after the producing program actually ran, so every timed loop in
    the bench scripts ends with this instead of block_until_ready.
    Costs ~1-3 ms (two tiny slice dispatches), amortized over a loop.
    """
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves[:2]:
        float(jnp.asarray(leaf).ravel()[0])


class PhaseTimer:
    """Accumulates wall time per named phase; blocks on device results so
    timings reflect real execution, not dispatch."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(
                    1e3 * self.totals[name] / max(self.counts[name], 1), 3
                ),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        lines = ["phase timings:"]
        for name, s in self.summary().items():
            lines.append(
                f"  {name:<12} {s['mean_ms']:>9.2f} ms/call"
                f" x{s['count']:<6} = {s['total_s']:.2f} s"
            )
        return "\n".join(lines)
