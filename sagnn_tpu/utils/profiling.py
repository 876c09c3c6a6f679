"""Profiling helpers: per-step timers, edges/s counters, jax.profiler hooks.

The reference has no profiling beyond timestamped prints (SURVEY.md §5); this
module is the framework's observability layer. `EdgeRateCounter` measures the
headline metric (edges/s/chip through SpMM propagation).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax


@dataclass
class StepTimer:
    """Accumulates per-step wall times; call .tic() / .toc() around steps."""

    times: List[float] = field(default_factory=list)
    _t0: float = 0.0

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))

    def windowed(self, window: int = 0) -> "StepTimer":
        """View over the last `window` samples (0 = all) for mean/percentile."""
        return StepTimer(times=self.times[-window:] if window else self.times)

    def percentile(self, p: float) -> float:
        if not self.times:
            return 0.0
        s = sorted(self.times)
        k = min(len(s) - 1, int(round(p / 100.0 * (len(s) - 1))))
        return s[k]


@dataclass
class EdgeRateCounter:
    """edges/s counter for SpMM propagation.

    `edges_per_step` should count every processed (padded) edge across all
    interval graphs, hops, and directions, i.e.
    2 * graph_num * gnn_layer * E_padded per training step.
    """

    edges_per_step: int
    timer: StepTimer = field(default_factory=StepTimer)

    @property
    def edges_per_sec(self) -> float:
        m = self.timer.mean
        return self.edges_per_step / m if m > 0 else 0.0


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block(tree):
    """Block until every array in a pytree is ready (for honest timing)."""
    return jax.block_until_ready(tree)


def fetch_scalar(tree) -> float:
    """Synchronize by FETCHING a value: on the axon relay,
    jax.block_until_ready does not reliably wait for remote execution, so
    honest timing must pull a scalar to the host."""
    return float(jax.tree_util.tree_leaves(tree)[0].reshape(-1)[0])


def time_scalar_fetch(fn, *args, iters: int = 8, chain: int = 1):
    """Relay-honest timing: warm up (compile) AND synchronize via a scalar
    fetch, then time `iters` calls each synchronized the same way. `chain`
    divides out data-dependent iterations folded inside fn (see bench.py
    _chain_steps — chaining amortizes the ~16 ms per-dispatch relay
    latency without letting XLA hoist loop-invariant work).

    Returns (ms_per_chained_step, last_fetched_value).
    """
    import time as _time
    fetch_scalar(fn(*args))
    t0 = _time.perf_counter()
    v = 0.0
    for _ in range(iters):
        v = fetch_scalar(fn(*args))
    return (_time.perf_counter() - t0) / iters / chain * 1e3, v
