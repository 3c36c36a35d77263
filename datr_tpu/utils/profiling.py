"""Profiling helpers.

Capability match for util/time_counter.py (TimeCounter/TimeHolder :4,18) and
the MetricLogger's iter/data timing (misc.py:218-256), plus what the reference
lacks: a jax.profiler trace context for real device timelines, and a
relay-safe two-point throughput measurement (see bench.py for why plain
block_until_ready timing can lie through remote-execution tunnels).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


class TimeHolder:
    """Accumulate named wall-clock spans (util/time_counter.py:18)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_throughput(
    fn: Callable, args: tuple, batch: int, n1: int = 2, n2: int = 10,
) -> float:
    """Per-iteration seconds of `fn(*args) -> pytree`, measured by chaining
    n iterations through a scalar data dependency inside one jit and
    differencing two trip counts — immune to async-dispatch under-reporting.
    `fn` must accept a scalar perturbation as its last argument."""

    def make(n):
        @jax.jit
        def run(*a):
            def body(i, c):
                out = fn(*a[:-1], a[-1] + c * 1e-12)
                leaves = jax.tree.leaves(out)
                return sum(jnp.mean(x.astype(jnp.float32)) for x in leaves)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    times = {}
    for n in (n1, n2):
        f = make(n)
        _ = float(np.asarray(f(*args)))  # compile + warm
        t0 = time.perf_counter()
        _ = float(np.asarray(f(*args)))
        times[n] = time.perf_counter() - t0
    return (times[n2] - times[n1]) / (n2 - n1)
