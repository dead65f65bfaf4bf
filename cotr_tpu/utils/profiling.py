"""Tracing / profiling utilities.

The reference has no profiling beyond wall-clock prints (SURVEY.md §5);
here: jax.profiler trace capture (view in TensorBoard / Perfetto) plus a
lightweight phase timer whose reports survive into logs.

Note on this environment: over the axon tunnel, device timelines may be
unavailable — the phase timer measures host-observed walls, and
``chained`` measures true device throughput by building an N-step
dependency chain inside one jit (defeats both async dispatch and
loop-invariant hoisting; see bench history for why naive timing lies).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    with timer.phase("encode"): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.3f}s total, {n} calls, "
                         f"{t / n * 1000:.2f}ms avg")
        return "\n".join(lines)


def chained_op_time(fn: Callable, *args, iters: int = 20) -> float:
    """True per-op device time in ms via an in-jit dependency chain.

    ``fn(acc, *args) -> scalar`` must consume the chained scalar ``acc`` so
    XLA cannot hoist it out of the loop.
    """
    import jax

    def chain(n):
        @jax.jit
        def run(*a):
            def body(_, acc):
                return fn(acc, *a)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return run

    r1, rn = chain(1), chain(iters + 1)
    float(r1(*args))
    float(rn(*args))
    t0 = time.perf_counter()
    float(r1(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(rn(*args))
    tn = time.perf_counter() - t0
    return (tn - t1) / iters * 1000.0
