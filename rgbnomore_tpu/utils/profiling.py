"""Profiling and FLOPs accounting.

The reference only wall-clocks (``benchmark.py:24-56``) and carries dormant
FLOP machinery (fvcore import never called, ``benchmark.py:8``; SwinV2
``flops()`` methods).  Here profiling is real: JAX profiler traces viewable
in TensorBoard/XProf, and FLOPs from XLA's own cost analysis of the compiled
executable.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "Timer", "compiled_cost", "model_flops"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer with device synchronization."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False

    @staticmethod
    def sync(tree):
        jax.block_until_ready(tree)


def compiled_cost(fn, *args, **kwargs) -> dict:
    """XLA cost analysis (flops, bytes accessed, ...) of ``jit(fn)(*args)``."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a per-device list
        cost = cost[0]
    return dict(cost) if cost else {}


def model_flops(model, params, *inputs) -> float:
    """FLOPs of one forward pass, as counted by XLA (not hand-derived)."""
    cost = compiled_cost(lambda p, *xs: model.apply(p, *xs), params, *inputs)
    return float(cost.get("flops", 0.0))
