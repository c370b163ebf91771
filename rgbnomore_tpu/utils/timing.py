"""Honest device timing through the axon relay.

``jax.block_until_ready`` on the tunneled TPU backend can acknowledge an
*enqueued* program before it has executed (measured: a dependent chain of
8192^3 matmuls "completed" at 97 PFLOP/s — 500x over hardware peak — while a
host readback of the same chain gave a sane 136 TFLOP/s).  Every device
timing in this repo therefore uses the FIFO-drain method below:

  1. dispatch ``k`` identical calls back-to-back (TPU cores execute their
     program queue in FIFO order, so the last program finishing implies all
     earlier ones finished);
  2. force a tiny host readback (``np.asarray``) of the last output — a
     value materialising on the host cannot be faked by the relay;
  3. do this for two queue depths ``k1 < k2`` and report the slope
     ``(t(k2) - t(k1)) / (k2 - k1)``, which cancels the fixed tunnel
     roundtrip (~0.5 s on a cold link) out of the per-call estimate.

The reference's CUDA benchmarks get the same guarantee for free from
``torch.cuda.synchronize`` (``/root/reference/benchmark.py:176``); this is
the TPU-relay equivalent.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Sequence

import numpy as np


def _readback(out: Any) -> None:
    """Force a minimal host materialisation of the first array leaf."""
    import jax

    leaves = jax.tree.leaves(out)
    if not leaves:
        return
    leaf = leaves[0]
    idx = tuple(slice(0, 1) for _ in range(getattr(leaf, "ndim", 0)))
    np.asarray(leaf[idx] if idx else leaf)


def timeit_fifo(
    fn: Callable[..., Any],
    args: Sequence[Any],
    depths: tuple[int, int] = (6, 24),
    repeats: int = 3,
    warmup: int = 2,
) -> float:
    """Seconds per call of ``fn(*args)`` via two-point FIFO-drain timing.

    ``fn`` must be side-effect free w.r.t. ``args`` (no donated buffers) so
    identical calls can be replayed.  Returns the median slope across
    ``repeats`` pairs.
    """
    k1, k2 = depths
    assert k2 > k1 > 0

    def window(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        _readback(out)
        return time.perf_counter() - t0

    for _ in range(warmup):
        _readback(fn(*args))
    slopes = []
    for _ in range(repeats):
        t1 = window(k1)
        t2 = window(k2)
        slopes.append((t2 - t1) / (k2 - k1))
    slopes.sort()
    return max(slopes[len(slopes) // 2], 1e-9)


def timeit_fifo_carry(
    step: Callable[[Any], Any],
    init: Any,
    depths: tuple[int, int] = (6, 24),
    repeats: int = 3,
    warmup: int = 2,
) -> float:
    """Like :func:`timeit_fifo` for state-threading steps ``s -> s`` (e.g. a
    train step with donated state): the carry keeps buffers alive across
    calls, and the final state is read back."""
    k1, k2 = depths
    assert k2 > k1 > 0
    s = init
    for _ in range(warmup):
        s = step(s)
    _readback(s)

    def window(k: int, s: Any) -> tuple[float, Any]:
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        _readback(s)
        return time.perf_counter() - t0, s

    slopes = []
    for _ in range(repeats):
        t1, s = window(k1, s)
        t2, s = window(k2, s)
        slopes.append((t2 - t1) / (k2 - k1))
    slopes.sort()
    return max(slopes[len(slopes) // 2], 1e-9)
