"""FIFO-drain timing helper (utils/timing.py)."""

import jax
import jax.numpy as jnp

from rgbnomore_tpu.utils.timing import timeit_fifo, timeit_fifo_carry


def test_timeit_fifo_orders_workloads():
    x = jnp.ones((256, 256))
    light = jax.jit(lambda a: a + 1.0)

    @jax.jit
    def heavy(a):
        for _ in range(40):
            a = a @ a * (1.0 / 256.0)
        return a

    t_light = timeit_fifo(light, (x,), depths=(2, 8), repeats=2, warmup=1)
    t_heavy = timeit_fifo(heavy, (x,), depths=(2, 8), repeats=2, warmup=1)
    assert t_light > 0 and t_heavy > 0
    assert t_heavy > t_light


def test_timeit_fifo_carry_threads_state():
    calls = []

    @jax.jit
    def step(s):
        return s + 1.0

    def counted(s):
        calls.append(1)
        return step(s)

    t = timeit_fifo_carry(counted, jnp.zeros(()), depths=(2, 4), repeats=2,
                          warmup=1)
    assert t > 0
    # warmup 1 + 2 repeats x (2 + 4) calls
    assert len(calls) == 1 + 2 * (2 + 4)
