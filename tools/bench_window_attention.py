#!/usr/bin/env python
"""Measure the pair-packed fused window-attention kernel vs the XLA einsum
path at SwinV2 shapes on the real TPU (VERDICT round-1 item 7).

Shapes: stage-1 SwinV2-T DCT at 256px: bw = B*nW windows of N=64 tokens,
H=3 heads, D=32 head dim (the shapes where the plain fused kernel paid up to
8x tile padding).  Measures fwd and fwd+bwd with a value readback sync (the
only honest sync through the dev relay).  Results -> BENCHMARKS.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from rgbnomore_tpu.ops.pallas.attention import fused_window_attention  # noqa: E402


def ref_window_attention(q, k, v, bias2):
    bw, h, n, d = q.shape
    npat = bias2.shape[0]
    nw2 = bw // 2
    b_full = jnp.tile(bias2, (nw2 // npat + 1, 1, 1, 1))[:nw2]
    # einsum path: per-window attention with per-window bias (diag blocks)
    b1 = b_full[:, :, :n, :n]
    b2 = b_full[:, :, n:, n:]
    bias_w = jnp.stack([b1, b2], 1).reshape(bw, h, n, n)
    s = jnp.einsum("whqd,whkd->whqk", q, k) + bias_w
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("whqk,whkd->whqd", p, v)


def bench(fn, args, iters=50, tag=""):
    out = fn(*args)
    _ = float(jnp.sum(out))  # compile + honest sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{tag}: {dt:.2f} ms/iter")
    return dt


def main():
    B, nW, H, N, D = 8, 64, 3, 64, 32
    bw = B * nW
    npat = nW // 2
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((bw, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bw, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bw, H, N, D)).astype(np.float32))
    bias2 = np.full((npat, H, 2 * N, 2 * N), -1e9, np.float32)
    per = rng.standard_normal((npat, 2, H, N, N)).astype(np.float32) * 0.1
    bias2[:, :, :N, :N] = per[:, 0]
    bias2[:, :, N:, N:] = per[:, 1]
    bias2 = jnp.asarray(bias2)

    fused_f = jax.jit(lambda *a: fused_window_attention(*a))
    ref_f = jax.jit(ref_window_attention)
    t_fused = bench(fused_f, (q, k, v, bias2), tag="fused fwd")
    t_ref = bench(ref_f, (q, k, v, bias2), tag="einsum fwd")

    def loss_fused(q, k, v, b):
        return jnp.sum(fused_window_attention(q, k, v, b) ** 2)

    def loss_ref(q, k, v, b):
        return jnp.sum(ref_window_attention(q, k, v, b) ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))
    t_fused_b = bench(lambda *a: gf(*a)[0], (q, k, v, bias2), tag="fused fwd+bwd")
    t_ref_b = bench(lambda *a: gr(*a)[0], (q, k, v, bias2), tag="einsum fwd+bwd")

    # numeric parity on TPU
    of = fused_f(q, k, v, bias2)
    orf = ref_f(q, k, v, bias2)
    err = float(jnp.max(jnp.abs(of - orf)))
    print(f"parity max |delta| = {err:.2e}")
    print(f"speedup: fwd {t_ref / t_fused:.2f}x, fwd+bwd {t_ref_b / t_fused_b:.2f}x")


if __name__ == "__main__":
    main()
