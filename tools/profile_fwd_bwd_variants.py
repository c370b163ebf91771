#!/usr/bin/env python
"""Backward-pass audit for the headline config (VERDICT round-3 item 6).

STEP_PROFILE.json put fwd at ~27 ms vs fwd+bwd ~87 ms at batch 256 — the
backward ~2.3x the forward.  Backward FLOPs are ~2x forward, so some gap is
physics; this tool isolates what is NOT physics by timing value_and_grad of
the production loss under one-knob variants:

  base        production model (f32 params, default matmul precision)
  highest     transformer einsums forced to HIGHEST (6-pass bf16 emulation;
              calibrates what the f32 recipe would cost if we pinned it)
  bf16        module compute dtype bf16 (the AMP path the vitb/swin presets
              use; the reference trains vitti in plain f32, configs.py:93)

vitti trains with drop=0.0 (cfg.train.drop, matching the reference's ViT-Ti
recipe), so there are no dropout/RNG variants — dropout is not in the
headline path.

Timing is FIFO-drain two-point (utils/timing.py): block_until_ready on the
axon relay can ack before execution, so naive timings here are garbage
(measured 0.1 "ms" for a 268-GFLOP forward before the fix).

Run on TPU: PYTHONPATH=. python tools/profile_fwd_bwd_variants.py
Writes BWD_PROBE.json.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "BWD_PROBE.json"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from rgbnomore_tpu.train.config import build_model, generate_config
    from rgbnomore_tpu.train.steps import softmax_cross_entropy
    from rgbnomore_tpu.utils.timing import timeit_fifo

    cfg = generate_config("vitti", "dct", modelver=1, batchsize=args.batch)
    B = args.batch

    nprng = np.random.default_rng(0)
    y = jax.device_put(jnp.asarray(
        nprng.standard_normal((B, 1, 28, 28, 8, 8)).astype(np.float32)))
    c = jax.device_put(jnp.asarray(
        nprng.standard_normal((B, 2, 14, 14, 8, 8)).astype(np.float32)))
    t = jax.device_put(
        jax.nn.one_hot(jnp.arange(B) % cfg.model.classes, cfg.model.classes))

    base_model = build_model(cfg, dtype=jnp.float32)
    params = jax.device_put(
        base_model.init(jax.random.PRNGKey(1), y[:2], c[:2])["params"])

    results: dict[str, dict] = {}
    depths = (max(2, args.iters // 5), args.iters)

    def measure(name: str, model, prec=None):
        def loss_fn(p, y_, c_, t_):
            logits = model.apply({"params": p}, y_, c_, train=True)
            return softmax_cross_entropy(logits, t_)

        if prec:
            with jax.default_matmul_precision(prec):
                f_fwd = jax.jit(loss_fn).lower(params, y, c, t).compile()
                f_fb = (jax.jit(jax.value_and_grad(loss_fn))
                        .lower(params, y, c, t).compile())
        else:
            f_fwd = jax.jit(loss_fn)
            f_fb = jax.jit(jax.value_and_grad(loss_fn))
        fwd = timeit_fifo(f_fwd, (params, y, c, t), depths=depths)
        fb = timeit_fifo(f_fb, (params, y, c, t), depths=depths)
        results[name] = {
            "fwd_ms": round(fwd * 1e3, 3), "fwd_bwd_ms": round(fb * 1e3, 3),
            "fwd_img_s": round(B / fwd, 1), "fwd_bwd_img_s": round(B / fb, 1),
        }
        print(f"{name:<14} fwd {fwd*1e3:8.3f} ms  fwd+bwd {fb*1e3:8.3f} ms "
              f"({B/fb:7.1f} img/s)", flush=True)

    measure("base", base_model)
    measure("highest", base_model, prec="highest")
    measure("bf16", build_model(cfg, dtype=jnp.bfloat16))

    payload = {
        "batch": B, "backend": jax.default_backend(),
        "timing": "fifo-drain two-point (utils/timing.py)",
        "variants": results,
    }
    OUT.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
