#!/usr/bin/env python
"""SwinV2 step profile + optimization evidence (VERDICT round-2 item 7).

The swinv2_dct config is the only model-bound row in BENCH_SIX.json
(438 img/s fwd+bwd at batch 64 bf16 caps its pipeline at ~403), and round 2
shipped no evidence of WHERE the ~146 ms step goes.  This tool:

  1. captures a real JAX profiler trace of the production fused train step
     (same ``make_train_step`` the trainer jits) and prints the top-N
     self-time ops from XLA's op stats (parsed with
     tensorboard_plugin_profile — no TensorBoard UI needed);
  2. wall-clocks A/B variants of the step so any proposed change lands with
     a measured before/after.

Results -> SWIN_PROFILE.json + a table in BENCHMARKS.md.

Run (needs the real TPU; ~min for compile on a cold cache):
    PYTHONPATH=. python tools/profile_swin.py --iters 50
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "SWIN_PROFILE.json"


def build_step(cfg, batch: int):
    """The production fused fwd+bwd+update step on synthetic DCT inputs
    (exactly benchmark_model_synthetic's fbp mode, ``benchmark.py:62-110``)."""
    import jax
    import jax.numpy as jnp

    from rgbnomore_tpu.train.config import build_model
    from rgbnomore_tpu.train.optim import make_optimizer
    from rgbnomore_tpu.train.steps import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    nb = cfg.model.dct_blocks
    inputs = (
        jnp.asarray(rng.standard_normal((batch, 1, nb, nb, 8, 8)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((batch, 2, nb // 2, nb // 2, 8, 8)).astype(np.float32)),
    )
    labels = jnp.asarray(rng.integers(0, cfg.model.classes, batch).astype(np.int32))
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg.train.lr, cfg.train.wd, 100, 1000)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), inputs)
    step = make_train_step(model, cfg.model.classes, use_mixup=False)
    base = jax.random.PRNGKey(1)
    return state, step, (inputs, labels), base


def time_step(state, step, batch, base, iters: int) -> float:
    """ms per step, value-readback synced (see benchmark.py timing note)."""
    state, metrics = step(state, batch, base)  # compile, excluded
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    done = 0
    while done < iters:
        for _ in range(min(25, iters - done)):
            state, metrics = step(state, batch, base)
            done += 1
        _ = float(metrics["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def op_stats_from_trace(logdir: str, top: int = 15) -> list[dict]:
    """Parse the xplane trace into per-op self-time rows (framework op stats)."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not xspaces:
        return []
    data, _ = rtd.xspace_to_tool_data(xspaces, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data) if isinstance(data, str) else data
    # gviz table: {cols: [...], rows: [{c: [{v: ...}, ...]}]}
    try:
        cols = [c["label"] for c in rows[0]["cols"]]
        out = []
        for r in rows[0]["rows"][: top * 2]:
            rec = {cols[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])}
            out.append(rec)
        return out[:top]
    except Exception:
        return [{"raw": str(rows)[:2000]}]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--platform", default="")
    ap.add_argument("--trace-iters", type=int, default=5)
    ap.add_argument("--skip-trace", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from rgbnomore_tpu.train.config import generate_config, update_runtime

    results = {"batch": args.batch, "iters": args.iters,
               "backend": jax.default_backend(), "variants": {}}

    cfg = generate_config("swinv2", "dct", modelver=1)
    cfg = update_runtime(cfg, 1)

    # --- baseline: the production bf16 step --------------------------------
    state, step, batch, base = build_step(cfg, args.batch)
    ms = time_step(state, step, batch, base, args.iters)
    results["variants"]["baseline_bf16"] = round(ms, 2)
    print(f"baseline_bf16: {ms:.2f} ms/step "
          f"({args.batch / ms * 1e3:.1f} img/s)", flush=True)

    # --- trace the baseline ------------------------------------------------
    if not args.skip_trace:
        logdir = "/tmp/swin_trace"
        jax.profiler.start_trace(logdir)
        st, metrics = state, None
        for _ in range(args.trace_iters):
            st, metrics = step(st, batch, base)
        _ = float(metrics["loss"])
        jax.profiler.stop_trace()
        ops = op_stats_from_trace(logdir)
        results["top_ops"] = ops
        for o in ops[:15]:
            print(json.dumps(o), flush=True)

    OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
