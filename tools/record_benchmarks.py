"""Record the reference's six throughput metrics for every BASELINE.json
config on the real TPU (VERDICT item 6).

Runs ``rgbnomore_tpu.benchmark.benchmark_model`` (the ``train.py
--benchmark N`` path) per config at the reference's per-accelerator batch
(its BATCHPERGPU = preset global batch // 8 GPUs, ``pipeline_utils.py:145``)
on the shared synthetic 512x512 q90 corpus.  Results accumulate in
``BENCH_SIX.json`` so interrupted runs resume where they left off; rerun
until all configs are present, then paste the table into BENCHMARKS.md.

Usage:  python tools/record_benchmarks.py [--iters 30] [--only NAME]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "BENCH_SIX.json"

# (name, generate_config kwargs, batch = reference BATCHPERGPU)
CONFIGS = [
    ("vitti_dct_e1", dict(modelarch="vitti", domain="dct", modelver=1), 128),
    ("vitti_rgb", dict(modelarch="vitti", domain="rgb"), 128),
    ("vits_dct_e2_amp", dict(modelarch="vits", domain="dct", modelver=2,
                             amp=True, ampdtype="bf16"), 128),
    ("vitti_dct_e2", dict(modelarch="vitti", domain="dct", modelver=2), 128),
    ("vitti_dct_e3", dict(modelarch="vitti", domain="dct", modelver=3), 128),
    ("vitti_dct_e2_nosub", dict(modelarch="vitti", domain="dct", modelver=2,
                                subblock=False), 128),
    ("swinv2_dct", dict(modelarch="swinv2", domain="dct"), 64),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30,
                    help="loader/pipeline iterations (model benches still run "
                         ">= 300 per the reference's semantics)")
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--phase", type=str, default="",
                    choices=("", "loader", "fbp", "fwd", "train_pipe", "test_pipe"),
                    help="run ONE measurement phase for --only (big models "
                         "compile each program slower than a single driver "
                         "invocation allows; phases accumulate in BENCH_SIX)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import logging

    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(message)s", datefmt="%H:%M:%S")

    from bench import make_synthetic_dataset
    from rgbnomore_tpu.benchmark import benchmark_model
    from rgbnomore_tpu.train.config import generate_config

    index = make_synthetic_dataset(Path("/tmp/rgbnomore_bench"), 2048)
    results = json.loads(OUT.read_text()) if OUT.exists() else {}

    for name, kw, batch in CONFIGS:
        if args.only and name != args.only:
            continue
        if name in results and not args.only and not args.phase:
            print(f"{name}: already recorded, skipping")
            continue
        print(f"=== {name} (batch {batch}) phase={args.phase or 'all'} ===", flush=True)
        cfg = generate_config(batchsize=batch, **kw)
        t0 = time.time()
        if not args.phase:
            r = benchmark_model(cfg, args.iters, str(index), str(index),
                                num_threads=2, verbose=1)
            r = {k: round(v, 1) for k, v in r.items()}
        else:
            from rgbnomore_tpu.benchmark import (
                benchmark_dataloader,
                benchmark_model_synthetic,
                benchmark_pipeline,
            )
            from rgbnomore_tpu.train.loop import Trainer, make_loaders

            r = dict(results.get(name, {}))
            if args.phase in ("fbp", "fwd"):
                n, dt = benchmark_model_synthetic(cfg, args.iters, args.phase,
                                                  n_devices=1)
                r[f"model_{args.phase}_fps"] = round(n / dt, 1)
            else:
                transfer = "cropped"  # both domains: crop-before-pack default
                trainer = Trainer(cfg, transfer=transfer)
                loaders = make_loaders(cfg, str(index), str(index), num_threads=2,
                                       global_batch=trainer.global_batch(),
                                       transfer=transfer)
                if args.phase == "loader":
                    n, dt = benchmark_dataloader(loaders["train"], args.iters)
                    r["train_loader_fps"] = round(n / dt, 1) if dt else 0.0
                    n, dt = benchmark_dataloader(loaders["test"], args.iters)
                    r["test_loader_fps"] = round(n / dt, 1) if dt else 0.0
                else:
                    trainer.create_state(max(1, len(loaders["train"])))
                    split = "train" if args.phase == "train_pipe" else "test"
                    n, dt = benchmark_pipeline(trainer, loaders[split], args.iters, split)
                    r[f"{split}_pipeline_fps"] = round(n / dt, 1) if dt else 0.0
        r["batch"] = batch
        r["wall_s"] = round(r.get("wall_s", 0) + time.time() - t0, 1)
        results[name] = r
        OUT.write_text(json.dumps(results, indent=1))
        print(f"{name}: {r}", flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
