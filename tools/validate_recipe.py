#!/usr/bin/env python
"""Recipe-fidelity convergence proxy (VERDICT round-1 item 9).

Trains the PRODUCTION pipeline — ``train_and_eval`` with the crop-before-pack
transfer, per-iteration warmup+cosine schedule, decoupled weight decay, mixup
and per-epoch eval/checkpointing — on a synthetic 100-class dataset for >= 1k
optimizer steps, in BOTH domains, with an f32-vs-bf16 A/B on the DCT path.

Hyperparameters come verbatim from ``generate_config`` presets except the
two that are functions of scale, adapted exactly as the reference would:
  - lr is linearly scaled by (batch / preset_batch) — the presets are tuned
    for global batch 1024 (configs.py:37);
  - warmup is scaled to the same fraction of total steps as the preset's
    10k-of-375k (~2.7%).

Pass thresholds are asserted; results go into BENCHMARKS.md.

Run: PYTHONPATH=. python tools/validate_recipe.py [--domain dct|rgb|dct-bf16]
Each run resumes from its checkpoint dir, so interrupted runs continue.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

CLASSES = 100
N_IMAGES = 2000
OUT = Path(__file__).resolve().parents[1] / "RECIPE_PROXY.json"


def make_dataset(root: Path) -> tuple[Path, Path]:
    """100-class corpus: orientation (20) x spatial frequency (5) gratings
    with random phase/noise, 512x512 q90 JPEGs."""
    from rgbnomore_tpu import codec

    root.mkdir(parents=True, exist_ok=True)
    train_idx, val_idx = root / "train.csv", root / "val.csv"
    if train_idx.exists() and val_idx.exists():
        return train_idx, val_idx
    rng = np.random.default_rng(0)
    ys, xs = np.mgrid[0:512, 0:512]
    rows = []
    for i in range(N_IMAGES):
        cls = i % CLASSES
        theta = (cls % 20) * np.pi / 20
        freq = 0.03 + 0.015 * (cls // 20)
        phase = rng.uniform(0, 2 * np.pi)
        g = ys * np.cos(theta) + xs * np.sin(theta)
        base = 128 + 100 * np.sin(g * freq + phase)
        noise = rng.integers(-25, 25, (512, 512))
        img = np.stack([np.clip(base + noise, 0, 255).astype(np.uint8)] * 3)
        p = root / f"i{i}.jpg"
        codec.write_tensor(p, img, quality=90)
        rows.append(f"{p},{cls}")
    split = N_IMAGES * 9 // 10
    train_idx.write_text("Filepath,Label\n" + "\n".join(rows[:split]) + "\n")
    val_idx.write_text("Filepath,Label\n" + "\n".join(rows[split:]) + "\n")
    return train_idx, val_idx


def run(domain: str, amp: bool, batch: int, total_steps: int, workdir: Path) -> dict:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import train_and_eval

    train_idx, val_idx = make_dataset(Path("/tmp/recipe_ds"))

    preset_batch = 1024
    cfg = generate_config("vitti", domain, modelver=1,
                          amp=True if amp else None,
                          ampdtype="bf16" if amp else None)
    base_lr, base_wd = cfg.train.lr, cfg.train.wd
    cfg.model.classes = CLASSES
    cfg.model.depth = 6  # half-depth ViT-Ti: the proxy task needs ~25 min/run
    cfg.train.batch_size = batch
    cfg.train.lr = base_lr * batch / preset_batch  # linear scaling rule
    steps_per_epoch = (N_IMAGES * 9 // 10) * 99 // 100 // batch
    cfg.train.epochs = max(1, total_steps // steps_per_epoch)
    cfg.train.warmup = max(10, int(0.027 * total_steps))  # preset's fraction

    workdir.mkdir(parents=True, exist_ok=True)
    save = workdir / "model.msgpack"
    ckpt_dir = workdir / "checkpoints" / f"vitti_{domain.lower()}"
    load_ckpt = str(ckpt_dir) if ckpt_dir.exists() and any(ckpt_dir.iterdir()) else ""
    res = train_and_eval(
        cfg, str(train_idx), str(val_idx), savepath=str(save),
        load_ckpt_dir=load_ckpt, run_train=True, run_eval=True, verbose=1,
        num_threads=2,
    )
    return {
        "domain": domain, "amp": amp, "batch": batch,
        "epochs": cfg.train.epochs, "steps_per_epoch": steps_per_epoch,
        "lr": cfg.train.lr, "wd": base_wd, "warmup": cfg.train.warmup,
        "val_acc": round(res["val"]["accuracy"], 4),
        "test_acc": round(res["test"]["accuracy"], 4),
        "test_loss": round(res["test"]["loss"], 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=str, required=True,
                    choices=("dct", "dct-bf16", "rgb"))
    ap.add_argument("--steps", type=int, default=1100)
    args = ap.parse_args()

    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    if args.run == "dct":
        r = run("dct", amp=False, batch=256, total_steps=args.steps,
                workdir=Path("/tmp/recipe_run_dct"))
    elif args.run == "dct-bf16":
        r = run("dct", amp=True, batch=256, total_steps=args.steps,
                workdir=Path("/tmp/recipe_run_dct_bf16"))
    else:
        r = run("rgb", amp=False, batch=128, total_steps=args.steps,
                workdir=Path("/tmp/recipe_run_rgb"))
    results[args.run] = r
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(r))

    # pass thresholds (chance = 1/100): asserted once all three runs exist
    if all(k in results for k in ("dct", "dct-bf16", "rgb")):
        dct, bf16, rgb = results["dct"], results["dct-bf16"], results["rgb"]
        assert dct["test_acc"] >= 0.5, f"DCT recipe underfits: {dct}"
        assert rgb["test_acc"] >= 0.4, f"RGB recipe underfits: {rgb}"
        assert abs(dct["test_acc"] - bf16["test_acc"]) <= 0.08, (
            f"f32 vs bf16 beyond noise: {dct['test_acc']} vs {bf16['test_acc']}")
        print("recipe-fidelity proxy PASSED")


if __name__ == "__main__":
    main()
