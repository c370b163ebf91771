#!/usr/bin/env python
"""Long-horizon full-cocktail convergence run (VERDICT round-2 item 8).

Round 2's recipe proxy showed every mechanism trains, but the EXACT
production configuration — RandAugment + mixup + warmup + cosine + decoupled
wd together — only ran 1.1k steps (0.3% of the reference's 375k-step
horizon) and sat at the mixup loss floor.  This runs the same production
loop (``train_and_eval``: cropped transfer, per-iteration schedule, Orbax
checkpoints, per-epoch evals) for 10k+ optimizer steps on a larger 20-class
grating corpus, with the preset cocktail UNCHANGED (mixup ON).

Pass criterion: final val accuracy >= 5x chance (>= 0.25), ideally above the
1.1k-step no-mixup run (0.425, RECIPE_PROXY.json dct-nomix).  Results are
appended to RECIPE_PROXY.json under "dct-cocktail-10k".

Resumable: interrupted runs continue from the Orbax checkpoint dir.
Run: PYTHONPATH=. python tools/cocktail_run.py [--steps 10000]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CLASSES = 20
N_IMAGES = 24000
OUT = Path(__file__).resolve().parents[1] / "RECIPE_PROXY.json"


def make_dataset_xl(root: Path) -> tuple[Path, Path]:
    """20-class grating corpus, 24k images (4x the round-2 proxy) so epochs
    are long enough that per-epoch eval overhead stays negligible at 10k
    steps.  Same generator family as tools/validate_recipe.py."""
    from rgbnomore_tpu import codec

    root.mkdir(parents=True, exist_ok=True)
    train_idx, val_idx = root / "train.csv", root / "val.csv"
    if train_idx.exists() and val_idx.exists():
        return train_idx, val_idx
    rng = np.random.default_rng(0)
    ys, xs = np.mgrid[0:256, 0:256]
    rows = []
    for i in range(N_IMAGES):
        cls = i % CLASSES
        theta = cls * np.pi / CLASSES
        phase = rng.uniform(0, 2 * np.pi)
        g = ys * np.cos(theta) + xs * np.sin(theta)
        base = 128 + 100 * np.sin(g * 0.05 + phase)
        noise = rng.integers(-15, 15, (256, 256))
        img = np.stack([np.clip(base + noise, 0, 255).astype(np.uint8)] * 3)
        p = root / f"i{i}.jpg"
        if not p.exists():
            codec.write_tensor(p, img, quality=90)
        rows.append(f"{p},{cls}")
    split = N_IMAGES * 9 // 10
    train_idx.write_text("Filepath,Label\n" + "\n".join(rows[:split]) + "\n")
    val_idx.write_text("Filepath,Label\n" + "\n".join(rows[split:]) + "\n")
    return train_idx, val_idx


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(message)s", datefmt="%H:%M:%S")
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.0,
                    help="override lr; default = preset lr scaled linearly to "
                         "--batch (the preset 3e-3 pairs with BATCHSIZE=1024, "
                         "configs.py:24 — running batch 128 at the unscaled "
                         "3e-3 is 8x the recipe's per-example lr, and the "
                         "first 10k-step attempt showed mixup never escapes "
                         "the uniform-logit floor there)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="override warmup steps (default: preset fraction)")
    ap.add_argument("--tag", default="dct-cocktail-10k",
                    help="RECIPE_PROXY.json row name")
    ap.add_argument("--workdir", default="/tmp/cocktail_run")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import train_and_eval

    train_idx, val_idx = make_dataset_xl(Path("/tmp/recipe_ds_xl"))

    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.classes = CLASSES
    # the FULL preset cocktail: mixup + 2-op RandAugment + warmup/cosine/wd
    # all at preset values; only scale-dependent knobs adapt (as the
    # reference itself scales them): batch and total epochs
    cfg.train.batch_size = args.batch
    steps_per_epoch = (N_IMAGES * 9 // 10) * 99 // 100 // args.batch
    cfg.train.epochs = max(1, args.steps // steps_per_epoch)
    # preset warmup is 10k ABSOLUTE steps (configs.py:41) == this whole run;
    # use the preset's warmup FRACTION of the horizon instead (10k/375k ~
    # 2.7% -> ~270 steps), exactly how the round-2 proxy scaled it
    cfg.train.warmup = args.warmup or max(270, args.steps * 27 // 1000)
    # linear batch scaling of the preset lr (reference: lr 3e-3 at global
    # batch 1024, configs.py:24,41) unless explicitly overridden
    cfg.train.lr = args.lr or cfg.train.lr * args.batch / 1024

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    res = train_and_eval(
        cfg, str(train_idx), str(val_idx), savepath=str(workdir / "model.msgpack"),
        load_ckpt_dir=str(workdir / "checkpoints" / "vitti_dct")
        if (workdir / "checkpoints" / "vitti_dct").exists() else "",
        run_train=True, run_eval=True, verbose=1, num_threads=2,
        ckpt_every=5, canvas=32, transfer="cropped",
    )
    row = {
        "domain": "dct", "amp": False, "batch": args.batch, "mixup": True,
        "epochs": cfg.train.epochs, "steps_per_epoch": steps_per_epoch,
        "lr": cfg.train.lr, "wd": cfg.train.wd, "warmup": cfg.train.warmup,
        "val_acc": round(res["val"]["accuracy"], 4),
        "test_acc": round(res["test"]["accuracy"], 4),
        "test_loss": round(res["test"]["loss"], 4),
        "note": f"full preset cocktail at {args.steps} steps on the 24k-image "
                f"corpus; chance 0.05, 5x-chance bar 0.25, round-2 no-mixup "
                f"1.1k-step reference point 0.425",
    }
    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    results[args.tag] = row
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(row))
    assert row["test_acc"] >= 0.25, f"cocktail below 5x chance: {row}"


if __name__ == "__main__":
    main()
