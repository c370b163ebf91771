#!/usr/bin/env python
"""Train-THROUGH-the-wire A/B: cropped K=16 vs dense full spectrum (VERDICT
round-3 item 4).

KSWEEP.json's per-K table measures what the lossy top-K wire does to the
OUTPUTS of one already-trained model.  The remaining question is what it does
to TRAINING: the reference trains on the full dequantized spectrum
(``/root/reference/datasets.py:286-297``), while this framework's default
transfer ships only the top-K=16 AC coefficients per block (int8, mask16
wire).  This tool trains the SAME recipe twice from the same seed —

  (a) transfer='cropped', K=16   (the production default), and
  (b) transfer='dense'           (full spectrum, device-side crop — the
                                  reference's training semantics),

with the proxy recipe that decisively escapes the loss floor at this horizon
(dct-nomix: preset ViT-Ti hyperparameters, no mixup, warmup 300 — the same
recipe as RECIPE_PROXY.json's dct-nomix row), then evaluates BOTH trained
models through the SAME dense eval path so the comparison isolates the
training-time wire.  Reported: final dense-eval top-1 per arm, the delta,
and the logit drift between the two trained models on identical inputs.

Pass bar: |acc(K16) - acc(dense)| within the harness's single-seed takeoff
noise (~±0.1 at this step count, measured in validate_recipe.py round 2);
otherwise K must be bumped.  Results land in KSWEEP.json under "train_ab".

Run on TPU: PYTHONPATH=. python tools/ksweep_train_ab.py [--steps 1100]
Each arm resumes from its own checkpoint dir.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "KSWEEP.json"
CLASSES = 20
CANVAS = 32


def train_arm(domain_cfg, transfer: str, k: int | None, steps: int,
              train_idx: str, val_idx: str, workdir: Path) -> dict:
    from rgbnomore_tpu.train.loop import train_and_eval

    workdir.mkdir(parents=True, exist_ok=True)
    ckpt_dir = workdir / "checkpoints" / "vitti_dct"
    res = train_and_eval(
        domain_cfg, train_idx, val_idx, savepath=str(workdir / "model.msgpack"),
        load_ckpt_dir=str(ckpt_dir)
        if ckpt_dir.exists() and any(ckpt_dir.iterdir()) else "",
        run_train=True, run_eval=True, verbose=1, num_threads=2,
        ckpt_every=10, canvas=CANVAS, transfer=transfer,
        **({"packed_k": k} if k is not None else {}),
    )
    return res


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(message)s", datefmt="%H:%M:%S")
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1100)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--limit", type=int, default=600,
                    help="eval images for the trained-model logit drift")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tools.ksweep_wire_accuracy import collect_logits
    from tools.validate_recipe import N_IMAGES, make_dataset

    from rgbnomore_tpu.train.config import generate_config

    train_idx, val_idx = make_dataset(Path("/tmp/recipe_ds"))

    def make_cfg():
        cfg = generate_config("vitti", "dct", modelver=1)
        cfg.model.classes = CLASSES
        cfg.model.mixup = False  # dct-nomix recipe: learns decisively at 1.1k steps
        cfg.train.batch_size = args.batch
        steps_per_epoch = (N_IMAGES * 9 // 10) * 99 // 100 // args.batch
        cfg.train.epochs = max(1, args.steps // steps_per_epoch)
        cfg.train.warmup = min(300, args.steps // 3)
        return cfg, steps_per_epoch

    arms = {}
    for name, transfer, k in (
        (f"cropped_k{args.k}", "cropped", args.k),
        ("dense", "dense", None),
    ):
        cfg, steps_per_epoch = make_cfg()
        print(f"=== training arm {name} (transfer={transfer}, k={k}) ===")
        res = train_arm(cfg, transfer, k, args.steps, str(train_idx),
                        str(val_idx), Path(f"/tmp/ksweep_train_{name}"))
        arms[name] = {
            "transfer": transfer, "k": k,
            "epochs": cfg.train.epochs, "steps_per_epoch": steps_per_epoch,
            "val_acc": round(res["val"]["accuracy"], 4),
            "test_acc": round(res["test"]["accuracy"], 4),
            "test_loss": round(res["test"]["loss"], 4),
        }
        print(json.dumps({name: arms[name]}))

    # Re-score both trained models through the IDENTICAL dense eval path so
    # the numbers differ only by what the training-time wire did.
    eval_cfg, _ = make_cfg()
    dense_eval = {}
    logits = {}
    for name in arms:
        lg, lb = collect_logits(
            eval_cfg, f"/tmp/ksweep_train_{name}/model.msgpack",
            str(val_idx), "dense", None, args.limit)
        dense_eval[name] = round(float((lg.argmax(-1) == lb).mean()), 4)
        logits[name] = lg

    names = list(arms)
    drift = np.abs(logits[names[0]] - logits[names[1]])
    agree = float((logits[names[0]].argmax(-1) == logits[names[1]].argmax(-1)).mean())
    acc_delta = dense_eval[names[0]] - dense_eval[names[1]]
    row = {
        "recipe": "dct-nomix (preset vitti, no mixup, warmup 300)",
        "steps": args.steps, "batch": args.batch,
        "arms": arms,
        "dense_eval_top1": dense_eval,
        "acc_delta_k16_minus_dense": round(acc_delta, 4),
        "trained_model_top1_agreement": round(agree, 4),
        "trained_model_logit_drift_mean": round(float(drift.mean()), 4),
        "noise_band": 0.1,
        "within_noise": bool(abs(acc_delta) <= 0.1),
    }
    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    results["train_ab"] = row
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(row, indent=1))
    assert row["within_noise"], f"train-through-wire K={args.k} beyond noise: {row}"


if __name__ == "__main__":
    main()
