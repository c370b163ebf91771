#!/usr/bin/env python
"""Bisect WHY training through the cropped wire flatlines while the packed
wire takes off (round-4 finding; see BWD_PROBE train_ab + RECIPE_PROXY).

Same dct-nomix proxy recipe as validate_recipe.py (preset ViT-Ti, no mixup,
warmup 300, 1100 steps).  Measured facts going in:
  - transfer='packed'  K=16: val acc ~0.46-0.50 by epoch 25 (takes off)
  - transfer='cropped' K=16: converges to uniform logits (never takes off)

Arms (run any subset via --arm, each resumes from its checkpoint):
  crop_k63     cropped wire, K=63 (near-full spectrum; isolates top-K loss)
  crop_noaug   cropped wire, K=16, RandAugment OFF (isolates aug x wire)
  pack_noaug   packed wire, K=16, RandAugment OFF (noaug control)
  crop_k32     cropped wire, K=32 (knee search)
  crop_w16     cropped wire, K=16, fmt=mask16w (int16 ACs; isolates int8
               scale quantization from the top-K selection itself)

Results land in CROPBISECT.json.
Run on TPU: PYTHONPATH=. python tools/bisect_cropped_train.py --arm crop_k63
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "CROPBISECT.json"
CLASSES = 20

ARMS = {
    "crop_k63": dict(transfer="cropped", packed_k=63, aug=True),
    "crop_noaug": dict(transfer="cropped", packed_k=16, aug=False),
    "pack_noaug": dict(transfer="packed", packed_k=16, aug=False),
    "crop_k32": dict(transfer="cropped", packed_k=32, aug=True),
    "crop_w16": dict(transfer="cropped", packed_k=16, aug=True, fmt="mask16w"),
    # noise hypothesis (WIRE_SNR.json; keys renamed round-5 per ADVICE —
    # the old 'ac_var_retained' was 1 - err_energy/signal_energy, not a
    # retained-variance fraction): packed K=16 has MORE truncation error
    # than cropped K=16 yet LEARNS, while cropped flatlines — the cropped
    # wire's int8 AC quantization (scale=ceil(maxabs/127)) puts ~56% rel
    # error on small-magnitude ACs, extra input noise that can delay
    # takeoff.  dense == the reference's full-spectrum semantics; crop_k8
    # truncates harder (more denoising) than the flatlining crop_k16.
    "dense": dict(transfer="dense", packed_k=None, aug=True),
    "crop_k8": dict(transfer="cropped", packed_k=8, aug=True),
    "pack_k63": dict(transfer="packed", packed_k=63, aug=True),
    # mask16q: host requantizes the resized plane to JPEG integer units
    # before top-K — selection/denoise equivalent to the packed wire at the
    # cropped wire's bytes (round-5; the candidate default-train fix)
    "crop_q16": dict(transfer="cropped", packed_k=16, aug=True, fmt="mask16q"),
    "crop_q16_noaug": dict(transfer="cropped", packed_k=16, aug=False,
                           fmt="mask16q"),
    # FRESH packed replica of dct-nomix: the 0.3983 "packed learns" control
    # in RECIPE_PROXY resumed from a pre-init-change checkpoint dir (its
    # val_acc row never moved), so it does not prove the CURRENT default
    # init takes off at this depth/lr/horizon — this arm does (round-5)
    "pack_aug": dict(transfer="packed", packed_k=16, aug=True),
    # batch-scaled peak lr (3e-3 * 128/1024): the preset lr belongs to global
    # batch 1024 (reference configs.py:24); at batch 128 the unscaled peak is
    # 8x the recipe's per-example rate, which the torch-family init (round-4
    # default, ~250-step later escape at depth 4) may not survive at depth 12
    "crop_q16_lr375": dict(transfer="cropped", packed_k=16, aug=True,
                           fmt="mask16q", lr=3.75e-4),
    "pack_lr375": dict(transfer="packed", packed_k=16, aug=True, lr=3.75e-4),
    # the SHIPPED default wire exactly as train.py configures it (cropped
    # mask16, K=16, aug on) — the arm the takeoff-horizon reruns use
    "crop_aug": dict(transfer="cropped", packed_k=16, aug=True),
    # the DEFAULT wire under the round-2/3 zero-bias init family — the
    # apples-to-apples control for RECIPE_PROXY's packed 0.3983 (also a
    # zero-bias-era run): same init era, shipped wire (round-5)
    "crop_zb": dict(transfer="cropped", packed_k=16, aug=True,
                    bias_init="zeros"),
    "pack_zb": dict(transfer="packed", packed_k=16, aug=True,
                    bias_init="zeros"),
    # full-spectrum dense wire, same init era: crop_zb vs dense_zb is the
    # train-side K=16-vs-dense accuracy A/B (KSWEEP train section)
    "dense_zb": dict(transfer="dense", packed_k=None, aug=True,
                     bias_init="zeros"),
}


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(message)s", datefmt="%H:%M:%S")
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", required=True, choices=sorted(ARMS))
    ap.add_argument("--steps", type=int, default=1100)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tag", default="", help="suffix for the result key and "
                    "workdir (e.g. a longer-horizon rerun of the same arm)")
    ap.add_argument("--warmup", type=int, default=0, help="override warmup "
                    "steps (0 = the proxy default min(300, steps//3); the "
                    "torch-family init needs longer warmup at depth 12 than "
                    "the zero-bias init the 300-step default was tuned on)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # a silent CPU fallback (e.g. an env without the relay's variables)
    # burns an hour producing an arm measured on the wrong backend
    assert jax.default_backend() != "cpu", (
        f"bisect arms are TPU measurements; backend={jax.default_backend()}")

    from tools.validate_recipe import N_IMAGES, make_dataset

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import train_and_eval

    train_idx, val_idx = make_dataset(Path("/tmp/recipe_ds"))
    spec = ARMS[args.arm]

    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.classes = CLASSES
    cfg.model.mixup = False
    cfg.model.bias_init = spec.get("bias_init", "torch")
    cfg.train.batch_size = args.batch
    if spec.get("lr"):
        cfg.train.lr = spec["lr"]
    steps_per_epoch = (N_IMAGES * 9 // 10) * 99 // 100 // args.batch
    cfg.train.epochs = max(1, args.steps // steps_per_epoch)
    cfg.train.warmup = args.warmup or min(300, args.steps // 3)
    if not spec["aug"]:
        cfg.train.auglist = []
        cfg.train.num_ops = 0

    key = args.arm + (f"_{args.tag}" if args.tag else "")
    workdir = Path(f"/tmp/cropbisect_{key}")
    workdir.mkdir(parents=True, exist_ok=True)
    ckpt = workdir / "checkpoints" / "vitti_dct"
    res = train_and_eval(
        cfg, str(train_idx), str(val_idx),
        savepath=str(workdir / "model.msgpack"),
        load_ckpt_dir=str(ckpt) if ckpt.exists() and any(ckpt.iterdir()) else "",
        run_train=True, run_eval=True, verbose=1, num_threads=2,
        ckpt_every=10, canvas=32, transfer=spec["transfer"],
        packed_k=spec["packed_k"], train_fmt=spec.get("fmt"),
    )
    row = {
        **{k: v for k, v in spec.items()},
        "steps": args.steps, "batch": args.batch,
        "epochs": cfg.train.epochs, "warmup": cfg.train.warmup,
        "val_acc": round(res["val"]["accuracy"], 4),
        "test_acc": round(res["test"]["accuracy"], 4),
        "test_loss": round(res["test"]["loss"], 4),
    }
    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    results[key] = row
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
