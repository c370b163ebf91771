#!/usr/bin/env python
"""Same-seed f32 vs bf16-compute train A/B on the production loop (VERDICT
round-3 item 6 gate).

BWD_PROBE.json shows the bf16 compute path is ~1.75x the f32 step
(fwd+bwd 47.5 ms vs 83.0 ms at batch 256).  Before the headline bench may
measure the TPU-native bf16 step, the claim "bf16 compute trains the f32
recipe within tolerance" needs a direct A/B: the SAME dct-nomix proxy recipe
(the one that decisively escapes the loss floor at 1.1k steps), same seed,
same data order, trained once with f32 compute and once with bf16 compute
(``cfg.train.amp=True, amp_dtype='bf16'`` — flax keeps params f32, casts
activations; no loss scaling, bf16 shares the f32 exponent range).

The reference's own precedent for training these models in reduced precision
is its fp16 AMP mode (``/root/reference/train.py:150-176``); vitti's preset
is f32 there (``configs.py:93``), so this divergence is gated on evidence
and documented in PARITY.md, not silently assumed.

Pass bar: |val_acc(f32) - val_acc(bf16)| within the harness's single-seed
takeoff noise (±0.1, measured in validate_recipe.py round 2), and the bf16
arm decisively above chance.  Results land in BWD_PROBE.json under
"train_ab".

Run on TPU: PYTHONPATH=. python tools/bf16_train_ab.py [--steps 1100]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "BWD_PROBE.json"
CLASSES = 20


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(message)s", datefmt="%H:%M:%S")
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1100)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=0,
                    help="override warmup steps (0 = min(300, steps//3))")
    ap.add_argument("--bias-init", default="torch", choices=("torch", "zeros"),
                    help="init family for BOTH arms (round-5: 'zeros' is the "
                    "family that takes off at proxy horizons; the A/B is "
                    "about compute dtype, not init)")
    ap.add_argument("--f32-from", default="",
                    help="reuse a recorded CROPBISECT.json arm as the f32 "
                    "side (must match steps/batch/warmup and the cropped "
                    "K=16 aug-on wire this tool trains) instead of "
                    "retraining it")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tools.validate_recipe import N_IMAGES, make_dataset

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import train_and_eval

    train_idx, val_idx = make_dataset(Path("/tmp/recipe_ds"))

    def run_arm(name: str, amp: bool) -> dict:
        cfg = generate_config("vitti", "dct", modelver=1,
                              amp=amp, ampdtype="bf16" if amp else None)
        cfg.model.classes = CLASSES
        cfg.model.mixup = False  # dct-nomix recipe
        cfg.model.bias_init = args.bias_init
        cfg.train.batch_size = args.batch
        steps_per_epoch = (N_IMAGES * 9 // 10) * 99 // 100 // args.batch
        cfg.train.epochs = max(1, args.steps // steps_per_epoch)
        cfg.train.warmup = args.warmup or min(300, args.steps // 3)
        # workdir keyed on the full arm config: a resume from a different
        # config's checkpoints is exactly the round-4 stale-control bug
        workdir = Path(
            f"/tmp/bf16_ab_{name}_{args.bias_init}_{args.steps}s{args.warmup}w")
        workdir.mkdir(parents=True, exist_ok=True)
        ckpt = workdir / "checkpoints" / "vitti_dct"
        print(f"=== arm {name} (amp={amp}) ===", flush=True)
        res = train_and_eval(
            cfg, str(train_idx), str(val_idx),
            savepath=str(workdir / "model.msgpack"),
            load_ckpt_dir=str(ckpt)
            if ckpt.exists() and any(ckpt.iterdir()) else "",
            run_train=True, run_eval=True, verbose=1, num_threads=2,
            ckpt_every=10, canvas=32, transfer="cropped",
        )
        return {
            "amp": amp, "epochs": cfg.train.epochs,
            "val_acc": round(res["val"]["accuracy"], 4),
            "test_acc": round(res["test"]["accuracy"], 4),
            "test_loss": round(res["test"]["loss"], 4),
        }

    if args.f32_from:
        bis = json.loads((OUT.parent / "CROPBISECT.json").read_text())
        src = bis[args.f32_from]
        want_warmup = args.warmup or min(300, args.steps // 3)
        assert (src["steps"], src["batch"]) == (args.steps, args.batch) and \
            src["transfer"] == "cropped" and src["packed_k"] == 16 and \
            src["aug"] and not src.get("fmt") and not src.get("lr") and \
            src.get("warmup", want_warmup) == want_warmup and \
            src.get("bias_init", "torch") == args.bias_init, src
        f32 = {"amp": False, "epochs": src["epochs"],
               "val_acc": src["val_acc"], "test_acc": src["test_acc"],
               "test_loss": src["test_loss"],
               "from": f"CROPBISECT.json[{args.f32_from}]"}
    else:
        f32 = run_arm("f32", False)
    arms = {"f32": f32, "bf16": run_arm("bf16", True)}
    delta = arms["bf16"]["val_acc"] - arms["f32"]["val_acc"]
    row = {
        "recipe": "dct-nomix (preset vitti, no mixup)",
        "bias_init": args.bias_init,
        "steps": args.steps, "batch": args.batch,
        "warmup": args.warmup or min(300, args.steps // 3), "arms": arms,
        "val_acc_delta_bf16_minus_f32": round(delta, 4),
        "noise_band": 0.1,
        "within_noise": bool(abs(delta) <= 0.1),
    }
    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    results["train_ab"] = row
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(row, indent=1))
    assert row["within_noise"], f"bf16 arm beyond noise: {row}"


if __name__ == "__main__":
    main()
