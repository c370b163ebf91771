#!/usr/bin/env python
"""Wire-accuracy K-sweep (VERDICT round-2 item 1).

The reference evaluates on the FULL dequantized coefficient spectrum
(``/root/reference/datasets.py:286-297``); this framework's default DCT
transfer ships only the top-K AC coefficients per block, int8-quantized
(``data/croppack.py`` / ``native/dctcodec.cpp`` mask16 wire).  This tool
quantifies what that lossy wire does to MODEL OUTPUTS: it feeds one trained
checkpoint the same evaluation corpus through

  (a) the dense full-spectrum canvas path (``transfer='dense'`` — device-side
      dequant + center crop + spectral resize, bit-faithful to the
      reference's eval transform), and
  (b) the production cropped wire at K in {8, 12, 16, 24, 32, 48, 63},

and records per-K top-1 agreement with (a), top-1 accuracy, and logit drift.
Results go to KSWEEP.json and the table in BENCHMARKS.md; the chosen
default K's agreement is regression-tested in tests/test_ksweep.py.

Checkpoint: the recipe-proxy ViT-Ti (depth 12, 20-class grating corpus,
``tools/validate_recipe.py``) — a really-trained model whose decision
boundaries make top-1 agreement a meaningful metric (a random-init model has
near-zero margins and overstates disagreement; an ImageNet checkpoint is not
obtainable in this environment).

Run: PYTHONPATH=. python tools/ksweep_wire_accuracy.py \
        [--weights /tmp/recipe_run_dct_nomix/model.msgpack] [--limit 600]
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
CANVAS = 32  # 256px corpus


def collect_logits(cfg, weights_path: str, index_val: str, transfer: str,
                   k: int | None, limit: int):
    """Per-image (logits, labels) through one transfer path, in index order."""
    import jax
    import jax.numpy as jnp

    from rgbnomore_tpu.train.loop import Trainer, load_params, make_loaders

    trainer = Trainer(cfg, canvas=CANVAS, transfer=transfer, packed_k=k)
    loaders = make_loaders(
        cfg, index_val, index_val, canvas=CANVAS, num_threads=2,
        global_batch=trainer.global_batch(), transfer=transfer, packed_k=k,
    )
    trainer.create_state(steps_per_epoch=1)
    params = load_params(weights_path, trainer.state.params)

    pipe, model = trainer.eval_pipe, trainer.model
    packed = transfer in ("packed", "cropped")

    @jax.jit
    def logits_fn(params, batch):
        if packed:
            y, c, labels, w = pipe(batch["packed"])
        else:
            y, c = pipe(batch["y"], batch["cbcr"], batch["quant"])
            labels, w = batch["labels"], batch["weights"]
        logits = model.apply({"params": params}, y, c, train=False)
        return logits.astype(jnp.float32), labels, w

    all_logits, all_labels = [], []
    n = 0
    for batch in loaders["test"]:
        lg, lb, w = jax.device_get(logits_fn(params, trainer.put_batch(batch)))
        keep = w > 0  # strided eval pads with zero-weight slots
        all_logits.append(lg[keep])
        all_labels.append(lb[keep])
        n += int(keep.sum())
        if n >= limit:
            break
    return (np.concatenate(all_logits)[:limit],
            np.concatenate(all_labels)[:limit])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="/tmp/recipe_run_dct_nomix/model.msgpack")
    ap.add_argument("--limit", type=int, default=600)
    ap.add_argument("--ks", type=int, nargs="*", default=[8, 12, 16, 24, 32, 48, 63])
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default: safe to run beside a TPU job) or tpu")
    args = ap.parse_args()

    import jax

    # Must be set via jax.config right after import: the container's
    # sitecustomize registers the axon TPU backend at interpreter start, so
    # JAX_PLATFORMS in the environment is latched too late (CLAUDE.md).
    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tools.validate_recipe import make_dataset

    from rgbnomore_tpu.train.config import generate_config

    _, index_val = make_dataset(Path("/tmp/recipe_ds"))

    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.classes = CLASSES

    dense_lg, dense_lb = collect_logits(
        cfg, args.weights, str(index_val), "dense", None, args.limit)
    dense_pred = dense_lg.argmax(-1)
    dense_acc = float((dense_pred == dense_lb).mean())
    results = {
        "n_images": int(dense_lg.shape[0]),
        "weights": args.weights,
        "dense_top1_acc": round(dense_acc, 4),
        "per_k": {},
    }
    print(f"dense: n={dense_lg.shape[0]} top1={dense_acc:.4f}")

    for k in args.ks:
        lg, lb = collect_logits(
            cfg, args.weights, str(index_val), "cropped", k, args.limit)
        assert np.array_equal(lb, dense_lb), "eval order mismatch"
        pred = lg.argmax(-1)
        agree = float((pred == dense_pred).mean())
        drift = np.abs(lg - dense_lg)
        row = {
            "top1_agreement_vs_dense": round(agree, 4),
            "top1_acc": round(float((pred == lb).mean()), 4),
            "logit_drift_mean": round(float(drift.mean()), 4),
            "logit_drift_max": round(float(drift.max()), 4),
        }
        results["per_k"][str(k)] = row
        print(f"K={k:2d}: agree={agree:.4f} acc={row['top1_acc']:.4f} "
              f"drift mean={row['logit_drift_mean']:.4f} max={row['logit_drift_max']:.4f}")

    OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
