#!/usr/bin/env python
"""Reference-as-oracle convergence A/B (VERDICT round-2 item 6).

Trains the SAME tiny recipe through BOTH stacks and compares loss curves and
final accuracy:

  torch side  — the reference's OWN code end to end: dct_manip C++ decode +
                dequant/clamp (``datasets.py:286-297``), its exact
                ``imagenet_dct`` train/val transforms (``datasets.py:354-369``),
                its ``models/plainvit.py`` ViT, its optimizer scheme
                (decay-free AdamW + manual ``(lr/base_lr)*wd`` weight decay on
                non-norm weights, grad-clip 1.0, per-iteration warmup+cosine,
                ``pipeline_utils.py:518-543`` / ``train.py:150-176``), run on
                CPU (torch single-thread, as one loader-core worker would).
  jax side    — this framework's production path: ``Trainer`` with the
                DEFAULT cropped k=16 wire (so the A/B also exercises the lossy
                transfer against the reference's full-spectrum semantics),
                same hyperparameters, on whatever backend is active.

Both sides read the SAME corpus (the 20-class grating set from
``tools/validate_recipe.py``), use the same aug list / num_ops / magnitude,
no mixup (single-probe comparability), identical lr/wd/warmup/cosine.
RNG streams necessarily differ — the claim is distributional: loss curves
within noise of each other and final val accuracy within +-0.05.

Results -> REFERENCE_AB.json + a table in BENCHMARKS.md.

Prep: /tmp/refbench/built/dct_manip.so (see tools/measure_reference_loader.py).
Run:  PYTHONPATH=. python tools/reference_ab.py --side torch
      PYTHONPATH=. python tools/reference_ab.py --side jax
      PYTHONPATH=. python tools/reference_ab.py --side report
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "REFERENCE_AB.json"

# Shared recipe (both sides bitwise-identical hyperparameters)
CLASSES = 20
DEPTH = 4
EMB, HEADS, HEAD_SIZE = 192, 3, 64
BATCH = 64
STEPS = 600
LR, WD, WARMUP = 1e-3, 1e-4, 100
NUM_OPS, MAGNITUDE = 2, 3
MIXUP = False  # --mixup: both sides apply batch mixup (reference alpha=0.2)
AUGLIST = (
    "AutoContrast,Posterize,SolarizeAdd,Color,Contrast,Brightness,MidfreqAug,"
    "Cutout,TranslateX,TranslateY,Rotate90,AutoSaturation,Grayscale,ChromaDrop"
).split(",")  # the ViT-Ti DCT preset list (configs.py:93)


def lr_at(step: int) -> float:
    """The shared schedule: LR*(step+1)/warmup, then cosine to 0
    (train.py:150-176; mirrors rgbnomore_tpu.train.optim.warmup_cosine)."""
    if step < WARMUP:
        return LR * (step + 1.0) / WARMUP
    progress = min(1.0, max(0.0, (step - WARMUP) / max(1, STEPS - WARMUP)))
    return LR * 0.5 * (1.0 + math.cos(math.pi * progress))


def corpus():
    from tools.validate_recipe import make_dataset

    return make_dataset(Path("/tmp/recipe_ds"))


def run_torch() -> dict:
    import torch

    torch.set_num_threads(1)
    torch.manual_seed(0)

    from tools.measure_reference_loader import stub_torchvision

    stub_torchvision()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "/tmp/refbench/built" not in sys.path:
        sys.path.insert(0, "/tmp/refbench/built")

    import dct_manip as dm
    import utils.custom_transforms as ctrans
    from models import plainvit as ref_vit

    train_tf = [
        ctrans.RandomResizedCrop_DCT(28, scale=(0.05, 1.0), ratio=(1, 1)),
        ctrans.RandomFlip_DCT(p=0.5, direction="horizontal"),
    ] + ([ctrans.RandAugment_dct(num_ops=NUM_OPS, magnitude=MAGNITUDE,
                                 num_magnitude_bins=11, ops_list=AUGLIST)]
         if NUM_OPS > 0 else []) + [
        ctrans.ToRange(val_min=-1, val_max=1, orig_min=-1024, orig_max=1016,
                       dtype=torch.float32),
    ]
    # the reference's own batch mixup (utils/cls_transforms.py RandomMixup_DCT,
    # wired via pipeline_utils.unpack_data:74-75); alpha fixed at 0.2
    # (pipeline_utils.py:181)
    import utils.cls_transforms as ctrans_cls

    mixup_fn = ctrans_cls.RandomMixup_DCT(CLASSES, alpha=0.2) if MIXUP else None
    val_tf = [
        ctrans.ResizedCenterCrop_DCT(32, 28),
        ctrans.ToRange(val_min=-1, val_max=1, orig_min=-1024, orig_max=1016,
                       dtype=torch.float32),
    ]

    def getitem(path, tfs):
        dim, quant, Y, cbcr = dm.read_coefficients(path)
        Y = torch.clamp(Y * quant[0], min=-(2 ** 10), max=2 ** 10 - 8)
        cbcr = torch.clamp(cbcr * quant[1:3].unsqueeze(1).unsqueeze(1),
                           min=-(2 ** 10), max=2 ** 10 - 8)
        coeffs = (Y, cbcr)
        for t in tfs:
            coeffs = t(coeffs)
        return coeffs

    train_idx, val_idx = corpus()
    rows = [l.split(",") for l in train_idx.read_text().strip().splitlines()[1:]]
    paths = [r[0] for r in rows]
    labels = np.asarray([int(r[1]) for r in rows])
    vrows = [l.split(",") for l in val_idx.read_text().strip().splitlines()[1:]]

    model = ref_vit.ViT(
        patch_size=16, emb_size=EMB, depth=DEPTH, n_classes=CLASSES,
        drop_p=0.0, pixel_space="DCT", ver=1, use_subblock=True,
        num_heads=HEADS, head_size=HEAD_SIZE,
    )
    criterion = torch.nn.CrossEntropyLoss()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=0.0)
    # the reference's separate WeightDecay optimizer: non-norm '*.weight'
    wd_params = [p for n, p in model.named_parameters()
                 if "weight" in n and "lrnorm" not in n and "norm" not in n]

    rng = np.random.default_rng(0)
    order = rng.permutation(len(paths))
    pos = 0
    losses = []
    t0 = time.time()
    model.train()
    for step in range(STEPS):
        if pos + BATCH > len(order):
            order = rng.permutation(len(paths))
            pos = 0
        idx = order[pos: pos + BATCH]
        pos += BATCH
        ys, cs = [], []
        for i in idx:
            y, c = getitem(paths[i], train_tf)
            ys.append(y)
            cs.append(c)
        yb = torch.stack(ys)
        cb = torch.stack(cs)
        tgt = torch.from_numpy(labels[idx]).long()
        if mixup_fn is not None:  # soft targets; CE accepts prob targets
            (yb, cb), tgt = mixup_fn((yb, cb), tgt)

        for g in opt.param_groups:
            g["lr"] = lr_at(step)
        opt.zero_grad()
        logits = model(yb, cb)
        loss = criterion(logits, tgt)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        with torch.no_grad():  # custom_optims.WeightDecay: p -= (lr/LR)*wd*p
            f = lr_at(step) / LR * WD
            for p in wd_params:
                p.mul_(1.0 - f)
        losses.append(float(loss))
        if step % 50 == 0:
            print(f"[torch] step {step} loss {float(loss):.4f} "
                  f"({(time.time()-t0)/(step+1):.2f} s/step)", flush=True)

    model.eval()
    correct = total = 0
    vloss = 0.0
    with torch.no_grad():
        for j in range(0, len(vrows), BATCH):
            chunk = vrows[j: j + BATCH]
            ys, cs = zip(*(getitem(r[0], val_tf) for r in chunk))
            tgt = torch.tensor([int(r[1]) for r in chunk]).long()
            logits = model(torch.stack(ys), torch.stack(cs))
            vloss += float(criterion(logits, tgt)) * len(chunk)
            correct += int((logits.argmax(-1) == tgt).sum())
            total += len(chunk)
    return {
        "side": "torch-reference",
        "losses_every10": [round(l, 4) for l in losses[::10]],
        "final_train_loss_mean50": round(float(np.mean(losses[-50:])), 4),
        "val_acc": round(correct / total, 4),
        "val_loss": round(vloss / total, 4),
        "wall_s": round(time.time() - t0, 1),
    }


def run_jax(torch_init: bool = False, transfer: str = "cropped") -> dict:
    """``torch_init``: replace the flax init with a fresh reference-ViT
    ``torch.manual_seed(0)`` init (same *distribution family* as the torch
    side — kaiming-uniform kernels + fan-in-uniform biases — vs this
    framework's torch-matched kernels + ZERO biases).  ``transfer``:
    'cropped' = the production lossy K=16 wire, 'dense' = full-spectrum
    transfer like the reference loader.  Each isolates one stochastic
    component of the learn2 gap (the deterministic process is lockstep-equal,
    LOCKSTEP_AB.json)."""
    import os

    import jax

    if os.environ.get("AB_CPU"):  # force CPU when the TPU tunnel is down
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer, make_loaders

    train_idx, val_idx = corpus()
    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.depth = DEPTH
    cfg.model.classes = CLASSES
    cfg.model.mixup = MIXUP
    cfg.train.mixup_alpha = 0.2  # the reference's fixed alpha
    cfg.train.batch_size = BATCH
    cfg.train.lr = LR
    cfg.train.wd = WD
    cfg.train.warmup = WARMUP
    cfg.train.auglist = list(AUGLIST)
    cfg.train.augstr = MAGNITUDE
    cfg.train.num_ops = NUM_OPS
    cfg.train.split = 0.01  # torch side trains on the full train index

    trainer = Trainer(cfg, canvas=32, transfer=transfer)
    loaders = make_loaders(
        cfg, str(train_idx), str(val_idx), canvas=32, num_threads=2,
        global_batch=trainer.global_batch(), transfer=transfer,
        packed_fmt=trainer.packed_fmt, packed_k=trainer.packed_k,
    )
    trainer.create_state(steps_per_epoch=STEPS)  # schedule total == STEPS
    if torch_init:
        import torch

        from rgbnomore_tpu.train.torch_import import import_vit_state_dict
        from tools.lockstep_ab import torch_init_state_dict

        torch.manual_seed(0)
        ref_model = torch_init_state_dict(DEPTH)
        params = import_vit_state_dict(
            ref_model.state_dict(), num_heads=3, head_size=64, depth=DEPTH,
            ver=1, use_subblock=True, pixel_space="DCT",
        )
        import jax.numpy as jnp

        params = jax.tree.map(jnp.asarray, params)
        trainer.state = trainer.state.replace(params=jax.device_put(
            params, trainer._rs))
    step_fn = trainer._fused_train_step()
    rng = jax.random.PRNGKey(1)
    losses = []
    t0 = time.time()
    for i, batch in enumerate(loaders["train"].iter_cycle(STEPS)):
        trainer.state, m = step_fn(trainer.state, trainer.put_batch(batch), rng)
        losses.append(float(m["loss"]))
        if i % 50 == 0:
            print(f"[jax] step {i} loss {losses[-1]:.4f} "
                  f"({(time.time()-t0)/(i+1):.2f} s/step)", flush=True)
    ev = trainer.evaluate(loaders["test"])
    return {
        "side": "jax-this-framework",
        "losses_every10": [round(l, 4) for l in losses[::10]],
        "final_train_loss_mean50": round(float(np.mean(losses[-50:])), 4),
        "val_acc": round(float(ev["accuracy"]), 4),
        "val_loss": round(float(ev["loss"]), 4),
        "wall_s": round(time.time() - t0, 1),
    }


def main() -> None:
    global STEPS, WARMUP, LR, NUM_OPS, MIXUP
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", required=True, choices=("torch", "jax", "report"))
    ap.add_argument("--steps", type=int, default=0,
                    help="override the 600-step horizon")
    ap.add_argument("--warmup", type=int, default=0,
                    help="override the 100-step warmup")
    ap.add_argument("--lr", type=float, default=0.0,
                    help="override the 1e-3 peak lr")
    ap.add_argument("--num_ops", type=int, default=-1,
                    help="override RandAugment num_ops (0 disables it on "
                         "both sides — isolates loader/model/optimizer in a "
                         "regime where the recipe actually learns)")
    ap.add_argument("--mixup", action="store_true",
                    help="apply batch mixup on both sides (reference "
                         "RandomMixup_DCT alpha=0.2 vs this framework's "
                         "mixup_batch) — the matched-cocktail probe")
    ap.add_argument("--tag", default="",
                    help="record under '<side>_<tag>' (a second A/B point, "
                         "e.g. the learning-regime warmup-300 run)")
    ap.add_argument("--jax_torch_init", action="store_true",
                    help="jax side starts from a reference torch.manual_seed(0)"
                         " init (bisects the init-distribution component)")
    ap.add_argument("--jax_transfer", default="cropped",
                    choices=("cropped", "dense"),
                    help="jax side wire: production lossy K=16 'cropped' or "
                         "full-spectrum 'dense' (bisects the wire component)")
    args = ap.parse_args()
    if args.steps:
        STEPS = args.steps
    if args.warmup:
        WARMUP = args.warmup
    if args.lr:
        LR = args.lr
    if args.num_ops >= 0:
        NUM_OPS = args.num_ops
    MIXUP = args.mixup
    suffix = f"_{args.tag}" if args.tag else ""
    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    if args.side == "torch":
        results["torch" + suffix] = run_torch()
    elif args.side == "jax":
        results["jax" + suffix] = run_jax(
            torch_init=args.jax_torch_init, transfer=args.jax_transfer)
        results["jax" + suffix]["torch_init"] = args.jax_torch_init
        results["jax" + suffix]["transfer"] = args.jax_transfer
    else:
        t, j = results["torch" + suffix], results["jax" + suffix]
        diff = abs(t["val_acc"] - j["val_acc"])
        print(f"torch val_acc {t['val_acc']} vs jax {j['val_acc']} "
              f"(diff {diff:.4f}); train loss {t['final_train_loss_mean50']} "
              f"vs {j['final_train_loss_mean50']}")
        results["verdict" + suffix] = {
            "val_acc_diff": round(diff, 4),
            "within_noise": diff <= 0.05,
        }
    hype = {"classes": CLASSES, "depth": DEPTH, "batch": BATCH, "steps": STEPS,
            "lr": LR, "wd": WD, "warmup": WARMUP, "num_ops": NUM_OPS,
            "magnitude": MAGNITUDE, "mixup": MIXUP}
    results["recipe" + suffix] = hype
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps({k: v for k, v in results.get(args.side + suffix, {}).items()
                      if k != "losses_every10"}))


if __name__ == "__main__":
    main()
