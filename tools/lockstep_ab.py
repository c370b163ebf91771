#!/usr/bin/env python
"""Lockstep training-process A/B (VERDICT round-3 item 2).

The learn2 distributional A/B left a 9-point val-acc gap (JAX 0.483 vs torch
0.393 on an identical recipe) — "the two stacks are not computing the same
training process" until proven otherwise.  This harness proves or refutes
exactly that, deterministically and cheaply:

  * ONE initialization: the reference ViT's own ``torch.manual_seed(0)`` init,
    exported via ``import_vit_state_dict`` so both stacks start from
    bit-identical parameters.
  * ONE data stream: a few fixed batches produced by the reference's OWN
    deterministic val transform (``ResizedCenterCrop_DCT(32,28)`` + ``ToRange``,
    ``datasets.py:366-369``) — the same float32 arrays are fed to both sides
    (no aug randomness, no packed wire).
  * ONE recipe: the learn2 hyperparameters (lr 3e-3, wd 1e-4, clip 1.0,
    linear warmup + cosine, ``train.py:150-176`` + ``custom_optims.py:37-43``).

Then run N steps on each side and compare the loss trajectories step by step.
If the optimizer/grad semantics match, the curves track to float-accumulation
noise; any systematic divergence pins the component (step-0 loss = forward,
step-1 loss = backward+update, drift shape = schedule/wd/eps semantics).

Results -> LOCKSTEP_AB.json.
Run:  PYTHONPATH=. python tools/lockstep_ab.py [--steps 80] [--depth 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "LOCKSTEP_AB.json"

CLASSES = 20
EMB, HEADS, HEAD_SIZE = 192, 3, 64
BATCH = 64
LR, WD, WARMUP = 3e-3, 1e-4, 10
N_BATCHES = 4  # fixed batches, cycled


def lr_at(step: int, total: int) -> float:
    import math

    if step < WARMUP:
        return LR * (step + 1.0) / WARMUP
    progress = min(1.0, max(0.0, (step - WARMUP) / max(1, total - WARMUP)))
    return LR * 0.5 * (1.0 + math.cos(math.pi * progress))


def fixed_batches() -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Deterministic (Y, CbCr, labels) float32 batches via the reference's
    own codec + val transform chain."""
    import torch

    from tools.measure_reference_loader import stub_torchvision
    from tools.validate_recipe import make_dataset

    stub_torchvision()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "/tmp/refbench/built" not in sys.path:
        sys.path.insert(0, "/tmp/refbench/built")
    import dct_manip as dm
    import utils.custom_transforms as ctrans

    train_idx, _ = make_dataset(Path("/tmp/recipe_ds"))
    rows = [l.split(",") for l in train_idx.read_text().strip().splitlines()[1:]]
    val_tf = [
        ctrans.ResizedCenterCrop_DCT(32, 28),
        ctrans.ToRange(val_min=-1, val_max=1, orig_min=-1024, orig_max=1016,
                       dtype=torch.float32),
    ]
    batches = []
    for b in range(N_BATCHES):
        chunk = rows[b * BATCH:(b + 1) * BATCH]
        assert len(chunk) == BATCH, "corpus too small for N_BATCHES"
        ys, cs, ls = [], [], []
        for path, label in chunk:
            dim, quant, Y, cbcr = dm.read_coefficients(path)
            Y = torch.clamp(Y * quant[0], min=-(2 ** 10), max=2 ** 10 - 8)
            cbcr = torch.clamp(cbcr * quant[1:3].unsqueeze(1).unsqueeze(1),
                               min=-(2 ** 10), max=2 ** 10 - 8)
            y, c = val_tf[1](val_tf[0]((Y, cbcr)))
            ys.append(y.numpy())
            cs.append(c.numpy())
            ls.append(int(label))
        batches.append((np.stack(ys), np.stack(cs), np.asarray(ls, np.int64)))
    return batches


def torch_init_state_dict(depth: int):
    import torch

    from tools.measure_reference_loader import stub_torchvision

    stub_torchvision()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models import plainvit as ref_vit

    torch.manual_seed(0)
    model = ref_vit.ViT(
        patch_size=16, emb_size=EMB, depth=depth, n_classes=CLASSES,
        drop_p=0.0, pixel_space="DCT", ver=1, use_subblock=True,
        num_heads=HEADS, head_size=HEAD_SIZE,
    )
    return model


def run_torch(model, batches, steps: int) -> list[float]:
    import torch

    torch.set_num_threads(1)
    criterion = torch.nn.CrossEntropyLoss()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=0.0)
    wd_params = [p for n, p in model.named_parameters()
                 if "weight" in n and "lrnorm" not in n and "norm" not in n]
    losses = []
    model.train()
    for step in range(steps):
        y, c, lab = batches[step % len(batches)]
        yb, cb = torch.from_numpy(y), torch.from_numpy(c)
        tgt = torch.from_numpy(lab)
        for g in opt.param_groups:
            g["lr"] = lr_at(step, steps)
        opt.zero_grad()
        loss = criterion(model(yb, cb), tgt)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        with torch.no_grad():
            f = lr_at(step, steps) / LR * WD
            for p in wd_params:
                p.mul_(1.0 - f)
        losses.append(float(loss))
    return losses


def run_jax(state_dict, batches, steps: int, depth: int) -> list[float]:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from rgbnomore_tpu.models import ViT
    from rgbnomore_tpu.train.optim import make_optimizer
    from rgbnomore_tpu.train.torch_import import import_vit_state_dict

    model = ViT(emb_size=EMB, depth=depth, num_heads=HEADS,
                head_size=HEAD_SIZE, n_classes=CLASSES, pixel_space="DCT",
                ver=1, use_subblock=True, drop_p=0.0)
    params = import_vit_state_dict(
        state_dict, num_heads=HEADS, head_size=HEAD_SIZE, depth=depth,
        ver=1, use_subblock=True, pixel_space="DCT",
    )
    tx, _ = make_optimizer(LR, WD, WARMUP, steps)
    opt_state = tx.init(params)

    def loss_fn(p, y, c, lab):
        logits = model.apply({"params": p}, y, c)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, lab[:, None], axis=-1))

    @jax.jit
    def step_fn(p, s, y, c, lab):
        loss, grads = jax.value_and_grad(loss_fn)(p, y, c, lab)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for step in range(steps):
        y, c, lab = batches[step % len(batches)]
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(y), jnp.asarray(c),
            jnp.asarray(lab))
        losses.append(float(loss))
    return losses


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args()

    t0 = time.time()
    batches = fixed_batches()
    model = torch_init_state_dict(args.depth)
    sd = {k: v.clone() for k, v in model.state_dict().items()}
    print(f"prep done ({time.time()-t0:.0f}s)", flush=True)

    tl = run_torch(model, batches, args.steps)
    print(f"torch done ({time.time()-t0:.0f}s) final {tl[-1]:.4f}", flush=True)
    jl = run_jax(sd, batches, args.steps, args.depth)
    print(f"jax   done ({time.time()-t0:.0f}s) final {jl[-1]:.4f}", flush=True)

    diffs = np.abs(np.asarray(tl) - np.asarray(jl))
    rel = diffs / np.maximum(np.abs(np.asarray(tl)), 1e-6)
    res = {
        "recipe": {"classes": CLASSES, "depth": args.depth, "batch": BATCH,
                   "steps": args.steps, "lr": LR, "wd": WD, "warmup": WARMUP,
                   "n_fixed_batches": N_BATCHES,
                   "data": "reference val transform, deterministic",
                   "init": "reference torch.manual_seed(0) init, imported"},
        "torch_losses": [round(x, 6) for x in tl],
        "jax_losses": [round(x, 6) for x in jl],
        "max_abs_diff": round(float(diffs.max()), 6),
        "max_rel_diff": round(float(rel.max()), 6),
        "final_abs_diff": round(float(diffs[-1]), 6),
        "lockstep_match": bool(rel.max() < 0.02),
    }
    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps({k: v for k, v in res.items()
                      if not k.endswith("losses")}))


if __name__ == "__main__":
    main()
