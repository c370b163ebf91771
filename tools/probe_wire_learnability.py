#!/usr/bin/env python
"""Probe-learnability of the e2e train-pipeline outputs, cropped vs packed.

CROPBISECT shows the ViT flatlines through the cropped wire even with aug
OFF, while the packed wire learns — yet the cropped wire is MORE faithful
(WIRE_SNR.json).  This takes the ViT out of the loop: run both production
train pipelines e2e on the same proxy images (aug ON and OFF), then fit a
multinomial logistic regression on the flattened low-frequency content of
the outputs.  If the probe separates both wires equally, the inputs are
equally learnable and the flatline is a training-dynamics problem; if the
cropped outputs are much worse, the pipeline output (not the wire bytes)
is damaged in a way the FFT-centroid diagnostic missed.

CPU-only.  Results land in PROBE_LEARN.json.
"""

from __future__ import annotations

import json
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

OUT = Path(__file__).resolve().parents[1] / "PROBE_LEARN.json"
B = 128
N_BATCHES = 12  # 1536 samples
CLASSES = 20


def collect(kind: str, aug: bool):
    import jax.numpy as jnp

    from tools.validate_recipe import make_dataset

    from rgbnomore_tpu.augment.pipeline import (
        make_cropped_train_pipeline,
        make_train_pipeline,
    )
    from rgbnomore_tpu.data.index import load_index
    from rgbnomore_tpu.data.loader import DctCroppedLoader, DctPackedLoader
    from rgbnomore_tpu.train.config import generate_config

    train_idx, _ = make_dataset(Path("/tmp/recipe_ds"))
    ds = load_index(str(train_idx))
    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.classes = CLASSES
    if not aug:
        cfg.train.auglist = []
        cfg.train.num_ops = 0

    pool = ThreadPoolExecutor(4)
    if kind == "cropped":
        loader = DctCroppedLoader(ds, B, target=28, k=16, mode="train", seed=3)
        pipe = jax.jit(make_cropped_train_pipeline(cfg, k=16, fmt="mask16"))
    else:
        loader = DctPackedLoader(ds, B, canvas=32, k=16, fmt="mask", seed=3)
        pipe = jax.jit(make_train_pipeline(cfg, canvas=32, packed=True,
                                           packed_fmt="mask", packed_k=16))
    X, L = [], []
    for b in range(N_BATCHES):
        idx = np.arange(b * B, (b + 1) * B)
        loader.epoch = b  # vary host crop draws
        batch = loader._decode_batch(pool, idx, batch_index=b)
        y, c, labels, w = pipe(jax.random.PRNGKey(b), batch["packed"])
        # low-frequency 4x4 of each Y block, spatially pooled 4x4 -> 7x7 grid
        yl = np.asarray(y)[:, 0, :, :, :4, :4]
        yl = yl.reshape(B, 7, 4, 7, 4, 4, 4).mean(axis=(2, 4))
        X.append(yl.reshape(B, -1))
        L.append(np.asarray(labels))
    return np.concatenate(X), np.concatenate(L)


def fit_probe(X, L):
    """Multinomial logistic regression, plain full-batch Adam, f64."""
    n, d = X.shape
    # labels cycle with period CLASSES in the index order, so split by
    # 20-sample cycle (every 4th cycle held out) to keep both splits
    # class-balanced
    tr = (np.arange(n) // CLASSES) % 4 != 0
    te = ~tr
    mu, sd = X[tr].mean(0), X[tr].std(0) + 1e-6
    Xn = (X - mu) / sd
    W = np.zeros((d, CLASSES))
    b = np.zeros(CLASSES)
    m = np.zeros_like(W); v = np.zeros_like(W)
    mb = np.zeros_like(b); vb = np.zeros_like(b)
    Y = np.eye(CLASSES)[L]
    lr = 0.05
    for t in range(1, 301):
        logits = Xn[tr] @ W + b
        p = np.exp(logits - logits.max(1, keepdims=True))
        p /= p.sum(1, keepdims=True)
        g = Xn[tr].T @ (p - Y[tr]) / tr.sum() + 1e-3 * W
        gb = (p - Y[tr]).mean(0)
        m = 0.9 * m + 0.1 * g; v = 0.999 * v + 0.001 * g * g
        mb = 0.9 * mb + 0.1 * gb; vb = 0.999 * vb + 0.001 * gb * gb
        W -= lr * (m / (1 - 0.9**t)) / (np.sqrt(v / (1 - 0.999**t)) + 1e-8)
        b -= lr * (mb / (1 - 0.9**t)) / (np.sqrt(vb / (1 - 0.999**t)) + 1e-8)
    pred = np.argmax(Xn[te] @ W + b, 1)
    tr_pred = np.argmax(Xn[tr] @ W + b, 1)
    return float((tr_pred == L[tr]).mean()), float((pred == L[te]).mean())


def main() -> None:
    results = {}
    for kind in ("cropped", "packed"):
        for aug in (False, True):
            X, L = collect(kind, aug)
            tr_acc, te_acc = fit_probe(X, L)
            key = f"{kind}_{'aug' if aug else 'noaug'}"
            results[key] = {"train_acc": round(tr_acc, 3), "test_acc": round(te_acc, 3)}
            print(key, results[key], flush=True)
    OUT.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
