#!/usr/bin/env python
"""Diagnose the cropped TRAIN wire: does class signal survive it?

bf16_train_ab (transfer="cropped") converged to uniform logits while the
same recipe through transfer="packed" reaches 0.42+ — so either the random
crop-resize-pack host path mangles images, or the proxy's class signal
(grating orientation at ~126 px wavelength) genuinely dies under it.

Checks, all on CPU:
  1. Wire fidelity: for a handful of proxy images, read the cropped train
     wire, reconstruct pixels from the dequantized Y plane (idct), and
     correlate against a ground-truth bilinear crop of the SAME box the
     codec reports.  Low correlation == mangled resample.
  2. Class separability: 400 wire samples -> 2D FFT orientation energy
     features -> nearest-class-centroid accuracy.  Chance = 1/20.
  3. Same separability through the PACKED wire pipeline (the arm that
     learns) for comparison.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

from tools.validate_recipe import make_dataset  # noqa: E402

from rgbnomore_tpu.data.index import load_index  # noqa: E402
from rgbnomore_tpu.data.loader import DctCroppedLoader, DctPackedLoader  # noqa: E402
from rgbnomore_tpu.augment.pipeline import (  # noqa: E402
    split_packed_batch, unpack_fields)
from scipy.fftpack import idct as sp_idct  # noqa: E402


def blocks_to_pixels(y: np.ndarray) -> np.ndarray:
    """(1, H, W, 8, 8) dequantized DCT blocks -> (H*8, W*8) pixels."""
    b = y[0]
    h, w = b.shape[:2]
    x = sp_idct(sp_idct(b, axis=-1, norm="ortho"), axis=-2, norm="ortho")
    return x.transpose(0, 2, 1, 3).reshape(h * 8, w * 8) + 128.0


def main() -> None:
    train_idx, _ = make_dataset(Path("/tmp/recipe_ds"))
    ds = load_index(str(train_idx))
    B = 256
    target = 28

    cl = DctCroppedLoader(ds, B, target=target, k=16, mode="train", seed=7)
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(4)
    idx = np.arange(B)
    batch = cl._decode_batch(pool, idx, batch_index=0)

    f = split_packed_batch(batch["packed"], target, 16, "mask16")
    y, c = unpack_fields(f, "mask16")
    y = np.asarray(y)
    labels = np.asarray(f["labels"]).ravel()
    weights = np.asarray(f["weights"]).ravel()
    print(f"labels match host copy: {np.array_equal(labels, batch['labels'])}")
    print(f"weights nonzero: {int((weights > 0).sum())}/{B}")
    print(f"y stats: mean {y.mean():.3f} std {y.std():.3f} "
          f"absmax {np.abs(y).max():.1f}")

    # 1. orientation separability through the cropped wire
    def feats(yb):
        img = blocks_to_pixels(yb)
        F = np.abs(np.fft.fftshift(np.fft.fft2(img - img.mean())))
        n = F.shape[0]
        yy, xx = np.mgrid[0:n, 0:n]
        yy = yy - n // 2
        xx = xx - n // 2
        r = np.hypot(yy, xx)
        ang = np.arctan2(yy, xx) % np.pi
        m = (r > 1) & (r < n // 4)
        # 20-bin orientation energy histogram
        bins = np.clip((ang[m] / np.pi * 20).astype(int), 0, 19)
        h = np.bincount(bins, weights=F[m] ** 2, minlength=20)
        return h / (h.sum() + 1e-9)

    X = np.stack([feats(y[i]) for i in range(B)])
    perm = np.random.default_rng(0).permutation(B)
    acc_parts = []
    for split in range(2):  # 2-fold centroid classifier (shuffled folds)
        tr = np.zeros(B, bool)
        tr[perm[split::2]] = True
        te = ~tr
        cent = np.stack([X[tr & (labels == c)].mean(0)
                         if (tr & (labels == c)).any() else np.zeros(20)
                         for c in range(20)])
        pred = np.argmax(X[te] @ cent.T, axis=1)
        acc_parts.append((pred == labels[te]).mean())
    print(f"cropped-wire orientation-centroid acc: {np.mean(acc_parts):.3f} "
          f"(chance 0.05)")

    # 2. ground-truth fidelity for a few identity-ish samples: compare wire
    # pixels vs PIL-free numpy crop of the reported box
    from rgbnomore_tpu import codec
    import io
    n_show = 4
    for i in range(n_show):
        p = ds.paths[i]
        full = codec.read_jpeg(p)  # (3, H, W) uint8? check
        full = np.asarray(full)
        img = blocks_to_pixels(y[i])
        print(f"sample {i} label {labels[i]}: wire img mean {img.mean():.1f} "
              f"std {img.std():.1f} | full std {np.asarray(full).std():.1f}")

    # 3. the packed wire for comparison (device pipeline does its own crop;
    # here just measure separability of the FULL canvas content)
    pl = DctPackedLoader(ds, B, canvas=32, k=16, fmt="mask", seed=7)
    pb = pl._decode_batch(pool, idx, batch_index=0)
    fp = split_packed_batch(pb["packed"], 32, 16, "mask")
    yp, cp = unpack_fields(fp, "mask")
    # mask fmt carries QUANTIZED values; dequant with quant table
    quant = np.asarray(fp["quant"])  # (B, 3, 8, 8)
    ypd = np.asarray(yp) * quant[:, 0][:, None, None, None]
    Xp = np.stack([feats(ypd[i]) for i in range(B)])
    accp = []
    for split in range(2):
        tr = np.zeros(B, bool)
        tr[perm[split::2]] = True
        te = ~tr
        cent = np.stack([Xp[tr & (labels == c)].mean(0)
                         if (tr & (labels == c)).any() else np.zeros(20)
                         for c in range(20)])
        pred = np.argmax(Xp[te] @ cent.T, axis=1)
        accp.append((pred == labels[te]).mean())
    print(f"packed-wire (full canvas) orientation-centroid acc: "
          f"{np.mean(accp):.3f}")

    # 4. END-TO-END device pipelines (what the model actually sees): same
    # images, full train pipeline incl. flip + RandAugment + ToRange.
    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.augment.pipeline import (
        make_cropped_train_pipeline, make_train_pipeline)

    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.classes = 20
    pipe_c = make_cropped_train_pipeline(cfg, k=16, fmt="mask16")
    pipe_p = make_train_pipeline(cfg, canvas=32, packed=True,
                                 packed_k=16, packed_fmt="mask")
    rng = jax.random.PRNGKey(0)
    yc, cc, lc, wc = pipe_c(rng, batch["packed"])
    yp2, cp2, lp2, wp2 = pipe_p(rng, pb["packed"])
    yc, yp2 = np.asarray(yc), np.asarray(yp2)
    print(f"pipeline out shapes cropped {yc.shape} packed {yp2.shape}")
    print(f"cropped out: mean {yc.mean():.4f} std {yc.std():.4f} "
          f"absmax {np.abs(yc).max():.3f}")
    print(f"packed  out: mean {yp2.mean():.4f} std {yp2.std():.4f} "
          f"absmax {np.abs(yp2).max():.3f}")

    def sep(Y):
        # Y: (B, 1, H, W, 8, 8) ToRange'd dct blocks; undo to pixel space
        Xf = np.stack([feats((Y[i] - Y[i].mean())) for i in range(B)])
        accs = []
        for split in range(2):
            tr = np.zeros(B, bool)
            tr[perm[split::2]] = True
            te = ~tr
            cent = np.stack([Xf[tr & (labels == c)].mean(0)
                             if (tr & (labels == c)).any() else np.zeros(20)
                             for c in range(20)])
            pred = np.argmax(Xf[te] @ cent.T, axis=1)
            accs.append((pred == labels[te]).mean())
        return np.mean(accs)

    print(f"e2e separability: cropped {sep(yc):.3f} packed {sep(yp2):.3f}")


if __name__ == "__main__":
    main()
