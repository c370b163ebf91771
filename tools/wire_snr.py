#!/usr/bin/env python
"""Quantify what the cropped TRAIN wire loses vs the packed wire, per config.

For a batch of proxy images and IDENTICAL crop boxes, compare each wire's
e2e pipeline output (unpack -> [dequant/crop] -> ToRange, aug OFF) against a
float64 oracle: dense dequantized coefficients cropped+resized with
``ops.basis.resize_axis_operator`` (the chain the cropped wire is oracled
against in tests/test_cropped.py).  Reports per-config relative RMS error and
the fraction of oracle variance retained — the mechanistic counterpart of the
CROPBISECT training arms.

CPU-only.  Results land in WIRE_SNR.json.
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

OUT = Path(__file__).resolve().parents[1] / "WIRE_SNR.json"


def main() -> None:
    from tools.validate_recipe import make_dataset

    from rgbnomore_tpu import codec
    from rgbnomore_tpu.augment.pipeline import split_packed_batch, unpack_fields
    from rgbnomore_tpu.data.croppack import build_op_pack
    from rgbnomore_tpu.data.index import load_index
    from rgbnomore_tpu.data.loader import packed_layout, row_views
    from rgbnomore_tpu.ops.basis import resize_axis_operator

    train_idx, _ = make_dataset(Path("/tmp/recipe_ds"))
    ds = load_index(str(train_idx))
    B, target = 128, 28
    rng = np.random.default_rng(11)
    uniforms = rng.random((B, 12))

    # oracle: dense f64 dequant -> crop -> resize for the SAME boxes the codec
    # reports (box comes back from read_crop_resize_pack)
    pack = build_op_pack(target, 64)

    def wire_and_oracle(i: int, k: int, fmt: str):
        layout = packed_layout(target, k, fmt)
        row = np.zeros(layout["row"], np.uint8)
        v = row_views(row, layout)
        ret = codec.read_crop_resize_pack(
            ds.paths[i], k, codec.CROP_RANDOM, uniforms[i], pack,
            v["vy"], v["iy"], v["sy"], v["dy"],
            v["vc"], v["ic"], v["sc"], v["dc"], v["quant"],
            ratio=target / (target + 4), wide=(fmt == "mask16w"),
        )
        bi, bj, bh, bw = ret[5:9]
        f = split_packed_batch(row[None], target, k, fmt)
        y, _ = unpack_fields(f, fmt)
        got = np.asarray(y[0, 0], np.float64)
        dims, quant, ycf, _c = codec.read_coefficients(ds.paths[i])
        deq = np.clip(ycf[0].astype(np.float64) * quant[0][None, None], -1024, 1016)
        h, w = deq.shape[:2]
        win = np.zeros((bh, bw, 8, 8))
        r1, c1 = min(bh, h - bi), min(bw, w - bj)
        win[:r1, :c1] = deq[bi : bi + r1, bj : bj + c1]
        flat = win.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        r_h = resize_axis_operator(bh, target).astype(np.float64)
        r_w = resize_axis_operator(bw, target).astype(np.float64)
        want = (r_h @ flat @ r_w.T).reshape(target, 8, target, 8).transpose(0, 2, 1, 3)
        return got, want

    pool = ThreadPoolExecutor(4)
    results = {}
    for k, fmt in ((16, "mask16"), (32, "mask16"), (63, "mask16"), (16, "mask16w")):
        pairs = list(pool.map(lambda i: wire_and_oracle(i, k, fmt), range(B)))
        got = np.stack([p[0] for p in pairs])
        want = np.stack([p[1] for p in pairs])
        err = got - want
        # AC-only variance (DC carries the mean; class signal is AC)
        ac = np.ones((8, 8), bool)
        ac[0, 0] = False
        ev = float((err[..., ac] ** 2).mean())
        wv = float((want[..., ac] ** 2).mean())
        # true retained-signal fraction: error is not orthogonal to signal,
        # so 1 - E/W is NOT "variance retained" (ADVICE round-4); report the
        # signal-aligned component cov(got, want)/var(want) instead
        g, w_ = got[..., ac].ravel(), want[..., ac].ravel()
        align = float((g * w_).mean() / max((w_ * w_).mean(), 1e-12))
        results[f"k{k}_{fmt}"] = {
            "ac_rel_rms": round(float(np.sqrt(ev / wv)), 4),
            "ac_err_energy_complement": round(1.0 - ev / wv, 4),
            "ac_signal_alignment": round(align, 4),
            "dc_max_err": round(float(np.abs(err[..., 0, 0]).max()), 2),
        }
        print(f"k={k} fmt={fmt}: {results[f'k{k}_{fmt}']}")

    OUT.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
