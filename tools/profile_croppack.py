#!/usr/bin/env python
"""Stage profile of the host crop-before-pack path (VERDICT round-2 item 2).

Runs ``read_crop_resize_pack_row`` (the exact loader hot call,
``data/loader.py:DctCroppedLoader._decode_batch``) over the bench corpus on
ONE thread with the C++ stage profiler enabled (``_dctcodec.crop_profile``),
printing ms/img for: entropy decode, extract+dequant+resize, top-K pack,
and the Python-call remainder.  This is the measurement behind the host-tail
optimization work in BENCHMARKS.md.

Run: PYTHONPATH=. python tools/profile_croppack.py [--n 512] [--mode train]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--mode", default="train", choices=("train", "center", "full"))
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--target", type=int, default=28)
    args = ap.parse_args()

    from bench import N_IMAGES, make_synthetic_dataset

    from rgbnomore_tpu import codec
    from rgbnomore_tpu.data.croppack import build_op_pack
    from rgbnomore_tpu.data.index import load_index
    from rgbnomore_tpu.data.loader import packed_layout
    from rgbnomore_tpu.native import _dctcodec

    index = make_synthetic_dataset(Path("/tmp/rgbnomore_bench"), N_IMAGES)
    ds = load_index(index)
    paths = list(ds.paths)[: args.n]
    mode = {"train": codec.CROP_RANDOM, "center": codec.CROP_CENTER,
            "full": codec.CROP_FULL}[args.mode]
    pack = build_op_pack(args.target, 64)
    layout = packed_layout(args.target, args.k, "mask16")
    offsets = codec.crop_row_offsets(layout)
    buf = np.zeros((layout["row"],), np.uint8)
    rng = np.random.default_rng(0)
    uniforms = rng.random((len(paths), 12))

    # warmup (page cache + branch predictors)
    for p in paths[:32]:
        codec.read_crop_resize_pack_row(p, args.k, mode, uniforms[0], pack,
                                        buf, offsets, 0, 1.0)

    _dctcodec.crop_profile(1)
    _dctcodec.crop_profile(1)  # reset counters, stay enabled
    t0 = time.perf_counter()
    for i, p in enumerate(paths):
        codec.read_crop_resize_pack_row(p, args.k, mode, uniforms[i], pack,
                                        buf, offsets, 0, 1.0)
    wall = time.perf_counter() - t0
    prof = _dctcodec.crop_profile(0)

    n = prof["n"]
    assert n == len(paths), (n, len(paths))
    dec = prof["decode_ns"] / n / 1e6
    ext = prof["extract_resize_ns"] / n / 1e6
    pk = prof["pack_ns"] / n / 1e6
    tot = wall / n * 1e3
    print(f"mode={args.mode} k={args.k} target={args.target} n={n}")
    print(f"  entropy decode     {dec:7.3f} ms/img  ({dec/tot*100:4.1f}%)")
    print(f"  extract+deq+resize {ext:7.3f} ms/img  ({ext/tot*100:4.1f}%)")
    print(f"  top-K pack         {pk:7.3f} ms/img  ({pk/tot*100:4.1f}%)")
    print(f"  other (open/bind)  {tot-dec-ext-pk:7.3f} ms/img")
    print(f"  TOTAL              {tot:7.3f} ms/img  = {1e3/tot:.0f} img/s/core")


if __name__ == "__main__":
    main()
