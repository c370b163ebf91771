#!/usr/bin/env python
"""Build the REFERENCE's own dct_manip extension into /tmp/refbench/built.

The torch-side A/B tools (reference_ab.py, lockstep_ab.py,
measure_reference_loader.py) import the reference's C++ extension from
``/tmp/refbench/built/dct_manip.so``.  /tmp does not survive host restarts,
so this scripts the one-time prep the round-2/3 sessions did by hand
(documented in measure_reference_loader.py):

  1. copy ``/root/reference/dct_manip/dct_manip.cpp`` to a /tmp build dir
     (nothing under /root/reference is modified);
  2. substitute the libjpeg v8-only struct members the WRITE path uses
     (``jpeg_width``/``jpeg_height`` -> ``image_width``/``image_height``)
     and drop the two ``min_DCT_*_scaled_size`` writes — this host's
     libjpeg-turbo speaks JPEG_LIB_VERSION 6.2 (the same substitutions our
     own codec guards with ``#if JPEG_LIB_VERSION`` in native/dctcodec.cpp);
  3. build with torch.utils.cpp_extension.load (pybind11 headers ship with
     torch) and copy the .so to /tmp/refbench/built/dct_manip.so.

The READ path (all the A/Bs measure) is byte-identical to upstream.

Run: PYTHONPATH=. python tools/build_reference_ext.py
"""

from __future__ import annotations

import re
import shutil
import sys
from pathlib import Path

SRC = Path("/root/reference/dct_manip/dct_manip.cpp")
WORK = Path("/tmp/refbench/work")
OUT = Path("/tmp/refbench/built")


def patch_source(text: str) -> str:
    # v8-only aliases: jpeg_width/jpeg_height == image_width/image_height
    # for the non-scaling write path the reference uses.
    text = text.replace("cinfo->jpeg_width = cinfo->image_width;", "")
    text = text.replace("cinfo->jpeg_height = cinfo->image_height;", "")
    text = text.replace("cinfo->jpeg_width", "cinfo->image_width")
    text = text.replace("cinfo->jpeg_height", "cinfo->image_height")
    # v7+-only: min_DCT_*_scaled_size don't exist pre-7; the defaults the
    # reference writes (DCTSIZE) are the only behavior libjpeg 6.2 has.
    text = re.sub(r"^.*min_DCT_[hv]_scaled_size.*$", "", text, flags=re.M)
    return text


def main() -> None:
    WORK.mkdir(parents=True, exist_ok=True)
    OUT.mkdir(parents=True, exist_ok=True)
    so = OUT / "dct_manip.so"
    if so.exists():
        print(f"already built: {so}")
        return
    (WORK / "dct_manip.cpp").write_text(patch_source(SRC.read_text()))

    from torch.utils import cpp_extension

    mod_dir = cpp_extension.load(
        name="dct_manip",
        sources=[str(WORK / "dct_manip.cpp")],
        extra_cflags=["-std=c++17", "-O2"],
        extra_ldflags=["-ljpeg"],
        build_directory=str(WORK),
        verbose=True,
        is_python_module=False,
        is_standalone=False,
    )
    del mod_dir
    built = next(WORK.glob("dct_manip.so"), None) or next(WORK.glob("*.so"))
    shutil.copy2(built, so)
    print(f"built {so}")

    # smoke: read one synthetic JPEG through it
    sys.path.insert(0, str(OUT))
    import numpy as np

    import dct_manip as dm

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from rgbnomore_tpu import codec

    p = Path("/tmp/refbench/smoke.jpg")
    img = (np.arange(3 * 64 * 64) % 255).astype(np.uint8).reshape(3, 64, 64)
    codec.write_tensor(p, img, quality=90)
    dim, quant, y, cbcr = dm.read_coefficients(str(p))
    assert tuple(y.shape) == (1, 8, 8, 8, 8), y.shape
    print("smoke read OK:", tuple(y.shape), tuple(cbcr.shape))


if __name__ == "__main__":
    main()
