"""Build the _dctcodec CPython extension with g++ + libjpeg.

Usage: ``python -m rgbnomore_tpu.native.build`` (or it is invoked
automatically on first ``import rgbnomore_tpu.codec``).
"""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "dctcodec.cpp"


def ext_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return HERE / f"_dctcodec{suffix}"


def build(force: bool = False) -> Path:
    out = ext_path()
    if out.exists() and not force and out.stat().st_mtime >= SRC.stat().st_mtime:
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O3",
        "-march=native",  # the crop+resize f32 loops need AVX to keep up
        "-funroll-loops",
        "-ffp-contract=fast",
        "-std=c++17",
        "-shared",
        "-fPIC",
        f"-I{include}",
        str(SRC),
        "-ljpeg",
        "-o",
        str(out),
    ]
    try:
        subprocess.run(cmd, check=True)
    except subprocess.CalledProcessError:
        cmd.remove("-march=native")  # exotic hosts: portable fallback
        subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"built {path}")
