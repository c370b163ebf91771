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


def _host_cpu_tag() -> str:
    """A short tag identifying the host CPU's ISA extensions.

    The extension is compiled ``-march=native``; a cached .so carried to a
    different machine (shared volume, container image) could SIGILL.  The
    build records this tag in a sidecar file and rebuilds whenever the tag
    no longer matches the running host.
    """
    import hashlib
    import re

    try:
        text = Path("/proc/cpuinfo").read_text()
        flags = re.search(r"^flags\s*:\s*(.*)$", text, re.M)
        model = re.search(r"^model name\s*:\s*(.*)$", text, re.M)
        key = (model.group(1) if model else "") + "|" + (flags.group(1) if flags else "")
    except OSError:  # non-Linux: fall back to the platform triple
        import platform

        key = platform.processor() + platform.machine()
    return hashlib.sha1(key.encode()).hexdigest()[:10]


def ext_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return HERE / f"_dctcodec{suffix}"


def _tag_path() -> Path:
    return HERE / "_dctcodec.buildtag"


def build(force: bool = False) -> Path:
    out = ext_path()
    tag = _host_cpu_tag()
    fresh = (
        out.exists()
        and out.stat().st_mtime >= SRC.stat().st_mtime
        and _tag_path().exists()
        and _tag_path().read_text().strip() == tag
    )
    if fresh and not force:
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O3",
        "-march=native",  # the crop+resize f32 loops need AVX to keep up
        "-funroll-loops",
        "-ffp-contract=fast",
        "-fopenmp-simd",  # `omp simd` pragmas only — no OpenMP runtime dep
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
    _tag_path().write_text(tag + "\n")
    return out


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"built {path}")
