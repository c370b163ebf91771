"""Measure the REFERENCE's own DCT data pipeline per-core on this host.

This grounds bench.py's baseline denominator (see BENCHMARKS.md): it runs the
reference's per-worker loader hot path — ``datasets.py:274-301`` __getitem__
(dct_manip.read_coefficients + dequant/clamp) followed by the exact
``imagenet_dct`` train/val transform chains (``datasets.py:354-369``) with
the ViT-Ti preset aug list (``configs.py:93``) — using the reference's OWN
code imported from ``/root/reference`` and its OWN C++ extension.

Prep (one-time; nothing under /root/reference is modified):
  1. Build dct_manip against this host's libjpeg.  The reference source uses
     libjpeg v8-only struct members (``jpeg_width``/``min_DCT_*_scaled_size``,
     write path only); on a libjpeg-turbo 6.2 host, copy the source to /tmp,
     apply the same ``JPEG_LIB_VERSION`` substitutions our codec guards with
     (image_width/_height; drop the two scaled-size writes), and build via
     ``torch.utils.cpp_extension.load``.  The READ path measured here is
     byte-identical to upstream.
  2. Copy the built .so to /tmp/refbench/built/dct_manip.so.
  3. Run ``python bench.py`` once so the synthetic 512x512 q90 corpus exists
     (the same images bench.py measures this repo on).

torchvision is stubbed (not installed here); the measured DCT chain never
calls it — only Rotate/Shear ops would, and the DCT aug lists exclude them.
torch runs single-threaded, matching a per-core loader-worker budget.

Measured on the round-2 dev host (1-core Xeon 2.10GHz, libjpeg-turbo 2.1.5):
  reference_train_getitem_fps_per_core = 277.7
  reference_val_getitem_fps_per_core   = 270.2
  reference_decode_dequant_fps_per_core = 1110.3
"""
import json
import sys
import time
import types


def stub_torchvision():
    if "torchvision" in sys.modules:
        return

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stub: not available")

    tv = types.ModuleType("torchvision")
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_f = types.ModuleType("torchvision.transforms.functional")

    class _Interp:
        NEAREST = "nearest"
        BILINEAR = "bilinear"

    def _mod_getattr(name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _unavailable

    tv_f.__getattr__ = _mod_getattr
    tv_tr.InterpolationMode = _Interp
    tv_tr.functional = tv_f
    tv.transforms = tv_tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_tr
    sys.modules["torchvision.transforms.functional"] = tv_f


import torch  # noqa: E402  (import BEFORE stubbing: torch's custom-op
# registration inspects sys.modules and chokes on the stub's __getattr__)

torch.set_num_threads(1)
stub_torchvision()
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/tmp/refbench/built")

import dct_manip as dm  # noqa: E402  (the reference's own C++ extension)
import utils.custom_transforms as ctrans  # noqa: E402

VITTI_AUGLIST = (
    "AutoContrast,Posterize,SolarizeAdd,Color,Contrast,Brightness,MidfreqAug,"
    "Cutout,TranslateX,TranslateY,Rotate90,AutoSaturation,Grayscale,ChromaDrop"
).split(",")  # configs.py:93

train_tf = [
    ctrans.RandomResizedCrop_DCT(28, scale=(0.05, 1.0), ratio=(1, 1)),
    ctrans.RandomFlip_DCT(p=0.5, direction="horizontal"),
    ctrans.RandAugment_dct(num_ops=2, magnitude=3, num_magnitude_bins=11,
                           ops_list=VITTI_AUGLIST),
    ctrans.ToRange(val_min=-1, val_max=1, orig_min=-1024, orig_max=1016,
                   dtype=torch.float32),
]
val_tf = [
    ctrans.ResizedCenterCrop_DCT(32, 28),
    ctrans.ToRange(val_min=-1, val_max=1, orig_min=-1024, orig_max=1016,
                   dtype=torch.float32),
]


def getitem(path, tfs):
    # exact datasets.py:286-297
    dim, quant, Y, cbcr = dm.read_coefficients(path)
    Y = torch.clamp(Y * quant[0], min=-(2 ** 10), max=2 ** 10 - 8)
    if cbcr is not None:
        cbcr = torch.clamp(cbcr * quant[1:3].unsqueeze(1).unsqueeze(1),
                           min=-(2 ** 10), max=2 ** 10 - 8)
    else:
        _, h, w, kh, kw = Y.shape
        cbcr = torch.zeros((2, h // 2, w // 2, kh, kw), dtype=Y.dtype)
    coeffs = (Y, cbcr)
    for t in tfs:
        coeffs = t(coeffs)
    return coeffs


def measure(paths, tfs, n):
    t0 = time.perf_counter()
    for i in range(n):
        getitem(paths[i % len(paths)], tfs)
    return n / (time.perf_counter() - t0)


if __name__ == "__main__":
    from pathlib import Path

    paths = sorted(str(p) for p in Path("/tmp/rgbnomore_bench").glob("*.jpg"))
    assert paths, "run bench.py once to create the synthetic dataset"
    # warmup (conversion-matrix caches)
    measure(paths, train_tf, 20)
    measure(paths, val_tf, 20)
    train_fps = measure(paths, train_tf, 200)
    val_fps = measure(paths, val_tf, 200)
    # decode-only (entropy decode + dequant, no transforms)
    decode_fps = measure(paths, [], 200)
    print(json.dumps({
        "reference_train_getitem_fps_per_core": round(train_fps, 1),
        "reference_val_getitem_fps_per_core": round(val_fps, 1),
        "reference_decode_dequant_fps_per_core": round(decode_fps, 1),
        "torch_threads": torch.get_num_threads(),
    }))
