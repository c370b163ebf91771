"""Host-side JPEG DCT coefficient codec (numpy interface).

Thin wrapper over the C++ extension ``rgbnomore_tpu/native/dctcodec.cpp``.
API parity with the reference extension (``dct_manip/dct_manip.cpp:578-669``):

- :func:`read_coefficients`  — Huffman-decode only; returns quantized int16
  coefficient blocks, quant tables and original dims.
- :func:`read_into_canvas`   — the training-loader hot path: decode straight
  into caller-owned fixed-size canvases (zero Python-level copies; releases
  the GIL so a thread pool parallelizes across cores).
- :func:`write_coefficients` / :func:`quantize_at_quality` /
  :func:`write_tensor` / :func:`read_jpeg` / :func:`decode_coeff` — cold
  utilities for dataset prep, debugging and pixel-space oracles.

Shapes follow the reference exactly: Y ``(1, H/8, W/8, 8, 8)`` int16,
CbCr ``(2, H/16, W/16, 8, 8)`` int16 (``None`` for grayscale), quant
``(3, 8, 8)`` int16, dims ``(C, 2)`` int32.
"""

from __future__ import annotations

import numpy as np

# build() is a freshness check, not just a compile: it rebuilds when the
# source is newer OR when the .so was produced on a different host CPU
# (-march=native artifacts must never be reused across machines).
from rgbnomore_tpu.native.build import build as _build

_build()
from rgbnomore_tpu.native import _dctcodec  # type: ignore[attr-defined]  # noqa: E402

__all__ = [
    "read_coefficients",
    "read_into_canvas",
    "read_into_packed",
    "read_into_packed_mask",
    "read_into_packed_mask16",
    "read_crop_resize_pack",
    "read_crop_resize_pack_row",
    "read_rgb_crop_pack_row",
    "crop_row_offsets",
    "rgb_crop_row_offsets",
    "CROP_RANDOM",
    "CROP_CENTER",
    "CROP_FULL",
    "RGB_CROP_TRAIN",
    "RGB_CROP_CENTER",
    "RGB_CROP_FULL",
    "write_coefficients",
    "quantize_at_quality",
    "write_tensor",
    "read_jpeg",
    "decode_coeff",
]


def _unpack_coeff_tuple(ret):
    ncomp, dims_b, quant_b, (yh, yw, y_b), ctuple = ret
    dims = np.frombuffer(dims_b, dtype=np.int32).reshape(ncomp, 2).copy()
    quant = np.frombuffer(quant_b, dtype=np.int16).reshape(3, 8, 8)[:ncomp].copy()
    y = np.frombuffer(y_b, dtype=np.int16).reshape(1, yh, yw, 8, 8).copy()
    if ctuple is None:
        return dims, quant, y, None
    ch, cw, c_b = ctuple
    cbcr = np.frombuffer(c_b, dtype=np.int16).reshape(2, ch, cw, 8, 8).copy()
    return dims, quant, y, cbcr


def read_coefficients(path: str):
    """Read quantized DCT coefficients from a JPEG (entropy decode only).

    Returns ``(dims (C,2) int32, quant (C,8,8) int16, Y (1,h,w,8,8) int16,
    CbCr (2,h2,w2,8,8) int16 | None)``.
    """
    return _unpack_coeff_tuple(_dctcodec.read_coefficients(str(path)))


def read_into_canvas(
    path: str,
    y_canvas: np.ndarray,
    c_canvas: np.ndarray,
    quant_out: np.ndarray,
):
    """Decode coefficients directly into fixed-size canvases (hot path).

    ``y_canvas``: int16 C-contiguous, logically ``(1, YH, YW, 8, 8)``;
    ``c_canvas``: int16, ``(2, CH, CW, 8, 8)``; ``quant_out``: int16
    ``(3, 8, 8)``.  Canvases are zero-filled first; the image's blocks land
    in the top-left corner.  Grayscale images leave chroma zero and chroma
    quant tables at 1.

    Returns ``(ncomp, yh, yw, ch, cw, img_h, img_w)`` — actual block counts
    and the original (luma) pixel dims.
    """
    assert y_canvas.dtype == np.int16 and y_canvas.flags.c_contiguous
    assert c_canvas.dtype == np.int16 and c_canvas.flags.c_contiguous
    assert quant_out.dtype == np.int16 and quant_out.flags.c_contiguous
    yh_c, yw_c = y_canvas.shape[-4], y_canvas.shape[-3]
    ch_c, cw_c = c_canvas.shape[-4], c_canvas.shape[-3]
    return _dctcodec.read_into_canvas(
        str(path), y_canvas, yh_c, yw_c, c_canvas, ch_c, cw_c, quant_out
    )


def read_into_packed(
    path: str,
    k: int,
    vy: np.ndarray, iy: np.ndarray, sy: np.ndarray,
    vc: np.ndarray, ic: np.ndarray, sc: np.ndarray,
    quant_out: np.ndarray,
):
    """Decode + sparse top-K pack straight into caller canvases (hot path).

    Per 8x8 block the K largest-|v| quantized coefficients are stored as
    ``value int8 = round(coeff/scale)`` with ``scale uint8 = ceil(max|v|/127)``
    and their positions as uint8 indices — ~4x fewer host->device bytes than
    dense int16 at K=16 (JPEG blocks average ~10-14 nonzeros at q90).

    Shapes: ``vy/iy`` (1, YH, YW, K) int8/uint8, ``sy`` (1, YH, YW) uint8;
    ``vc/ic`` (2, CH, CW, K), ``sc`` (2, CH, CW); ``quant_out`` (3, 8, 8)
    int16.  Returns ``(ncomp, yh, yw, ch, cw)``.
    """
    yh_c, yw_c = vy.shape[-3], vy.shape[-2]
    ch_c, cw_c = vc.shape[-3], vc.shape[-2]
    return _dctcodec.read_into_packed(
        str(path), k, vy, iy, sy, yh_c, yw_c, vc, ic, sc, ch_c, cw_c, quant_out
    )


def read_into_packed_mask(
    path: str,
    k: int,
    vy: np.ndarray, my: np.ndarray, sy: np.ndarray,
    vc: np.ndarray, mc: np.ndarray, sc: np.ndarray,
    quant_out: np.ndarray,
):
    """Top-K pack with occupancy bitmasks: the tightest lossless-vs-index wire
    format (25 B/block at K=16 vs 33 for ``read_into_packed``).

    Per block: ``my/mc`` hold an 8-byte little-endian mask (bit ``p & 7`` of
    byte ``p >> 3`` set <=> coefficient position ``p`` kept) and ``vy/vc`` hold
    the kept values int8-quantized as in :func:`read_into_packed` but in
    ASCENDING POSITION order (the device reconstructs positions from the mask
    via a prefix-sum).  Shapes: ``vy`` (1, YH, YW, K) int8, ``my`` (1, YH, YW,
    8) uint8, ``sy`` (1, YH, YW) uint8; chroma likewise with a leading 2.
    """
    yh_c, yw_c = vy.shape[-3], vy.shape[-2]
    ch_c, cw_c = vc.shape[-3], vc.shape[-2]
    return _dctcodec.read_into_packed_mask(
        str(path), k, vy, my, sy, yh_c, yw_c, vc, mc, sc, ch_c, cw_c, quant_out
    )


def read_into_packed_mask16(
    path: str,
    k: int,
    vy: np.ndarray, my: np.ndarray, sy: np.ndarray, dy: np.ndarray,
    vc: np.ndarray, mc: np.ndarray, sc: np.ndarray, dc: np.ndarray,
    quant_out: np.ndarray,
):
    """Bitmask pack with an EXACT int16 DC per block (``dy``/``dc``,
    shape (1|2, H, W) int16) and int8 top-K ACs scaled independently of the
    DC.  The DC usually dominates a block's magnitude, so excluding it keeps
    the AC scale at 1 for typical photos — near-lossless at K >= the AC
    nonzero count (K+11 B/block; K=63 keeps the whole spectrum).  Used as the
    default wire format for the RGB domain's on-device JPEG decode.
    """
    yh_c, yw_c = vy.shape[-3], vy.shape[-2]
    ch_c, cw_c = vc.shape[-3], vc.shape[-2]
    return _dctcodec.read_into_packed_mask16(
        str(path), k, vy, my, sy, dy, yh_c, yw_c, vc, mc, sc, dc, ch_c, cw_c,
        quant_out,
    )


CROP_RANDOM = 0  # RandomResizedCrop_DCT box distribution (train)
CROP_CENTER = 1  # ResizedCenterCrop_DCT (ViT val)
CROP_FULL = 2  # whole-image Resize_DCT (swin val)


def read_crop_resize_pack(
    path: str,
    k: int,
    mode: int,
    uniforms: np.ndarray,
    pack,
    vy: np.ndarray, my: np.ndarray, sy: np.ndarray, dy: np.ndarray,
    vc: np.ndarray, mc: np.ndarray, sc: np.ndarray, dc: np.ndarray,
    quant_out: np.ndarray,
    *,
    scale: tuple[float, float] = (0.05, 1.0),
    ratio: float = 1.0,
    wide: bool = False,
    requant: bool = False,
):
    """Decode + host-side crop/resize to the target grid + mask16 pack.

    The crop-before-pack hot path: samples the reference's exact crop-box
    distribution on the TRUE image block grid
    (``custom_transforms.py:557-629``; ``mode`` selects train random crop /
    val center crop / swin full resize), dequantizes + clamps the window,
    resizes it to ``(pack.t_y, pack.t_c)`` block grids with the gcd operators
    from :mod:`rgbnomore_tpu.data.croppack`, and packs only the target blocks
    in the ``mask16`` wire format — ~5x fewer host->device bytes than the
    full-canvas packed formats.  Output values are DEQUANTIZED floats
    quantized to the wire (exact int16 DC, int8 x uint8-scale ACs); the
    device must NOT re-apply the quant table.

    ``uniforms``: float64 (12,) — 10 area draws + 2 offset draws (mode 0
    only).  ``ratio``: crop/resize ratio for mode 1 (e.g. 28/32).  ``wide``
    selects the int16-AC ``mask16w`` wire (``vy``/``vc`` must be int16).
    ``requant`` selects the ``mask16q`` wire: the resized plane is rounded
    back to JPEG integer units (v -> round(v/q)) BEFORE top-K, so selection
    ranks in the same quantized domain as the full-canvas packed wire and the
    device must multiply the quant table back (``augment.pipeline``).
    Returns ``(ncomp, yh, yw, ch, cw, bi, bj, bh, bw)`` with the sampled box.
    """
    return _dctcodec.read_crop_resize_pack(
        str(path), k, mode, pack.t_y, pack.t_c, pack.max_src,
        np.ascontiguousarray(uniforms, np.float64), float(scale[0]),
        float(scale[1]), float(ratio), pack.evens, pack.spec, pack.data,
        vy, my, sy, dy, vc, mc, sc, dc, quant_out, int(wide), int(requant),
    )


def crop_row_offsets(layout: dict) -> np.ndarray:
    """int64 (11,) byte offsets for :func:`read_crop_resize_pack_row`, in the
    fixed field order [vy, iy, sy, dy, vc, ic, sc, dc, quant, labels,
    weights], taken from a ``data.loader.packed_layout`` mask16 layout."""
    order = ("vy", "iy", "sy", "dy", "vc", "ic", "sc", "dc", "quant",
             "labels", "weights")
    return np.asarray([layout[f][0] for f in order], np.int64)


def read_crop_resize_pack_row(
    path: str,
    k: int,
    mode: int,
    uniforms: np.ndarray,
    pack,
    row: np.ndarray,
    offsets: np.ndarray,
    label: int,
    weight: float = 1.0,
    *,
    scale: tuple[float, float] = (0.05, 1.0),
    ratio: float = 1.0,
    wide: bool = False,
    requant: bool = False,
):
    """Loader hot-path variant of :func:`read_crop_resize_pack`: writes every
    per-sample field (including label/weight) into ONE consolidated uint8 row
    buffer, so the Python worker makes a single call with no per-image numpy
    views.  ``offsets`` from :func:`crop_row_offsets`.  ``wide`` selects the
    int16-AC ``mask16w`` wire (offsets must come from a mask16w layout);
    ``requant`` the quantized-unit ``mask16q`` wire (see
    :func:`read_crop_resize_pack`)."""
    return _dctcodec.read_crop_resize_pack_row(
        str(path), k, mode, pack.t_y, pack.t_c, pack.max_src,
        uniforms, float(scale[0]), float(scale[1]), float(ratio),
        pack.evens, pack.spec, pack.data, row, offsets, int(label),
        float(weight), int(wide), int(requant),
    )


RGB_CROP_TRAIN = 0  # torchvision RandomResizedCrop box (datasets.py:320)
RGB_CROP_CENTER = 1  # Resize(256) + CenterCrop(224) source box (datasets.py:328)
RGB_CROP_FULL = 2  # whole image (swin val Resize only, datasets.py:347)


def rgb_crop_row_offsets(layout: dict) -> np.ndarray:
    """int64 (12,) byte offsets for :func:`read_rgb_crop_pack_row` — the 11
    standard mask16 fields + the trailing ``geom`` float4, from a
    ``data.loader.packed_layout(..., geom=True)`` layout."""
    order = ("vy", "iy", "sy", "dy", "vc", "ic", "sc", "dc", "quant",
             "labels", "weights", "geom")
    return np.asarray([layout[f][0] for f in order], np.int64)


def read_rgb_crop_pack_row(
    path: str,
    k: int,
    t: int,
    mode: int,
    uniforms: np.ndarray,
    g2: np.ndarray,
    g4: np.ndarray,
    row: np.ndarray,
    offsets: np.ndarray,
    label: int,
    weight: float = 1.0,
    *,
    scale: tuple[float, float] = (0.05, 1.0),
    resize_to: float = 256.0,
    crop: float = 224.0,
):
    """RGB crop-before-pack loader hot path (one GIL-free call per image).

    Samples the reference's PIXEL-granular RGB crop box (torchvision
    RandomResizedCrop / Resize+CenterCrop semantics — unlike the DCT path's
    block-snapped boxes), ships only the block-aligned window covering it in
    a fixed ``t``-block mask16 wire, spectrally pre-downsampled per axis by
    the smallest f in {1, 2, 4} that fits, with the residual fractional box
    (``geom`` float4) left for the device's bilinear resample after the JPEG
    tail decode.  ``uniforms`` float64 (22,): 10x(area, log-aspect) + 2
    placement draws.  ``g2``/``g4``: ``croppack.rgb_downsample_blocks()``.

    Returns ``(ncomp, yh, yw, wy0, wx0, wbh, wbw, fy, fx)`` (blocks).
    """
    return _dctcodec.read_rgb_crop_pack_row(
        str(path), k, t, mode, np.ascontiguousarray(uniforms, np.float64),
        float(scale[0]), float(scale[1]), float(resize_to), float(crop),
        g2, g4, row, offsets, int(label), float(weight),
    )


def write_coefficients(path, dimensions, quantization, y, cbcr=None):
    """Write raw coefficients to a JPEG file (inverse of read_coefficients)."""
    dimensions = np.ascontiguousarray(dimensions, dtype=np.int32)
    quant = np.zeros((3, 8, 8), np.int16)
    quant[: quantization.shape[0]] = quantization
    y = np.ascontiguousarray(y, dtype=np.int16)
    img_h, img_w = int(dimensions[0, 0]), int(dimensions[0, 1])
    if cbcr is None:
        _dctcodec.write_coefficients(
            str(path), img_h, img_w, quant, y, y.shape[1], y.shape[2], None, 0, 0
        )
    else:
        cbcr = np.ascontiguousarray(cbcr, dtype=np.int16)
        _dctcodec.write_coefficients(
            str(path), img_h, img_w, quant, y, y.shape[1], y.shape[2], cbcr,
            cbcr.shape[1], cbcr.shape[2],
        )


def quantize_at_quality(pixels: np.ndarray, quality: int, baseline: bool = True):
    """Encode CHW uint8 pixels at ``quality`` and return their coefficients.

    Bit-exact libjpeg quantization (the encode-then-reread trick of
    ``dct_manip.cpp:315-375``).  Returns the same tuple as
    :func:`read_coefficients`.
    """
    del baseline  # libjpeg baseline tables are always used here
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    c, h, w = pixels.shape
    return _unpack_coeff_tuple(_dctcodec.quantize_at_quality(pixels, c, h, w, quality))


def write_tensor(path, data: np.ndarray, quantization=None, quality: int = 100):
    """Encode CHW uint8 pixels to a JPEG file with optional custom quant table."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    c, h, w = data.shape
    if quantization is not None:
        q = np.zeros((3, 8, 8), np.int16)
        q[: np.asarray(quantization).shape[0]] = quantization
        quantization = np.ascontiguousarray(q)
    _dctcodec.write_tensor(str(path), data, c, h, w, quantization, quality)


def read_jpeg(path) -> np.ndarray:
    """Fully decode a JPEG to a CHW uint8 array."""
    c, h, w, buf = _dctcodec.read_jpeg(str(path))
    return np.frombuffer(buf, dtype=np.uint8).reshape(c, h, w).copy()


def decode_coeff(dimensions, quantization, y, cbcr=None, quality: int = -1) -> np.ndarray:
    """Decode raw DCT coefficients to CHW uint8 pixels.

    ``quality > 0`` substitutes libjpeg's quality-derived quant table for the
    provided one (``dct_manip.cpp:485-576``).
    """
    dimensions = np.ascontiguousarray(dimensions, dtype=np.int32)
    quant = np.zeros((3, 8, 8), np.int16)
    qarr = np.asarray(quantization, dtype=np.int16)
    quant[: qarr.shape[0]] = qarr
    y = np.ascontiguousarray(y, dtype=np.int16)
    img_h, img_w = int(dimensions[0, 0]), int(dimensions[0, 1])
    if cbcr is None:
        c, h, w, buf = _dctcodec.decode_coeff(
            img_h, img_w, quant, quality, y, y.shape[1], y.shape[2], None, 0, 0
        )
    else:
        cbcr = np.ascontiguousarray(cbcr, dtype=np.int16)
        c, h, w, buf = _dctcodec.decode_coeff(
            img_h, img_w, quant, quality, y, y.shape[1], y.shape[2], cbcr,
            cbcr.shape[1], cbcr.shape[2],
        )
    return np.frombuffer(buf, dtype=np.uint8).reshape(c, h, w).copy()
