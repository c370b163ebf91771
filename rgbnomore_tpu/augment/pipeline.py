"""End-to-end on-device input pipelines: dequantize -> crop/resize ->
flip -> RandAugment -> normalize, all inside one jitted function.

This is the TPU-first replacement for the reference's per-sample CPU
transform chains (``datasets.py:305-390``): the host ships raw quantized
int16 canvases (half the bandwidth of f32) and everything else runs batched
on-device.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from rgbnomore_tpu.augment.crops import (
    make_center_crop_resize,
    make_full_resize,
    make_random_resized_crop,
)
from rgbnomore_tpu.augment.randaugment import RandAugmentDCT
from rgbnomore_tpu.ops import blocks
from rgbnomore_tpu.ops.photometric import DCT_MAX, DCT_MIN

__all__ = [
    "dequantize",
    "split_packed_batch",
    "unpack_coefficients",
    "unpack_coefficients_mask",
    "unpack_fields",
    "unpack_cropped",
    "make_packed_rgb_decode",
    "to_range",
    "make_train_pipeline",
    "make_eval_pipeline",
    "make_cropped_train_pipeline",
    "make_cropped_eval_pipeline",
]


def split_packed_batch(
    packed: jax.Array, canvas: int, k: int, fmt: str = "mask", geom: bool = False
) -> dict[str, jax.Array]:
    """Re-slice the consolidated (B, row) uint8 buffer into typed fields.

    Inverse of the host-side layout (``data.loader.packed_layout``): static
    slices + bitcasts, free under XLA fusion.
    """
    import numpy as np

    from rgbnomore_tpu.data.loader import packed_layout

    layout = packed_layout(canvas, k, fmt, geom=geom)
    b = packed.shape[0]
    out = {}
    for name, spec in layout.items():
        if name == "row":
            continue
        off, shape, dtype = spec
        itemsize = dtype.itemsize
        n = int(np.prod(shape, dtype=np.int64))
        sl = jax.lax.slice_in_dim(packed, off, off + n * itemsize, axis=1)
        if itemsize == 1:
            arr = jax.lax.bitcast_convert_type(sl, jnp.dtype(dtype))
        else:
            arr = jax.lax.bitcast_convert_type(
                sl.reshape(b, n, itemsize), jnp.dtype(dtype)
            )
        out[name] = arr.reshape((b,) + shape)
    return out


def unpack_coefficients(values: jax.Array, indices: jax.Array, scales: jax.Array) -> jax.Array:
    """Decompress sparse top-K packed blocks to dense quantized coefficients.

    ``values`` (..., H, W, K) int8, ``indices`` (..., H, W, K) uint8 block
    positions, ``scales`` (..., H, W) uint8.  Returns (..., H, W, 8, 8)
    float32 quantized coefficients.  The compare-and-reduce form compiles to
    a fused VPU loop on TPU (no scatter).
    """
    vals = values.astype(jnp.float32) * scales[..., None].astype(jnp.float32)
    slots = jnp.arange(64, dtype=jnp.int32)
    hit = indices.astype(jnp.int32)[..., None] == slots  # (..., K, 64)
    dense = jnp.sum(vals[..., None] * hit, axis=-2)  # (..., 64)
    return dense.reshape(dense.shape[:-1] + (8, 8))


def unpack_coefficients_mask(
    values: jax.Array, mask: jax.Array, scales: jax.Array
) -> jax.Array:
    """Decompress bitmask-packed blocks to dense quantized coefficients.

    ``values`` (..., H, W, K) int8 in ascending-position order, ``mask``
    (..., H, W, 8) uint8 little-endian occupancy bits (bit ``p & 7`` of byte
    ``p >> 3`` <=> position ``p`` kept), ``scales`` (..., H, W) uint8.  The
    value for set position ``p`` sits at rank = popcount(mask below p), an
    exclusive prefix-sum of the bits; the rank->value lookup is the same
    compare-and-reduce as :func:`unpack_coefficients` (no scatter/gather).
    Returns (..., H, W, 8, 8) float32.
    """
    k = values.shape[-1]
    bit_sel = jnp.left_shift(jnp.ones((), jnp.uint8), jnp.arange(8, dtype=jnp.uint8))
    bits = (mask[..., None] & bit_sel) != 0  # (..., 8, 8) bytes x bits
    bits = bits.reshape(bits.shape[:-2] + (64,)).astype(jnp.int32)
    ranks = jnp.cumsum(bits, axis=-1) - bits  # exclusive prefix sum, (..., 64)
    vals = values.astype(jnp.float32) * scales[..., None].astype(jnp.float32)
    hit = ranks[..., None] == jnp.arange(k, dtype=jnp.int32)  # (..., 64, K)
    dense = jnp.sum(vals[..., None, :] * hit, axis=-1) * bits.astype(jnp.float32)
    return dense.reshape(dense.shape[:-1] + (8, 8))


def unpack_fields(f: dict, fmt: str):
    """Decompress a split packed batch to dense (y, c) quantized coefficients
    under any wire format (see ``data.loader.packed_layout``)."""
    unpack = unpack_coefficients if fmt == "index" else unpack_coefficients_mask
    y = unpack(f["vy"], f["iy"], f["sy"])
    c = unpack(f["vc"], f["ic"], f["sc"])
    if fmt in ("mask16", "mask16w", "mask16q"):  # exact int16 DC plane
        y = y.at[..., 0, 0].set(f["dy"].astype(jnp.float32))
        c = c.at[..., 0, 0].set(f["dc"].astype(jnp.float32))
    return y, c


def unpack_cropped(f: dict, fmt: str):
    """Unpack a crop-before-pack wire to DEQUANTIZED coefficients.

    ``mask16``/``mask16w`` carry dequantized values directly; ``mask16q``
    carries JPEG quantized-unit integers (host ``requant_plane``) and is
    multiplied back by the per-sample quant table here — the same on-device
    dequantize (+ reference clamp) the full-canvas packed path uses.
    """
    y, c = unpack_fields(f, fmt)
    if fmt == "mask16q":
        y, c = dequantize(y, c, f["quant"])
    return y, c


def make_packed_rgb_decode(canvas: int = 64, k: int = 63, fmt: str = "mask16"):
    """Packed coefficient buffer -> RGB pixel batch, fully on-device.

    The RGB domain's answer to transfer compression: instead of shipping
    decoded (B, 3, 8*canvas, 8*canvas) uint8 canvases (786 KB/img at 512px),
    ship the same sparse-packed DCT coefficients as the DCT domain and run
    the JPEG tail decode (IDCT + fancy chroma upsample + YCbCr->RGB, see
    ``ops.pixel_decode``) as jitted matmul work on the device.  The default
    ``mask16`` format at full AC spectrum (K=63) is 1.7x fewer bytes and
    near-lossless (exact DC, AC scale almost always 1); smaller K trades
    high-frequency pixel fidelity for more speed.

    Returns ``fn(packed_buf) -> (pixels f32 (B, 3, H, W), labels, weights)``.
    """
    from rgbnomore_tpu.ops.pixel_decode import decode_rgb_pixels

    def decode(packed_buf):
        f = split_packed_batch(packed_buf, canvas, k, fmt)
        y, c = unpack_fields(f, fmt)
        y, c = dequantize(y, c, f["quant"])
        return decode_rgb_pixels(y, c), f["labels"], f["weights"]

    return decode


def make_rgb_cropped_train_pipeline(cfg=None, *, size: int = 224, k: int = 63,
                                    auglist=None, num_ops: int = 2,
                                    magnitude: int = 10, fill: float = 128.0,
                                    out_dtype=None):
    """RGB crop-before-pack train pipeline: fixed-window wire -> JPEG tail
    decode -> residual bilinear resample -> HFlip -> RandAugment -> [-1, 1].

    The host already sampled the reference's pixel-granular RandomResizedCrop
    box (``datasets.py:320``) and shipped only the block-aligned covering
    window, pre-downsampled per axis by f in {1, 2, 4}
    (``codec.read_rgb_crop_pack_row``); the wire's ``geom`` float4 carries the
    residual fractional box, applied here with the same antialiased-bilinear
    resampler the full-canvas path uses — so f=1 windows reproduce the dense
    path's crop EXACTLY, and f>1 differ only by the spectral prefilter.

    Returns ``fn(rng, packed_buf) -> (img (B,3,size,size), labels, weights)``.
    """
    import jax.numpy as jnp

    from rgbnomore_tpu.augment.rgb import (
        RandAugmentRGB,
        _apply_separable_rgb,
        _resample_matrix,
    )
    from rgbnomore_tpu.ops.pixel_decode import decode_rgb_pixels

    if cfg is not None:
        size = cfg.model.input_size
        auglist = list(cfg.train.auglist)
        num_ops = cfg.train.num_ops
        magnitude = cfg.train.augstr
    window = size // 8
    aug = RandAugmentRGB(ops_list=list(auglist or []), num_ops=num_ops,
                         magnitude=magnitude, image_hw=(size, size), fill=fill)

    def pipeline(rng, packed_buf):
        f = split_packed_batch(packed_buf, window, k, "mask16", geom=True)
        y, c = unpack_fields(f, "mask16")  # wire carries DEQUANTIZED coeffs
        img = decode_rgb_pixels(y, c)  # (B, 3, size, size) f32 pixels
        g = f["geom"]
        m_h = jax.vmap(lambda a, s: _resample_matrix(a, s, size, size))(g[:, 0], g[:, 1])
        m_w = jax.vmap(lambda a, s: _resample_matrix(a, s, size, size))(g[:, 2], g[:, 3])
        img = _apply_separable_rgb(img, m_h, m_w)
        k_flip, k_aug = jax.random.split(rng)
        flip = jax.random.bernoulli(k_flip, 0.5, (img.shape[0],))
        img = jnp.where(flip[:, None, None, None], jnp.flip(img, axis=-1), img)
        img = aug(k_aug, img)
        img = (img / 255.0 * 2.0 - 1.0).astype(out_dtype or jnp.float32)
        return img, f["labels"], f["weights"]

    return pipeline


def make_rgb_cropped_eval_pipeline(cfg=None, *, size: int = 224, k: int = 63,
                                   out_dtype=None):
    """Eval twin: the host shipped the Resize+CenterCrop (or swin whole-image)
    source box; only the residual resample + range map run here."""
    import jax.numpy as jnp

    from rgbnomore_tpu.augment.rgb import _apply_separable_rgb, _resample_matrix
    from rgbnomore_tpu.ops.pixel_decode import decode_rgb_pixels

    if cfg is not None:
        size = cfg.model.input_size
    window = size // 8

    def pipeline(packed_buf):
        f = split_packed_batch(packed_buf, window, k, "mask16", geom=True)
        y, c = unpack_fields(f, "mask16")
        img = decode_rgb_pixels(y, c)
        g = f["geom"]
        m_h = jax.vmap(lambda a, s: _resample_matrix(a, s, size, size))(g[:, 0], g[:, 1])
        m_w = jax.vmap(lambda a, s: _resample_matrix(a, s, size, size))(g[:, 2], g[:, 3])
        img = _apply_separable_rgb(img, m_h, m_w)
        img = (img / 255.0 * 2.0 - 1.0).astype(out_dtype or jnp.float32)
        return img, f["labels"], f["weights"]

    return pipeline


def dequantize(y_q: jax.Array, c_q: jax.Array, quant: jax.Array):
    """Dequantize int16 coefficient canvases with per-sample quant tables.

    ``y_q`` (B, 1, H, W, 8, 8) int16, ``c_q`` (B, 2, H/2, W/2, 8, 8) int16,
    ``quant`` (B, 3, 8, 8) int16.  Multiplies and clamps to [-1024, 1016] as
    the reference loader does (``datasets.py:286-297``).
    """
    qy = quant[:, 0:1, None, None].astype(jnp.float32)
    qc = quant[:, 1:3, None, None].astype(jnp.float32)
    y = jnp.clip(y_q.astype(jnp.float32) * qy, DCT_MIN, DCT_MAX)
    c = jnp.clip(c_q.astype(jnp.float32) * qc, DCT_MIN, DCT_MAX)
    return y, c


def to_range(
    x: jax.Array,
    val_min: float = -1.0,
    val_max: float = 1.0,
    orig_min: float = DCT_MIN,
    orig_max: float = DCT_MAX,
    dtype=jnp.float32,
) -> jax.Array:
    """Affine rescale (``custom_transforms.py:406-466``)."""
    x = (x.astype(jnp.float32) - orig_min) / (orig_max - orig_min)
    return (val_min + x * (val_max - val_min)).astype(dtype)


def random_flip(rng: jax.Array, y: jax.Array, c: jax.Array, p: float = 0.5):
    """Per-sample horizontal flip (``custom_transforms.py:913-942``)."""
    flip = jax.random.bernoulli(rng, p, (y.shape[0],))
    fy = blocks.flip_dct(y, "horizontal")
    fc = blocks.flip_dct(c, "horizontal")
    sel = flip.reshape(-1, 1, 1, 1, 1, 1)
    return jnp.where(sel, fy, y), jnp.where(sel, fc, c)


def make_train_pipeline(
    cfg=None,
    *,
    target: int = 28,
    canvas: int = 64,
    auglist: list[str] | None = None,
    num_ops: int = 2,
    magnitude: int = 3,
    out_dtype=jnp.float32,
    packed: bool = False,
    packed_fmt: str = "mask",
    packed_k: int = 16,
) -> Callable:
    """Build the jitted train input pipeline.

    Dense: ``fn(rng, y_q, c_q, quant)``.  ``packed=True``: ``fn(rng, batch)``
    where ``batch`` carries the sparse top-K fields (vy/iy/sy/vc/ic/sc/quant).
    Matches the ``imagenet_dct`` train chain (``datasets.py:354-361``):
    RandomResizedCrop(target, scale .05-1, ratio 1:1) -> HFlip ->
    RandAugment(num_ops, magnitude) -> ToRange(-1, 1).
    """
    if cfg is not None:
        target = cfg.model.dct_blocks
        auglist = list(cfg.train.auglist)
        num_ops = cfg.train.num_ops
        magnitude = cfg.train.augstr
    rrc = make_random_resized_crop(target, canvas)
    aug = RandAugmentDCT(
        ops_list=list(auglist or []), num_ops=num_ops, magnitude=magnitude, grid=target
    )

    def tail(rng, y, c, quant):
        k_crop, k_flip, k_aug = jax.random.split(rng, 3)
        y, c = dequantize(y, c, quant)
        y, c = rrc(k_crop, y, c)
        y, c = random_flip(k_flip, y, c)
        y, c = aug(k_aug, y, c)
        return to_range(y, dtype=out_dtype), to_range(c, dtype=out_dtype)

    if packed:

        def pipeline(rng, packed_buf, k: int = packed_k):
            f = split_packed_batch(packed_buf, canvas, k, packed_fmt)
            y, c = unpack_fields(f, packed_fmt)
            out_y, out_c = tail(rng, y, c, f["quant"])
            return out_y, out_c, f["labels"], f["weights"]

        return pipeline

    return lambda rng, y_q, c_q, quant: tail(rng, y_q, c_q, quant)


def make_cropped_train_pipeline(
    cfg=None,
    *,
    target: int = 28,
    auglist: list[str] | None = None,
    num_ops: int = 2,
    magnitude: int = 3,
    out_dtype=jnp.float32,
    k: int = 16,
    fmt: str = "mask16",
    fused: bool | None = False,
    fused_interpret: bool | None = None,
) -> Callable:
    """Train pipeline for the crop-before-pack wire (``DctCroppedLoader``).

    The host already dequantized, cropped and resized to the target grid
    (``codec.read_crop_resize_pack``), so the device path is just
    unpack -> flip -> RandAugment -> ToRange — no dequant, no crop matmuls.
    ``fn(rng, packed_buf) -> (y, cbcr, labels, weights)``.

    ``fused`` selects the single-pass Pallas flip+RandAugment+ToRange kernel
    (``ops/pallas/augpipe.py``); ``None`` auto-enables it on TPU when every
    op in the list is kernel-supported.  Both paths consume the SAME
    ``draw_policy`` randomness, so they apply identical augmentations.
    """
    if cfg is not None:
        target = cfg.model.dct_blocks
        auglist = list(cfg.train.auglist)
        num_ops = cfg.train.num_ops
        magnitude = cfg.train.augstr
    ops_list = list(auglist or [])
    aug = RandAugmentDCT(
        ops_list=ops_list, num_ops=num_ops, magnitude=magnitude, grid=target
    )
    if fused is None:
        from rgbnomore_tpu.ops.pallas.augpipe import SUPPORTED_OPS

        fused = (
            jax.default_backend() == "tpu"
            and bool(ops_list)
            and num_ops > 0
            and set(ops_list) <= SUPPORTED_OPS
        )

    if fused_interpret is None:
        # explicit fused=True off-TPU falls back to interpret mode so the
        # fused path stays testable/drivable on CPU
        fused_interpret = jax.default_backend() != "tpu"

    if fused:
        from rgbnomore_tpu.ops.pallas.augpipe import fused_flip_aug_range

        def pipeline(rng, packed_buf):
            k_flip, k_aug = jax.random.split(rng)
            f = split_packed_batch(packed_buf, target, k, fmt)
            y, c = unpack_cropped(f, fmt)
            flip = jax.random.bernoulli(k_flip, 0.5, (y.shape[0],))
            policy = aug.draw_policy(k_aug, y.shape[0], y.shape[2], y.shape[3])
            y, c = fused_flip_aug_range(
                y, c, policy, flip, ops_list=ops_list, num_ops=num_ops,
                magnitude=magnitude, out_dtype=out_dtype,
                interpret=fused_interpret,
            )
            return y, c, f["labels"], f["weights"]

        return pipeline

    def pipeline(rng, packed_buf):
        k_flip, k_aug = jax.random.split(rng)
        f = split_packed_batch(packed_buf, target, k, fmt)
        y, c = unpack_cropped(f, fmt)  # dequantized floats
        y, c = random_flip(k_flip, y, c)
        y, c = aug(k_aug, y, c)
        return (to_range(y, dtype=out_dtype), to_range(c, dtype=out_dtype),
                f["labels"], f["weights"])

    return pipeline


def make_cropped_eval_pipeline(
    cfg=None,
    *,
    target: int = 28,
    out_dtype=jnp.float32,
    k: int = 16,
    fmt: str = "mask16",
) -> Callable:
    """Eval pipeline for the crop-before-pack wire: the host already did the
    deterministic center-crop (ViT) / full resize (swin), so the device just
    unpacks and rescales.  ``fn(packed_buf) -> (y, cbcr, labels, weights)``."""
    if cfg is not None:
        target = cfg.model.dct_blocks

    def pipeline(packed_buf):
        f = split_packed_batch(packed_buf, target, k, fmt)
        y, c = unpack_cropped(f, fmt)
        return (to_range(y, dtype=out_dtype), to_range(c, dtype=out_dtype),
                f["labels"], f["weights"])

    return pipeline


def make_eval_pipeline(
    cfg=None,
    *,
    target: int = 28,
    canvas: int = 64,
    swin: bool = False,
    out_dtype=jnp.float32,
    packed: bool = False,
    packed_fmt: str = "mask",
    packed_k: int = 16,
) -> Callable:
    """Build the jitted eval pipeline (dense ``fn(y_q, c_q, quant)`` or packed
    ``fn(batch)``).

    ViT: ResizedCenterCrop(32 -> 28) (``datasets.py:364``); Swin: full resize
    to 32 (``datasets.py:381``).  Then ToRange(-1, 1).
    """
    if cfg is not None:
        target = cfg.model.dct_blocks
        swin = cfg.model.arch == "swinv2"
    if swin:
        crop = make_full_resize(target, canvas)
    else:
        crop = make_center_crop_resize(target + 4, target, canvas)

    def tail(y, c, quant):
        y, c = dequantize(y, c, quant)
        y, c = crop(y, c)
        return to_range(y, dtype=out_dtype), to_range(c, dtype=out_dtype)

    if packed:

        def pipeline(packed_buf, k: int = packed_k):
            f = split_packed_batch(packed_buf, canvas, k, packed_fmt)
            y, c = unpack_fields(f, packed_fmt)
            out_y, out_c = tail(y, c, f["quant"])
            return out_y, out_c, f["labels"], f["weights"]

        return pipeline

    return tail
