"""Photometric DCT-domain augmentation primitives.

Each function operates on a single sample laid out ``(C, H, W, KH, KW)`` in
float32 and is jit/vmap-safe; magnitudes may be traced scalars (so the batched
RandAugment policy can feed per-sample magnitudes).  Batch them with
``jax.vmap`` — per-sample reductions (mean / min / max / histogram) then apply
per sample exactly as the reference does per image.

Semantics mirror ``utils/dct_ops.py`` (cited per function).  Values stay in
float32 throughout; the reference's int16 round-trips are intentionally not
replicated (documented divergence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DCT_MIN = -1024.0  # -2**10
DCT_MAX = 1016.0  # 2**10 - 8

__all__ = [
    "DCT_MIN",
    "DCT_MAX",
    "clamp_dct",
    "invert_dct",
    "solarize_dct",
    "solarize_add_dct",
    "sharpblur_dct",
    "midfreqaug_dct",
    "translate_dct",
    "cutout_dct",
    "brightness_dct",
    "contrast_dct",
    "autocontrast_dct",
    "posterize_dct",
    "equalize_dct",
    "freq_enhance_dct",
]


def clamp_dct(coeff: jax.Array) -> jax.Array:
    """Clamp to the 8-bit dequantized DCT range ``[-1024, 1016]``."""
    return jnp.clip(coeff, DCT_MIN, DCT_MAX)


def _set_dc(coeff: jax.Array, dc: jax.Array) -> jax.Array:
    return coeff.at[..., 0, 0].set(dc)


def invert_dct(coeff: jax.Array) -> jax.Array:
    """Invert zero-centered coefficients (``utils/dct_ops.py:623-629``)."""
    return -coeff


def solarize_dct(coeff: jax.Array, threshold, mask: jax.Array | None = None):
    """Negate whole blocks whose DC exceeds ``threshold``.

    Returns ``(coeff, mask)`` so the luma mask can be reused (subsampled) for
    chroma, as in ``utils/dct_ops.py:631-651``.
    """
    dc = coeff[..., 0, 0]
    if mask is None:
        mask = dc > threshold
    out = jnp.where(mask[..., None, None], -coeff, coeff)
    return out, mask


def solarize_add_dct(coeff: jax.Array, addition, threshold=0.0, mask: jax.Array | None = None):
    """Add ``addition`` to DCs below ``threshold``; clamp (``utils/dct_ops.py:653-679``)."""
    dc = coeff[..., 0, 0]
    if mask is None:
        mask = dc < threshold
    dc = jnp.where(mask, dc + addition, dc)
    return clamp_dct(_set_dc(coeff, dc)), mask


def sharpblur_dct(coeff: jax.Array, intensity) -> jax.Array:
    """Sharpen (>0) / blur (<0) via a linear high-frequency ramp.

    ``filter = clamp(linspace(1, 1+2*intensity, K), 0)`` outer product over
    the 8x8 frequency axes (``utils/dct_ops.py:681-708``).
    """
    kh, kw = coeff.shape[-2], coeff.shape[-1]
    ramp_h = jnp.clip(1.0 + 2.0 * intensity * jnp.arange(kh, dtype=jnp.float32) / (kh - 1), 0.0)
    ramp_w = jnp.clip(1.0 + 2.0 * intensity * jnp.arange(kw, dtype=jnp.float32) / (kw - 1), 0.0)
    filt = ramp_h[:, None] * ramp_w[None, :]
    return clamp_dct(coeff * filt)


def _gaussian_window(n: int, std) -> jax.Array:
    """scipy.signal.windows.gaussian equivalent: exp(-0.5*((i-(n-1)/2)/std)^2)."""
    i = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
    return jnp.exp(-0.5 * jnp.square(i / std))


def midfreqaug_dct(coeff: jax.Array, intensity) -> jax.Array:
    """Mid-frequency sharpen/blur with a (block-shifted) gaussian window.

    Reference: ``utils/dct_ops.py:710-746``.
    """
    kh, kw = coeff.shape[-2], coeff.shape[-1]
    x = jnp.roll(coeff, (kh // 2, kw // 2), axis=(-2, -1))  # blockshift
    std_h = kh // 2 - (kh // 8 * 2.2) * jnp.abs(intensity)
    std_w = kw // 2 - (kw // 8 * 2.2) * jnp.abs(intensity)
    filt = _gaussian_window(kh, std_h)[:, None] * _gaussian_window(kw, std_w)[None, :]
    filt = jnp.where(intensity >= 0, 1.0 / filt, filt)
    x = clamp_dct(x * filt)
    return jnp.roll(x, (kh - kh // 2, kw - kw // 2), axis=(-2, -1))  # iblockshift


def translate_dct(coeff: jax.Array, magnitude, direction: str = "H") -> jax.Array:
    """Translate by ``magnitude`` blocks along H or W, zero-filling the gap.

    ``magnitude`` may be a traced int scalar.  Reference:
    ``utils/dct_ops.py:748-774``.
    """
    axis = coeff.ndim - 4 if direction == "H" else coeff.ndim - 3
    n = coeff.shape[axis]
    mag = jnp.asarray(magnitude, jnp.int32)
    out = jnp.roll(coeff, mag, axis=axis)
    idx_shape = [1] * coeff.ndim
    idx_shape[axis] = n
    idx = jnp.arange(n).reshape(idx_shape)
    keep = jnp.where(mag >= 0, idx >= mag, idx < n + mag)
    return jnp.where(keep, out, 0.0)


def cutout_dct(coeff: jax.Array, pad_size, center_h, center_w, replace=0.0) -> jax.Array:
    """Zero (or ``replace``) a ``2*pad_size`` square of blocks centered at
    ``(center_h, center_w)`` (``utils/dct_ops.py:776-815``).

    Unlike the reference, the random center is sampled by the caller (the
    batched policy passes per-sample centers from ``jax.random``).
    """
    h, w = coeff.shape[-4], coeff.shape[-3]
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    in_rows = (rows >= center_h - pad_size) & (rows < center_h + pad_size)
    in_cols = (cols >= center_w - pad_size) & (cols < center_w + pad_size)
    mask = in_rows[:, None] & in_cols[None, :]  # (H, W) True inside the hole
    shape = [1] * coeff.ndim
    shape[-4], shape[-3] = h, w
    mask = mask.reshape(shape)
    return jnp.where(mask, jnp.asarray(replace, coeff.dtype), coeff)


def brightness_dct(coeff: jax.Array, factor) -> jax.Array:
    """DC += mean(|DC|) * (factor - 1) (``utils/dct_ops.py:817-837``)."""
    dc = coeff[..., 0, 0]
    dc = dc + jnp.mean(jnp.abs(dc)) * (factor - 1.0)
    return _set_dc(coeff, dc)


def contrast_dct(coeff: jax.Array, factor) -> jax.Array:
    """DC *= factor; doubles as saturation on chroma (``utils/dct_ops.py:839-860``)."""
    return _set_dc(coeff, coeff[..., 0, 0] * factor)


def autocontrast_dct(coeff: jax.Array, vmin=DCT_MIN, vmax=DCT_MAX) -> jax.Array:
    """Rescale DCs so min -> vmin and max -> vmax (``utils/dct_ops.py:862-887``)."""
    dc = coeff[..., 0, 0]
    dc_min = jnp.min(dc)
    dc_max = jnp.max(dc)
    scale = (dc - dc_min) / jnp.where(dc_max == dc_min, 1.0, dc_max - dc_min)
    rescaled = vmin + scale * (vmax - vmin)
    dc_out = jnp.where(dc_max == dc_min, dc, rescaled)
    return _set_dc(coeff, dc_out)


def posterize_dct(coeff: jax.Array, bitoffset, vmin=DCT_MIN, vmax=DCT_MAX) -> jax.Array:
    """Quantize DCs by dropping ``bitoffset`` bits (``utils/dct_ops.py:889-914``).

    The reference's lookup table ``linspace(vmin, vmax, N+1)[round((dc-vmin)/2^b)]``
    with ``N = round((vmax-vmin)/2^b)`` is equivalent to the closed form
    ``vmin + round((dc-vmin)/2^b) * (vmax-vmin)/N`` — traced-friendly.
    """
    step = jnp.exp2(jnp.asarray(bitoffset, jnp.float32))
    n = jnp.round((vmax - vmin) / step)
    dc = coeff[..., 0, 0]
    idx = jnp.round((dc - vmin) / step)
    dc_out = vmin + idx * (vmax - vmin) / jnp.maximum(n, 1.0)
    return _set_dc(coeff, dc_out)


def _equalize_channel_dc(dc: jax.Array, vmin: float, vmax: float) -> jax.Array:
    """Histogram-equalize one channel's DC plane (``utils/dct_ops.py:916-941``)."""
    nbins = int(vmax - vmin) + 1  # 2041 integer bins, CPU-bincount semantics
    idx = jnp.clip(jnp.round(dc - vmin), 0, nbins - 1).astype(jnp.int32)
    hist = jnp.zeros((nbins,), jnp.float32).at[idx.reshape(-1)].add(1.0)
    total = jnp.sum(hist)
    first_nonzero = jnp.argmax(hist > 0)
    cdf_min = hist[first_nonzero]
    denom = jnp.maximum(total - cdf_min, 1.0)
    cdf = jnp.cumsum(hist)
    equalized = jnp.round((cdf - cdf_min) / denom * (vmax - vmin - 1.0))
    return equalized[idx] + vmin


def equalize_dct(coeff: jax.Array, vmin=DCT_MIN, vmax=DCT_MAX) -> jax.Array:
    """Per-channel histogram equalization of the DC plane.

    Reference: ``utils/dct_ops.py:943-955``.  Channel count is static, so a
    Python loop unrolls cleanly under jit.
    """
    dc = coeff[..., 0, 0]
    chans = [_equalize_channel_dc(dc[c], vmin, vmax) for c in range(coeff.shape[0])]
    return _set_dc(coeff, jnp.stack(chans, axis=0))


def freq_enhance_dct(coeff: jax.Array, magnitude) -> jax.Array:
    """Multiply every AC coefficient by ``magnitude`` (``utils/dct_ops.py:1015-1035``)."""
    kh, kw = coeff.shape[-2], coeff.shape[-1]
    ac_mask = jnp.ones((kh, kw), bool).at[0, 0].set(False)
    return jnp.where(ac_mask, coeff * magnitude, coeff)
