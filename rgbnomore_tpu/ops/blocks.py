"""Structural DCT-block operations: combine/decompose, resize, crop, flips.

All functions are pure JAX, operate on ``(..., H, W, KH, KW)`` coefficient
arrays (leading dims usually ``C`` or ``B, C``) and are jit/vmap-safe with
static shape arguments.  Behaviour mirrors the reference ops in
``utils/dct_ops.py`` (cited per-function) but computation stays in float
throughout — we do not round back to int16 between ops (a CPU-format artifact
of the reference), which is both faster on TPU and mathematically cleaner.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax
from einops import rearrange

from rgbnomore_tpu.ops.basis import (
    KSIZE,
    conversion_matrix,
    conversion_matrix_dft,
    resize_axis_operator,
)

__all__ = [
    "blockshift",
    "iblockshift",
    "combine_blocks",
    "decompose_blocks",
    "combine_blocks_dft",
    "decompose_blocks_dft",
    "upsample_dct",
    "downsample_dct",
    "resize_dct",
    "crop_dct",
    "flip_dct",
    "rotate_dct_90deg",
]


def blockshift(coeff: jax.Array, axes=(-2, -1)) -> jax.Array:
    """Roll so the origin moves to the center (fftshift-like).

    Reference: ``utils/dct_ops.py:62-77``.
    """
    h = coeff.shape[axes[0]]
    w = coeff.shape[axes[1]]
    return jnp.roll(coeff, (h // 2, w // 2), axis=axes)


def iblockshift(coeff: jax.Array, axes=(-2, -1)) -> jax.Array:
    """Inverse of :func:`blockshift`.  Reference: ``utils/dct_ops.py:79-96``."""
    h = coeff.shape[axes[0]]
    w = coeff.shape[axes[1]]
    return jnp.roll(coeff, (h - h // 2, w - w // 2), axis=axes)


def combine_blocks(coeff: jax.Array) -> jax.Array:
    """Merge the 8x8 block-DCT grid into one large global DCT coefficient map.

    ``(..., H, W, KH, KW) -> (..., H*KH, W*KW)``.
    Reference: ``utils/dct_ops.py:237-267``.
    """
    *_, h, w, kh, kw = coeff.shape
    conv_l = jnp.asarray(conversion_matrix(kh, h))
    conv_m = conv_l if (h == w and kh == kw) else jnp.asarray(conversion_matrix(kw, w))
    flat = rearrange(coeff.astype(jnp.float32), "... h w kh kw -> ... (h kh) (w kw)")
    out = jnp.einsum("ho,...ow->...hw", conv_l, flat, precision=lax.Precision.HIGHEST)
    out = jnp.einsum("...ho,wo->...hw", out, conv_m, precision=lax.Precision.HIGHEST)
    return out


def decompose_blocks(coeff: jax.Array, h: int, w: int, kh: int = KSIZE, kw: int = KSIZE) -> jax.Array:
    """Inverse of :func:`combine_blocks`: ``(..., H*KH, W*KW) -> (..., H, W, KH, KW)``.

    Reference: ``utils/dct_ops.py:269-301``.
    """
    conv_l = jnp.asarray(conversion_matrix(kh, h))
    conv_m = conv_l if (h == w and kh == kw) else jnp.asarray(conversion_matrix(kw, w))
    out = jnp.einsum("oh,...ow->...hw", conv_l, coeff.astype(jnp.float32), precision=lax.Precision.HIGHEST)
    out = jnp.einsum("...ho,ow->...hw", out, conv_m, precision=lax.Precision.HIGHEST)
    return rearrange(out, "... (h kh) (w kw) -> ... h w kh kw", kh=kh, kw=kw)


def combine_blocks_dft(coeff: jax.Array) -> jax.Array:
    """Merge block-DCT grid into one large global *DFT* coefficient map.

    Output is complex64 of shape ``(..., H*KH, W*KW)``.  The row transform is
    scaled by ``sqrt(H*KH)`` and the column transform by ``1/sqrt(W*KW)`` to
    match the reference convention (``utils/dct_ops.py:303-332``).
    """
    *_, h, w, kh, kw = coeff.shape
    conv_l = jnp.asarray(conversion_matrix_dft(kh, h))
    conv_m = conv_l if (h == w and kh == kw) else jnp.asarray(conversion_matrix_dft(kw, w))
    flat = rearrange(coeff.astype(jnp.complex64), "... h w kh kw -> ... (h kh) (w kw)")
    out = jnp.einsum("ho,...ow->...hw", conv_l, flat, precision=lax.Precision.HIGHEST) * math.sqrt(kh * h)
    out = jnp.einsum("...ho,wo->...hw", out, jnp.conj(conv_m), precision=lax.Precision.HIGHEST) / math.sqrt(kw * w)
    return out


def decompose_blocks_dft(coeff: jax.Array, h: int, w: int, kh: int = KSIZE, kw: int = KSIZE) -> jax.Array:
    """Inverse of :func:`combine_blocks_dft`; returns the real part (float32).

    Reference: ``utils/dct_ops.py:334-365``.
    """
    conv_l = jnp.asarray(conversion_matrix_dft(kh, h))
    conv_m = conv_l if (h == w and kh == kw) else jnp.asarray(conversion_matrix_dft(kw, w))
    out = jnp.einsum("oh,...ow->...hw", jnp.conj(conv_l), coeff.astype(jnp.complex64), precision=lax.Precision.HIGHEST) / math.sqrt(kh * h)
    out = jnp.einsum("...ho,ow->...hw", out, conv_m, precision=lax.Precision.HIGHEST) * math.sqrt(kw * w)
    return rearrange(out.real, "... (h kh) (w kw) -> ... h w kh kw", kh=kh, kw=kw)


def upsample_dct(coeff: jax.Array, l: int = 1, m: int = 1) -> jax.Array:
    """Upsample the block grid by ``l`` (H) x ``m`` (W).

    Each 8x8 block's spectrum is zero-padded to ``(l*8, m*8)`` (scaled by
    ``sqrt(l*m)``) and decomposed back into ``l x m`` 8x8 blocks.
    Reference: ``utils/dct_ops.py:436-482``.
    """
    if l == 1 and m == 1:
        return coeff.astype(jnp.float32)
    *_, h, w, kh, kw = coeff.shape
    conv_l = jnp.asarray(conversion_matrix(kh, l))
    conv_m = conv_l if (l == m and kh == kw) else jnp.asarray(conversion_matrix(kw, m))
    x = coeff.astype(jnp.float32) * math.sqrt(l * m)
    pad = [(0, 0)] * (x.ndim - 2) + [(0, (l - 1) * kh), (0, (m - 1) * kw)]
    x = jnp.pad(x, pad)
    x = jnp.einsum("ol,...om->...lm", conv_l, x, precision=lax.Precision.HIGHEST)  # conv_l.T @ x along rows
    x = jnp.einsum("...lo,om->...lm", x, conv_m, precision=lax.Precision.HIGHEST)
    return rearrange(x, "... h w (l kh) (m kw) -> ... (h l) (w m) kh kw", l=l, m=m)


def downsample_dct(coeff: jax.Array, l: int = 1, m: int = 1) -> jax.Array:
    """Downsample the block grid by ``l`` (H) x ``m`` (W).

    Groups of ``l x m`` blocks are combined into one large spectrum which is
    truncated to its lowest 8x8 coefficients (scaled by ``1/sqrt(l*m)``).
    Reference: ``utils/dct_ops.py:484-527``.
    """
    if l == 1 and m == 1:
        return coeff.astype(jnp.float32)
    *_, h, w, kh, kw = coeff.shape
    conv_l = jnp.asarray(conversion_matrix(kh, l))
    conv_m = conv_l if (l == m and kh == kw) else jnp.asarray(conversion_matrix(kw, m))
    x = rearrange(coeff.astype(jnp.float32), "... (h l) (w m) kh kw -> ... h w (l kh) (m kw)", l=l, m=m)
    x = jnp.einsum("lo,...om->...lm", conv_l, x, precision=lax.Precision.HIGHEST)
    x = jnp.einsum("...lo,mo->...lm", x, conv_m, precision=lax.Precision.HIGHEST)
    return x[..., :kh, :kw] / math.sqrt(l * m)


def resize_dct(coeff: jax.Array, size: int) -> jax.Array:
    """Resize the block grid to ``size x size`` via one matmul per axis.

    Equivalent to the reference's gcd-based upsample-then-downsample
    (``utils/dct_ops.py:529-580``) but the two stages are pre-composed into a
    dense per-axis operator (see ``basis.resize_axis_operator``), turning the
    whole resize into two MXU matmuls.
    """
    *lead, h, w, kh, kw = coeff.shape
    if h == size and w == size:
        return coeff.astype(jnp.float32)
    r_h = jnp.asarray(resize_axis_operator(h, size, kh))
    r_w = r_h if (h == w and kh == kw) else jnp.asarray(resize_axis_operator(w, size, kw))
    x = rearrange(coeff.astype(jnp.float32), "... h w kh kw -> ... (h kh) (w kw)")
    x = jnp.einsum("oh,...hw->...ow", r_h, x, precision=lax.Precision.HIGHEST)
    x = jnp.einsum("...hw,ow->...ho", x, r_w, precision=lax.Precision.HIGHEST)
    return rearrange(x, "... (h kh) (w kw) -> ... h w kh kw", kh=kh, kw=kw)


def crop_dct(coeff: jax.Array, top: int, left: int, height: int, width: int) -> jax.Array:
    """Crop ``height x width`` blocks at ``(top, left)``; out-of-range is zero-padded.

    ``top``/``left`` may be negative and the crop may extend past the edges,
    matching ``utils/dct_ops.py:584-599``.  ``height``/``width`` must be static.
    """
    *_, h, w, kh, kw = coeff.shape
    pad_top = max(-top, 0)
    pad_left = max(-left, 0)
    pad_bottom = max(top + height - h, 0)
    pad_right = max(left + width - w, 0)
    if pad_top or pad_left or pad_bottom or pad_right:
        axes_pad = [(0, 0)] * (coeff.ndim - 4) + [(pad_top, pad_bottom), (pad_left, pad_right), (0, 0), (0, 0)]
        coeff = jnp.pad(coeff, axes_pad)
        top += pad_top
        left += pad_left
    hax = coeff.ndim - 4
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(coeff, top, top + height, axis=hax), left, left + width, axis=hax + 1
    )


def flip_dct(coeff: jax.Array, direction: str = "horizontal", fixed_pos: bool = False) -> jax.Array:
    """Exact flip in the DCT domain.

    Flip the block grid, then negate odd-frequency columns (horizontal) or
    rows (vertical).  ``fixed_pos`` skips the grid flip (used inside 90-degree
    rotation).  Reference: ``utils/dct_ops.py:601-621``.
    """
    *_, h, w, kh, kw = coeff.shape
    hax = coeff.ndim - 4
    if direction == "horizontal":
        if not fixed_pos:
            coeff = jnp.flip(coeff, axis=hax + 1)
        sign = jnp.ones((kw,), dtype=coeff.dtype).at[1::2].set(-1)
        return coeff * sign
    elif direction == "vertical":
        if not fixed_pos:
            coeff = jnp.flip(coeff, axis=hax)
        sign = jnp.ones((kh, 1), dtype=coeff.dtype).at[1::2, :].set(-1)
        return coeff * sign
    raise ValueError(f"Unknown flip direction: {direction}")


def rotate_dct_90deg(coeff: jax.Array, rotate: int = 0) -> jax.Array:
    """Exact rotation by multiples of 90 degrees (counter-clockwise positive).

    Rotate the block grid, transpose each block, and apply the appropriate
    flip sign pattern.  Reference: ``utils/dct_ops.py:99-130``.
    """
    hax = coeff.ndim - 4
    grid_axes = (hax, hax + 1)
    r = rotate % 4
    if r == 0:
        return coeff
    if r == 3:  # 90 degrees clockwise
        out = jnp.rot90(coeff, k=-1, axes=grid_axes)
        out = jnp.swapaxes(out, -2, -1)
        return flip_dct(out, direction="horizontal", fixed_pos=True)
    if r == 2:  # 180 degrees
        out = flip_dct(coeff, direction="vertical")
        return flip_dct(out, direction="horizontal")
    # r == 1: 90 degrees counter-clockwise
    out = jnp.rot90(coeff, k=1, axes=grid_axes)
    out = jnp.swapaxes(out, -2, -1)
    return flip_dct(out, direction="vertical", fixed_pos=True)
