"""Arbitrary-angle rotate / shear of DCT coefficients, plus the affine
resampler they are built on.

The reference routes these ops through a global DFT and a torchvision
``rotate``/``affine`` on the real/imag planes (``utils/dct_ops.py:367-434``,
``:957-1013``; ``utils/dct_torch_utils.py:232-321``).  Here the resampler is a
pure-JAX gather (vectorized, fully fused by XLA); matrix conventions replicate
torchvision's ``_get_inverse_affine_matrix`` so results are comparable.

These ops take *static* (Python float) angles — in RandAugment only the sign
of the magnitude is random, so the batched policy dispatches over the two
precompiled ±magnitude branches.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rgbnomore_tpu.ops.blocks import (
    blockshift,
    combine_blocks_dft,
    decompose_blocks_dft,
    iblockshift,
    rotate_dct_90deg,
)

__all__ = [
    "inverse_affine_matrix",
    "affine_resample",
    "rotate_image",
    "shear_image",
    "rotate_dft_2d_spatial",
    "shear_dft_2d_spatial",
    "rotate_block",
    "shear_block",
]


def inverse_affine_matrix(
    angle: float,
    translate=(0.0, 0.0),
    scale: float = 1.0,
    shear=(0.0, 0.0),
    center=(0.0, 0.0),
):
    """Inverse affine matrix mapping output pixel coords -> input pixel coords.

    Matches torchvision's convention (angle degrees counter-clockwise, shear
    in degrees, rotation about ``center`` in pixel-index units).
    Returns the 6-tuple ``(a, b, c, d, e, f)`` for
    ``x_in = a*x + b*y + c;  y_in = d*x + e*y + f``.
    """
    rot = math.radians(angle)
    sx = math.radians(shear[0])
    sy = math.radians(shear[1])
    cx, cy = center
    tx, ty = translate

    # Inverse of rotation-with-shear (RSS) matrix, following torchvision.
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)

    m = [d / scale, -b / scale, 0.0, -c / scale, a / scale, 0.0]
    m[2] += m[0] * (-cx - tx) + m[1] * (-cy - ty)
    m[5] += m[3] * (-cx - tx) + m[4] * (-cy - ty)
    m[2] += cx
    m[5] += cy
    return tuple(m)


def affine_resample(img: jax.Array, matrix, interpolation: str = "nearest",
                    fill: float = 0.0) -> jax.Array:
    """Resample ``img (..., H, W)`` through an inverse affine map.

    ``matrix`` is the 6-tuple from :func:`inverse_affine_matrix` in pixel-index
    units (x = column, y = row); out-of-bounds samples take ``fill``.
    """
    h, w = img.shape[-2], img.shape[-1]
    a, b, c, d, e, f = matrix
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x_in = a * xs + b * ys + c
    y_in = d * xs + e * ys + f

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[..., yc, xc]
        return jnp.where(inb, vals, fill)

    if interpolation == "nearest":
        # grid_sample 'nearest' truncates after a half-pixel shift equivalent
        # to rounding toward nearest integer index.
        xi = jnp.floor(x_in + 0.5).astype(jnp.int32)
        yi = jnp.floor(y_in + 0.5).astype(jnp.int32)
        return gather(yi, xi)
    elif interpolation == "bilinear":
        x0 = jnp.floor(x_in)
        y0 = jnp.floor(y_in)
        wx = x_in - x0
        wy = y_in - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x0i + 1)
        v10 = gather(y0i + 1, x0i)
        v11 = gather(y0i + 1, x0i + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy
    raise ValueError(f"Unknown interpolation: {interpolation}")


def rotate_image(img: jax.Array, degrees: float, interpolation: str = "nearest",
                 fill: float = 0.0) -> jax.Array:
    """Counter-clockwise rotation about the image center (torchvision ``rotate``)."""
    h, w = img.shape[-2], img.shape[-1]
    center = ((w - 1) * 0.5, (h - 1) * 0.5)
    m = inverse_affine_matrix(-degrees, center=center)
    return affine_resample(img, m, interpolation, fill)


def shear_image(img: jax.Array, deg_x: float = 0.0, deg_y: float = 0.0,
                interpolation: str = "nearest", fill: float = 0.0) -> jax.Array:
    """Shear about the image center (torchvision ``affine(shear=[x, y])``)."""
    h, w = img.shape[-2], img.shape[-1]
    center = ((w - 1) * 0.5, (h - 1) * 0.5)
    m = inverse_affine_matrix(0.0, shear=(deg_x, deg_y), center=center)
    return affine_resample(img, m, interpolation, fill)


def rotate_dft_2d_spatial(dft: jax.Array, degrees: float) -> jax.Array:
    """Rotate a DFT spectrum spatially: fftshift, rotate re/im, ifftshift.

    The sign flip matches the reference so positive angles rotate the image
    counter-clockwise (``utils/dct_torch_utils.py:232-265``).
    """
    shifted = jnp.fft.fftshift(dft, axes=(-2, -1))
    rot_re = rotate_image(shifted.real, -degrees)
    rot_im = rotate_image(shifted.imag, -degrees)
    return jnp.fft.ifftshift(rot_re + 1j * rot_im, axes=(-2, -1))


def shear_dft_2d_spatial(dft: jax.Array, deg_x: float = 0.0, deg_y: float = 0.0) -> jax.Array:
    """Shear a DFT spectrum spatially (``utils/dct_torch_utils.py:267-321``)."""
    shifted = jnp.fft.fftshift(dft, axes=(-2, -1))
    sh_re = shear_image(shifted.real, deg_x, deg_y)
    sh_im = shear_image(shifted.imag, deg_x, deg_y)
    return jnp.fft.ifftshift(sh_re + 1j * sh_im, axes=(-2, -1))


def _tukey_window(n: int, alpha: float = 0.4) -> jax.Array:
    """Tukey (tapered cosine) window, scipy.signal.windows.tukey semantics."""
    x = jnp.linspace(0.0, 1.0, n)
    w = jnp.ones((n,))
    edge = alpha / 2.0
    rise = 0.5 * (1.0 + jnp.cos(jnp.pi * (2.0 * x / alpha - 1.0)))
    fall = 0.5 * (1.0 + jnp.cos(jnp.pi * (2.0 * x / alpha - 2.0 / alpha + 1.0)))
    w = jnp.where(x < edge, rise, w)
    return jnp.where(x >= 1.0 - edge, fall, w)


def _apply_window(coeff: jax.Array, hp: int, wp: int, alpha: float = 0.4) -> jax.Array:
    """Per-block-grid tukey taper (the reference's ``window=True`` option,
    ``utils/dct_ops.py:399-403``)."""
    win = _tukey_window(hp, alpha)[:, None] * _tukey_window(wp, alpha)[None, :]
    shape = [1] * coeff.ndim
    shape[-4], shape[-3] = hp, wp
    return coeff * win.reshape(shape)


def _pad_grid(coeff: jax.Array, pad: float | None):
    """Zero-pad the block grid by factor ``pad`` (centered); returns margins."""
    if not pad:
        return coeff, 0, 0, coeff.shape[-4], coeff.shape[-3]
    h, w = coeff.shape[-4], coeff.shape[-3]
    hp = int(h * pad // 1)
    wp = int(w * pad // 1)
    hm = (hp - h) // 2
    wm = (wp - w) // 2
    pads = [(0, 0)] * (coeff.ndim - 4) + [(hm, hp - h - hm), (wm, wp - w - wm), (0, 0), (0, 0)]
    return jnp.pad(coeff, pads), hm, wm, h, w


def rotate_block(coeff: jax.Array, degrees: float = 45.0, pad: float | None = None,
                 window: bool = False) -> jax.Array:
    """Rotate DCT coefficients by ``degrees`` counter-clockwise.

    Lossless 90-degree multiples are factored out first so the lossy DFT
    rotation stays within +-45 degrees; then blockshift -> global DFT ->
    spatial rotate -> decompose -> unshift.  Reference:
    ``utils/dct_ops.py:367-434``.
    """
    padded, hm, wm, h, w = _pad_grid(coeff, pad)
    hp, wp = padded.shape[-4], padded.shape[-3]
    kh, kw = padded.shape[-2], padded.shape[-1]
    if window:
        padded = _apply_window(padded, hp, wp)

    sign = 1.0 if degrees == 0 else degrees / abs(degrees)
    deg_remainder = sign * (abs(degrees) % 360.0)
    deg_shifted = (deg_remainder + 360.0 + 45.0) % 360.0
    rot90s = int(deg_shifted // 90.0)
    deg_leftover = -((rot90s * 90.0) - (deg_shifted - 45.0))

    x = rotate_dct_90deg(padded, rotate=rot90s)
    x = blockshift(x, axes=(-4, -3))
    dft = combine_blocks_dft(x)
    dft = rotate_dft_2d_spatial(dft, deg_leftover)
    x = decompose_blocks_dft(dft, hp, wp, kh, kw)
    x = iblockshift(x, axes=(-4, -3))

    if pad:
        hax = x.ndim - 4
        x = jax.lax.slice_in_dim(x, hm, hm + h, axis=hax)
        x = jax.lax.slice_in_dim(x, wm, wm + w, axis=hax + 1)
    return x


def shear_block(coeff: jax.Array, deg_x: float = 0.0, deg_y: float = 0.0,
                pad: float | None = None, window: bool = False) -> jax.Array:
    """Shear DCT coefficients via the global-DFT route.

    Reference: ``utils/dct_ops.py:957-1013``.
    """
    padded, hm, wm, h, w = _pad_grid(coeff, pad)
    hp, wp = padded.shape[-4], padded.shape[-3]
    kh, kw = padded.shape[-2], padded.shape[-1]
    if window:
        padded = _apply_window(padded, hp, wp)

    x = blockshift(padded, axes=(-4, -3))
    dft = combine_blocks_dft(x)
    dft = shear_dft_2d_spatial(dft, deg_x, deg_y)
    x = decompose_blocks_dft(dft, hp, wp, kh, kw)
    x = iblockshift(x, axes=(-4, -3))

    if pad:
        hax = x.ndim - 4
        x = jax.lax.slice_in_dim(x, hm, hm + h, axis=hax)
        x = jax.lax.slice_in_dim(x, wm, wm + w, axis=hax + 1)
    return x
