"""On-device JPEG tail decode: DCT coefficients -> RGB pixels, as matmuls.

The reference decodes RGB images on the host with PIL/libjpeg per worker
(``datasets.py:286``, ``custom_transforms.py:1140-1171``).  On TPU the
inverse DCT is just two 8x8 matmuls per block — MXU work — so the RGB domain
can ride the exact same sparse-packed coefficient transfer as the DCT domain
(3-5x fewer host->device bytes than shipping decoded pixel canvases) and
reconstruct pixels on-device inside the jitted input pipeline.

Each stage follows libjpeg's decode semantics so the output matches a host
``codec.read_jpeg`` within +-3 gray levels (its fixed-point IDCT vs our f32
one; the upsample and color-convert stages are integer-exact):

- ``idct_plane``     — float IDCT + level shift + range limit (jidctint.c's
                       contract; we use the orthonormal basis, not AAN).
- ``fancy_upsample_2x`` — jdsample.c ``h2v2_fancy_upsample``: triangular
                       3:1 filter with libjpeg's exact integer rounding.
- ``ycbcr_to_rgb_pixels`` — jdcolor.c ``ycc_rgb_convert`` constants.
- ``decode_rgb_pixels``  — the full chain on dequantized (Y, CbCr) batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rgbnomore_tpu.ops.basis import dct_basis_matrix

__all__ = [
    "idct_plane",
    "fancy_upsample_2x",
    "ycbcr_to_rgb_pixels",
    "decode_rgb_pixels",
]

_HIGHEST = jax.lax.Precision.HIGHEST


def idct_plane(coeff: jax.Array) -> jax.Array:
    """Dequantized coefficient blocks (..., H, W, 8, 8) -> samples
    (..., 8H, 8W), level-shifted (+128), rounded, range-limited to [0, 255].

    ``x = A^T C A`` with the orthonormal DCT-II analysis matrix ``A`` —
    float-exact counterpart of libjpeg's fixed-point ``jpeg_idct_islow``.
    """
    a = jnp.asarray(dct_basis_matrix(8), jnp.float32)
    x = jnp.einsum("ij,...jk,kl->...il", a.T, coeff.astype(jnp.float32), a,
                   precision=_HIGHEST)
    *lead, h, w, _, _ = x.shape
    x = jnp.moveaxis(x, -2, -3).reshape(*lead, h * 8, w * 8)
    return jnp.clip(jnp.round(x + 128.0), 0.0, 255.0)


def fancy_upsample_2x(plane: jax.Array) -> jax.Array:
    """libjpeg ``h2v2_fancy_upsample`` (jdsample.c): 2x triangular upsample.

    Input (..., h, w) integer-valued samples; output (..., 2h, 2w).  Per
    output pixel the 4 nearest input samples are weighted 9:3:3:1 with
    libjpeg's exact rounding: vertical pass ``cs = 3*near + far`` (edge rows
    replicate), horizontal pass ``even = (3*cs + cs_left + 8) >> 4``,
    ``odd = (3*cs + cs_right + 7) >> 4`` (edge columns replicate).
    """
    p = plane.astype(jnp.int32)
    up = jnp.concatenate([p[..., :1, :], p[..., :-1, :]], axis=-2)
    down = jnp.concatenate([p[..., 1:, :], p[..., -1:, :]], axis=-2)
    cs_even = 3 * p + up      # output rows 2i
    cs_odd = 3 * p + down     # output rows 2i+1
    cs = jnp.stack([cs_even, cs_odd], axis=-2)  # (..., h, 2, w)
    *lead, h, _, w = cs.shape
    cs = cs.reshape(*lead, 2 * h, w)
    left = jnp.concatenate([cs[..., :1], cs[..., :-1]], axis=-1)
    right = jnp.concatenate([cs[..., 1:], cs[..., -1:]], axis=-1)
    out_even = (3 * cs + left + 8) >> 4   # output cols 2j
    out_odd = (3 * cs + right + 7) >> 4   # output cols 2j+1
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(*lead, 2 * h, 2 * w)
    return out.astype(jnp.float32)


def ycbcr_to_rgb_pixels(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """jdcolor.c ``ycc_rgb_convert``, bit-exact: planes (..., H, W) in
    [0, 255] -> (..., 3, H, W) clipped RGB.

    Uses libjpeg's 16.16 fixed-point constants and arithmetic-shift rounding
    (``FIX(x) = round(x * 65536)``, ``ONE_HALF`` added once per table), so
    given identical input samples the output bytes match libjpeg exactly.
    """
    yi = y.astype(jnp.int32)
    cbi = cb.astype(jnp.int32) - 128
    cri = cr.astype(jnp.int32) - 128
    half = jnp.int32(32768)
    r = yi + ((jnp.int32(91881) * cri + half) >> 16)          # FIX(1.40200)
    g = yi + ((jnp.int32(-22554) * cbi                        # -FIX(0.34414)
               + jnp.int32(-46802) * cri + half) >> 16)       # -FIX(0.71414)
    b = yi + ((jnp.int32(116130) * cbi + half) >> 16)         # FIX(1.77200)
    rgb = jnp.stack([r, g, b], axis=-3)
    return jnp.clip(rgb, 0, 255).astype(jnp.float32)


def decode_rgb_pixels(y: jax.Array, c: jax.Array) -> jax.Array:
    """Dequantized batches ``y`` (B, 1, H, W, 8, 8), ``c`` (B, 2, H/2, W/2,
    8, 8) -> RGB pixels (B, 3, 8H, 8W) float32 with uint8 values.

    Grayscale sources arrive with zero chroma blocks (the loader's
    convention, ``datasets.py:291-293``), which decode to neutral Cb=Cr=128.
    Canvas area beyond the image decodes to BLACK — the mask16 packer
    pre-fills out-of-image Y DCs with -1024 — matching the dense RGB
    loader's zero-filled pixel canvases.
    """
    y_plane = idct_plane(y[:, 0])
    cb = fancy_upsample_2x(idct_plane(c[:, 0]))
    cr = fancy_upsample_2x(idct_plane(c[:, 1]))
    return ycbcr_to_rgb_pixels(y_plane, cb, cr)
