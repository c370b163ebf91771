"""Subblock conversion helpers shared by the DCT patch embeddings.

Mirrors the reference helpers ``patch2subblock`` / ``apply_subblock`` /
``patch2rearrange`` (``models/plainvit.py:19-88``): a patch larger than the
8x8 JPEG block is formed by *combining* adjacent blocks into one larger DCT
basis; a smaller patch by *decomposing* each 8x8 block into sub-blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from jax import lax

from rgbnomore_tpu.ops.basis import conversion_matrix

__all__ = ["patch_conversion", "apply_subblock", "group_blocks", "ungroup_blocks"]


def patch_conversion(patch_size: int, use_subblock: bool = True):
    """Conversion matrix + grouping factor for a patch size.

    Returns ``(convmat | None, patch_dim, combine)`` where ``patch_dim`` is
    how many blocks group per side (patch > 8) or how many sub-blocks an 8x8
    block splits into per side (patch < 8), and ``combine`` says which
    direction applies.
    """
    assert patch_size >= 2 and (patch_size & (patch_size - 1)) == 0, (
        f"Patch size must be a power of two >= 2, got {patch_size}"
    )
    if patch_size > 8:
        patch_dim = patch_size // 8
        conv = conversion_matrix(8, patch_dim) if use_subblock else None
        return conv, patch_dim, True
    if patch_size == 8:
        return None, 1, True
    patch_dim = 8 // patch_size
    if not use_subblock:
        raise ValueError("patch_size < 8 requires subblock conversion")
    return conversion_matrix(patch_size, patch_dim), patch_dim, False


def apply_subblock(coeff: jax.Array, convmat: np.ndarray | None, combine: bool = True) -> jax.Array:
    """Apply subblock conversion on the trailing two axes.

    ``combine=True``: project stacked small-block coefficients onto the large
    basis (``C x Cᵀ``); ``False``: the inverse (``Cᵀ x C``).
    Reference: ``models/plainvit.py:50-69``.
    """
    if convmat is None:
        return coeff
    m = jnp.asarray(convmat)
    if combine:
        out = jnp.einsum("io,...oj->...ij", m, coeff, precision=lax.Precision.HIGHEST)
        out = jnp.einsum("...io,oj->...ij", out, m.T, precision=lax.Precision.HIGHEST)
    else:
        out = jnp.einsum("io,...oj->...ij", m.T, coeff, precision=lax.Precision.HIGHEST)
        out = jnp.einsum("...io,oj->...ij", out, m, precision=lax.Precision.HIGHEST)
    return out


def group_blocks(coeff: jax.Array, patch_dim: int) -> jax.Array:
    """(B, C, H*pd, W*pd, k, k) -> (B, C, H, W, pd*k, pd*k): stack a pd x pd
    neighbourhood of blocks into one large block (``plainvit.py:83``)."""
    return rearrange(
        coeff, "b c (h pdh) (w pdw) p1 p2 -> b c h w (pdh p1) (pdw p2)", pdh=patch_dim, pdw=patch_dim
    )


def ungroup_blocks(coeff: jax.Array, patch_dim: int) -> jax.Array:
    """(B, C, H, W, pd*k, pd*k) -> (B, C, H*pd, W*pd, k, k): split each block
    into a pd x pd grid of sub-blocks (``plainvit.py:86``)."""
    return rearrange(
        coeff, "b c h w (p1 pdh) (p2 pdw) -> b c (h pdh) (w pdw) p1 p2", pdh=patch_dim, pdw=patch_dim
    )
