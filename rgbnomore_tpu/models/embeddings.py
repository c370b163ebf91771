"""Patch embeddings: RGB conv embedding and the three DCT variants.

Faithful functional re-designs of the reference embedding layers
(``models/plainvit.py:90-410``) in Flax linen.  Naming of the variants
follows the CLI: embed_type 1 = grouped, 2 = separate, 3 = concatenate.

Initialization note: Linear kernels use a torch-style fan-in uniform
initializer so from-scratch training matches the reference recipe; biases
are zero-initialized (divergence from torch's fan-in uniform bias —
negligible and simpler).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from rgbnomore_tpu.models.subblock import (
    apply_subblock,
    group_blocks,
    patch_conversion,
    ungroup_blocks,
)

# torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) -> variance 1/(3 fan_in)
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def sincos_position_embedding(h: int, w: int, e: int, dtype=jnp.float32) -> jax.Array:
    """Fixed 2-D sin-cos position embedding, big_vision layout.

    ``cat(sin(w), cos(w), sin(h), cos(h))`` with e/4 frequencies each,
    ``freq_k = exp(-k * ln(10000) / (e/4 - 1))``.
    Reference: ``models/plainvit.py:90-121``.
    """
    assert e % 4 == 0, "Embedding size should be a multiple of 4"
    nfreq = e // 4
    freqs = jnp.exp(-jnp.arange(nfreq, dtype=dtype) * (math.log(10000.0) / (nfreq - 1)))
    hh, ww = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij")
    ph = hh.reshape(-1)[:, None] * freqs[None, :]
    pw = ww.reshape(-1)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(pw), jnp.cos(pw), jnp.sin(ph), jnp.cos(ph)], axis=-1)
    return emb.reshape(h, w, e)


def _add_sincos(x: jax.Array) -> jax.Array:
    """Add the fixed sincos embedding to a (..., h, w, e) feature map."""
    *_, h, w, e = x.shape
    return x + sincos_position_embedding(h, w, e, x.dtype)


class PatchEmbeddingRGB(nn.Module):
    """Conv-stride patch embedding for RGB input (``plainvit.py:123-155``).

    Input (B, C, H, W) -> tokens (B, N, E) with sincos position embedding.
    """

    patch_size: int = 16
    emb_size: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC (TPU-native layout)
        x = nn.Conv(
            self.emb_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            kernel_init=torch_linear_init,
            dtype=self.dtype,
            name="projection",
        )(x)
        x = _add_sincos(x)
        return rearrange(x, "b h w e -> b (h w) e")


class PatchEmbeddingDCTGroup(nn.Module):
    """embed_type 1 — grouped: merge Y and CbCr features of one spatial patch
    and project with a single Linear (``plainvit.py:157-218``)."""

    patch_size: int = 16
    emb_size: int = 768
    use_subblock: bool = True
    chroma_scale: int = 2
    add_sincos: bool = True   # SwinV2 reuses this embed without sincos (swinv2.py:547-550)
    use_norm: bool = False    # SwinV2 applies a LayerNorm after projection (swinv2.py:551-554)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, cbcr: jax.Array) -> jax.Array:
        conv_y, pd_y, comb_y = patch_conversion(self.patch_size, self.use_subblock)
        conv_c, pd_c, comb_c = patch_conversion(
            self.patch_size // self.chroma_scale, self.use_subblock
        )

        if comb_y:
            y = group_blocks(y, pd_y)
            y = apply_subblock(y, conv_y, combine=True)
        else:
            y = apply_subblock(y, conv_y, combine=False)
            y = ungroup_blocks(y, pd_y)
        if comb_c:
            cbcr = group_blocks(cbcr, pd_c)
            cbcr = apply_subblock(cbcr, conv_c, combine=True)
        else:
            cbcr = apply_subblock(cbcr, conv_c, combine=False)
            cbcr = ungroup_blocks(cbcr, pd_c)

        y = rearrange(y, "b c h w i j -> b h w (c i j)")
        cbcr = rearrange(cbcr, "b c h w i j -> b h w (c i j)")
        feats = jnp.concatenate([y, cbcr], axis=-1)
        feats = nn.Dense(
            self.emb_size, kernel_init=torch_linear_init, dtype=self.dtype, name="projection"
        )(feats)
        if self.add_sincos:
            feats = _add_sincos(feats)
        feats = rearrange(feats, "b h w e -> b (h w) e")
        if self.use_norm:
            feats = nn.LayerNorm(epsilon=1e-5, name="norm")(feats)
        return feats


class PatchEmbeddingDCTSeparate(nn.Module):
    """embed_type 2 without subblock — per-8x8-block Linear projections then a
    channel-mixing Linear (``plainvit.py:220-278``)."""

    patch_size: int = 16
    emb_size: int = 768
    chroma_scale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, cbcr: jax.Array) -> jax.Array:
        assert self.patch_size // self.chroma_scale >= 8, (
            "separate (no-subblock) embedding needs chroma patch >= 8"
        )
        pd_y = self.patch_size // 8
        pd_c = pd_y // self.chroma_scale
        n_blocks = pd_y**2 + 2 * pd_c**2
        per_block = self.emb_size // n_blocks

        y = rearrange(
            y, "b c (h pdh) (w pdw) p1 p2 -> b h w (c pdh pdw) (p1 p2)", pdh=pd_y, pdw=pd_y
        )
        cbcr = rearrange(
            cbcr, "b c (h pdh) (w pdw) p1 p2 -> b h w (c pdh pdw) (p1 p2)", pdh=pd_c, pdw=pd_c
        )
        youts = [
            nn.Dense(per_block, kernel_init=torch_linear_init, dtype=self.dtype, name=f"linear_y{i}")(
                y[:, :, :, i]
            )
            for i in range(y.shape[3])
        ]
        couts = [
            nn.Dense(per_block, kernel_init=torch_linear_init, dtype=self.dtype, name=f"linear_c{i}")(
                cbcr[:, :, :, i]
            )
            for i in range(cbcr.shape[3])
        ]
        feats = jnp.concatenate(youts + couts, axis=-1)
        feats = nn.gelu(feats, approximate=False)
        feats = nn.Dense(
            self.emb_size, kernel_init=torch_linear_init, dtype=self.dtype, name="linear_mix"
        )(feats)
        feats = _add_sincos(feats)
        return rearrange(feats, "b h w e -> b (h w) e")


class PatchEmbeddingDCTSeparateSubblock(nn.Module):
    """embed_type 2 with subblock — separate Y/CbCr projections to 4/6 and 2/6
    of the embedding, GELU, residual channel mix (``plainvit.py:280-351``)."""

    patch_size: int = 16
    emb_size: int = 768
    chroma_scale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, cbcr: jax.Array) -> jax.Array:
        conv_y, pd_y, comb_y = patch_conversion(self.patch_size, True)
        conv_c, pd_c, comb_c = patch_conversion(self.patch_size // self.chroma_scale, True)

        if comb_y:
            y = group_blocks(y, pd_y)
            y = apply_subblock(y, conv_y, combine=True)
        else:
            y = apply_subblock(y, conv_y, combine=False)
            y = ungroup_blocks(y, pd_y)
        if comb_c:
            cbcr = group_blocks(cbcr, pd_c)
            cbcr = apply_subblock(cbcr, conv_c, combine=True)
        else:
            cbcr = apply_subblock(cbcr, conv_c, combine=False)
            cbcr = ungroup_blocks(cbcr, pd_c)

        y = rearrange(y, "b c h w i j -> b h w (c i j)")
        cbcr = rearrange(cbcr, "b c h w i j -> b h w (c i j)")
        y = nn.Dense(
            self.emb_size // 6 * 4, kernel_init=torch_linear_init, dtype=self.dtype, name="projection_y"
        )(y)
        cbcr = nn.Dense(
            self.emb_size // 6 * 2, kernel_init=torch_linear_init, dtype=self.dtype, name="projection_c"
        )(cbcr)
        feats = jnp.concatenate([y, cbcr], axis=-1)
        feats = nn.gelu(feats, approximate=False)
        residual = feats
        feats = nn.Dense(
            self.emb_size, kernel_init=torch_linear_init, dtype=self.dtype, name="linear_mix"
        )(feats)
        feats = feats + residual
        feats = _add_sincos(feats)
        return rearrange(feats, "b h w e -> b (h w) e")


class PatchEmbeddingDCTConcat(nn.Module):
    """embed_type 3 — concatenate: independent Y and CbCr token streams joined
    along the sequence axis, 1.5x tokens (``plainvit.py:353-410``)."""

    patch_size: int = 16
    emb_size: int = 768
    use_subblock: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, cbcr: jax.Array) -> jax.Array:
        conv, pd, comb = patch_conversion(self.patch_size, self.use_subblock)

        def embed(x, name):
            if comb:
                x = group_blocks(x, pd)
                x = apply_subblock(x, conv, combine=True)
            else:
                x = apply_subblock(x, conv, combine=False)
                x = ungroup_blocks(x, pd)
            x = rearrange(x, "b c h w i j -> b c h w (i j)")
            x = nn.Dense(
                self.emb_size, kernel_init=torch_linear_init, dtype=self.dtype, name=name
            )(x)
            x = _add_sincos(x)  # per-channel sincos on (b, c, h, w, e)
            return rearrange(x, "b c h w e -> b (c h w) e")

        y_tok = embed(y, "projection_y")
        c_tok = embed(cbcr, "projection_c")
        return jnp.concatenate([y_tok, c_tok], axis=1)
