"""Patch embeddings: RGB conv embedding and the three DCT variants.

Faithful functional re-designs of the reference embedding layers
(``models/plainvit.py:90-410``) in Flax linen.  Naming of the variants
follows the CLI: embed_type 1 = grouped, 2 = separate, 3 = concatenate.

Initialization note: Linear/Conv kernels AND biases use torch-style fan-in
uniform initializers so from-scratch training matches the reference recipe
exactly.  Biases were zero-initialized through round 3; the round-4 learn2
bisect (REFERENCE_AB.json jax_learn2_torchinit, BENCHMARKS.md) measured that
this seemingly negligible divergence shifts plateau-escape timing enough to
move final val acc ~5 points at proxy scale — so the fan-in uniform bias is
now the default (``torch_bias_init``).
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

# Bias init family (round-5).  "torch" is the reference-parity default
# (U(+-1/sqrt(fan_in)), the torch nn.Linear/Conv2d default the reference's
# plainvit inherits — no explicit init there).  "zeros" is the round-2/3
# era family (kaiming-uniform kernels + zero biases): short-horizon proxy
# tooling selects it via cfg.model.bias_init because the uniform bias draw
# delays depth-12 plateau escape beyond proxy horizons (CROPBISECT round-5:
# every wire flat at 1.1k-4k steps under "torch"; the same recipe took off
# at 2k steps under "zeros"), while at the reference's real scale (batch
# 1024, 10k warmup, 375k steps) the torch family is what its checkpoints
# prove out.
_BIAS_FAMILY = "torch"


def set_bias_family(family: str) -> None:
    """Select the bias init family for subsequently *initialized* models
    ("torch" | "zeros").  Read at flax-init time, so call before
    ``model.init`` — ``build_model``/``Trainer`` do this from
    ``cfg.model.bias_init``."""
    global _BIAS_FAMILY
    assert family in ("torch", "zeros"), family
    _BIAS_FAMILY = family


def torch_bias_init(fan_in: int):
    """torch nn.Linear/Conv2d default bias init: U(-1/sqrt(fan_in),
    1/sqrt(fan_in)).  Flax bias initializers only see the bias shape, which
    has no fan-in, so the caller closes over the layer's input width
    (``x.shape[-1]`` at the call site, or in_ch*kh*kw for convs).  Honors
    ``set_bias_family`` ("zeros" -> zero biases, the round-2/3 family)."""
    bound = 1.0 / math.sqrt(max(1, fan_in))

    def init(key, shape, dtype=jnp.float32):
        if _BIAS_FAMILY == "zeros":
            return jnp.zeros(shape, dtype)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_dense(x: jax.Array, features: int, *, name: str, dtype=jnp.float32) -> jax.Array:
    """``nn.Dense`` with torch's exact default init (kaiming-uniform kernel +
    fan-in uniform bias) — the init family every reference plainvit Linear
    uses (``models/plainvit.py``, torch defaults)."""
    return nn.Dense(
        features,
        kernel_init=torch_linear_init,
        bias_init=torch_bias_init(x.shape[-1]),
        dtype=dtype,
        name=name,
    )(x)


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
            bias_init=torch_bias_init(3 * self.patch_size**2),
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
        feats = torch_dense(feats, self.emb_size, dtype=self.dtype, name="projection")
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
            torch_dense(y[:, :, :, i], per_block, dtype=self.dtype, name=f"linear_y{i}")
            for i in range(y.shape[3])
        ]
        couts = [
            torch_dense(cbcr[:, :, :, i], per_block, dtype=self.dtype, name=f"linear_c{i}")
            for i in range(cbcr.shape[3])
        ]
        feats = jnp.concatenate(youts + couts, axis=-1)
        feats = nn.gelu(feats, approximate=False)
        feats = torch_dense(feats, self.emb_size, dtype=self.dtype, name="linear_mix")
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
        y = torch_dense(y, self.emb_size // 6 * 4, dtype=self.dtype, name="projection_y")
        cbcr = torch_dense(cbcr, self.emb_size // 6 * 2, dtype=self.dtype, name="projection_c")
        feats = jnp.concatenate([y, cbcr], axis=-1)
        feats = nn.gelu(feats, approximate=False)
        residual = feats
        feats = torch_dense(feats, self.emb_size, dtype=self.dtype, name="linear_mix")
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
            x = torch_dense(x, self.emb_size, dtype=self.dtype, name=name)
            x = _add_sincos(x)  # per-channel sincos on (b, c, h, w, e)
            return rearrange(x, "b c h w e -> b (c h w) e")

        y_tok = embed(y, "projection_y")
        c_tok = embed(cbcr, "projection_c")
        return jnp.concatenate([y_tok, c_tok], axis=1)
