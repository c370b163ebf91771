"""Vision Transformer with DCT patch embeddings (Flax linen).

Architectural parity with the reference ViT (``models/plainvit.py:412-612``):
pre-LN encoder blocks, a custom multi-head attention that scales attention
logits by ``sqrt(emb_size)`` (NOT ``sqrt(head_dim)`` — a deliberate quirk of
the reference, ``plainvit.py:455-457``), fixed 2-D sincos position
embeddings, and a mean-pool -> Linear -> Tanh -> Linear classification head.

The compute path is TPU-shaped: attention and MLP matmuls run in the module
``dtype`` (bf16 under mixed precision) with f32 parameters; softmax is
computed in f32 for stability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from rgbnomore_tpu.models.embeddings import (
    PatchEmbeddingDCTConcat,
    PatchEmbeddingDCTGroup,
    PatchEmbeddingDCTSeparate,
    PatchEmbeddingDCTSeparateSubblock,
    PatchEmbeddingRGB,
    torch_bias_init,
    torch_dense,
    torch_linear_init,
)

LN_EPS = 1e-5  # torch LayerNorm default, for checkpoint parity


class MultiHeadAttention(nn.Module):
    """Fused-QKV attention with the reference's emb_size**0.5 logit scaling.

    A fused Pallas attention kernel (QKᵀ -> softmax -> AV in VMEM, custom
    VJP; ``ops/pallas/attention.py``) is available via ``use_fused_kernel``.
    Measured on TPU v5e at ViT-Ti scale (B=256, H=3, N=196, D=64) the XLA
    einsum path is faster (2.8 vs 3.2 ms fwd) because the kernel's tile
    padding (N 196->256, D 64->128) wastes more compute than the avoided
    HBM traffic saves at these tiny head dims — so einsum is the default.
    The kernel pays off for longer sequences / larger heads.
    """

    emb_size: int
    num_heads: int = 8
    head_size: int = 64
    dropout: float = 0.0
    use_fused_kernel: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        inner = self.num_heads * self.head_size
        qkv = torch_dense(x, inner * 3, dtype=self.dtype, name="qkv")
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=self.num_heads)
        k = rearrange(k, "b n (h d) -> b h n d", h=self.num_heads)
        v = rearrange(v, "b n (h d) -> b h n d", h=self.num_heads)

        scale = float(1.0 / self.emb_size**0.5)
        if self.use_fused_kernel and self.dropout == 0.0 and jax.default_backend() == "tpu":
            from rgbnomore_tpu.ops.pallas.attention import fused_attention

            out = fused_attention(q, k, v, scale)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            att = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            if self.dropout > 0:
                att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        return torch_dense(out, self.emb_size, dtype=self.dtype, name="projection")


class EncoderBlock(nn.Module):
    """Pre-LN transformer block (``plainvit.py:493-529``)."""

    emb_size: int
    num_heads: int
    head_size: int = 64
    drop_p: float = 0.0
    forward_expansion: int = 4
    forward_drop_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.LayerNorm(epsilon=LN_EPS, name="ln1")(x)
        h = MultiHeadAttention(
            self.emb_size, self.num_heads, self.head_size, dtype=self.dtype, name="mha"
        )(h, deterministic)
        if self.drop_p > 0:
            h = nn.Dropout(self.drop_p)(h, deterministic=deterministic)
        x = x + h

        h = nn.LayerNorm(epsilon=LN_EPS, name="ln2")(x)
        h = torch_dense(h, self.forward_expansion * self.emb_size, dtype=self.dtype, name="mlp1")
        h = nn.gelu(h, approximate=False)
        if self.forward_drop_p > 0:
            h = nn.Dropout(self.forward_drop_p)(h, deterministic=deterministic)
        h = torch_dense(h, self.emb_size, dtype=self.dtype, name="mlp2")
        if self.drop_p > 0:
            h = nn.Dropout(self.drop_p)(h, deterministic=deterministic)
        return x + h


class ClassificationHead(nn.Module):
    """LN -> mean pool -> Linear -> Tanh -> Linear (``plainvit.py:542-557``)."""

    emb_size: int
    n_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln")(x)
        x = jnp.mean(x, axis=1)
        x = torch_dense(x, self.emb_size, dtype=self.dtype, name="linear1")
        x = jnp.tanh(x)
        # final logits in f32 regardless of compute dtype
        return nn.Dense(self.n_classes, kernel_init=torch_linear_init,
                        bias_init=torch_bias_init(self.emb_size), name="linear2")(
            x.astype(jnp.float32)
        )


class ViT(nn.Module):
    """ViT dispatcher over pixel space and embedding version.

    ``pixel_space`` 'rgb' uses the conv patch embed; 'dct' selects one of the
    three DCT embeddings by ``ver`` (1 grouped / 2 separate / 3 concatenate)
    and ``use_subblock``.  Mirrors ``plainvit.py:559-612``.
    """

    patch_size: int = 16
    emb_size: int = 768
    depth: int = 12
    num_heads: int = 8
    head_size: int = 64
    n_classes: int = 1000
    drop_p: float = 0.1
    pixel_space: str = "RGB"
    ver: int = 1
    use_subblock: bool = True
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cbcr: jax.Array | None = None, train: bool = False) -> jax.Array:
        space = self.pixel_space.lower()
        if space == "rgb":
            tokens = PatchEmbeddingRGB(
                self.patch_size, self.emb_size, dtype=self.dtype, name="patchembed"
            )(x)
        elif space == "dct":
            assert cbcr is not None, "DCT models take (y, cbcr)"
            if self.ver == 1:
                embed = PatchEmbeddingDCTGroup(
                    self.patch_size, self.emb_size, self.use_subblock, dtype=self.dtype,
                    name="patchembed",
                )
            elif self.ver == 2 and not self.use_subblock:
                embed = PatchEmbeddingDCTSeparate(
                    self.patch_size, self.emb_size, dtype=self.dtype, name="patchembed"
                )
            elif self.ver == 2:
                embed = PatchEmbeddingDCTSeparateSubblock(
                    self.patch_size, self.emb_size, dtype=self.dtype, name="patchembed"
                )
            elif self.ver == 3:
                embed = PatchEmbeddingDCTConcat(
                    self.patch_size, self.emb_size, self.use_subblock, dtype=self.dtype,
                    name="patchembed",
                )
            else:
                raise ValueError(f"Unknown embed version: {self.ver}")
            tokens = embed(x, cbcr)
        else:
            raise ValueError(f"Unknown pixel space: {self.pixel_space}")

        tokens = tokens.astype(self.dtype)
        for i in range(self.depth):
            tokens = EncoderBlock(
                self.emb_size,
                self.num_heads,
                self.head_size,
                drop_p=self.drop_p,
                forward_drop_p=self.drop_p,
                dtype=self.dtype,
                name=f"encoder_{i}",
            )(tokens, deterministic=not train)
        return ClassificationHead(self.emb_size, self.n_classes, dtype=self.dtype, name="head")(
            tokens
        )
