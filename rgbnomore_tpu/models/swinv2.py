"""SwinV2 in Flax with DCT patch embedding.

Re-design of the reference SwinV2 (``models/swinv2.py``, itself the official
Microsoft implementation) for TPU: cosine window attention with a learned
clamped logit scale, continuous relative position bias via a small MLP
(CPB-MLP), shifted windows with a static additive mask, res-post-norm blocks
(norm scales zero-initialized), patch merging between stages, and for the DCT
domain a norm-carrying grouped patch embedding at patch size 4 (8x8 JPEG
blocks decomposed into 4x4 sub-blocks; ``swinv2.py:505-576, 629-632``).

Window partition/merge are pure reshapes, so XLA lays the whole stage out as
batched matmuls on the MXU; attention masks and CPB coordinate tables are
trace-time numpy constants.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from rgbnomore_tpu.models.embeddings import PatchEmbeddingDCTGroup

LN_EPS = 1e-5
trunc_init = nn.initializers.truncated_normal(stddev=0.02)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C).  Reference: ``swinv2.py:38-50``."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """Inverse of :func:`window_partition`.  Reference: ``swinv2.py:53-67``."""
    b = windows.shape[0] // ((h * w) // (ws * ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_coords_table(ws: int, pretrained_ws: int = 0) -> np.ndarray:
    """Log-spaced continuous relative coordinates, (2*ws-1, 2*ws-1, 2).

    Reference: ``swinv2.py:100-116``.
    """
    rel = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(rel, rel, indexing="ij"), axis=-1)
    denom = (pretrained_ws - 1) if pretrained_ws > 0 else (ws - 1)
    table = table / denom * 8.0
    return np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)


def _relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the flattened coords table (``swinv2.py:118-129``)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Additive (0 / -100) mask for shifted-window attention, (nW, N, N).

    Reference: ``swinv2.py:248-267``.
    """
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, ws_] = cnt
            cnt += 1
    m = img_mask.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Cosine attention with CPB-MLP relative bias (``swinv2.py:70-182``)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    pretrained_window_size: int = 0
    dtype: jnp.dtype = jnp.float32
    # pair-packed Pallas kernel (ops/pallas/attention.py): two windows share
    # one MXU tile, recovering the 128-lane padding the 64-token/32-dim swin
    # shapes otherwise waste.  Requires an even window count per image.
    use_fused_kernel: bool = False
    # XLA-level pair packing: reshape two consecutive windows into one
    # 2n-token block-diagonal attention (cross terms masked -1e9) so the
    # QK^T / AV matmuls run at a full 128-lane MXU tile instead of padded
    # 64x32 tiles.  2x the attention FLOPs for ~4x better tile utilization;
    # unlike the Pallas kernel it keeps XLA's fused softmax and autodiff
    # (no bias-gradient HBM rewrites).  Same even-window requirement.
    use_paired_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: np.ndarray | None, deterministic: bool = True) -> jax.Array:
        bw, n, c = x.shape
        head_dim = self.dim // self.num_heads

        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.log(10.0 * jnp.ones(shape)),
            (self.num_heads, 1, 1),
        )

        qkv_kernel = self.param("qkv_kernel", trunc_init, (c, 3 * self.dim))
        qkv = x @ qkv_kernel.astype(self.dtype)
        if self.qkv_bias:
            # q and v get a learnable bias, k does not (swinv2.py:131-137, 150-153)
            q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(self.dtype)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (bw, n, h, d)

        # Cosine attention: the normalization runs in f32 (precision-
        # sensitive: rsqrt of a 32-term sum of squares), but the NORMALIZED
        # q/k — bounded to [-1, 1], maximally well-conditioned for a
        # low-precision dot — are cast back to the module dtype so the QK^T
        # einsum rides the bf16 MXU path under AMP, exactly the reference's
        # torch.autocast split (normalize f32, attention matmul fp16).
        # Measured on the batch-64 bf16 step: 148.0 -> 140.3 ms
        # (SWIN_PROFILE.json `bf16_matmul`); the f32->f32 eval path is
        # unchanged, pinned by tests/test_swin_import.py at <=5e-4.
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf / (jnp.linalg.norm(qf, axis=-1, keepdims=True) + 1e-12)).astype(self.dtype)
        k = (kf / (jnp.linalg.norm(kf, axis=-1, keepdims=True) + 1e-12)).astype(self.dtype)
        scale = jnp.exp(jnp.minimum(logit_scale, jnp.log(1.0 / 0.01)))

        # continuous relative position bias
        table = jnp.asarray(_relative_coords_table(self.window_size, self.pretrained_window_size))
        cpb = nn.Dense(512, name="cpb_mlp1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(self.num_heads, use_bias=False, name="cpb_mlp2")(cpb)
        cpb = cpb.reshape(-1, self.num_heads)
        idx = _relative_position_index(self.window_size).reshape(-1)
        bias_tbl = cpb[idx].reshape(n, n, self.num_heads)
        bias_tbl = 16.0 * jax.nn.sigmoid(bias_tbl)
        bias_hnn = bias_tbl.transpose(2, 0, 1)  # (H, n, n)

        nw = 1 if mask is None else mask.shape[0]
        fuse = (
            self.use_fused_kernel
            and jax.default_backend() == "tpu"
            and bw % 2 == 0
            and (mask is None or (nw % 2 == 0 and bw % nw == 0))
        )
        if fuse:
            from rgbnomore_tpu.ops.pallas.attention import fused_window_attention

            # per-window logits bias incl. shift mask, paired block-diagonally
            if mask is None:
                per_w = bias_hnn[None]  # (1, H, n, n)
                pairs = jnp.stack([per_w[0], per_w[0]])[None]  # (1, 2, H, n, n)
            else:
                per_w = bias_hnn[None] + jnp.asarray(mask)[:, None]  # (nw, H, n, n)
                pairs = per_w.reshape(nw // 2, 2, self.num_heads, n, n)
            npat = pairs.shape[0]
            bias2 = jnp.full((npat, self.num_heads, 2 * n, 2 * n), -1e9, jnp.float32)
            bias2 = bias2.at[:, :, :n, :n].set(pairs[:, 0])
            bias2 = bias2.at[:, :, n:, n:].set(pairs[:, 1])
            qs = jnp.transpose(q.astype(jnp.float32), (0, 2, 1, 3)) * scale[None]
            ks = jnp.transpose(k.astype(jnp.float32), (0, 2, 1, 3))
            vs = jnp.transpose(v.astype(jnp.float32), (0, 2, 1, 3))
            out = fused_window_attention(qs, ks, vs, bias2)
            out = jnp.transpose(out, (0, 2, 1, 3)).astype(self.dtype)
        elif (
            self.use_paired_attention
            and bw % 2 == 0
            and (mask is None or (nw % 2 == 0 and bw % nw == 0))
        ):
            # block-diagonal pair packing: windows (2i, 2i+1) share one
            # (2n, 2n) logits tile; -1e9 cross blocks reproduce the two
            # per-window softmaxes exactly (exp underflows to 0)
            if mask is None:
                pairs = jnp.stack([bias_hnn, bias_hnn])[None]  # (1, 2, H, n, n)
            else:
                per_w = bias_hnn[None] + jnp.asarray(mask)[:, None]  # (nw, H, n, n)
                pairs = per_w.reshape(nw // 2, 2, self.num_heads, n, n)
            npat = pairs.shape[0]
            big = jnp.full((npat, self.num_heads, 2 * n, 2 * n), -1e9, jnp.float32)
            big = big.at[:, :, :n, :n].set(pairs[:, 0])
            big = big.at[:, :, n:, n:].set(pairs[:, 1])
            q2 = q.reshape(bw // 2, 2 * n, self.num_heads, head_dim)
            k2 = k.reshape(bw // 2, 2 * n, self.num_heads, head_dim)
            v2 = v.reshape(bw // 2, 2 * n, self.num_heads, head_dim)
            attn = jnp.einsum("bqhd,bkhd->bhqk", q2, k2).astype(jnp.float32)
            attn = attn * scale
            attn = attn.reshape(bw // 2 // npat, npat, self.num_heads, 2 * n, 2 * n)
            attn = (attn + big[None]).reshape(bw // 2, self.num_heads, 2 * n, 2 * n)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v2)
            out = out.reshape(bw, n, self.num_heads, head_dim)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            attn = attn * scale
            attn = attn + bias_hnn[None]
            if mask is not None:
                attn = attn.reshape(bw // nw, nw, self.num_heads, n, n) + jnp.asarray(mask)[None, :, None]
                attn = attn.reshape(bw, self.num_heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(bw, n, self.dim)
        return nn.Dense(self.dim, kernel_init=trunc_init, dtype=self.dtype, name="proj")(out)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, 0.0)


class SwinBlock(nn.Module):
    """Res-post-norm SwinV2 block (``swinv2.py:202-309``)."""

    dim: int
    input_resolution: tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    drop_path: float = 0.0
    pretrained_window_size: int = 0
    dtype: jnp.dtype = jnp.float32
    use_fused_attention: bool = False
    use_paired_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h, w = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0

        b, l, c = x.shape
        shortcut = x
        x = x.reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        windows = window_partition(x, ws)
        mask = _shift_attn_mask(h, w, ws, shift) if shift > 0 else None
        attn_windows = WindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias, self.pretrained_window_size,
            dtype=self.dtype, use_fused_kernel=self.use_fused_attention,
            use_paired_attention=self.use_paired_attention, name="attn",
        )(windows, mask, deterministic)
        x = window_reverse(attn_windows, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, l, c)
        # res-post-norm: scale/bias start at zero so blocks begin as identity
        x = nn.LayerNorm(
            epsilon=LN_EPS, scale_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="norm1",
        )(x)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, deterministic)

        shortcut = x
        hdim = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hdim, kernel_init=trunc_init, dtype=self.dtype, name="mlp1")(x)
        y = nn.gelu(y, approximate=False)
        if self.drop > 0:
            y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, kernel_init=trunc_init, dtype=self.dtype, name="mlp2")(y)
        if self.drop > 0:
            y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        y = nn.LayerNorm(
            epsilon=LN_EPS, scale_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="norm2",
        )(y)
        return shortcut + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchMerging(nn.Module):
    """2x2 patch merging: 4C -> 2C reduction + norm (``swinv2.py:330-367``)."""

    input_resolution: tuple[int, int]
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = nn.Dense(
            2 * self.dim, use_bias=False, kernel_init=trunc_init, dtype=self.dtype, name="reduction"
        )(x)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)


class SwinTransformerV2(nn.Module):
    """SwinV2 classifier; ``pixel_space`` selects RGB conv or DCT group embed.

    Reference: ``models/swinv2.py:578-712``.
    """

    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    pretrained_window_sizes: Sequence[int] = (0, 0, 0, 0)
    pixel_space: str = "rgb"
    dtype: jnp.dtype = jnp.float32
    use_fused_attention: bool = False  # pair-packed Pallas window kernel (TPU)
    use_paired_attention: bool = False  # XLA block-diagonal window pairing

    @nn.compact
    def __call__(self, x: jax.Array, cbcr: jax.Array | None = None, train: bool = False) -> jax.Array:
        deterministic = not train
        num_layers = len(self.depths)
        if self.pixel_space.lower() == "rgb":
            img = jnp.transpose(x, (0, 2, 3, 1))
            feats = nn.Conv(
                self.embed_dim,
                (self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                padding="VALID",
                kernel_init=trunc_init,
                dtype=self.dtype,
                name="patch_embed",
            )(img)
            res = self.img_size // self.patch_size
            feats = feats.reshape(feats.shape[0], res * res, self.embed_dim)
            if self.patch_norm:
                feats = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm")(feats)
        else:
            # DCT: grouped embedding at patch 4 (8x8 blocks -> 4x4 subblocks),
            # no sincos, with post-projection norm (swinv2.py:629-632)
            assert cbcr is not None
            feats = PatchEmbeddingDCTGroup(
                patch_size=4,
                emb_size=self.embed_dim,
                use_subblock=True,
                add_sincos=False,
                use_norm=self.patch_norm,
                dtype=self.dtype,
                name="patch_embed",
            )(x, cbcr)
            res = self.img_size // 4

        if self.ape:
            ape = self.param("absolute_pos_embed", trunc_init, (1, feats.shape[1], self.embed_dim))
            feats = feats + ape
        if self.drop_rate > 0:
            feats = nn.Dropout(self.drop_rate)(feats, deterministic=deterministic)
        feats = feats.astype(self.dtype)

        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths)).tolist()
        block_idx = 0
        for i_layer in range(num_layers):
            dim = int(self.embed_dim * 2**i_layer)
            layer_res = (res // 2**i_layer, res // 2**i_layer)
            for d in range(self.depths[i_layer]):
                feats = SwinBlock(
                    dim=dim,
                    input_resolution=layer_res,
                    num_heads=self.num_heads[i_layer],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop=self.drop_rate,
                    drop_path=dpr[block_idx],
                    pretrained_window_size=self.pretrained_window_sizes[i_layer],
                    dtype=self.dtype,
                    use_fused_attention=self.use_fused_attention,
                    use_paired_attention=self.use_paired_attention,
                    name=f"layer{i_layer}_block{d}",
                )(feats, deterministic)
                block_idx += 1
            if i_layer < num_layers - 1:
                feats = PatchMerging(
                    layer_res, dim, dtype=self.dtype, name=f"layer{i_layer}_downsample"
                )(feats)

        feats = nn.LayerNorm(epsilon=LN_EPS, name="norm")(feats)
        feats = jnp.mean(feats, axis=1)
        return nn.Dense(self.num_classes, kernel_init=trunc_init, name="head")(
            feats.astype(jnp.float32)
        )
