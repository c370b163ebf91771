"""Device-side RGB augmentation: batched RandomResizedCrop + RandAugment.

TPU-first replacement for the reference's PIL/torchvision CPU transforms
(``datasets.py:317-353``, ``utils/custom_transforms.py:15-314``): the host
ships raw uint8 pixel canvases; crop/resize/flip/RandAugment/normalize run
batched inside the jitted step.

Design notes:
- Crop+resize is separable: per-sample row/col resampling matrices built with
  scale-aware triangle (bilinear-antialias) filters — PIL's downscale
  semantics — applied as two batched MXU matmuls, like the DCT crop path.
- Pixel ops work in float32 [0, 255] with clamping where torchvision's uint8
  semantics round; magnitudes follow the big_vision table
  (``custom_transforms.py:266-291``), signs random for signed ops.
- YCbCr ops (ChromaDrop, AutoSaturation, Grayscale) use the ITU-R BT.601
  full-range matrix (PIL's convention).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rgbnomore_tpu.ops.geometry import rotate_image, shear_image

__all__ = ["RandAugmentRGB", "make_rgb_train_pipeline", "make_rgb_eval_pipeline"]


# ---------------------------------------------------------------- resample --
def _resample_matrix(src_start, src_size, n_src: int, n_out: int):
    """(n_out, n_src) antialiased-bilinear resampling matrix for one axis.

    Output sample r maps to source coordinate
    ``src_start + (r + 0.5) * src_size / n_out - 0.5`` with a triangle filter
    whose support scales with the downscale factor (PIL bilinear semantics).
    ``src_start``/``src_size`` may be traced scalars (per-sample boxes).
    """
    scale = src_size / n_out
    support = jnp.maximum(scale, 1.0)
    r = jnp.arange(n_out, dtype=jnp.float32)
    centers = src_start + (r + 0.5) * scale - 0.5  # (n_out,)
    s = jnp.arange(n_src, dtype=jnp.float32)
    dist = jnp.abs(s[None, :] - centers[:, None]) / support
    weights = jnp.maximum(0.0, 1.0 - dist)
    norm = jnp.sum(weights, axis=1, keepdims=True)
    return weights / jnp.maximum(norm, 1e-8)


def _apply_separable_rgb(img, m_h, m_w):
    """img (B, C, H, W) x m_h (B, OH, H) x m_w (B, OW, W) -> (B, C, OH, OW)."""
    t = jnp.einsum("boh,bchw->bcow", m_h, img)
    return jnp.einsum("bcow,bpw->bcop", t, m_w)


def make_random_resized_crop_rgb(
    out_size: int,
    canvas: int,
    scale: tuple[float, float] = (0.05, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    tries: int = 10,
):
    """Batched torchvision-style RandomResizedCrop (``datasets.py:319``).

    Vectorizes the 10-try accept/reject loop: all candidates are sampled at
    once and the first in-bounds one is selected, falling back to the
    reference's central crop rule.
    """
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))

    def sample(rng, batch):
        k_area, k_ar, k_i, k_j = jax.random.split(rng, 4)
        area = canvas * canvas * jax.random.uniform(
            k_area, (batch, tries), minval=scale[0], maxval=scale[1]
        )
        ar = jnp.exp(
            jax.random.uniform(k_ar, (batch, tries), minval=log_ratio[0], maxval=log_ratio[1])
        )
        w = jnp.round(jnp.sqrt(area * ar))
        h = jnp.round(jnp.sqrt(area / ar))
        valid = (w <= canvas) & (h <= canvas) & (w > 0) & (h > 0)
        first = jnp.argmax(valid, axis=1)
        found = jnp.any(valid, axis=1)
        take = lambda x: jnp.take_along_axis(x, first[:, None], axis=1)[:, 0]
        w_sel, h_sel = take(w), take(h)
        # fallback: whole image (canvas square => in_ratio 1 within [3/4, 4/3])
        w_sel = jnp.where(found, w_sel, canvas)
        h_sel = jnp.where(found, h_sel, canvas)
        ui = jax.random.uniform(k_i, (batch, tries))
        uj = jax.random.uniform(k_j, (batch, tries))
        i = jnp.floor(take(ui) * (canvas - h_sel + 1))
        j = jnp.floor(take(uj) * (canvas - w_sel + 1))
        return i, j, h_sel, w_sel

    def crop_resize(rng, img):
        b = img.shape[0]
        i, j, h, w = sample(rng, b)
        m_h = jax.vmap(lambda a, s: _resample_matrix(a, s, canvas, out_size))(i, h)
        m_w = jax.vmap(lambda a, s: _resample_matrix(a, s, canvas, out_size))(j, w)
        return _apply_separable_rgb(img, m_h, m_w)

    return crop_resize


def make_resize_center_crop_rgb(resize_to: int, crop: int, canvas: int):
    """Val transform: Resize(resize_to) + CenterCrop(crop) (``datasets.py:331-334``)."""

    def run(img):
        b = img.shape[0]
        # resize canvas -> resize_to, then center crop: compose into one map
        # source box of the crop in canvas coords:
        scale = canvas / resize_to
        start = (resize_to - crop) / 2 * scale
        size = crop * scale
        m = _resample_matrix(jnp.float32(start), jnp.float32(size), canvas, crop)
        mb = jnp.broadcast_to(m, (b,) + m.shape)
        return _apply_separable_rgb(img, mb, mb)

    return run


# ------------------------------------------------------------- pixel ops ---
_YCBCR = np.array(
    [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]],
    np.float32,
)
_YCBCR_INV = np.linalg.inv(_YCBCR).astype(np.float32)


def _to_ycbcr(img):
    out = jnp.einsum("ij,jhw->ihw", jnp.asarray(_YCBCR), img)
    return out.at[1:].add(128.0)


def _from_ycbcr(ycc):
    ycc = ycc.at[1:].add(-128.0)
    return jnp.einsum("ij,jhw->ihw", jnp.asarray(_YCBCR_INV), ycc)


def _clamp(img):
    return jnp.clip(img, 0.0, 255.0)


def _blend(img1, img2, f):
    """torchvision blend: img1 * f + img2 * (1 - f), clamped."""
    return _clamp(f * img1 + (1.0 - f) * img2)


def _grayscale(img):
    g = 0.299 * img[0] + 0.587 * img[1] + 0.114 * img[2]
    return jnp.broadcast_to(g[None], img.shape)


def _equalize_channel(ch):
    """PIL ImageOps.equalize, exactly: ``step = (total - count_of_last_
    NONZERO_bin) // 255``, ``lut[i] = (step//2 + sum(h[:i])) // step``
    (exclusive cumsum); identity when the channel has <= 1 distinct value or
    ``step == 0``.

    TPU note: histogram and LUT-apply are written as broadcast compare +
    reduce (one-hot algebra) instead of scatter-add + gather — XLA fuses the
    comparisons into both reductions on the VPU, where the scatter/gather
    forms serialize (measured 756 -> ~8 ms/batch for the 16-op RandAugment
    switch at (128, 3, 224, 224))."""
    idx = jnp.clip(jnp.round(ch), 0, 255)  # float bin ids, exact integers
    flat = idx.reshape(-1)
    bins = jnp.arange(256, dtype=jnp.float32)
    onehot = flat[None, :] == bins[:, None]  # (256, P), fused into reduces
    hist = jnp.sum(onehot, axis=1, dtype=jnp.float32)
    nonzero = hist > 0
    last_nz = 255 - jnp.argmax(jnp.flip(nonzero))
    step = jnp.floor((jnp.sum(hist) - hist[last_nz]) / 255.0)
    excl_cdf = jnp.cumsum(hist) - hist  # sum of h[:i]
    lut = jnp.floor((step // 2 + excl_cdf) / jnp.maximum(step, 1.0))
    lut = jnp.clip(lut, 0, 255)
    # LUT apply: exactly one bin matches per pixel -> masked sum == lut[idx]
    out = jnp.sum(jnp.where(onehot, lut[:, None], 0.0), axis=0).reshape(ch.shape)
    identity = (jnp.sum(nonzero) <= 1) | (step == 0)
    return jnp.where(identity, ch, out)


def _smooth(img):
    kernel = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    k3 = jnp.broadcast_to(kernel[None, None], (3, 1, 3, 3))
    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="edge")
    sm = lax.conv_general_dilated(
        pad[None], k3, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=3,
        precision=lax.Precision.HIGHEST,
    )[0]
    # interior only: borders keep the original (torchvision semantics)
    h, w = img.shape[-2:]
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    interior = ((rows > 0) & (rows < h - 1))[:, None] & ((cols > 0) & (cols < w - 1))[None, :]
    return jnp.where(interior, sm, img)


def _translate(img, t, axis, fill=0.0):
    out = jnp.roll(img, t, axis=axis)
    n = img.shape[axis]
    idx_shape = [1] * img.ndim
    idx_shape[axis] = n
    idx = jnp.arange(n).reshape(idx_shape)
    keep = jnp.where(t >= 0, idx >= t, idx < n + t)
    return jnp.where(keep, out, fill)


def _cutout(img, pad_size, ch, cw, fill=128.0):
    h, w = img.shape[-2:]
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    hole = ((rows >= ch - pad_size) & (rows < ch + pad_size))[:, None] & (
        (cols >= cw - pad_size) & (cols < cw + pad_size)
    )[None, :]
    return jnp.where(hole, fill, img)


def _rgb_magnitude_table(num_bins: int, hw: tuple[int, int]):
    """Big_vision magnitude table (``custom_transforms.py:266-291``)."""
    lin = lambda a, b: np.linspace(a, b, num_bins)
    zero = np.zeros(num_bins)
    h, w = hw
    return {
        "Identity": (zero, False),
        "AutoContrast": (zero, False),
        "Equalize": (zero, False),
        "Invert": (zero, False),
        "Rotate": (lin(0.0, 30.0), True),
        "Posterize": (8 - np.round(np.arange(num_bins) / ((num_bins - 1) / 4)), False),
        "Solarize": (lin(255.0, 0.0), False),
        "SolarizeAdd": (lin(0, 110), False),
        "Color": (lin(0.0, 0.9), True),
        "Contrast": (lin(0.0, 0.9), True),
        "Brightness": (lin(0.0, 0.9), True),
        "Sharpness": (lin(0.0, 0.9), True),
        "ShearX": (lin(0.0, 0.3), True),
        "ShearY": (lin(0.0, 0.3), True),
        "Cutout": (lin(0, 40), False),
        "TranslateX": (lin(0.0, 150.0 / 336.0 * w), True),
        "TranslateY": (lin(0.0, 150.0 / 336.0 * h), True),
        "Grayscale": (zero, False),
        "ChromaDrop": (zero, False),
        "AutoSaturation": (zero, False),
        "Rotate90": (np.full(num_bins, 90.0), True),
    }


def _make_rgb_op(name: str, mag: float, signed: bool, fill: float):
    """Single-sample op (3, H, W) float32 [0,255] -> same.  Mirrors
    ``_apply_op`` (``custom_transforms.py:126-218``)."""

    def op(img, rng, sign):
        m = mag * sign if signed else mag
        if name == "Identity":
            return img
        if name == "AutoContrast":
            lo = img.min(axis=(-2, -1), keepdims=True)
            hi = img.max(axis=(-2, -1), keepdims=True)
            scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
            return jnp.where(hi > lo, _clamp((img - lo) * scale), img)
        if name == "Equalize":
            return jnp.stack([_equalize_channel(img[c]) for c in range(3)])
        if name == "Invert":
            return 255.0 - img
        if name == "Rotate" or name == "Rotate90":
            if mag == 0.0:
                return img
            f = lambda d: rotate_image(img, d, interpolation="nearest", fill=fill)
            return jax.lax.cond(sign > 0, lambda: f(mag), lambda: f(-mag))
        if name == "Posterize":
            bits = int(mag)
            mask = 256 - 2 ** (8 - bits) if bits < 8 else 255
            return (jnp.clip(img, 0, 255).astype(jnp.int32) & mask).astype(jnp.float32)
        if name == "Solarize":
            return jnp.where(img >= mag, 255.0 - img, img)
        if name == "SolarizeAdd":
            return jnp.where(img < 128.0, _clamp(img + m), img)
        if name == "Color":
            return _blend(img, _grayscale(img), 1.0 + m)
        if name == "Contrast":
            mean = jnp.round(_grayscale(img)[0]).mean()
            return _blend(img, mean, 1.0 + m)
        if name == "Brightness":
            return _blend(img, jnp.zeros_like(img), 1.0 + m)
        if name == "Sharpness":
            return _blend(img, _smooth(img), 1.0 + m)
        if name in ("ShearX", "ShearY"):
            if mag == 0.0:
                return img
            deg = float(np.degrees(np.arctan(mag)))
            dx = name == "ShearX"
            f = lambda d: shear_image(img, deg_x=d if dx else 0.0, deg_y=0.0 if dx else d, fill=fill)
            return jax.lax.cond(sign > 0, lambda: f(deg), lambda: f(-deg))
        if name in ("TranslateX", "TranslateY"):
            t = jnp.asarray(int(mag), jnp.int32) * jnp.asarray(sign, jnp.int32)
            return _translate(img, t, axis=2 if name == "TranslateX" else 1, fill=fill)
        if name == "Cutout":
            h, w = img.shape[-2:]
            kh, kw = jax.random.split(rng)
            ch = jax.random.randint(kh, (), 0, h)
            cw = jax.random.randint(kw, (), 0, w)
            return _cutout(img, int(mag), ch, cw, fill=fill)
        if name == "Grayscale":
            return _grayscale(img)
        if name == "ChromaDrop":
            ycc = _to_ycbcr(img)
            drop_cb = jax.random.bernoulli(rng)
            ycc = jnp.where(
                jnp.asarray([False, True, False])[:, None, None] & drop_cb, 128.0, ycc
            )
            ycc = jnp.where(
                jnp.asarray([False, False, True])[:, None, None] & ~drop_cb, 128.0, ycc
            )
            return _clamp(_from_ycbcr(ycc))
        if name == "AutoSaturation":
            ycc = _to_ycbcr(img)
            c = ycc[1:]
            lo, hi = c.min(), c.max()
            c2 = jnp.where(hi > lo, (c - lo) / (hi - lo) * 255.0, c)
            return _clamp(_from_ycbcr(jnp.concatenate([ycc[:1], c2])))
        raise ValueError(f"Unknown RGB augmentation op: {name}")

    return op


@dataclasses.dataclass
class RandAugmentRGB:
    """Batched big_vision RandAugment on pixels (``custom_transforms.py:222-314``)."""

    ops_list: list[str]
    num_ops: int = 2
    magnitude: int = 10
    num_magnitude_bins: int = 11
    image_hw: tuple[int, int] = (224, 224)
    fill: float = 0.0

    def __post_init__(self):
        table = _rgb_magnitude_table(self.num_magnitude_bins, self.image_hw)
        unknown = [o for o in self.ops_list if o not in table]
        if unknown:
            raise ValueError(f"Unknown ops: {unknown}")
        self._ops = []
        for name in self.ops_list:
            mags, signed = table[name]
            self._ops.append(_make_rgb_op(name, float(mags[self.magnitude]), signed, self.fill))
        self._signed = jnp.asarray([table[o][1] for o in self.ops_list], jnp.float32)

    def __call__(self, rng: jax.Array, img: jax.Array) -> jax.Array:
        """img (B, 3, H, W) float32 [0,255]."""
        if not self.ops_list:
            return img
        n = len(self.ops_list)
        ops = self._ops
        signed = self._signed

        def per_sample(rng, x):
            # scan over rounds so the op branches are traced/compiled once
            def round_body(carry, _):
                x, rng = carry
                rng, k_op, k_sign, k_inner = jax.random.split(rng, 4)
                idx = jax.random.randint(k_op, (), 0, n)
                sign = jnp.where(jax.random.bernoulli(k_sign) & (signed[idx] > 0), -1.0, 1.0)
                x = jax.lax.switch(idx, ops, x, k_inner, sign)
                return (x, rng), None

            (x, _), _ = jax.lax.scan(round_body, (x, rng), None, length=self.num_ops)
            return x

        keys = jax.random.split(rng, img.shape[0])
        return jax.vmap(per_sample)(keys, img)


# -------------------------------------------------------------- pipelines --
def make_rgb_train_pipeline(
    cfg=None,
    *,
    size: int = 224,
    canvas: int = 512,
    auglist: list[str] | None = None,
    num_ops: int = 2,
    magnitude: int = 10,
    fill: float = 128.0,
    out_dtype=jnp.float32,
):
    """RandomResizedCrop -> HFlip -> RandAugment -> ToTensor_range(-1, 1).

    Mirrors the ``imagenet``/``imagenet_swin`` train chains
    (``datasets.py:317-343``); both pass ``fill=128`` to RandAugment.
    """
    if cfg is not None:
        size = cfg.model.input_size
        auglist = list(cfg.train.auglist)
        num_ops = cfg.train.num_ops
        magnitude = cfg.train.augstr
    rrc = make_random_resized_crop_rgb(size, canvas)
    aug = RandAugmentRGB(
        ops_list=list(auglist or []), num_ops=num_ops, magnitude=magnitude,
        image_hw=(size, size), fill=fill,
    )

    def pipeline(rng, pixels_u8):
        k_crop, k_flip, k_aug = jax.random.split(rng, 3)
        img = pixels_u8.astype(jnp.float32)
        img = rrc(k_crop, img)
        flip = jax.random.bernoulli(k_flip, 0.5, (img.shape[0],))
        img = jnp.where(flip[:, None, None, None], jnp.flip(img, axis=-1), img)
        img = aug(k_aug, img)
        # ToTensor (x/255) then range [-1, 1]
        return (img / 255.0 * 2.0 - 1.0).astype(out_dtype)

    return pipeline


def make_rgb_eval_pipeline(cfg=None, *, size: int = 224, resize_to: int = 256,
                           canvas: int = 512, out_dtype=jnp.float32):
    """Resize(256) + CenterCrop(224) (vit) or Resize(256) (swin)."""
    if cfg is not None:
        size = cfg.model.input_size
        if cfg.model.arch == "swinv2":
            resize_to = size  # swin val: Resize(256) only (datasets.py:347)
    rcc = make_resize_center_crop_rgb(resize_to, size, canvas)

    def pipeline(pixels_u8):
        img = rcc(pixels_u8.astype(jnp.float32))
        return (img / 255.0 * 2.0 - 1.0).astype(out_dtype)

    return pipeline
