"""Fused DCT input-pipeline Pallas kernel: flip + RandAugment + ToRange.

The production cropped-wire train pipeline
(``augment.pipeline.make_cropped_train_pipeline``) runs unpack -> per-sample
flip -> RandAugment -> ToRange as XLA ops.  Its hot part is the batched
``lax.switch`` RandAugment policy: under ``vmap`` XLA evaluates EVERY branch
over the full batch each round and selects per sample — with the 14-op ViT
preset and ``num_ops=2`` that is ~28 full-tensor passes over HBM to keep 2
(measured 9.3 ms of an 89.9 ms ViT-Ti step at batch 256, STEP_PROFILE.json).

This kernel re-designs that TPU-first: one grid step per sample, the whole
sample resident in VMEM, and ``lax.switch`` on a prefetched SMEM scalar so
each sample executes ONLY its drawn branch.  Flip and the final ToRange fuse
into the same single HBM read/write.

Layout: the caller reshapes ``(B, C, H, W, 8, 8)`` coefficients to
``(B, C, H*W, 64)`` — the 64 frequencies sit on VPU *lanes*, the flattened
block grid on sublanes.  Every preset op is then one of
  - a lane-masked elementwise / reduction op (photometric DC ops),
  - a static sublane shift + iota mask (TranslateX/Y, Cutout),
  - an exact permutation matmul on the MXU (flip, Rotate90): grid movement is
    a row permutation of the (H*W, 64) matrix and the intra-block transpose a
    64x64 lane permutation; both matrices are built IN-KERNEL from iota
    comparisons (0/1 exact, ``precision=HIGHEST``), so Mosaic never sees a
    ``rev``/transpose primitive and no VMEM is spent on constant operands.

Randomness is drawn OUTSIDE by ``RandAugmentDCT.draw_policy`` (the same
function the XLA path consumes), so both paths apply bit-identical
augmentation decisions.

Reference semantics: ``utils/custom_transforms.py:944-1127`` via
``augment.randaugment._make_op`` — every branch mirrors one of those op
bodies on the lane layout (op math cited in ``ops/photometric.py``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgbnomore_tpu.augment.randaugment import _magnitude_table
from rgbnomore_tpu.ops.photometric import DCT_MAX, DCT_MIN

# Ops the kernel implements; lists containing anything else (Shear/Rotate/
# Equalize/... — the RGB-domain names) fall back to the XLA switch path.
SUPPORTED_OPS = frozenset({
    "Identity", "AutoContrast", "Posterize", "SolarizeAdd", "Color",
    "Contrast", "Brightness", "Sharpness", "MidfreqAug", "Cutout",
    "TranslateX", "TranslateY", "Rotate90", "AutoSaturation", "Grayscale",
    "ChromaDrop",
})


def _clip(x):
    return jnp.clip(x, DCT_MIN, DCT_MAX)


def _dc_mask(x):
    """lane == 0 <=> the block's DC coefficient (freq (0, 0))."""
    return lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) == 0


def _hw_iota(x, w: int):
    """(h, w) block-grid coordinates of each row of the (C, H*W, 64) layout."""
    r = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return r // w, r % w


def _sign_col(x):
    """(-1)^j for lane f=(i,j): horizontal-flip sign (``dct_ops.py:601-621``)."""
    f = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where((f % 8) % 2 == 1, -1.0, 1.0)


def _sign_row(x):
    """(-1)^i for lane f=(i,j): vertical-flip sign."""
    f = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where((f // 8) % 2 == 1, -1.0, 1.0)


def _perm_matmul(x, src_of_row):
    """Exact row permutation of the (C, N, 64) value as an MXU matmul.

    ``out[c, r, f] = x[c, src_of_row(r), f]`` with the 0/1 permutation matrix
    generated from iota comparisons (no constant operand, no ``rev``).
    """
    n = x.shape[1]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)  # output row r
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)  # input row
    q = (cols == src_of_row(rows)).astype(jnp.float32)
    return jnp.einsum("rs,csf->crf", q, x, precision=lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def _freq_transpose(x):
    """Per-block 8x8 transpose as an exact 64x64 lane-permutation matmul."""
    f = lax.broadcasted_iota(jnp.int32, (64, 64), 0)  # input lane
    g = lax.broadcasted_iota(jnp.int32, (64, 64), 1)  # output lane
    p = (g == (f % 8) * 8 + f // 8).astype(jnp.float32)
    return jnp.einsum("csf,fg->csg", x, p, precision=lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def _flip_h(x, w: int):
    """Horizontal flip: reverse the W grid columns + negate odd freq columns
    (``ops/blocks.py flip_dct``; reference ``utils/dct_ops.py:601-621``)."""
    flipped = _perm_matmul(x, lambda r: (r // w) * w + (w - 1 - r % w))
    return flipped * _sign_col(x)


def _rot90(x, w: int, k: int):
    """Exact 90-degree rotation (``ops/blocks.py rotate_dct_90deg``;
    reference ``utils/dct_ops.py:99-130``).  Grids here are square (H == W).

    k=+1 (ccw): grid out[h,w] = in[w, W-1-h]; block transpose; odd-row signs.
    k=-1 (cw):  grid out[h,w] = in[H-1-w, h]; block transpose; odd-col signs.
    """
    if k == 1:
        g = _perm_matmul(x, lambda r: (r % w) * w + (w - 1 - r // w))
        return _freq_transpose(g) * _sign_row(x)
    g = _perm_matmul(x, lambda r: (w - 1 - r % w) * w + r // w)
    return _freq_transpose(g) * _sign_col(x)


def _shift_rows(x, t: int):
    """Static shift along the flattened-grid axis with zero fill."""
    if t == 0:
        return x
    n = x.shape[1]
    pad = [(0, 0)] * x.ndim
    pad[1] = (t, 0) if t > 0 else (0, -t)
    lo = 0 if t > 0 else -t
    return lax.slice_in_dim(jnp.pad(x, pad), lo, lo + n, axis=1)


def _translate(x, t: int, w: int, direction: str):
    """Translate by ``t`` blocks along H or W, zero-filling the gap
    (``ops/photometric.py translate_dct`` with a static magnitude).

    On the flattened grid a W shift is a row shift by ``t`` plus masking the
    columns that wrapped across grid rows; an H shift is a row shift by
    ``t*w`` (whole grid rows move, zero fill is exact)."""
    if t == 0:
        return x
    if direction == "H":
        return _shift_rows(x, t * w)
    out = _shift_rows(x, t)
    _, wi = _hw_iota(x, w)
    keep = wi >= t if t > 0 else wi < w + t
    return jnp.where(keep, out, 0.0)


def _autocontrast_lane(x):
    """Rescale DCs so min -> DCT_MIN, max -> DCT_MAX, joint over channels
    (``ops/photometric.py autocontrast_dct``)."""
    m = _dc_mask(x)
    dc_min = jnp.min(jnp.where(m, x, jnp.inf))
    dc_max = jnp.max(jnp.where(m, x, -jnp.inf))
    denom = jnp.where(dc_max == dc_min, 1.0, dc_max - dc_min)
    rescaled = DCT_MIN + (x - dc_min) / denom * (DCT_MAX - DCT_MIN)
    new_dc = jnp.where(dc_max == dc_min, x, rescaled)
    return jnp.where(m, new_dc, x)


def _midfreq_filters(mag: float) -> np.ndarray:
    """(2, 64) filters for sign +1 / -1, pre-composed with the block shift.

    ``midfreqaug_dct`` is roll -> multiply by gaussian filt -> clamp ->
    roll-back; clamp commutes with the rolls, so the whole op is
    ``clamp(x * filt[(i+4)%8, (j+4)%8])`` (``utils/dct_ops.py:710-746``).
    """
    out = np.empty((2, 64), np.float32)
    for s_i, sign in enumerate((1.0, -1.0)):
        intensity = mag * sign
        std = 4.0 - 2.2 * abs(intensity)
        i = np.arange(8.0) - 3.5
        g = np.exp(-0.5 * np.square(i / std))
        filt = g[:, None] * g[None, :]
        filt = 1.0 / filt if intensity >= 0 else filt
        shifted = np.roll(filt, (-4, -4), axis=(0, 1))  # filt[(i+4)%8,(j+4)%8]
        out[s_i] = shifted.reshape(64)
    return out


def _sharp_filters(mag: float) -> np.ndarray:
    """(2, 64) sharpen/blur ramps for sign +1 / -1 (``utils/dct_ops.py:681``)."""
    out = np.empty((2, 64), np.float32)
    for s_i, sign in enumerate((1.0, -1.0)):
        ramp = np.clip(1.0 + 2.0 * mag * sign * np.arange(8.0) / 7.0, 0.0, None)
        out[s_i] = (ramp[:, None] * ramp[None, :]).reshape(64)
    return out


def _make_branches(ops_list, magnitude, num_bins, grid_h, grid_w):
    """Branch fns ``(y, c, sign, ch, cw, drop, filts) -> (y, c)`` on the
    (C, H*W, 64) lane layout (mirroring ``randaugment._make_op``), plus the
    (n_ops, 2, 64) per-op filter table (rows: sign +1 / -1; ones when the op
    has no filter) passed through as a broadcast operand."""
    table = _magnitude_table(num_bins, grid_h, grid_w)
    branches = []
    filts = np.ones((len(ops_list), 2, 64), np.float32)
    for i, name in enumerate(ops_list):
        mags, signed = table[name]
        mag = float(mags[magnitude])
        if name == "Sharpness":
            filts[i] = _sharp_filters(mag)
        elif name == "MidfreqAug":
            filts[i] = _midfreq_filters(mag)
        branches.append(_make_branch(name, mag, i, grid_w))
    return branches, filts


def _make_branch(name: str, mag: float, op_i: int, w: int) -> Callable:
    def clamp_pair(y, c):
        return _clip(y), _clip(c)

    if name == "Identity":
        return lambda y, c, s, ch, cw, d, ft: (y, c)

    if name == "AutoContrast":
        return lambda y, c, s, ch, cw, d, ft: clamp_pair(_autocontrast_lane(y), c)

    if name == "AutoSaturation":
        return lambda y, c, s, ch, cw, d, ft: clamp_pair(y, _autocontrast_lane(c))

    if name == "Posterize":

        def posterize(x):
            step = 2.0 ** mag
            n = round((DCT_MAX - DCT_MIN) / step)
            idx = jnp.round((x - DCT_MIN) / step)
            out = DCT_MIN + idx * (DCT_MAX - DCT_MIN) / max(n, 1.0)
            return jnp.where(_dc_mask(x), out, x)

        return lambda y, c, s, ch, cw, d, ft: clamp_pair(posterize(y), posterize(c))

    if name == "SolarizeAdd":
        add = int(mag)

        def solarize_add(x):
            m = _dc_mask(x) & (x < 0.0)
            return _clip(jnp.where(m, x + add, x))

        return lambda y, c, s, ch, cw, d, ft: clamp_pair(solarize_add(y), c)

    if name == "Color":

        def op(y, c, s, ch, cw, d, ft):
            f = 1.0 + mag * s
            return clamp_pair(y, jnp.where(_dc_mask(c), c * f, c))

        return op

    if name == "Contrast":

        def op(y, c, s, ch, cw, d, ft):
            f = 1.0 + mag * s
            return clamp_pair(jnp.where(_dc_mask(y), y * f, y), c)

        return op

    if name == "Brightness":

        def op(y, c, s, ch, cw, d, ft):
            m = _dc_mask(y)
            n_dc = y.shape[0] * y.shape[1]
            mean_abs = jnp.sum(jnp.where(m, jnp.abs(y), 0.0)) / n_dc
            return clamp_pair(jnp.where(m, y + mean_abs * (mag * s), y), c)

        return op

    if name in ("Sharpness", "MidfreqAug"):

        def op(y, c, s, ch, cw, d, ft):
            f = jnp.where(s > 0, ft[op_i, 0], ft[op_i, 1])
            return clamp_pair(_clip(y * f), c)

        return op

    if name == "Cutout":
        size = int(round(mag))
        size -= size % 2

        def hole(x, pad, grid_w, hh, ww):
            hi, wi = _hw_iota(x, grid_w)
            m = (hi >= hh - pad) & (hi < hh + pad) & \
                (wi >= ww - pad) & (wi < ww + pad)
            return jnp.where(m, 0.0, x)

        def op(y, c, s, ch, cw, d, ft):
            return clamp_pair(hole(y, size, w, ch, cw),
                              hole(c, size // 2, w // 2, ch // 2, cw // 2))

        return op

    if name in ("TranslateX", "TranslateY"):
        direction = "W" if name == "TranslateX" else "H"
        # sign applied before float-mod evenization (custom_transforms.py:958)
        t_pos = int(mag - (mag % 2))
        t_neg = int(-mag - ((-mag) % 2))
        if t_pos == 0 and t_neg == 0:
            return lambda y, c, s, ch, cw, d, ft: (y, c)

        def op(y, c, s, ch, cw, d, ft):
            def go(t):
                return clamp_pair(_translate(y, t, w, direction),
                                  _translate(c, t // 2, w // 2, direction))

            return lax.cond(s > 0, lambda: go(t_pos), lambda: go(t_neg))

        return op

    if name == "Rotate90":

        def op(y, c, s, ch, cw, d, ft):
            def go(k):
                return clamp_pair(_rot90(y, w, k), _rot90(c, w // 2, k))

            return lax.cond(s > 0, lambda: go(1), lambda: go(-1))

        return op

    if name == "Grayscale":
        return lambda y, c, s, ch, cw, d, ft: clamp_pair(y, c * 0.0)

    if name == "ChromaDrop":

        def op(y, c, s, ch, cw, d, ft):
            keep = jnp.where(d > 0, 1, 0)
            ch_idx = lax.broadcasted_iota(jnp.int32, c.shape, 0)
            return clamp_pair(y, jnp.where(ch_idx == keep, c, 0.0))

        return op

    raise ValueError(f"Pallas aug kernel does not support op: {name}")


def _kernel(branches, num_ops: int, grid_w: int, val_scale: float,
            val_shift: float,
            idx_ref, sign_ref, ch_ref, cw_ref, drop_ref, flip_ref,
            y_ref, c_ref, filts_ref, yo_ref, co_ref):
    b = pl.program_id(0)
    y = y_ref[0]  # (1, H*W, 64)
    c = c_ref[0]  # (2, (H/2)*(W/2), 64)
    filts = filts_ref[...]

    # per-sample horizontal flip (pipeline order: flip BEFORE the policy)
    y, c = lax.cond(
        flip_ref[b] > 0,
        lambda: (_flip_h(y, grid_w), _flip_h(c, grid_w // 2)),
        lambda: (y, c),
    )
    # the policy clamps on entry (randaugment.RandAugmentDCT.__call__)
    y, c = _clip(y), _clip(c)
    for r in range(num_ops):
        y, c = lax.switch(
            idx_ref[b, r], branches, y, c,
            sign_ref[b, r], ch_ref[b, r], cw_ref[b, r], drop_ref[b, r], filts,
        )
    # ToRange(-1, 1) from [-1024, 1016] (custom_transforms.py:406-466)
    yo_ref[0] = (y * val_scale + val_shift).astype(yo_ref.dtype)
    co_ref[0] = (c * val_scale + val_shift).astype(co_ref.dtype)


def fused_flip_aug_range(
    y: jax.Array, c: jax.Array, policy, flip: jax.Array, *,
    ops_list, num_ops: int, magnitude: int, num_bins: int = 11,
    out_dtype=jnp.float32, interpret: bool = False,
):
    """Apply flip + ``num_ops`` RandAugment rounds + ToRange in ONE kernel.

    ``y`` (B, 1, H, W, 8, 8) f32, ``c`` (B, 2, H/2, W/2, 8, 8) f32 —
    already-unpacked dequantized coefficients.  ``policy`` is the
    ``RandAugmentDCT.draw_policy`` tuple; ``flip`` a (B,) bool.  Returns
    ``(y, c)`` in the input block shapes, ToRange'd to [-1, 1] in
    ``out_dtype``.
    """
    b_sz, _, h, w = y.shape[:4]
    hc, wc = c.shape[2], c.shape[3]
    idx, sign, cut_ch, cut_cw, drop = policy
    branches, filts = _make_branches(ops_list, magnitude, num_bins, h, w)

    yf = y.reshape(b_sz, 1, h * w, 64)
    cf = c.reshape(b_sz, 2, hc * wc, 64)
    val_scale = 2.0 / (DCT_MAX - DCT_MIN)
    val_shift = -1.0 - DCT_MIN * val_scale

    kernel = functools.partial(_kernel, branches, num_ops, w, val_scale,
                               val_shift)
    spec_y = pl.BlockSpec((1, 1, h * w, 64), lambda b, *_: (b, 0, 0, 0))
    spec_c = pl.BlockSpec((1, 2, hc * wc, 64), lambda b, *_: (b, 0, 0, 0))
    spec_filts = pl.BlockSpec(filts.shape, lambda b, *_: (0, 0, 0))
    yo, co = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(b_sz,),
            in_specs=[spec_y, spec_c, spec_filts],
            out_specs=[spec_y, spec_c],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(yf.shape, out_dtype),
            jax.ShapeDtypeStruct(cf.shape, out_dtype),
        ],
        interpret=interpret,
    )(
        idx.astype(jnp.int32), sign.astype(jnp.float32),
        cut_ch.astype(jnp.int32), cut_cw.astype(jnp.int32),
        drop.astype(jnp.int32), flip.astype(jnp.int32),
        yf, cf, jnp.asarray(filts),
    )
    return (yo.reshape(y.shape), co.reshape(c.shape))
