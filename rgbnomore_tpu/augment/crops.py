"""Batched random-resized-crop / center-crop for DCT coefficients, as matmuls.

TPU-first re-design of the reference's per-sample CPU crop+resize
(``utils/custom_transforms.py:527-669``, ``:819-911``).  Key observation: the
reference's crop followed by gcd-based resize is, per axis, a *linear map*
from the canvas coefficient layout to the target layout.  For each admissible
crop size ``s`` we precompute the dense resize operator ``R(s->target)``
(``ops.basis.resize_axis_operator``); the crop offset just shifts where ``R``
sits inside a ``(target*8, canvas*8)`` matrix.  The whole batched crop+resize
is then two batched MXU matmuls:

    out[b] = M_h[b] @ Y_flat[b] @ M_w[b]^T

with per-sample ``M`` built by a cheap gather.  No dynamic shapes, no
per-sample branching — XLA sees one fused program.

Crop-box distribution matches the reference exactly (``ratio`` fixed 1:1 as
the DCT pipelines use): ``area ~ U(scale)*H*W``, side ``round(sqrt(area))``
snapped to the even factors / multiples of the target
(``custom_transforms.py:557-629``), offsets uniform, floored to multiples of
the chroma scale.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from jax import lax

from rgbnomore_tpu.ops.basis import resize_axis_operator

__all__ = [
    "crop_size_candidates",
    "make_random_resized_crop",
    "make_center_crop_resize",
    "make_full_resize",
]


def crop_size_candidates(target: int, canvas: int) -> list[int]:
    """Even factors of ``target`` plus multiples of ``target`` up to ``canvas``.

    These are the only crop sizes the reference's ``choose_closest`` can emit
    (``custom_transforms.py:550-555``, ``:571-578``).
    """
    evens = sorted({f for f in range(2, target + 1) if target % f == 0 and f % 2 == 0})
    mults = [target * k for k in range(2, canvas // target + 1)]
    return evens + mults


@functools.lru_cache(maxsize=None)
def _stacked_resize_operators(target: int, canvas: int, chroma: bool) -> np.ndarray:
    """(K, target*8, smax*8) stack of zero-padded resize operators.

    ``chroma=True`` uses the halved candidate sizes and halved target.
    """
    cands = crop_size_candidates(target, canvas)
    if chroma:
        cands = [max(1, s // 2) for s in cands]
        tgt = math.ceil(target / 2)
    else:
        tgt = target
    smax = max(cands)
    out = np.zeros((len(cands), tgt * 8, smax * 8), np.float32)
    for k, s in enumerate(cands):
        out[k, :, : s * 8] = resize_axis_operator(s, tgt)
    return out


def _choose_closest(val: jax.Array, evens: jax.Array, maxfac: int, maxval: int) -> jax.Array:
    """The reference's factor-or-multiple snap (``custom_transforms.py:571-578``)."""
    fac = evens[jnp.argmin(jnp.abs(evens - val))]
    mult = jnp.round(val / maxfac) * maxfac
    mult = jnp.where(mult > maxval, mult - maxfac, mult)
    return jnp.where(val <= maxfac, fac, mult).astype(jnp.int32)


def _build_matrix(r_stack: jax.Array, size_idx: jax.Array, offset_blocks: jax.Array, canvas: int):
    """Per-sample (target*8, canvas*8) crop+resize matrix via gather."""
    r = r_stack[size_idx]  # (T8, smax8)
    smax8 = r.shape[-1]
    cols = jnp.arange(canvas * 8) - offset_blocks * 8
    valid = (cols >= 0) & (cols < smax8)
    gathered = r[:, jnp.clip(cols, 0, smax8 - 1)]
    return jnp.where(valid[None, :], gathered, 0.0)


def _apply_separable(coeff: jax.Array, m_h: jax.Array, m_w: jax.Array) -> jax.Array:
    """coeff (B, C, H, W, 8, 8); m_h/m_w (B, T8, H8) -> (B, C, T, T, 8, 8)."""
    flat = rearrange(coeff, "b c h w kh kw -> b c (h kh) (w kw)")
    t = jnp.einsum("boh,bchw->bcow", m_h, flat, precision=lax.Precision.HIGHEST)
    out = jnp.einsum("bcow,bpw->bcop", t, m_w, precision=lax.Precision.HIGHEST)
    t8 = m_h.shape[1]
    return rearrange(out, "b c (h kh) (w kw) -> b c h w kh kw", kh=8, kw=8)


def make_random_resized_crop(
    target: int,
    canvas: int,
    scale: tuple[float, float] = (0.05, 1.0),
    chroma_scale: int = 2,
):
    """Build the batched random-resized-crop: ``fn(rng, y, cbcr) -> (y, cbcr)``.

    ``y``: (B, 1, canvas, canvas, 8, 8) float; ``cbcr``: (B, 2, canvas/2,
    canvas/2, 8, 8).  Output target grids ``target`` / ``ceil(target/2)``.
    Aspect ratio is fixed 1:1, as in both DCT train pipelines
    (``datasets.py:357``, ``:373``).
    """
    cands = crop_size_candidates(target, canvas)
    evens_np = np.asarray([c for c in cands if c <= target], np.int32)
    maxfac = int(evens_np.max())
    r_y = jnp.asarray(_stacked_resize_operators(target, canvas, chroma=False))
    r_c = jnp.asarray(_stacked_resize_operators(target, canvas, chroma=True))
    cands_arr = jnp.asarray(cands, jnp.int32)
    evens = jnp.asarray(evens_np)
    c_canvas = canvas // chroma_scale

    def sample_boxes(rng, batch):
        k_area, k_i, k_j = jax.random.split(rng, 3)
        area = canvas * canvas * jax.random.uniform(
            k_area, (batch,), minval=scale[0], maxval=scale[1]
        )
        side = jnp.round(jnp.sqrt(area))
        snap = jax.vmap(lambda v: _choose_closest(v, evens, maxfac, canvas))(side)
        size = jnp.maximum(2, snap)
        # offsets: U{0, canvas-size}, floored to multiples of chroma_scale
        i = jax.random.randint(k_i, (batch,), 0, canvas - size + 1)
        j = jax.random.randint(k_j, (batch,), 0, canvas - size + 1)
        i = i // chroma_scale * chroma_scale
        j = j // chroma_scale * chroma_scale
        size_idx = jnp.searchsorted(cands_arr, size)
        return size_idx, i, j

    def crop_resize(rng, y, cbcr):
        batch = y.shape[0]
        size_idx, i, j = sample_boxes(rng, batch)
        m_h = jax.vmap(lambda k, o: _build_matrix(r_y, k, o, canvas))(size_idx, i)
        m_w = jax.vmap(lambda k, o: _build_matrix(r_y, k, o, canvas))(size_idx, j)
        y_out = _apply_separable(y, m_h, m_w)
        mc_h = jax.vmap(lambda k, o: _build_matrix(r_c, k, o, c_canvas))(
            size_idx, i // chroma_scale
        )
        mc_w = jax.vmap(lambda k, o: _build_matrix(r_c, k, o, c_canvas))(
            size_idx, j // chroma_scale
        )
        c_out = _apply_separable(cbcr, mc_h, mc_w)
        return y_out, c_out

    return crop_resize


def make_center_crop_resize(size_resize: int, size_crop: int, canvas: int, chroma_scale: int = 2):
    """Batched ResizedCenterCrop (val transform, ``custom_transforms.py:819-911``).

    Deterministic for a fixed canvas, so the crop+resize collapses to one
    static matrix pair: crop ``round(size_crop/size_resize * canvas)``
    (snapped) centered, then resize to ``size_crop``.
    """
    ratio = size_crop / size_resize
    cands = crop_size_candidates(size_crop, canvas)
    evens = np.asarray([c for c in cands if c <= size_crop], np.int32)
    maxfac = int(evens.max())

    def choose(val: int, maxval: int) -> int:
        if val <= maxfac:
            return int(evens[np.argmin(np.abs(evens - val))])
        m = round(val / maxfac) * maxfac
        return m - maxfac if m > maxval else m

    s = max(1, choose(round(ratio * canvas), canvas))
    i = (canvas - s) // 2 // chroma_scale * chroma_scale

    def static_matrix(src: int, tgt: int, cvs: int, off: int):
        m = np.zeros((tgt * 8, cvs * 8), np.float32)
        m[:, off * 8 : off * 8 + src * 8] = resize_axis_operator(src, tgt)
        return jnp.asarray(m)

    m_y = static_matrix(s, size_crop, canvas, i)
    sc = max(1, s // chroma_scale)
    ic = i // chroma_scale
    m_c = static_matrix(sc, math.ceil(size_crop / chroma_scale), canvas // chroma_scale, ic)

    def crop_resize(y, cbcr):
        b = y.shape[0]
        mh = jnp.broadcast_to(m_y, (b,) + m_y.shape)
        mc = jnp.broadcast_to(m_c, (b,) + m_c.shape)
        return _apply_separable(y, mh, mh), _apply_separable(cbcr, mc, mc)

    return crop_resize


def make_full_resize(target: int, canvas: int, chroma_scale: int = 2):
    """Batched Resize_DCT of the full canvas (swin val, ``datasets.py:381``)."""
    m_y = jnp.asarray(resize_axis_operator(canvas, target))
    m_c = jnp.asarray(
        resize_axis_operator(canvas // chroma_scale, math.ceil(target / chroma_scale))
    )

    def run(y, cbcr):
        b = y.shape[0]
        mh = jnp.broadcast_to(m_y, (b,) + m_y.shape)
        mc = jnp.broadcast_to(m_c, (b,) + m_c.shape)
        return _apply_separable(y, mh, mh), _apply_separable(cbcr, mc, mc)

    return run
