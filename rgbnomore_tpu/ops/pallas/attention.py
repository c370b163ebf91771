"""Fused multi-head attention as a Pallas TPU kernel (forward + backward).

For the ViT's short sequences (196-294 tokens) a whole head's attention fits
in VMEM, so instead of flash-style tiling we fuse QKᵀ -> softmax -> AV into
one kernel per (batch, head) grid cell: the (N, N) attention matrix never
touches HBM.  At ViT-Ti scale that removes ~120 MB of HBM traffic per
256-batch forward (and twice that in backward), which is exactly the
memory-bound part of the step.

The backward pass is the standard softmax-attention VJP, also fused per
(batch, head):

    dV = Pᵀ dO
    dP = dO Vᵀ
    dS = P * (dP - rowsum(dP * P))
    dQ = scale * dS K ;  dK = scale * dSᵀ Q

Inputs are padded to TPU tile boundaries (sublane multiple of 8, lane 128)
outside the kernels; padded key columns are masked with -inf before softmax.
The logit scaling follows the reference ViT: ``1/sqrt(emb_size)``, passed in
as ``scale`` (``models/plainvit.py:455-457``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(n_real: int, scale: float, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    n_pad = s.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    s = jnp.where(col < n_real, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(n_real: int, scale: float, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    n_pad = s.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    s = jnp.where(col < n_real, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.dot(p.T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad(x, n_pad, d_pad):
    b, h, n, d = x.shape
    return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))


def _attention_impl(q, k, v, scale: float, interpret: bool):
    b, h, n, d = q.shape
    n_pad = _round_up(n, 128)
    d_pad = _round_up(d, 128)
    qp = _pad(q, n_pad, d_pad).reshape(b * h, 1, n_pad, d_pad)
    kp = _pad(k, n_pad, d_pad).reshape(b * h, 1, n_pad, d_pad)
    vp = _pad(v, n_pad, d_pad).reshape(b * h, 1, n_pad, d_pad)

    spec = pl.BlockSpec((1, 1, n_pad, d_pad), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n, scale),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, 1, n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale: float, interpret: bool = False):
    """Softmax attention ``softmax(scale * QKᵀ) V`` fused in VMEM.

    ``q, k, v``: (B, H, N, D).  ``interpret=True`` runs the kernels in the
    Pallas interpreter (for CPU tests).
    """
    return _attention_impl(q, k, v, scale, interpret)


def _fwd(q, k, v, scale, interpret):
    return _attention_impl(q, k, v, scale, interpret), (q, k, v)


def _bwd(scale, interpret, residuals, g):
    q, k, v = residuals
    b, h, n, d = q.shape
    n_pad = _round_up(n, 128)
    d_pad = _round_up(d, 128)
    qp = _pad(q, n_pad, d_pad).reshape(b * h, 1, n_pad, d_pad)
    kp = _pad(k, n_pad, d_pad).reshape(b * h, 1, n_pad, d_pad)
    vp = _pad(v, n_pad, d_pad).reshape(b * h, 1, n_pad, d_pad)
    gp = _pad(g, n_pad, d_pad).reshape(b * h, 1, n_pad, d_pad)

    spec = pl.BlockSpec((1, 1, n_pad, d_pad), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, n, scale),
        grid=(b * h,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b * h, 1, n_pad, d_pad), q.dtype) for _ in range(3)
        ),
        interpret=interpret,
    )(qp, kp, vp, gp)
    unpad = lambda x: x.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]
    return unpad(dq), unpad(dk), unpad(dv)


fused_attention.defvjp(_fwd, _bwd)


# ===========================================================================
# Swin window attention: pair-packed fused kernel.
#
# SwinV2's windows are N = ws^2 = 64 tokens with head_dim 32 (stage 1) — the
# plain fused_attention pays a 128-lane/128-sublane padding tax of up to 8x
# at those shapes (BENCHMARKS.md round 1).  Here TWO consecutive windows are
# stacked along the sublane axis into one (2N = 128, D) tile, and the cross-
# window logit quadrants are killed by the additive bias (block-diagonal with
# -1e9 off-diagonal), so one MXU matmul serves two windows.  The bias carries
# the CPB relative-position table and the shifted-window mask, and its
# GRADIENT is accumulated in-kernel across the (sequential) TPU grid, so the
# (2N, 2N) attention matrices never reach HBM in either direction.
# ===========================================================================


def _win_fwd_kernel(two_n: int, q_ref, k_ref, v_ref, b_ref, o_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    b = b_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + b
    n_pad = s.shape[-1]
    if n_pad != two_n:  # mask sublane padding columns
        col = lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        s = jnp.where(col < two_n, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _win_bwd_kernel(two_n: int, q_ref, k_ref, v_ref, b_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, db_ref):
    t = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    b = b_ref[0, 0]
    do = do_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + b
    n_pad = s.shape[-1]
    if n_pad != two_n:
        col = lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        s = jnp.where(col < two_n, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.dot(p.T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0, 0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0, 0] = jnp.dot(ds.T, q, preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    # bias gradient: the backward grid is (npat, h, m) with the accumulation
    # dim t INNERMOST, so every revisit of the (pattern, head) db block is a
    # CONSECUTIVE grid step — the only pattern for which Pallas TPU keeps an
    # output block resident in VMEM between visits.  (A (pairs, h) grid with
    # index_map (i % npat, j) revisits non-consecutively and reads back stale
    # VMEM on real TPUs, even though interpret mode emulates it fine.)
    @pl.when(t == 0)
    def _init():
        db_ref[0, 0] = ds.astype(db_ref.dtype)

    @pl.when(t > 0)
    def _acc():
        db_ref[0, 0] = (db_ref[0, 0] + ds).astype(db_ref.dtype)


def _win_pack(x, d_pad):
    """(bw, h, n, d) -> (bw/2, h, 2n, d_pad): stack consecutive window pairs."""
    bw, h, n, d = x.shape
    x = x.reshape(bw // 2, 2, h, n, d).transpose(0, 2, 1, 3, 4).reshape(bw // 2, h, 2 * n, d)
    pad_n = _round_up(2 * n, 8) - 2 * n
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad_n), (0, d_pad - d)))


def _win_unpack(x, bw, h, n, d):
    x = x[:, :, : 2 * n, :d].reshape(bw // 2, h, 2, n, d)
    return x.transpose(0, 2, 1, 3, 4).reshape(bw, h, n, d)


def _win_specs(npat, two_n_pad, d_pad):
    qspec = pl.BlockSpec((1, 1, two_n_pad, d_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, two_n_pad, two_n_pad),
                         lambda i, j: (i % npat, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, bspec


def _window_attention_impl(q, k, v, bias2, interpret: bool):
    bw, h, n, d = q.shape
    npat = bias2.shape[0]
    d_pad = _round_up(d, 128)
    two_n_pad = _round_up(2 * n, 8)
    qp = _win_pack(q, d_pad)
    kp = _win_pack(k, d_pad)
    vp = _win_pack(v, d_pad)
    bp = jnp.pad(bias2, ((0, 0), (0, 0), (0, two_n_pad - 2 * n), (0, two_n_pad - 2 * n)))
    qspec, bspec = _win_specs(npat, two_n_pad, d_pad)
    out = pl.pallas_call(
        functools.partial(_win_fwd_kernel, 2 * n),
        grid=(bw // 2, h),
        in_specs=[qspec, qspec, qspec, bspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bw // 2, h, two_n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bp)
    return _win_unpack(out, bw, h, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_window_attention(q, k, v, bias2, interpret: bool = False):
    """Paired-window attention ``softmax(QKᵀ + bias) V`` fused in VMEM.

    ``q, k, v``: (BW, H, N, D) per-window tensors with BW even; any logit
    scale must be pre-folded into ``q``.  ``bias2``: (NPAT, H, 2N, 2N)
    additive logits for CONSECUTIVE window pairs — block-diagonal per-window
    bias (+ shift mask) with a large negative constant on the off-diagonal
    quadrants; pair ``i`` uses pattern ``i % NPAT``.  All four inputs are
    differentiable (the bias gradient is accumulated in-kernel).
    """
    return _window_attention_impl(q, k, v, bias2, interpret)


def _win_fwd(q, k, v, bias2, interpret):
    return _window_attention_impl(q, k, v, bias2, interpret), (q, k, v, bias2)


def _win_bwd(interpret, residuals, g):
    q, k, v, bias2 = residuals
    bw, h, n, d = q.shape
    npat = bias2.shape[0]
    pairs = bw // 2
    assert pairs % npat == 0, (
        f"fused_window_attention backward needs pairs ({pairs}) divisible by "
        f"bias patterns ({npat}) — every model call site satisfies this "
        "(pairs = batch * nW/2, npat = nW/2)"
    )
    m = pairs // npat  # pairs per pattern (the db accumulation depth)
    d_pad = _round_up(d, 128)
    two_n_pad = _round_up(2 * n, 8)
    qp = _win_pack(q, d_pad)
    kp = _win_pack(k, d_pad)
    vp = _win_pack(v, d_pad)
    gp = _win_pack(g, d_pad)
    bp = jnp.pad(bias2, ((0, 0), (0, 0), (0, two_n_pad - 2 * n), (0, two_n_pad - 2 * n)))
    # grid (npat, h, m), t innermost: pair index = p + t*npat (pair i uses
    # pattern i % npat), so all pairs sharing a pattern are consecutive and
    # the db output block (p, j) accumulates legally in VMEM (see kernel).
    pair_spec = pl.BlockSpec((1, 1, two_n_pad, d_pad),
                             lambda p, j, t, _npat=npat: (p + t * _npat, j, 0, 0),
                             memory_space=pltpu.VMEM)
    patt_spec = pl.BlockSpec((1, 1, two_n_pad, two_n_pad),
                             lambda p, j, t: (p, j, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_win_bwd_kernel, 2 * n),
        grid=(npat, h, m),
        in_specs=[pair_spec, pair_spec, pair_spec, patt_spec, pair_spec],
        out_specs=(pair_spec, pair_spec, pair_spec, patt_spec),
        out_shape=(
            jax.ShapeDtypeStruct((pairs, h, two_n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((pairs, h, two_n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((pairs, h, two_n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((npat, h, two_n_pad, two_n_pad), bias2.dtype),
        ),
        interpret=interpret,
    )(qp, kp, vp, bp, gp)
    unpad_b = db[:, :, : 2 * n, : 2 * n]
    return (_win_unpack(dq, bw, h, n, d), _win_unpack(dk, bw, h, n, d),
            _win_unpack(dv, bw, h, n, d), unpad_b)


fused_window_attention.defvjp(_win_fwd, _win_bwd)
