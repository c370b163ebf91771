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
