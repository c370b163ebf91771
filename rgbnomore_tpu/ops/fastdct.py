"""FFT-based fast DCT and DCT<->DFT conversion kernels.

JAX re-derivations of the Makhoul fast-DCT family the reference keeps in
``utils/dct_torch_utils.py:8-230``.  All functions operate on the last one or
two axes and are jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "fct_1d",
    "ifct_1d",
    "fct_2d",
    "ifct_2d",
    "dct2dft_fast_1d",
    "dct2dft_fast_2d",
    "dft2dct_1d",
    "dft2dct_2d",
    "dct2dft_2n_1d",
    "dft2dct_2n_1d",
    "dct2dft_2n_2d",
    "dft2dct_2n_2d",
    "phase_shift_dft_1d",
    "phase_shift_dft_2d",
]


def fct_1d(signal: jax.Array, norm: str = "ortho") -> jax.Array:
    """Fast DCT-II along the last axis (Makhoul; ``dct_torch_utils.py:8-36``)."""
    n = signal.shape[-1]
    rearranged = jnp.concatenate([signal[..., ::2], jnp.flip(signal[..., 1::2], axis=-1)], axis=-1)
    coeff = jnp.fft.fft(rearranged, axis=-1)
    w = jnp.exp(-1j * jnp.arange(n) * jnp.pi / (2 * n))
    coeff = coeff * w
    if norm == "ortho":
        scale = jnp.full((n,), 1.0 / (jnp.sqrt(n / 2.0) * 2.0)).at[0].set(1.0 / (jnp.sqrt(1.0 * n) * 2.0))
        coeff = coeff * scale
    return 2.0 * coeff.real


def ifct_1d(coeff: jax.Array, norm: str = "ortho") -> jax.Array:
    """Inverse of :func:`fct_1d` (``dct_torch_utils.py:38-64``)."""
    n = coeff.shape[-1]
    c = coeff
    if norm == "ortho":
        scale = jnp.full((n,), jnp.sqrt(n / 2.0) * 2.0).at[0].set(jnp.sqrt(1.0 * n) * 2.0)
        c = c * scale
    flipped = jnp.concatenate([jnp.zeros_like(c[..., :1]), jnp.flip(c[..., 1:], axis=-1)], axis=-1)
    w = jnp.exp(1j * jnp.arange(n) * jnp.pi / (2 * n))
    dft = w * (c - 1j * flipped) / 2.0
    sig = jnp.fft.ifft(dft, axis=-1).real
    half = n - n // 2
    out = jnp.zeros_like(sig)
    out = out.at[..., ::2].set(sig[..., :half])
    out = out.at[..., 1::2].set(jnp.flip(sig[..., half:], axis=-1))
    return out


def fct_2d(signal: jax.Array, norm: str = "ortho") -> jax.Array:
    """2-D fast DCT on the last two axes."""
    x = fct_1d(signal, norm)
    x = fct_1d(jnp.swapaxes(x, -1, -2), norm)
    return jnp.swapaxes(x, -1, -2)


def ifct_2d(coeff: jax.Array, norm: str = "ortho") -> jax.Array:
    """2-D inverse fast DCT on the last two axes."""
    x = ifct_1d(coeff, norm)
    x = ifct_1d(jnp.swapaxes(x, -1, -2), norm)
    return jnp.swapaxes(x, -1, -2)


def dct2dft_fast_1d(dct: jax.Array, norm: str = "ortho") -> jax.Array:
    """Same-length DCT -> DFT conversion (``dct_torch_utils.py:88-105``)."""
    n = dct.shape[-1]
    c = dct
    if norm == "ortho":
        scale = jnp.full((n,), jnp.sqrt(n / 2.0) * 2.0).at[0].set(jnp.sqrt(1.0 * n) * 2.0)
        c = c * scale
    flipped = jnp.concatenate([jnp.zeros_like(c[..., :1]), jnp.flip(c[..., 1:], axis=-1)], axis=-1)
    w = jnp.exp(1j * jnp.arange(n) * jnp.pi / (2 * n))
    return w * (c - 1j * flipped) / 2.0


def dct2dft_fast_2d(dct: jax.Array, norm: str = "ortho") -> jax.Array:
    x = dct2dft_fast_1d(dct, norm)
    x = dct2dft_fast_1d(jnp.swapaxes(x, -1, -2), norm)
    return jnp.swapaxes(x, -1, -2)


def dft2dct_1d(dft: jax.Array, norm: str = "ortho") -> jax.Array:
    """Same-length DFT -> DCT conversion (``dct_torch_utils.py:115-133``)."""
    n = dft.shape[-1]
    w = jnp.exp(-1j * jnp.arange(n) * jnp.pi / (2 * n))
    dct = (2.0 * dft * w).real
    if norm == "ortho":
        scale = jnp.full((n,), 1.0 / (jnp.sqrt(n / 2.0) * 2.0)).at[0].set(1.0 / (jnp.sqrt(1.0 * n) * 2.0))
        dct = dct * scale
    return dct


def dft2dct_2d(dft: jax.Array, norm: str = "ortho") -> jax.Array:
    x = dft2dct_1d(dft, norm)
    x = dft2dct_1d(jnp.swapaxes(x, -1, -2), norm)
    return jnp.swapaxes(x, -1, -2)


def dct2dft_2n_1d(dct: jax.Array, norm: str = "ortho") -> jax.Array:
    """Recover the DFT of the length-2N mirrored sequence from a length-N DCT.

    Reference: ``dct_torch_utils.py:143-163``.
    """
    n = dct.shape[-1]
    c = dct
    if norm == "ortho":
        scale = jnp.full((n,), jnp.sqrt(n / 2.0) * 2.0).at[0].set(jnp.sqrt(1.0 * n) * 2.0)
        c = c * scale
    zeros = jnp.zeros_like(c[..., :1])
    back = -jnp.flip(c, axis=-1)[..., :-1]
    recon = jnp.concatenate([c, zeros, back], axis=-1).astype(jnp.complex64)
    w = jnp.exp(1j * jnp.arange(2 * n) * jnp.pi / (2 * n))
    return recon * w


def dft2dct_2n_1d(dft: jax.Array, norm: str = "ortho", takereal: bool = True) -> jax.Array:
    """Recover a length-N DCT from the mirrored length-2N DFT.

    Reference: ``dct_torch_utils.py:165-192``.
    """
    n2 = dft.shape[-1]
    n = n2 // 2
    w = jnp.exp(-1j * jnp.arange(n2) * jnp.pi / n2)
    x = dft.astype(jnp.complex64) * w
    if norm == "ortho":
        scale = jnp.full((n2,), 1.0 / (jnp.sqrt(n2 / 4.0) * 2.0)).at[0].set(1.0 / (jnp.sqrt(n2 / 2.0) * 2.0))
        x = x * scale
    x = x[..., :n]
    return x.real if takereal else x


def dct2dft_2n_2d(dct: jax.Array, norm: str = "ortho") -> jax.Array:
    x = dct2dft_2n_1d(dct, norm)
    x = dct2dft_2n_1d(jnp.swapaxes(x, -1, -2), norm)
    return jnp.swapaxes(x, -1, -2)


def dft2dct_2n_2d(dft: jax.Array, norm: str = "ortho") -> jax.Array:
    x = dft2dct_2n_1d(dft, norm, takereal=False)
    x = dft2dct_2n_1d(jnp.swapaxes(x, -1, -2), norm, takereal=True)
    return jnp.swapaxes(x, -1, -2)


def phase_shift_dft_1d(dft: jax.Array, degrees: float = 45.0) -> jax.Array:
    """Constant phase shift of the last axis (``dct_torch_utils.py:210-222``)."""
    rad = jnp.asarray(degrees) / 180.0 * jnp.pi
    return dft * jnp.exp(1j * rad)


def phase_shift_dft_2d(dft: jax.Array, degrees: float = 45.0) -> jax.Array:
    x = phase_shift_dft_1d(dft, degrees)
    x = phase_shift_dft_1d(jnp.swapaxes(x, -1, -2), degrees)
    return jnp.swapaxes(x, -1, -2)
