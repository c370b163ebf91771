"""Shared numpy oracles for tests: blockwise DCT transforms via scipy."""

import numpy as np
import scipy.fft


def blockwise_dct(img: np.ndarray, ksize: int = 8) -> np.ndarray:
    """Pixels (C, H*K, W*K) -> block coefficients (C, H, W, K, K), orthonormal DCT-II."""
    c, hk, wk = img.shape
    h, w = hk // ksize, wk // ksize
    blocks = img.reshape(c, h, ksize, w, ksize).transpose(0, 1, 3, 2, 4)
    return scipy.fft.dctn(blocks, axes=(-2, -1), norm="ortho")


def blockwise_idct(coeff: np.ndarray) -> np.ndarray:
    """Block coefficients (C, H, W, K, K) -> pixels (C, H*K, W*K)."""
    c, h, w, kh, kw = coeff.shape
    blocks = scipy.fft.idctn(coeff, axes=(-2, -1), norm="ortho")
    return blocks.transpose(0, 1, 3, 2, 4).reshape(c, h * kh, w * kw)


def full_dct(img: np.ndarray) -> np.ndarray:
    """Global orthonormal 2-D DCT over the last two axes."""
    return scipy.fft.dctn(img, axes=(-2, -1), norm="ortho")
