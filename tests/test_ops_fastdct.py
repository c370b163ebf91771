import numpy as np
import scipy.fft
import jax.numpy as jnp

from rgbnomore_tpu.ops import fastdct


def test_fct_1d_matches_scipy(rng):
    x = rng.standard_normal((5, 16)).astype(np.float32)
    out = np.asarray(fastdct.fct_1d(jnp.asarray(x)))
    ref = scipy.fft.dct(x, axis=-1, norm="ortho")
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_ifct_1d_roundtrip(rng):
    x = rng.standard_normal((3, 8)).astype(np.float32)
    coeff = fastdct.fct_1d(jnp.asarray(x))
    back = np.asarray(fastdct.ifct_1d(coeff))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_fct_2d_matches_scipy(rng):
    x = rng.standard_normal((2, 8, 8)).astype(np.float32)
    out = np.asarray(fastdct.fct_2d(jnp.asarray(x)))
    ref = scipy.fft.dctn(x, axes=(-2, -1), norm="ortho")
    np.testing.assert_allclose(out, ref, atol=1e-4)
    back = np.asarray(fastdct.ifct_2d(jnp.asarray(out)))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_dct2dft_fast_roundtrip(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    coeff = fastdct.fct_1d(jnp.asarray(x))
    dft = fastdct.dct2dft_fast_1d(coeff)
    back = np.asarray(fastdct.dft2dct_1d(dft))
    np.testing.assert_allclose(back, np.asarray(coeff), atol=1e-4)


def test_dct2dft_2n_recovers_mirrored_fft(rng):
    x = rng.standard_normal((1, 8)).astype(np.float32)
    coeff = fastdct.fct_1d(jnp.asarray(x))
    dft2n = np.asarray(fastdct.dct2dft_2n_1d(coeff))
    mirrored = np.concatenate([x, x[:, ::-1]], axis=-1)
    ref = np.fft.fft(mirrored, axis=-1)
    np.testing.assert_allclose(dft2n, ref, atol=1e-3)


def test_dft2dct_2n_roundtrip(rng):
    x = rng.standard_normal((2, 8)).astype(np.float32)
    coeff = fastdct.fct_1d(jnp.asarray(x))
    dft2n = fastdct.dct2dft_2n_1d(coeff)
    back = np.asarray(fastdct.dft2dct_2n_1d(dft2n))
    np.testing.assert_allclose(back, np.asarray(coeff), atol=1e-4)


def test_2n_2d_roundtrip(rng):
    x = rng.standard_normal((1, 8, 8)).astype(np.float32)
    coeff = fastdct.fct_2d(jnp.asarray(x))
    dft = fastdct.dct2dft_2n_2d(coeff)
    back = np.asarray(fastdct.dft2dct_2n_2d(dft))
    np.testing.assert_allclose(back, np.asarray(coeff), atol=1e-3)
