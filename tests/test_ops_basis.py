import numpy as np
import scipy.fft

from rgbnomore_tpu.ops import basis


def test_dct_basis_matches_scipy():
    b = basis.dct_basis_matrix(8)
    # dct of the identity's columns gives the analysis matrix itself.
    ref = scipy.fft.dct(np.eye(8), axis=0, norm="ortho")
    np.testing.assert_allclose(b, ref.astype(np.float32), atol=1e-6)


def test_dct_basis_orthonormal():
    for n in (4, 8, 16, 32):
        b = basis.dct_basis_matrix(n).astype(np.float64)
        np.testing.assert_allclose(b @ b.T, np.eye(n), atol=1e-6)


def test_fourier_basis_unitary():
    f = basis.fourier_basis_matrix(16).astype(np.complex128)
    np.testing.assert_allclose(f @ f.conj().T, np.eye(16), atol=1e-5)


def test_conversion_matrix_orthonormal():
    for ls, mult in [(8, 2), (8, 4), (4, 2), (2, 4), (8, 7)]:
        c = basis.conversion_matrix(ls, mult).astype(np.float64)
        n = ls * mult
        np.testing.assert_allclose(c @ c.T, np.eye(n), atol=1e-5)


def test_conversion_matrix_identity_for_mult_1():
    np.testing.assert_array_equal(basis.conversion_matrix(8, 1), np.eye(8, dtype=np.float32))


def test_conversion_matrix_semantics(rng):
    """C maps stacked small-block DCT coeffs onto the large-block DCT coeffs."""
    ls, mult = 8, 2
    n = ls * mult
    sig = rng.standard_normal(n)
    small_coeffs = np.concatenate(
        [scipy.fft.dct(sig[i * ls : (i + 1) * ls], norm="ortho") for i in range(mult)]
    )
    large_coeffs = scipy.fft.dct(sig, norm="ortho")
    c = basis.conversion_matrix(ls, mult).astype(np.float64)
    np.testing.assert_allclose(c @ small_coeffs, large_coeffs, atol=1e-5)


def test_resize_axis_operator_identity():
    r = basis.resize_axis_operator(7, 7)
    np.testing.assert_array_equal(r, np.eye(56, dtype=np.float32))


def test_resize_axis_operator_roundtrip_when_upsampling(rng):
    """Upsampling then downsampling by the same integer factor is lossless."""
    up = basis.resize_axis_operator(4, 8).astype(np.float64)
    down = basis.resize_axis_operator(8, 4).astype(np.float64)
    np.testing.assert_allclose(down @ up, np.eye(32), atol=1e-5)
