import numpy as np
import jax.numpy as jnp

from rgbnomore_tpu.ops import geometry
from tests.helpers import blockwise_dct, blockwise_idct


def _blob(h, w, cy, cx, sigma=1.5):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma**2)).astype(np.float32)[None]


def _center_of_mass(img):
    img = np.maximum(img[0], 0)
    ys, xs = np.mgrid[0 : img.shape[0], 0 : img.shape[1]]
    total = img.sum()
    return (ys * img).sum() / total, (xs * img).sum() / total


def test_rotate_image_90_ccw_moves_top_to_left():
    # blob above center; CCW rotation moves it to the left of center
    img = jnp.asarray(_blob(33, 33, cy=5, cx=16))
    out = np.asarray(geometry.rotate_image(img, 90.0, interpolation="bilinear"))
    cy, cx = _center_of_mass(out)
    assert abs(cy - 16) < 0.5 and abs(cx - 5) < 0.5, (cy, cx)


def test_rotate_image_small_angle_center_of_mass():
    img = jnp.asarray(_blob(33, 33, cy=16, cx=26))  # right of center
    out = np.asarray(geometry.rotate_image(img, 30.0, interpolation="bilinear"))
    cy, cx = _center_of_mass(out)
    # CCW by 30 deg: (dx=10, dy=0) -> (dx=10*cos30, dy=-10*sin30)
    assert abs(cx - (16 + 10 * np.cos(np.radians(30)))) < 0.7, cx
    assert abs(cy - (16 - 10 * np.sin(np.radians(30)))) < 0.7, cy


def test_shear_inverse_consistency():
    img = jnp.asarray(_blob(33, 33, cy=10, cx=22))
    sheared = geometry.shear_image(img, deg_x=15.0, interpolation="bilinear")
    back = np.asarray(geometry.shear_image(sheared, deg_x=-15.0, interpolation="bilinear"))
    # interior should approximately round-trip (tan(15)*tan(15) ~ 7% scale error is below tolerance here)
    a = np.asarray(img)[0, 8:25, 8:25]
    b = back[0, 8:25, 8:25]
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.98


def test_rotate_block_90_is_near_exact(rng):
    img = rng.standard_normal((1, 32, 32)).astype(np.float32)
    coeff = jnp.asarray(blockwise_dct(img).astype(np.float32))
    out = np.asarray(geometry.rotate_block(coeff, degrees=90.0))
    expected = np.rot90(img, k=1, axes=(1, 2))
    got = blockwise_idct(out)
    np.testing.assert_allclose(got, expected, atol=1e-2)


def _mixed_fft(img):
    """combine_blocks_dft's convention: forward DFT on rows, inverse on cols."""
    return np.fft.ifft(np.fft.fft(img, axis=0), axis=1)


def _mixed_ifft(spec):
    return np.fft.fft(np.fft.ifft(spec, axis=0), axis=1).real


def _reference_rotate_sim(img32, degrees, pad=2**0.5):
    """Numpy emulation of the reference rotate algorithm, using our resampler
    as the stand-in for torchvision rotate (validated separately)."""
    h = img32.shape[0]
    blocks_n = h // 8
    hp = int(blocks_n * pad)
    margin = (hp - blocks_n) // 2 * 8
    canvas = np.zeros((hp * 8, hp * 8), np.float32)
    canvas[margin : margin + h, margin : margin + h] = img32
    rolled = np.roll(canvas, (hp // 2 * 8, hp // 2 * 8), axis=(0, 1))  # blockshift
    spec = np.fft.fftshift(_mixed_fft(rolled))
    rot = np.asarray(geometry.rotate_image(jnp.asarray(spec.real[None]), -degrees, "nearest"))[0]
    rot = rot + 1j * np.asarray(geometry.rotate_image(jnp.asarray(spec.imag[None]), -degrees, "nearest"))[0]
    out = _mixed_ifft(np.fft.ifftshift(rot))
    out = np.roll(out, ((hp - hp // 2) * 8, (hp - hp // 2) * 8), axis=(0, 1))  # iblockshift
    return out[margin : margin + h, margin : margin + h]


def test_rotate_block_matches_reference_algorithm():
    """rotate_block must reproduce the reference's spectral-rotation pipeline
    (``utils/dct_ops.py:367-434``) including its block-granular centering."""
    img = _blob(32, 32, cy=15.5, cx=23.5, sigma=2.0)
    coeff = jnp.asarray(blockwise_dct(img).astype(np.float32))
    mine = blockwise_idct(np.asarray(geometry.rotate_block(coeff, degrees=25.0, pad=2**0.5)))[0]
    sim = _reference_rotate_sim(img[0], 25.0)
    np.testing.assert_allclose(mine, sim, atol=1e-2)


def test_shear_block_zero_is_identityish(rng):
    img = rng.standard_normal((1, 16, 16)).astype(np.float32)
    coeff = jnp.asarray(blockwise_dct(img).astype(np.float32))
    out = np.asarray(geometry.shear_block(coeff, deg_x=0.0, deg_y=0.0))
    np.testing.assert_allclose(out, np.asarray(coeff), atol=1e-2)


def test_shear_block_matches_reference_algorithm():
    """shear_block must reproduce the reference's spectral-shear pipeline
    (``utils/dct_ops.py:957-1013``)."""
    img = _blob(32, 32, cy=9.5, cx=15.5, sigma=2.0)
    coeff = jnp.asarray(blockwise_dct(img).astype(np.float32))
    mine = blockwise_idct(np.asarray(geometry.shear_block(coeff, deg_x=15.0, pad=2**0.5)))[0]

    h = 32
    blocks_n = 4
    hp = int(blocks_n * 2**0.5)
    margin = (hp - blocks_n) // 2 * 8
    canvas = np.zeros((hp * 8, hp * 8), np.float32)
    canvas[margin : margin + h, margin : margin + h] = img[0]
    rolled = np.roll(canvas, (hp // 2 * 8, hp // 2 * 8), axis=(0, 1))
    spec = np.fft.fftshift(_mixed_fft(rolled))
    sh = np.asarray(geometry.shear_image(jnp.asarray(spec.real[None]), deg_x=15.0))[0]
    sh = sh + 1j * np.asarray(geometry.shear_image(jnp.asarray(spec.imag[None]), deg_x=15.0))[0]
    out = _mixed_ifft(np.fft.ifftshift(sh))
    out = np.roll(out, ((hp - hp // 2) * 8, (hp - hp // 2) * 8), axis=(0, 1))
    sim = out[margin : margin + h, margin : margin + h]
    np.testing.assert_allclose(mine, sim, atol=1e-2)
