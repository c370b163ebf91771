"""Pixel-space equivalence of DCT-domain ops using the REAL codec round trip.

The oracle the reference architecture enables (SURVEY §4): apply an op in the
DCT domain, decode with libjpeg, and compare against the op applied to the
decoded pixels.  Flips and 90-degree rotations are exact in the DCT domain.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rgbnomore_tpu.augment.convert import rgb_to_dct, ycbcr_to_rgb
from rgbnomore_tpu.ops import blocks

PIL = pytest.importorskip("PIL")


@pytest.fixture(scope="module")
def photo():
    ys, xs = np.mgrid[0:64, 0:64]
    img = np.stack([
        (128 + 90 * np.sin(ys / 6.0) * np.cos(xs / 4.0)).astype(np.uint8),
        (128 + 70 * np.cos(ys / 9.0)).astype(np.uint8),
        (128 + 60 * np.sin(xs / 7.0)).astype(np.uint8),
    ])
    return img


def _dequant(img):
    """Encode at q100 and dequantize (quant tables are all >= 1)."""
    from rgbnomore_tpu import codec

    _, quant, y, cbcr = codec.quantize_at_quality(img, quality=100)
    yd = y.astype(np.float32) * quant[0]
    cd = cbcr.astype(np.float32) * quant[1:3, None, None]
    return np.clip(yd, -1024, 1016), np.clip(cd, -1024, 1016)


def test_hflip_matches_pixel_flip(photo):
    y, c = _dequant(photo)
    ref = ycbcr_to_rgb(y, c)  # decode baseline through the same path
    yf = np.asarray(blocks.flip_dct(jnp.asarray(y), "horizontal"))
    cf = np.asarray(blocks.flip_dct(jnp.asarray(c), "horizontal"))
    flipped = ycbcr_to_rgb(yf, cf)
    np.testing.assert_allclose(
        flipped.astype(int), ref[:, :, ::-1].astype(int), atol=2
    )


def test_rot90_matches_pixel_rot(photo):
    y, c = _dequant(photo)
    ref = ycbcr_to_rgb(y, c)
    yr = np.asarray(blocks.rotate_dct_90deg(jnp.asarray(y), 1))
    cr = np.asarray(blocks.rotate_dct_90deg(jnp.asarray(c), 1))
    rotated = ycbcr_to_rgb(yr, cr)
    np.testing.assert_allclose(
        rotated.astype(int), np.rot90(ref, k=1, axes=(1, 2)).astype(int), atol=2
    )


def test_resize_halves_image(photo):
    y, c = _dequant(photo)
    y2 = np.asarray(blocks.resize_dct(jnp.asarray(y), 4))  # 8 -> 4 blocks
    c2 = np.asarray(blocks.resize_dct(jnp.asarray(c), 2))
    small = ycbcr_to_rgb(y2, c2)
    assert small.shape == (3, 32, 32)
    # downsampled image correlates strongly with a simple pixel downsample
    ref = ycbcr_to_rgb(y, c).astype(np.float32)
    ref_small = ref.reshape(3, 32, 2, 32, 2).mean(axis=(2, 4))
    corr = np.corrcoef(small.astype(np.float32).ravel(), ref_small.ravel())[0, 1]
    assert corr > 0.98, corr


def test_rgb_to_dct_roundtrip(photo):
    y, cbcr = rgb_to_dct(photo)
    assert y.shape == (1, 8, 8, 8, 8) and cbcr.shape == (2, 4, 4, 8, 8)
    # q100 quant tables are mostly 1 -> near-lossless round trip
    from rgbnomore_tpu import codec

    _, quant, _, _ = codec.quantize_at_quality(photo, quality=100)
    yd = np.clip(y.astype(np.float32) * quant[0], -1024, 1016)
    cd = np.clip(cbcr.astype(np.float32) * quant[1:3, None, None], -1024, 1016)
    back = ycbcr_to_rgb(yd, cd)
    err = np.abs(back.astype(int) - photo.astype(int)).mean()
    assert err < 4.0, err
