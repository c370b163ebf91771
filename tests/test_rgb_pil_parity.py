"""RGB op parity against PIL's ImageOps (the reference's effective backend for
Equalize/AutoContrast/Posterize/Solarize on PIL images)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgbnomore_tpu.augment import rgb

PIL = pytest.importorskip("PIL")
from PIL import Image, ImageOps  # noqa: E402


def _imgs(rng, s=32):
    arr = rng.integers(0, 256, (s, s, 3), dtype=np.uint8)
    chw = jnp.asarray(arr.transpose(2, 0, 1).astype(np.float32))[None]
    return arr, chw


def _apply(name, chw, magnitude=7):
    aug = rgb.RandAugmentRGB(ops_list=[name], num_ops=1, magnitude=magnitude,
                             image_hw=(chw.shape[-2], chw.shape[-1]))
    out = aug(jax.random.PRNGKey(0), chw)
    return np.asarray(out)[0].transpose(1, 2, 0)


def test_equalize_matches_pil(rng):
    arr, chw = _imgs(rng)
    ref = np.asarray(ImageOps.equalize(Image.fromarray(arr, "RGB")))
    out = _apply("Equalize", chw)
    # LUT rounding conventions differ by <= 1 level on a few pixels
    assert np.abs(out - ref.astype(np.float32)).max() <= 1.5


def test_autocontrast_matches_pil(rng):
    arr, chw = _imgs(rng)
    ref = np.asarray(ImageOps.autocontrast(Image.fromarray(arr, "RGB")))
    out = _apply("AutoContrast", chw)
    assert np.abs(np.round(out) - ref.astype(np.float32)).max() <= 2.0


def test_solarize_matches_pil(rng):
    arr, chw = _imgs(rng)
    # magnitude 7 -> threshold linspace(255, 0, 11)[7] = 76.5... PIL solarize
    # inverts pixels >= threshold
    thr = np.linspace(255.0, 0.0, 11)[7]
    ref = np.asarray(ImageOps.solarize(Image.fromarray(arr, "RGB"), threshold=thr))
    out = _apply("Solarize", chw)
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1.0)


def test_posterize_matches_pil(rng):
    arr, chw = _imgs(rng)
    bits = int(8 - round(7 / 2.5))  # magnitude 7 -> 5 bits
    ref = np.asarray(ImageOps.posterize(Image.fromarray(arr, "RGB"), bits))
    out = _apply("Posterize", chw)
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=0.5)


def test_equalize_matches_pil_without_value_255(rng):
    """PIL's step uses the count of the last NONZERO bin; an image whose max
    value is < 255 exposes the difference."""
    arr = (rng.integers(0, 200, (32, 32, 3)) ).astype(np.uint8)
    arr[0, 0] = 199  # ensure max < 255 with mass at the top bin
    ref = np.asarray(ImageOps.equalize(Image.fromarray(arr, "RGB")))
    chw = jnp.asarray(arr.transpose(2, 0, 1).astype(np.float32))[None]
    out = _apply("Equalize", chw)
    assert np.abs(out - ref.astype(np.float32)).max() <= 1.5


def test_equalize_constant_channel_is_identity():
    arr = np.full((16, 16, 3), 77, np.uint8)
    chw = jnp.asarray(arr.transpose(2, 0, 1).astype(np.float32))[None]
    out = _apply("Equalize", chw)
    np.testing.assert_array_equal(out, 77.0)
