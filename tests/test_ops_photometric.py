import numpy as np
import jax.numpy as jnp

from rgbnomore_tpu.ops import photometric as ph


def _coeff(rng, c=1, h=4, w=4):
    return (rng.standard_normal((c, h, w, 8, 8)) * 100).astype(np.float32)


def test_invert(rng):
    x = _coeff(rng)
    np.testing.assert_array_equal(np.asarray(ph.invert_dct(jnp.asarray(x))), -x)


def test_solarize_negates_blocks_above_threshold(rng):
    x = _coeff(rng)
    out, mask = ph.solarize_dct(jnp.asarray(x), 0.0)
    out, mask = np.asarray(out), np.asarray(mask)
    np.testing.assert_array_equal(mask, x[..., 0, 0] > 0)
    np.testing.assert_allclose(out[mask], -x[mask])
    np.testing.assert_allclose(out[~mask], x[~mask])


def test_solarize_add(rng):
    x = _coeff(rng)
    out, mask = ph.solarize_add_dct(jnp.asarray(x), 100.0, threshold=0.0)
    out = np.asarray(out)
    dc = x[..., 0, 0]
    expected = np.where(dc < 0, dc + 100.0, dc)
    np.testing.assert_allclose(out[..., 0, 0], np.clip(expected, -1024, 1016), atol=1e-5)


def test_sharpblur_ramp(rng):
    x = _coeff(rng)
    out = np.asarray(ph.sharpblur_dct(jnp.asarray(x), 0.5))
    ramp = np.clip(np.linspace(1, 2.0, 8), 0, None)
    filt = np.outer(ramp, ramp)
    np.testing.assert_allclose(out, np.clip(x * filt, -1024, 1016), atol=1e-3)


def test_midfreqaug_zero_intensity_is_identity(rng):
    x = _coeff(rng)
    out = np.asarray(ph.midfreqaug_dct(jnp.asarray(x), 0.0))
    # gaussian window with std=4 is not flat, so zero intensity applies the
    # inverted filter with |i|=0 -> std = kh//2 = 4 -> filter != 1.  The
    # reference has the same behaviour; just check it runs and clamps.
    assert out.shape == x.shape
    assert out.max() <= 1016 and out.min() >= -1024


def test_translate_matches_roll_and_zero(rng):
    x = _coeff(rng, h=6, w=6)
    out = np.asarray(ph.translate_dct(jnp.asarray(x), 2, "H"))
    expected = np.roll(x, 2, axis=1)
    expected[:, :2] = 0
    np.testing.assert_array_equal(out, expected)
    out = np.asarray(ph.translate_dct(jnp.asarray(x), -2, "W"))
    expected = np.roll(x, -2, axis=2)
    expected[:, :, -2:] = 0
    np.testing.assert_array_equal(out, expected)


def test_cutout_hole(rng):
    x = _coeff(rng, h=8, w=8)
    out = np.asarray(ph.cutout_dct(jnp.asarray(x), pad_size=2, center_h=4, center_w=4))
    assert (out[:, 2:6, 2:6] == 0).all()
    np.testing.assert_array_equal(out[:, :2], x[:, :2])
    np.testing.assert_array_equal(out[:, 6:], x[:, 6:])


def test_brightness(rng):
    x = _coeff(rng)
    out = np.asarray(ph.brightness_dct(jnp.asarray(x), 1.5))
    dc = x[..., 0, 0]
    expected = dc + np.abs(dc).mean() * 0.5
    np.testing.assert_allclose(out[..., 0, 0], expected, atol=1e-3)
    np.testing.assert_array_equal(out[..., 0, 1], x[..., 0, 1])


def test_contrast(rng):
    x = _coeff(rng)
    out = np.asarray(ph.contrast_dct(jnp.asarray(x), 2.0))
    np.testing.assert_allclose(out[..., 0, 0], x[..., 0, 0] * 2.0, rtol=1e-6)


def test_autocontrast_spans_range(rng):
    x = _coeff(rng)
    out = np.asarray(ph.autocontrast_dct(jnp.asarray(x)))
    dc = out[..., 0, 0]
    np.testing.assert_allclose(dc.min(), -1024.0, atol=1e-2)
    np.testing.assert_allclose(dc.max(), 1016.0, atol=1e-2)


def test_autocontrast_constant_dc_unchanged():
    x = np.zeros((1, 2, 2, 8, 8), np.float32)
    x[..., 0, 0] = 5.0
    out = np.asarray(ph.autocontrast_dct(jnp.asarray(x)))
    np.testing.assert_array_equal(out, x)


def test_posterize_matches_reference_table(rng):
    x = _coeff(rng)
    bit = 3
    out = np.asarray(ph.posterize_dct(jnp.asarray(x), bit))
    dc = x[..., 0, 0]
    n = round((1016 - (-1024)) / 2**bit)
    table = np.linspace(-1024, 1016, n + 1)
    idx = np.round((dc - (-1024)) / 2**bit).astype(int)
    np.testing.assert_allclose(out[..., 0, 0], table[idx], atol=1e-3)


def test_equalize_monotone(rng):
    x = _coeff(rng, h=6, w=6)
    out = np.asarray(ph.equalize_dct(jnp.asarray(x)))
    dc_in = x[..., 0, 0].ravel()
    dc_out = out[..., 0, 0].ravel()
    order = np.argsort(dc_in)
    assert (np.diff(dc_out[order]) >= -1e-3).all(), "equalization must preserve order"


def test_freq_enhance_preserves_dc(rng):
    x = _coeff(rng)
    out = np.asarray(ph.freq_enhance_dct(jnp.asarray(x), 1.7))
    np.testing.assert_array_equal(out[..., 0, 0], x[..., 0, 0])
    np.testing.assert_allclose(out[..., 0, 1], x[..., 0, 1] * 1.7, rtol=1e-6)
