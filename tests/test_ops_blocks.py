import numpy as np
import jax.numpy as jnp

from rgbnomore_tpu.ops import blocks
from tests.helpers import blockwise_dct, blockwise_idct, full_dct


def _rand_coeff(rng, c=1, h=6, w=6):
    img = rng.standard_normal((c, h * 8, w * 8))
    return blockwise_dct(img).astype(np.float32), img


def test_combine_blocks_equals_global_dct(rng):
    coeff, img = _rand_coeff(rng, c=2, h=4, w=6)
    combined = np.asarray(blocks.combine_blocks(jnp.asarray(coeff)))
    np.testing.assert_allclose(combined, full_dct(img), atol=1e-3)


def test_combine_decompose_roundtrip(rng):
    coeff, _ = _rand_coeff(rng, c=1, h=5, w=3)
    combined = blocks.combine_blocks(jnp.asarray(coeff))
    back = np.asarray(blocks.decompose_blocks(combined, 5, 3))
    np.testing.assert_allclose(back, coeff, atol=1e-3)


def test_combine_decompose_dft_roundtrip(rng):
    coeff, _ = _rand_coeff(rng, c=1, h=4, w=4)
    combined = blocks.combine_blocks_dft(jnp.asarray(coeff))
    back = np.asarray(blocks.decompose_blocks_dft(combined, 4, 4))
    np.testing.assert_allclose(back, coeff, atol=1e-3)


def test_upsample_downsample_roundtrip(rng):
    coeff, _ = _rand_coeff(rng, c=1, h=4, w=4)
    up = blocks.upsample_dct(jnp.asarray(coeff), 2, 3)
    assert up.shape == (1, 8, 12, 8, 8)
    down = np.asarray(blocks.downsample_dct(up, 2, 3))
    np.testing.assert_allclose(down, coeff, atol=1e-3)


def test_upsample_matches_numpy_oracle(rng):
    """Upsample = per-block zero-pad spectrum (scaled) + decompose, in float64."""
    from rgbnomore_tpu.ops.basis import conversion_matrix

    coeff, _ = _rand_coeff(rng, c=1, h=2, w=2)
    up = np.asarray(blocks.upsample_dct(jnp.asarray(coeff), 2, 2))
    conv = conversion_matrix(8, 2).astype(np.float64)
    expected = np.zeros((1, 4, 4, 8, 8))
    for bi in range(2):
        for bj in range(2):
            padded = np.zeros((16, 16))
            padded[:8, :8] = coeff[0, bi, bj] * 2.0  # sqrt(L*M) = 2
            dec = conv.T @ padded @ conv
            for l in range(2):
                for m in range(2):
                    expected[0, bi * 2 + l, bj * 2 + m] = dec[l * 8 : (l + 1) * 8, m * 8 : (m + 1) * 8]
    np.testing.assert_allclose(up, expected, atol=1e-3)


def test_resize_matches_up_down_composition(rng):
    coeff, _ = _rand_coeff(rng, c=1, h=6, w=6)
    # 6 -> 4: gcd 2, us=2, ds=3
    resized = np.asarray(blocks.resize_dct(jnp.asarray(coeff), 4))
    manual = blocks.downsample_dct(blocks.upsample_dct(jnp.asarray(coeff), 2, 2), 3, 3)
    np.testing.assert_allclose(resized, np.asarray(manual), atol=1e-3)


def test_resize_identity(rng):
    coeff, _ = _rand_coeff(rng, c=1, h=4, w=4)
    out = np.asarray(blocks.resize_dct(jnp.asarray(coeff), 4))
    np.testing.assert_allclose(out, coeff, atol=1e-5)


def test_crop_dct_plain_and_padded(rng):
    coeff, _ = _rand_coeff(rng, c=2, h=6, w=6)
    out = np.asarray(blocks.crop_dct(jnp.asarray(coeff), 1, 2, 3, 4))
    np.testing.assert_array_equal(out, coeff[:, 1:4, 2:6])
    # negative origin -> zero padding
    out = np.asarray(blocks.crop_dct(jnp.asarray(coeff), -1, -1, 3, 3))
    assert out.shape == (2, 3, 3, 8, 8)
    np.testing.assert_array_equal(out[:, 0], 0)
    np.testing.assert_array_equal(out[:, :, 0], 0)
    np.testing.assert_array_equal(out[:, 1:, 1:], coeff[:, 0:2, 0:2])


def test_flip_dct_pixel_equivalence(rng):
    coeff, img = _rand_coeff(rng, c=1, h=3, w=5)
    flipped_h = blockwise_idct(np.asarray(blocks.flip_dct(jnp.asarray(coeff), "horizontal")))
    np.testing.assert_allclose(flipped_h, img[:, :, ::-1], atol=1e-3)
    flipped_v = blockwise_idct(np.asarray(blocks.flip_dct(jnp.asarray(coeff), "vertical")))
    np.testing.assert_allclose(flipped_v, img[:, ::-1, :], atol=1e-3)


def test_rot90_pixel_equivalence(rng):
    coeff, img = _rand_coeff(rng, c=1, h=4, w=4)
    for k in (0, 1, 2, 3):
        rotated = blockwise_idct(np.asarray(blocks.rotate_dct_90deg(jnp.asarray(coeff), rotate=k)))
        np.testing.assert_allclose(rotated, np.rot90(img, k=k, axes=(1, 2)), atol=1e-3)


def test_batched_shapes(rng):
    coeff, _ = _rand_coeff(rng, c=1, h=4, w=4)
    batched = jnp.asarray(np.stack([coeff] * 3))  # (B, C, H, W, 8, 8)
    out = blocks.resize_dct(batched, 2)
    assert out.shape == (3, 1, 2, 2, 8, 8)
    out = blocks.flip_dct(batched, "horizontal")
    assert out.shape == batched.shape
