"""Direct numerical parity: our DCT ops vs the reference's own dct_ops.

The reference's functional op library (``utils/dct_ops.py``) is pure torch
for everything except the torchvision-based crop/resize-pad and rotate paths,
so with the torchvision stub it imports and runs on CPU.  These tests feed
identical random coefficients to both implementations.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_torch_import import _stub_torchvision  # noqa: E402

_stub_torchvision()
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

try:
    from utils import dct_ops as ref_ops

    HAVE_REF = True
except Exception:
    HAVE_REF = False

import jax.numpy as jnp  # noqa: E402

from rgbnomore_tpu.ops import blocks, photometric as ph  # noqa: E402

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference dct_ops not importable")


@pytest.fixture
def coeff(rng):
    return (rng.standard_normal((1, 6, 6, 8, 8)) * 100).astype(np.float32)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_blockshift_parity(coeff):
    ref = ref_ops.blockshift(_t(coeff), dim=(1, 2)).numpy()
    ours = np.asarray(blocks.blockshift(jnp.asarray(coeff), axes=(1, 2)))
    np.testing.assert_array_equal(ours, ref)
    ref_i = ref_ops.iblockshift(_t(ref), dim=(1, 2)).numpy()
    ours_i = np.asarray(blocks.iblockshift(jnp.asarray(ours), axes=(1, 2)))
    np.testing.assert_array_equal(ours_i, ref_i)


def test_flip_parity(coeff):
    for direction in ("horizontal", "vertical"):
        for fixed in (False, True):
            ref = ref_ops.flip_dct(_t(coeff), direction=direction, fixed_pos=fixed).numpy()
            ours = np.asarray(blocks.flip_dct(jnp.asarray(coeff), direction, fixed))
            np.testing.assert_array_equal(ours, ref)


def test_rot90_parity(coeff):
    for k in (1, 2, 3):
        ref = ref_ops.rotate_dct_90deg(_t(coeff), rotate=k).numpy()
        ours = np.asarray(blocks.rotate_dct_90deg(jnp.asarray(coeff), rotate=k))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_combine_decompose_parity(coeff):
    ref, _, _ = ref_ops.combine_blocks(_t(coeff))
    ours = np.asarray(blocks.combine_blocks(jnp.asarray(coeff)))
    np.testing.assert_allclose(ours, ref.numpy(), atol=5e-3)
    ref_d, _, _ = ref_ops.decompose_block(ref, 6, 6, 8, 8)
    ours_d = np.asarray(blocks.decompose_blocks(jnp.asarray(ours), 6, 6))
    np.testing.assert_allclose(ours_d, ref_d.numpy(), atol=5e-3)


def test_up_down_resize_parity(coeff):
    ref_up, _, _ = ref_ops.upsample_dct(_t(coeff), L=2, M=3)
    ours_up = np.asarray(blocks.upsample_dct(jnp.asarray(coeff), 2, 3))
    np.testing.assert_allclose(ours_up, ref_up.numpy(), atol=1e-3)

    ref_dn, _, _ = ref_ops.downsample_dct(_t(coeff), L=2, M=3)
    ours_dn = np.asarray(blocks.downsample_dct(jnp.asarray(coeff), 2, 3))
    np.testing.assert_allclose(ours_dn, ref_dn.numpy(), atol=1e-3)

    # 6 -> 4: gcd path (dtype_out float to avoid the reference's int rounding)
    ref_rs = ref_ops.resize_dct(_t(coeff), 4, dtype_out=torch.float32).numpy()
    ours_rs = np.asarray(blocks.resize_dct(jnp.asarray(coeff), 4))
    np.testing.assert_allclose(ours_rs, ref_rs, atol=1e-2)


def test_photometric_parity(coeff):
    pairs = [
        (lambda c: ref_ops.invert_dct(_t(c)).numpy(),
         lambda c: np.asarray(ph.invert_dct(jnp.asarray(c)))),
        (lambda c: ref_ops.brightness_dct(_t(c), 1.7).numpy(),
         lambda c: np.asarray(ph.brightness_dct(jnp.asarray(c), 1.7))),
        (lambda c: ref_ops.contrast_dct(_t(c), 1.4).numpy(),
         lambda c: np.asarray(ph.contrast_dct(jnp.asarray(c), 1.4))),
        (lambda c: ref_ops.autocontrast_dct(_t(c)).numpy(),
         lambda c: np.asarray(ph.autocontrast_dct(jnp.asarray(c)))),
        (lambda c: ref_ops.freq_enhance_dct(_t(c), 1.3).numpy(),
         lambda c: np.asarray(ph.freq_enhance_dct(jnp.asarray(c), 1.3))),
        (lambda c: ref_ops.sharpblur_dct(_t(c), 0.6).numpy(),
         lambda c: np.asarray(ph.sharpblur_dct(jnp.asarray(c), 0.6))),
        (lambda c: ref_ops.midfreqaug_dct(_t(c), -0.5).numpy(),
         lambda c: np.asarray(ph.midfreqaug_dct(jnp.asarray(c), -0.5))),
        (lambda c: ref_ops.posterize_dct(_t(c), bitoffset=3).numpy(),
         lambda c: np.asarray(ph.posterize_dct(jnp.asarray(c), 3))),
        (lambda c: ref_ops.translate_dct(_t(c), 2, "H").numpy(),
         lambda c: np.asarray(ph.translate_dct(jnp.asarray(c), 2, "H"))),
        (lambda c: ref_ops.translate_dct(_t(c), -3, "W").numpy(),
         lambda c: np.asarray(ph.translate_dct(jnp.asarray(c), -3, "W"))),
    ]
    for i, (ref_fn, our_fn) in enumerate(pairs):
        np.testing.assert_allclose(our_fn(coeff), ref_fn(coeff), atol=1e-3,
                                   err_msg=f"pair {i}")


def test_solarize_parity(coeff):
    ref, ref_mask = ref_ops.solarize_dct(_t(coeff), threshold=10.0)
    ours, mask = ph.solarize_dct(jnp.asarray(coeff), 10.0)
    np.testing.assert_array_equal(np.asarray(mask), ref_mask.numpy())
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)

    ref2, _ = ref_ops.solarize_add_dct(_t(coeff), addition=100, threshold=0)
    ours2, _ = ph.solarize_add_dct(jnp.asarray(coeff), 100.0, 0.0)
    np.testing.assert_allclose(np.asarray(ours2), ref2.numpy(), atol=1e-4)


def test_cutout_parity(coeff):
    """The reference's F.pad argument order vertically MIRRORS the hole
    (effective center row = H - center_h, ``dct_ops.py:796-807``); since the
    random center is uniform this is distribution-equivalent, and our hole at
    the mirrored center matches the reference's element-for-element."""
    h = coeff.shape[1]
    ref, ch, cw = ref_ops.cutout_dct(_t(coeff), 2, replace=0,
                                     cutout_center_height=2, cutout_center_width=4)
    ours = np.asarray(ph.cutout_dct(jnp.asarray(coeff), 2, h - 2, 4))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


def test_equalize_parity(rng):
    # integer-valued data (the reference bincounts, which needs ints)
    coeff = rng.integers(-900, 900, (1, 6, 6, 8, 8)).astype(np.int64)
    coeff_f = coeff.astype(np.float32)
    ref = ref_ops.equalize_dct(torch.from_numpy(coeff)).numpy()
    ours = np.asarray(ph.equalize_dct(jnp.asarray(coeff_f)))
    np.testing.assert_allclose(ours[..., 0, 0], ref[..., 0, 0].astype(np.float32), atol=1.0)


def test_conversion_matrix_parity():
    ref = ref_ops.generate_conversion_matrix(length_small=8, mult=4).numpy()
    from rgbnomore_tpu.ops.basis import conversion_matrix

    ours = conversion_matrix(8, 4)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
