import numpy as np
import pytest

from rgbnomore_tpu import codec

try:
    from PIL import Image

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def _make_jpeg(tmp_path, rng, size=(64, 48), gray=False, quality=90):
    """Write a JPEG with PIL (independent encoder) and return its path + pixels."""
    w, h = size
    if gray:
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        img = Image.fromarray(arr, "L")
    else:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        img = Image.fromarray(arr, "RGB")
    path = tmp_path / ("g.jpg" if gray else "c.jpg")
    img.save(path, quality=quality)
    return str(path), arr


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_read_coefficients_shapes(tmp_path, rng):
    path, _ = _make_jpeg(tmp_path, rng, size=(64, 48))
    dims, quant, y, cbcr = codec.read_coefficients(path)
    assert dims.shape == (3, 2) and dims.dtype == np.int32
    assert (dims[0] == [48, 64]).all()
    assert quant.shape == (3, 8, 8) and quant.dtype == np.int16
    assert y.shape == (1, 6, 8, 8, 8) and y.dtype == np.int16
    assert cbcr.shape == (2, 3, 4, 8, 8) and cbcr.dtype == np.int16
    assert (quant > 0).all()


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_read_coefficients_grayscale(tmp_path, rng):
    path, _ = _make_jpeg(tmp_path, rng, size=(32, 32), gray=True)
    dims, quant, y, cbcr = codec.read_coefficients(path)
    assert cbcr is None
    assert y.shape == (1, 4, 4, 8, 8)
    assert dims.shape == (1, 2)


def test_read_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        codec.read_coefficients("/nonexistent/file.jpg")


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_not_a_jpeg_raises(tmp_path):
    path = tmp_path / "fake.jpg"
    path.write_bytes(b"definitely not a jpeg")
    with pytest.raises(RuntimeError):
        codec.read_coefficients(str(path))


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_write_read_roundtrip_is_lossless(tmp_path, rng):
    """Coefficients written with write_coefficients re-read identically."""
    path, _ = _make_jpeg(tmp_path, rng, size=(64, 64))
    dims, quant, y, cbcr = codec.read_coefficients(path)
    out = tmp_path / "rt.jpg"
    codec.write_coefficients(out, dims, quant, y, cbcr)
    dims2, quant2, y2, cbcr2 = codec.read_coefficients(str(out))
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(cbcr2, cbcr)
    np.testing.assert_array_equal(quant2, quant)
    np.testing.assert_array_equal(dims2, dims)


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_read_jpeg_matches_pil(tmp_path, rng):
    path, _ = _make_jpeg(tmp_path, rng, size=(40, 24))
    ours = codec.read_jpeg(path)
    ref = np.asarray(Image.open(path).convert("RGB")).transpose(2, 0, 1)
    assert ours.shape == ref.shape
    # libjpeg IDCT variants may differ by a small amount per pixel
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_quantize_at_quality_roundtrip(tmp_path, rng):
    """quantize_at_quality == write at quality then read coefficients."""
    w, h = 48, 32
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    pixels = arr.transpose(2, 0, 1)
    dims, quant, y, cbcr = codec.quantize_at_quality(pixels, quality=75)
    assert y.shape == (1, 4, 6, 8, 8)
    assert cbcr.shape == (2, 2, 3, 8, 8)
    assert (dims[0] == [32, 48]).all()
    # oracle: PIL-save at the same quality then read with our reader —
    # both encoders use stock libjpeg tables at quality 75, so quant matches
    p = tmp_path / "q75.jpg"
    Image.fromarray(arr, "RGB").save(p, quality=75, subsampling=2)
    _, quant_pil, _, _ = codec.read_coefficients(str(p))
    np.testing.assert_array_equal(quant, quant_pil)


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_decode_coeff_pixel_oracle(tmp_path, rng):
    """decode_coeff inverts quantize_at_quality to near-identical pixels."""
    # smooth image so quality-95 JPEG is near-lossless
    ys, xs = np.mgrid[0:64, 0:64]
    base = (128 + 60 * np.sin(ys / 10) * np.cos(xs / 9)).astype(np.uint8)
    pixels = np.stack([base, base // 2 + 40, 255 - base])
    dims, quant, y, cbcr = codec.quantize_at_quality(pixels, quality=95)
    decoded = codec.decode_coeff(dims, quant, y, cbcr)
    assert decoded.shape == pixels.shape
    err = np.abs(decoded.astype(int) - pixels.astype(int)).mean()
    assert err < 6.0, f"mean abs error {err}"


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_write_tensor_then_read(tmp_path, rng):
    arr = rng.integers(0, 256, (3, 32, 32), dtype=np.uint8)
    p = tmp_path / "wt.jpg"
    codec.write_tensor(p, arr, quality=100)
    back = codec.read_jpeg(str(p))
    assert back.shape == arr.shape


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_read_into_canvas_matches_read_coefficients(tmp_path, rng):
    path, _ = _make_jpeg(tmp_path, rng, size=(64, 48))
    dims, quant, y, cbcr = codec.read_coefficients(path)

    y_canvas = np.full((1, 16, 16, 8, 8), 7, np.int16)  # dirty canvas
    c_canvas = np.full((2, 8, 8, 8, 8), 7, np.int16)
    quant_out = np.zeros((3, 8, 8), np.int16)
    ncomp, yh, yw, ch, cw, img_h, img_w = codec.read_into_canvas(
        path, y_canvas, c_canvas, quant_out
    )
    assert (ncomp, yh, yw, ch, cw) == (3, 6, 8, 3, 4)
    assert (img_h, img_w) == (48, 64)
    np.testing.assert_array_equal(y_canvas[:, :6, :8], y)
    np.testing.assert_array_equal(c_canvas[:, :3, :4], cbcr)
    np.testing.assert_array_equal(quant_out, quant)
    # region outside the image must be zeroed, not stale
    assert (y_canvas[:, 6:] == 0).all() and (y_canvas[:, :, 8:] == 0).all()
    assert (c_canvas[:, 3:] == 0).all()


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_read_into_canvas_grayscale_zero_chroma(tmp_path, rng):
    path, _ = _make_jpeg(tmp_path, rng, size=(32, 32), gray=True)
    y_canvas = np.zeros((1, 8, 8, 8, 8), np.int16)
    c_canvas = np.full((2, 4, 4, 8, 8), 3, np.int16)
    quant_out = np.zeros((3, 8, 8), np.int16)
    ncomp, yh, yw, ch, cw, _, _ = codec.read_into_canvas(path, y_canvas, c_canvas, quant_out)
    assert ncomp == 1 and (yh, yw) == (4, 4)
    assert (c_canvas == 0).all()
    assert (quant_out[1:] == 1).all()  # neutral chroma quant for grayscale


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
def test_read_into_canvas_clips_oversized_image(tmp_path, rng):
    """Images larger than the canvas are clipped to the top-left blocks."""
    path, _ = _make_jpeg(tmp_path, rng, size=(64, 64))
    dims, quant, y, cbcr = codec.read_coefficients(path)
    y_canvas = np.zeros((1, 4, 4, 8, 8), np.int16)
    c_canvas = np.zeros((2, 2, 2, 8, 8), np.int16)
    quant_out = np.zeros((3, 8, 8), np.int16)
    ncomp, yh, yw, ch, cw, _, _ = codec.read_into_canvas(path, y_canvas, c_canvas, quant_out)
    assert (yh, yw) == (8, 8)  # true block count reported even when clipped
    np.testing.assert_array_equal(y_canvas, y[:, :4, :4])
    np.testing.assert_array_equal(c_canvas, cbcr[:, :2, :2])
