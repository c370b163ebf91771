"""On-device JPEG tail decode (ops/pixel_decode) vs host libjpeg decode,
and the packed-RGB transfer path built on it."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgbnomore_tpu import codec
from rgbnomore_tpu.augment.pipeline import make_packed_rgb_decode
from rgbnomore_tpu.data.index import load_index
from rgbnomore_tpu.data.loader import DctPackedLoader
from rgbnomore_tpu.ops.pixel_decode import decode_rgb_pixels, fancy_upsample_2x


@pytest.fixture(scope="module")
def photo_jpegs(tmp_path_factory):
    """Three 128x128 color JPEGs of varying frequency content."""
    root = tmp_path_factory.mktemp("pdec")
    rng = np.random.default_rng(0)
    ys, xs = np.mgrid[0:128, 0:128]
    imgs = [
        np.stack([(128 + 90 * np.sin(ys / 7 + p) * np.cos(xs / 5)).astype(np.uint8)
                  for p in (0, 1, 2)]),
        rng.integers(0, 255, (3, 128, 128)).astype(np.uint8),
        np.clip(np.stack([ys + xs, ys * 2, xs * 2]) % 256
                + rng.normal(0, 8, (3, 128, 128)), 0, 255).astype(np.uint8),
    ]
    paths = []
    for i, img in enumerate(imgs):
        p = root / f"img_{i}.jpg"
        codec.write_tensor(p, img, quality=88)
        paths.append(str(p))
    return paths


def test_decode_matches_libjpeg(photo_jpegs):
    """Float IDCT + exact integer upsample/color-convert vs libjpeg's
    fixed-point decode: residual is the IDCT rounding only (<= +-3, and
    >1-level differences on <2% of pixels)."""
    for path in photo_jpegs:
        ref = codec.read_jpeg(path).astype(np.float32)
        _, quant, y, c = codec.read_coefficients(path)
        yd = jnp.asarray(y.astype(np.float32) * quant[0])[None]
        cd = jnp.asarray(c.astype(np.float32) * quant[1:3, None, None])[None]
        out = np.asarray(jax.jit(decode_rgb_pixels)(yd, cd))[0]
        diff = np.abs(out - ref)
        assert diff.max() <= 3.0
        assert diff.mean() <= 0.15
        assert (diff > 1).mean() <= 0.02


def test_fancy_upsample_replicates_edges_and_interior_weights():
    """Interior pixels follow libjpeg's 9:3:3:1 stencil with the 8/7 bias."""
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4) * 10)
    up = np.asarray(fancy_upsample_2x(x))[0]
    assert up.shape == (8, 8)
    xi = np.asarray(x[0]).astype(np.int64)
    # interior even-even output (2i, 2j): nearest (i,j), far (i-1, j-1)
    i, j = 1, 1
    cs = 3 * xi[i] + xi[i - 1]
    assert up[2 * i, 2 * j] == (3 * cs[j] + cs[j - 1] + 8) // 16
    # odd-odd output (2i+1, 2j+1): nearest (i,j), far (i+1, j+1)
    cs = 3 * xi[i] + xi[i + 1]
    assert up[2 * i + 1, 2 * j + 1] == (3 * cs[j] + cs[j + 1] + 7) // 16
    # corners replicate: all four neighbors are the corner sample itself
    assert up[0, 0] == (4 * (4 * xi[0, 0]) + 8) // 16


def test_grayscale_decodes_neutral(tmp_path):
    g = np.tile((np.arange(64, dtype=np.uint8) * 4)[None, :, None], (1, 1, 64))
    g = np.ascontiguousarray(np.transpose(g, (0, 2, 1)))
    p = tmp_path / "gray.jpg"
    codec.write_tensor(p, g, quality=90)  # 1-channel input -> grayscale JPEG
    rows = ["Filepath,Label", f"{p},0"]
    csv = tmp_path / "idx.csv"
    csv.write_text("\n".join(rows) + "\n")
    loader = DctPackedLoader(load_index(csv), 1, canvas=8, k=63, fmt="mask16",
                             shuffle=False, num_threads=1)
    batch = next(iter(loader))
    decode = make_packed_rgb_decode(canvas=8, k=63)
    img, labels, w = jax.jit(decode)(jnp.asarray(batch["packed"]))
    img = np.asarray(img)[0]
    # zero chroma blocks -> Cb=Cr=128 -> R=G=B exactly
    np.testing.assert_array_equal(img[0], img[1])
    np.testing.assert_array_equal(img[1], img[2])
    ref = codec.read_jpeg(str(p))  # grayscale -> (1, H, W)
    assert np.abs(img[0] - ref[0].astype(np.float32)).max() <= 3.0


def test_packed_rgb_decode_close_to_host_decode(photo_jpegs, tmp_path):
    """Full wire path in the RGB default format (mask16, K=63: exact DC, no
    spectrum truncation): loader pack -> device unpack -> decode stays within
    the float-IDCT rounding of host libjpeg."""
    rows = ["Filepath,Label"] + [f"{p},{i}" for i, p in enumerate(photo_jpegs)]
    csv = tmp_path / "idx.csv"
    csv.write_text("\n".join(rows) + "\n")
    loader = DctPackedLoader(load_index(csv), 3, canvas=16, k=63, fmt="mask16",
                             shuffle=False, num_threads=2)
    batch = next(iter(loader))
    decode = make_packed_rgb_decode(canvas=16, k=63)
    imgs, labels, w = jax.jit(decode)(jnp.asarray(batch["packed"]))
    imgs = np.asarray(imgs)
    np.testing.assert_array_equal(np.asarray(labels), batch["labels"])
    for i, path in enumerate(photo_jpegs):
        ref = codec.read_jpeg(path).astype(np.float32)
        diff = np.abs(imgs[i] - ref)
        assert diff.max() <= 4.0, f"img {i}: max {diff.max()}"
        assert diff.mean() <= 0.2, f"img {i}: mean {diff.mean()}"


def test_non_420_jpeg_rejected(tmp_path):
    """4:4:4 / 4:2:2 inputs would silently decode with stretched chroma; the
    loaders must fail loudly instead (the staging resizer emits 4:2:0)."""
    from PIL import Image

    from rgbnomore_tpu.data.loader import DctCanvasLoader

    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (64, 64, 3)).astype(np.uint8))
    p = tmp_path / "s444.jpg"
    img.save(p, quality=90, subsampling=0)  # 4:4:4
    csv = tmp_path / "idx.csv"
    csv.write_text(f"Filepath,Label\n{p},0\n")
    for loader in (
        DctPackedLoader(load_index(csv), 1, canvas=8, k=16, shuffle=False, num_threads=1),
        DctPackedLoader(load_index(csv), 1, canvas=8, k=63, fmt="mask16",
                        shuffle=False, num_threads=1),
        DctCanvasLoader(load_index(csv), 1, canvas=8, shuffle=False, num_threads=1),
    ):
        with pytest.raises(Exception, match="4:2:0"):
            next(iter(loader))


def test_undersized_image_pads_black(tmp_path):
    """mask16 canvas area beyond the image decodes to black, matching the
    dense RGB loader's zero-filled pixel canvases."""
    img = np.full((3, 32, 32), 200, np.uint8)
    p = tmp_path / "small.jpg"
    codec.write_tensor(p, img, quality=90)
    csv = tmp_path / "idx.csv"
    csv.write_text(f"Filepath,Label\n{p},0\n")
    loader = DctPackedLoader(load_index(csv), 1, canvas=8, k=63, fmt="mask16",
                             shuffle=False, num_threads=1)  # 64px canvas, 32px image
    batch = next(iter(loader))
    decode = make_packed_rgb_decode(canvas=8, k=63)
    out = np.asarray(jax.jit(decode)(jnp.asarray(batch["packed"]))[0])[0]
    assert np.abs(out[:, :32, :32] - 200).max() <= 3  # image area intact
    np.testing.assert_array_equal(out[:, 32:, :], 0.0)  # padding is black
    np.testing.assert_array_equal(out[:, :, 32:], 0.0)


def test_rgb_packed_trainer_end_to_end(tmp_path):
    """RGB domain rides the packed coefficient transfer end to end."""
    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import train_and_eval

    rng = np.random.default_rng(1)
    ys, xs = np.mgrid[0:64, 0:64]
    rows = ["Filepath,Label"]
    for i in range(8):
        img = np.stack([
            (128 + 80 * np.sin(ys / (3 + i % 2)) * np.cos(xs / 2)).astype(np.uint8),
            rng.integers(0, 255, (64, 64)).astype(np.uint8),
            (xs * 4 % 256).astype(np.uint8),
        ])
        p = tmp_path / f"img_{i}.jpg"
        codec.write_tensor(p, img, quality=90)
        rows.append(f"{p},{i % 2}")
    csv = tmp_path / "idx.csv"
    csv.write_text("\n".join(rows) + "\n")

    cfg = generate_config("vitti", "rgb")
    cfg.model.depth = 2
    cfg.model.input_size = 32
    cfg.model.classes = 2
    cfg.train.epochs = 1
    cfg.train.batch_size = 8
    cfg.train.warmup = 2
    cfg.train.split = 0.25
    res = train_and_eval(
        cfg, str(csv), str(csv), savepath=str(tmp_path / "m.msgpack"),
        run_train=True, run_eval=True, verbose=0, canvas=48, num_threads=2,
        transfer="packed",
    )
    assert res["test"]["count"] == 8.0
    assert np.isfinite(res["test"]["loss"])
