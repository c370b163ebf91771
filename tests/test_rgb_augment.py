import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgbnomore_tpu.augment import rgb


def _img(rng, b=2, s=64):
    return jnp.asarray(rng.integers(0, 256, (b, 3, s, s)).astype(np.float32))


def test_resample_matrix_identity():
    m = np.asarray(rgb._resample_matrix(jnp.float32(0.0), jnp.float32(8.0), 8, 8))
    np.testing.assert_allclose(m, np.eye(8), atol=1e-5)


def test_resample_downscale_preserves_mean(rng):
    x = rng.random(64).astype(np.float32)
    m = np.asarray(rgb._resample_matrix(jnp.float32(0.0), jnp.float32(64.0), 64, 16))
    out = m @ x
    np.testing.assert_allclose(out.mean(), x.mean(), rtol=0.02)
    np.testing.assert_allclose(m.sum(1), 1.0, atol=1e-5)  # partition of unity


def test_random_resized_crop_rgb(rng):
    img = _img(rng, b=8, s=64)
    rrc = rgb.make_random_resized_crop_rgb(32, 64)
    out = jax.jit(rrc)(jax.random.PRNGKey(0), img)
    assert out.shape == (8, 3, 32, 32)
    assert np.isfinite(np.asarray(out)).all()
    assert 0 <= float(out.min()) and float(out.max()) <= 255.0 + 1e-3


def test_resize_center_crop_semantics(rng):
    # constant image stays constant through resize+crop
    img = jnp.full((1, 3, 64, 64), 77.0)
    rcc = rgb.make_resize_center_crop_rgb(32, 28, 64)
    out = np.asarray(rcc(img))
    assert out.shape == (1, 3, 28, 28)
    np.testing.assert_allclose(out, 77.0, atol=1e-3)


@pytest.mark.parametrize("name", [
    "AutoContrast", "Equalize", "Invert", "Posterize", "Solarize", "SolarizeAdd",
    "Color", "Contrast", "Brightness", "Sharpness", "Cutout", "TranslateX",
    "TranslateY", "Grayscale", "ChromaDrop", "AutoSaturation", "Rotate90",
    "ShearX", "Rotate",
])
def test_rgb_ops_run_and_stay_in_range(rng, name):
    img = _img(rng, b=2, s=32)
    aug = rgb.RandAugmentRGB(ops_list=[name], num_ops=1, magnitude=7, image_hw=(32, 32))
    out = np.asarray(aug(jax.random.PRNGKey(0), img))
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    assert out.min() >= -1e-3 and out.max() <= 255.0 + 1e-3


def test_invert_semantics(rng):
    img = _img(rng)
    aug = rgb.RandAugmentRGB(ops_list=["Invert"], num_ops=1, magnitude=5, image_hw=(64, 64))
    out = np.asarray(aug(jax.random.PRNGKey(0), img))
    np.testing.assert_allclose(out, 255.0 - np.asarray(img), atol=1e-4)


def test_grayscale_channels_equal(rng):
    img = _img(rng)
    aug = rgb.RandAugmentRGB(ops_list=["Grayscale"], num_ops=1, magnitude=5, image_hw=(64, 64))
    out = np.asarray(aug(jax.random.PRNGKey(0), img))
    np.testing.assert_allclose(out[:, 0], out[:, 1], atol=1e-4)
    np.testing.assert_allclose(out[:, 1], out[:, 2], atol=1e-4)


def test_posterize_quantizes(rng):
    img = _img(rng)
    # magnitude 7 -> bits = 8 - round(7/2.5) = 5
    aug = rgb.RandAugmentRGB(ops_list=["Posterize"], num_ops=1, magnitude=7, image_hw=(64, 64))
    out = np.asarray(aug(jax.random.PRNGKey(0), img))
    assert np.all(out.astype(np.int32) % 8 == 0)  # low 3 bits cleared


def test_equalize_flattens_histogram():
    # strongly skewed image -> equalize should widen the dynamic range
    rng = np.random.default_rng(0)
    skewed = jnp.asarray((rng.random((1, 3, 64, 64)) * 40).astype(np.float32))
    aug = rgb.RandAugmentRGB(ops_list=["Equalize"], num_ops=1, magnitude=5, image_hw=(64, 64))
    out = np.asarray(aug(jax.random.PRNGKey(0), skewed))
    assert out.max() > 200.0


def test_rgb_train_pipeline_end_to_end(rng):
    pix = jnp.asarray(rng.integers(0, 256, (4, 3, 64, 64), dtype=np.uint8))
    pipe = jax.jit(rgb.make_rgb_train_pipeline(
        size=32, canvas=64,
        auglist=["AutoContrast", "Brightness", "Cutout", "TranslateX"],
        num_ops=2, magnitude=10,
    ))
    out = pipe(jax.random.PRNGKey(0), pix)
    assert out.shape == (4, 3, 32, 32)
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5


def test_rgb_eval_pipeline_deterministic(rng):
    pix = jnp.asarray(rng.integers(0, 256, (2, 3, 64, 64), dtype=np.uint8))
    pipe = jax.jit(rgb.make_rgb_eval_pipeline(size=28, resize_to=32, canvas=64))
    o1, o2 = pipe(pix), pipe(pix)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert o1.shape == (2, 3, 28, 28)


def test_rgb_trainer_end_to_end(tmp_path, rng):
    """Full RGB domain slice: pixel loader -> device pipeline -> ViT train."""
    from PIL import Image

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import train_and_eval

    rows = ["Filepath,Label"]
    for i in range(8):
        arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        p = tmp_path / f"i{i}.jpg"
        Image.fromarray(arr, "RGB").save(p, quality=90)
        rows.append(f"{p},{i % 2}")
    csv = tmp_path / "idx.csv"
    csv.write_text("\n".join(rows) + "\n")

    cfg = generate_config("vitti", "rgb")
    cfg.model.depth = 2
    cfg.model.classes = 2
    cfg.model.input_size = 32
    cfg.train.epochs = 1
    cfg.train.batch_size = 8
    cfg.train.warmup = 2
    cfg.train.split = 0.25
    res = train_and_eval(
        cfg, str(csv), str(csv), savepath=str(tmp_path / "m.msgpack"),
        run_train=True, run_eval=True, verbose=0, canvas=64, num_threads=2,
    )
    assert res["test"]["count"] == 8.0
