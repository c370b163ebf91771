"""RGB crop-before-pack: window wire vs the dense full-canvas path.

The reference crops/resizes RGB pixels on the CPU before anything ships
(``datasets.py:317-335``); round 2's RGB path shipped the full 64-block
coefficient canvas (444 KB/img).  The cropped path ships only the
block-aligned window covering the pixel box (~87 KB at 224px), spectrally
pre-downsampled per axis by f in {1, 2, 4}, and lets the device tail-decode
+ residual-bilinear the fractional box.

Correctness anchors:
  - f=1 windows: the decoded window IS the dense path's pixels (pixel_decode
    parity) and the residual resample uses the same PIL-pinned matrices
    (tests/test_rgb_pil_parity.py) — near-exact match to the dense pipeline.
  - f=2 windows (val center-crop on 512px sources): spectral halving is the
    prefilter; differences vs the dense bilinear chain stay small on real
    content.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rgbnomore_tpu import codec  # noqa: E402
from rgbnomore_tpu.augment.pipeline import (  # noqa: E402
    make_rgb_cropped_eval_pipeline,
    split_packed_batch,
)
from rgbnomore_tpu.augment.rgb import (  # noqa: E402
    _apply_separable_rgb,
    _resample_matrix,
    make_resize_center_crop_rgb,
)
from rgbnomore_tpu.data.croppack import rgb_downsample_blocks  # noqa: E402
from rgbnomore_tpu.data.loader import packed_layout  # noqa: E402


def _write_jpeg(path, seed=0, hw=(512, 512), quality=90):
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0 : hw[0], 0 : hw[1]]
    f = 0.02 + 0.02 * rng.random(2)
    img = np.stack(
        [
            (128 + 100 * np.sin(ys * f[0] + p) * np.cos(xs * f[1])).astype(np.uint8)
            for p in (0.0, 1.0, 2.0)
        ]
    )
    codec.write_tensor(path, img, quality=quality)
    return path


def _call_row(path, mode, size=224, k=63, uniforms=None, resize_to=256.0):
    g2, g4 = rgb_downsample_blocks()
    layout = packed_layout(size // 8, k, "mask16", geom=True)
    row = np.zeros(layout["row"], np.uint8)
    offsets = codec.rgb_crop_row_offsets(layout)
    if uniforms is None:
        uniforms = np.zeros(22)
    ret = codec.read_rgb_crop_pack_row(
        path, k, size // 8, mode, uniforms, g2, g4, row, offsets, 7, 1.0,
        resize_to=resize_to, crop=float(size),
    )
    return ret, row, layout


def _decode_resample(row, size=224, k=63):
    pipe = make_rgb_cropped_eval_pipeline(size=size, k=k)
    img, labels, w = pipe(jnp.asarray(row[None]))
    return np.asarray(img[0]), int(labels[0]), float(w[0])


def _dense_pixels(path):
    return codec.read_jpeg(path).astype(np.float32)


def _uniforms_for_box(side_px, H=512, W=512, u_i=0.3, u_j=0.6):
    """Craft train-mode uniforms whose FIRST try yields a side_px 1:1 box."""
    u = np.zeros(22)
    scale = (side_px * side_px) / (H * W)
    u[0] = (scale - 0.05) / 0.95
    u[1] = 0.5  # log-aspect midpoint -> aspect exactly 1
    u[20], u[21] = u_i, u_j
    return u


def test_train_box_matches_torchvision_formula(tmp_path):
    path = _write_jpeg(tmp_path / "a.jpg", seed=1)
    u = _uniforms_for_box(150)
    (ncomp, yh, yw, wy0, wx0, wbh, wbw, fy, fx), row, layout = _call_row(
        path, codec.RGB_CROP_TRAIN, uniforms=u
    )
    assert (ncomp, yh, yw) == (3, 64, 64)
    assert fy == 1 and fx == 1  # 150px box fits the 224px window at f=1
    # expected torchvision box: i = int(u_i * (H - h + 1))
    i, j = int(0.3 * (512 - 150 + 1)), int(0.6 * (512 - 150 + 1))
    f = split_packed_batch(jnp.asarray(row[None]), 28, 63, "mask16", geom=True)
    sy0, sh, sx0, sw = np.asarray(f["geom"][0])
    assert sh == 150.0 and sw == 150.0
    np.testing.assert_allclose(sy0, i - wy0 * 8)
    np.testing.assert_allclose(sx0, j - wx0 * 8)
    assert wy0 * 8 <= i and i + 150 <= (wy0 + wbh) * 8
    assert wx0 * 8 <= j and j + 150 <= (wx0 + wbw) * 8
    assert wy0 % 2 == 0 and wbh % 2 == 0  # chroma-aligned window


def test_f1_window_matches_dense_crop(tmp_path):
    """f=1: window decode + residual resample == dense decode + same-box
    resample, within JPEG tail-decode parity (+-3 gray) + resample smoothing."""
    path = _write_jpeg(tmp_path / "b.jpg", seed=2)
    u = _uniforms_for_box(180, u_i=0.45, u_j=0.1)
    (_, _, _, wy0, wx0, *_), row, _ = _call_row(path, codec.RGB_CROP_TRAIN, uniforms=u)
    got, label, w = _decode_resample(row)
    assert label == 7 and w == 1.0

    dense = _dense_pixels(path)
    i, j = int(0.45 * (512 - 180 + 1)), int(0.1 * (512 - 180 + 1))
    m_h = _resample_matrix(jnp.float32(i), jnp.float32(180), 512, 224)
    m_w = _resample_matrix(jnp.float32(j), jnp.float32(180), 512, 224)
    want = _apply_separable_rgb(
        jnp.asarray(dense[None]), m_h[None], m_w[None]
    )[0]
    want = np.asarray(want) / 255.0 * 2.0 - 1.0
    diff = np.abs(got - want)
    assert diff.max() < 0.05, diff.max()  # ~ +-3 gray of IDCT rounding x2
    assert diff.mean() < 0.005, diff.mean()


def test_center_eval_close_to_dense_chain(tmp_path):
    """val path on a 512px source (f=2): spectral-halving prefilter vs the
    dense Resize(256)+CenterCrop(224) bilinear chain stays close."""
    path = _write_jpeg(tmp_path / "c.jpg", seed=3)
    (_, _, _, wy0, wx0, wbh, wbw, fy, fx), row, _ = _call_row(
        path, codec.RGB_CROP_CENTER
    )
    assert fy == 2 and fx == 2  # 448px source box -> half-res window
    got, _, _ = _decode_resample(row)

    dense = _dense_pixels(path)
    rcc = make_resize_center_crop_rgb(256, 224, 512)
    want = np.asarray(rcc(jnp.asarray(dense[None]))[0]) / 255.0 * 2.0 - 1.0
    diff = np.abs(got - want)
    assert diff.mean() < 0.02, diff.mean()
    assert diff.max() < 0.2, diff.max()


def test_full_mode_covers_whole_image(tmp_path):
    path = _write_jpeg(tmp_path / "d.jpg", seed=4, hw=(512, 512))
    (_, _, _, wy0, wx0, wbh, wbw, fy, fx), row, _ = _call_row(
        path, codec.RGB_CROP_FULL, size=224
    )
    assert (wy0, wx0) == (0, 0)
    assert wbh * 8 >= 512 and wbw * 8 >= 512
    assert fy == 4 and fx == 4  # 64 blocks -> 16 <= 28 needs f=4 (f=2 gives 32 > 28)
    got, _, _ = _decode_resample(row)
    assert got.shape == (3, 224, 224)
    assert np.isfinite(got).all()


def test_wire_is_5x_smaller_than_dense_canvas():
    cropped = packed_layout(28, 63, "mask16", geom=True)["row"]
    dense = packed_layout(64, 63, "mask16")["row"]
    assert cropped * 4.5 < dense  # ~87 KB vs ~444 KB


def test_trainer_rgb_cropped_end_to_end(tmp_path):
    """One fused train step + eval through Trainer with the RGB cropped
    transfer on the 8-device CPU mesh."""
    from rgbnomore_tpu.data.index import load_index
    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer, make_loaders

    rows = ["Filepath,Label"]
    for i in range(16):
        p = _write_jpeg(tmp_path / f"t{i}.jpg", seed=10 + i, hw=(256, 256))
        rows.append(f"{p},{i % 2}")
    csv = tmp_path / "idx.csv"
    csv.write_text("\n".join(rows) + "\n")

    cfg = generate_config("vitti", "rgb", modelver=1)
    cfg.model.depth = 1
    cfg.model.classes = 2
    cfg.train.batch_size = 8
    cfg.train.warmup = 2
    cfg.train.split = 0.25
    cfg.train.auglist = ["Brightness", "Cutout"]

    trainer = Trainer(cfg, transfer="cropped")
    assert trainer.packed_k == 63
    loaders = make_loaders(
        cfg, str(csv), str(csv), num_threads=2,
        global_batch=trainer.global_batch(), transfer="cropped",
        packed_k=trainer.packed_k,
    )
    trainer.create_state(steps_per_epoch=1)
    step = trainer._fused_train_step()
    batch = next(iter(loaders["train"]))
    trainer.state, m = step(trainer.state, trainer.put_batch(batch), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    res = trainer.evaluate(loaders["test"])
    assert res["count"] == 16 and np.isfinite(res["loss"])


def test_out_of_image_blocks_inside_window_fill_black(tmp_path):
    """window_axis rounds the block window up (16px alignment), so a source
    whose block grid is smaller than the window leaves blocks INSIDE the
    packed rect but beyond the image.  Those must carry the wire's black
    convention (Y DC -1024), not the zero fill that decodes to mid-gray
    (ADVICE r3, dctcodec.cpp rgb_crop_pack_core)."""
    path = _write_jpeg(tmp_path / "small.jpg", seed=3, hw=(200, 200))
    (ncomp, yh, yw, wy0, wx0, wbh, wbw, fy, fx), row, _ = _call_row(
        path, codec.RGB_CROP_FULL, size=224
    )
    # 200px -> 25 image block rows; window rounds up to 26 (16px-aligned)
    assert (wbh, wbw, fy, fx) == (26, 26, 1, 1)
    f = split_packed_batch(jnp.asarray(row[None]), 28, 63, "mask16", geom=True)
    dy = np.asarray(f["dy"][0, 0])  # (28, 28) int16 luma DCs
    assert (dy[25, :26] == -1024).all()  # OOB row inside the 26-block rect
    assert (dy[:26, 25] == -1024).all()  # OOB col inside the rect
    assert (dy[26:, :] == -1024).all() and (dy[:, 26:] == -1024).all()  # pad
    assert (dy[:25, :25] != -1024).any()  # real content present
