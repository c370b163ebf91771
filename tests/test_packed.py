"""Sparse top-K packed transfer: pack/unpack fidelity and loader/pipeline wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgbnomore_tpu import codec
from rgbnomore_tpu.augment.pipeline import (
    make_train_pipeline,
    unpack_coefficients,
    unpack_coefficients_mask,
)
from rgbnomore_tpu.data.index import load_index
from rgbnomore_tpu.data.loader import DctPackedLoader, packed_layout

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("pk")
    ys, xs = np.mgrid[0:64, 0:64]
    img = np.stack([(128 + 90 * np.sin(ys / 7) * np.cos(xs / 5)).astype(np.uint8)] * 3)
    p = root / "img.jpg"
    codec.write_tensor(p, img, quality=90)
    return str(p)


def _pack(path, k=16, cv=8):
    vy = np.zeros((1, cv, cv, k), np.int8)
    iy = np.zeros((1, cv, cv, k), np.uint8)
    sy = np.ones((1, cv, cv), np.uint8)
    vc = np.zeros((2, cv // 2, cv // 2, k), np.int8)
    ic = np.zeros((2, cv // 2, cv // 2, k), np.uint8)
    sc = np.ones((2, cv // 2, cv // 2), np.uint8)
    q = np.zeros((3, 8, 8), np.int16)
    codec.read_into_packed(path, k, vy, iy, sy, vc, ic, sc, q)
    return vy, iy, sy, vc, ic, sc, q


def _pack_mask(path, k=16, cv=8):
    vy = np.zeros((1, cv, cv, k), np.int8)
    my = np.zeros((1, cv, cv, 8), np.uint8)
    sy = np.ones((1, cv, cv), np.uint8)
    vc = np.zeros((2, cv // 2, cv // 2, k), np.int8)
    mc = np.zeros((2, cv // 2, cv // 2, 8), np.uint8)
    sc = np.ones((2, cv // 2, cv // 2), np.uint8)
    q = np.zeros((3, 8, 8), np.int16)
    codec.read_into_packed_mask(path, k, vy, my, sy, vc, mc, sc, q)
    return vy, my, sy, vc, mc, sc, q


def test_mask_format_matches_index_reconstruction(jpeg_file):
    """Bitmask packing carries the exact same information as (value, index)
    pairs — reconstructions must be bit-identical, at 25 vs 33 B/block."""
    vy, iy, sy, vc, ic, sc, q = _pack(jpeg_file, k=16)
    vym, my, sym, vcm, mc, scm, qm = _pack_mask(jpeg_file, k=16)
    np.testing.assert_array_equal(q, qm)
    np.testing.assert_array_equal(sy, sym)
    y_idx = np.asarray(unpack_coefficients(jnp.asarray(vy), jnp.asarray(iy), jnp.asarray(sy)))
    y_msk = np.asarray(unpack_coefficients_mask(jnp.asarray(vym), jnp.asarray(my), jnp.asarray(sym)))
    np.testing.assert_array_equal(y_idx, y_msk)
    c_idx = np.asarray(unpack_coefficients(jnp.asarray(vc), jnp.asarray(ic), jnp.asarray(sc)))
    c_msk = np.asarray(unpack_coefficients_mask(jnp.asarray(vcm), jnp.asarray(mc), jnp.asarray(scm)))
    np.testing.assert_array_equal(c_idx, c_msk)
    # popcount of every mask never exceeds K
    bits = np.unpackbits(my, axis=-1).reshape(1, my.shape[1], my.shape[2], 64)
    assert bits.sum(axis=-1).max() <= 16


def test_mask_layout_is_smaller(jpeg_file):
    assert packed_layout(64, 16, "mask")["row"] < 0.78 * packed_layout(64, 16, "index")["row"]


def test_mask16_format_near_lossless(jpeg_file):
    """Exact int16 DC + DC-free AC scale: at K=63 every block whose AC scale
    is 1 (the typical case) round-trips bit-exactly."""
    from rgbnomore_tpu.augment.pipeline import unpack_fields

    k = 63
    cv = 8
    vy = np.zeros((1, cv, cv, k), np.int8)
    my = np.zeros((1, cv, cv, 8), np.uint8)
    sy = np.ones((1, cv, cv), np.uint8)
    dy = np.zeros((1, cv, cv), np.int16)
    vc = np.zeros((2, cv // 2, cv // 2, k), np.int8)
    mc = np.zeros((2, cv // 2, cv // 2, 8), np.uint8)
    sc = np.ones((2, cv // 2, cv // 2), np.uint8)
    dc = np.zeros((2, cv // 2, cv // 2), np.int16)
    q = np.zeros((3, 8, 8), np.int16)
    codec.read_into_packed_mask16(jpeg_file, k, vy, my, sy, dy, vc, mc, sc, dc, q)

    _, quant, y_dense, c_dense = codec.read_coefficients(jpeg_file)
    np.testing.assert_array_equal(q, quant)
    np.testing.assert_array_equal(dy[0], y_dense[0, :, :, 0, 0])  # DC exact

    f = {name: jnp.asarray(a[None]) for name, a in
         (("vy", vy), ("iy", my), ("sy", sy), ("dy", dy),
          ("vc", vc), ("ic", mc), ("sc", sc), ("dc", dc))}
    y, c = unpack_fields(f, "mask16")
    y = np.asarray(y)[0]
    c = np.asarray(c)[0]
    # AC-scale-1 blocks are exact; others within scale/2
    exact = sy == 1
    np.testing.assert_array_equal(y[exact], y_dense[exact].astype(np.float32))
    assert np.abs(y - y_dense).max() <= np.float32(sy.max()) / 2 + 0.5
    np.testing.assert_array_equal(c[sc == 1], c_dense[sc == 1].astype(np.float32))


def test_pack_unpack_close_to_dense(jpeg_file):
    _, quant, y_dense, c_dense = codec.read_coefficients(jpeg_file)
    vy, iy, sy, vc, ic, sc, q = _pack(jpeg_file, k=16)
    np.testing.assert_array_equal(q, quant)
    y_up = np.asarray(unpack_coefficients(jnp.asarray(vy[None]), jnp.asarray(iy[None]), jnp.asarray(sy[None])))[0]
    c_up = np.asarray(unpack_coefficients(jnp.asarray(vc[None]), jnp.asarray(ic[None]), jnp.asarray(sc[None])))[0]
    # scale rounding error <= scale/2; scales here are small
    assert np.abs(y_up - y_dense).max() <= 2.0
    assert np.abs(c_up - c_dense).max() <= 2.0
    # AC coefficients with |v| <= 127 and blocks with <= K nonzeros are exact
    nz = (y_dense != 0).sum(axis=(-1, -2))
    small_scale = np.abs(y_dense).max(axis=(-1, -2)) <= 127
    exact = (nz <= 16) & small_scale
    np.testing.assert_array_equal(y_up[0][exact[0]], y_dense[0][exact[0]].astype(np.float32))


def test_pack_large_k_is_lossless_when_scale_1(jpeg_file):
    _, _, y_dense, _ = codec.read_coefficients(jpeg_file)
    vy, iy, sy, *_ = _pack(jpeg_file, k=64)
    y_up = np.asarray(unpack_coefficients(jnp.asarray(vy[None]), jnp.asarray(iy[None]), jnp.asarray(sy[None])))[0]
    mask = np.abs(y_dense).max(axis=(-1, -2)) <= 127  # scale-1 blocks
    np.testing.assert_array_equal(y_up[0][mask[0]], y_dense[0][mask[0]].astype(np.float32))


def test_packed_loader_and_pipeline(tmp_path, jpeg_file):
    rows = ["Filepath,Label"] + [f"{jpeg_file},{i % 2}" for i in range(6)]
    csv = tmp_path / "idx.csv"
    csv.write_text("\n".join(rows) + "\n")
    ds = load_index(csv)
    loader = DctPackedLoader(ds, 4, canvas=8, k=16, shuffle=False, num_threads=2)
    batch = next(iter(loader))
    # consolidated single-buffer transfer, >4x smaller than dense int16
    dense_bytes = 1 * 8 * 8 * 64 * 2 + 2 * 4 * 4 * 64 * 2
    assert batch["packed"].shape == (4, loader.layout["row"])
    assert loader.layout["row"] < dense_bytes / 4
    assert (batch["weights"] == 1.0).all()
    assert set(batch["labels"].tolist()) == {0, 1}

    pipe = jax.jit(make_train_pipeline(
        target=8, canvas=8, auglist=["Brightness", "Cutout"], num_ops=1, magnitude=3,
        packed=True,
    ))
    y, c, labels, weights = pipe(jax.random.PRNGKey(0), jnp.asarray(batch["packed"]))
    assert y.shape == (4, 1, 8, 8, 8, 8)
    assert float(jnp.abs(y).max()) <= 1.0 + 1e-6
    # labels/weights round-trip through the packed buffer bit-exactly
    np.testing.assert_array_equal(np.asarray(labels), batch["labels"])
    np.testing.assert_array_equal(np.asarray(weights), batch["weights"])


def test_packed_trainer_end_to_end(tmp_path, jpeg_file):
    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import train_and_eval

    rows = ["Filepath,Label"] + [f"{jpeg_file},{i % 2}" for i in range(8)]
    csv = tmp_path / "idx.csv"
    csv.write_text("\n".join(rows) + "\n")
    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.depth = 2
    cfg.model.dct_blocks = 8
    cfg.model.classes = 2
    cfg.train.epochs = 1
    cfg.train.batch_size = 8
    cfg.train.warmup = 2
    cfg.train.split = 0.25
    res = train_and_eval(
        cfg, str(csv), str(csv), savepath=str(tmp_path / "m.msgpack"),
        run_train=True, run_eval=True, verbose=0, canvas=8, num_threads=2,
        transfer="packed",
    )
    assert res["test"]["count"] == 8.0
