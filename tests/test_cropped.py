"""Tests for the host-side crop-before-pack path (codec.read_crop_resize_pack
+ DctCroppedLoader + make_cropped_*_pipeline).

Oracles: the dense Python chain (read_coefficients -> dequant+clamp ->
crop -> resize via ops.basis.resize_axis_operator), which is itself pinned
against the reference's dct_ops in tests/test_reference_parity_ops.py.
"""

import math

import jax
import numpy as np
import pytest

from rgbnomore_tpu import codec
from rgbnomore_tpu.augment.pipeline import split_packed_batch, unpack_fields
from rgbnomore_tpu.data.croppack import build_op_pack, even_factors
from rgbnomore_tpu.data.index import load_index
from rgbnomore_tpu.data.loader import DctCroppedLoader, packed_layout, row_views
from rgbnomore_tpu.ops.basis import resize_axis_operator


def _write_jpeg(path, h, w, seed=0, gray=False, quality=90):
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w]
    f = 0.02 + 0.03 * rng.random(2)
    chans = 1 if gray else 3
    img = np.stack(
        [
            (128 + 100 * np.sin(ys * f[0] + p) * np.cos(xs * f[1])).astype(np.uint8)
            for p in np.linspace(0, 2, chans)
        ]
    )
    codec.write_tensor(path, img, quality=quality)
    return path


def _call(path, mode, target=28, k=16, uniforms=None, ratio=None, max_src=64):
    pack = build_op_pack(target, max_src)
    layout = packed_layout(target, k, "mask16")
    row = np.zeros(layout["row"], np.uint8)
    v = row_views(row, layout)
    if uniforms is None:
        uniforms = np.zeros(12)
    ret = codec.read_crop_resize_pack(
        path, k, mode, uniforms, pack,
        v["vy"], v["iy"], v["sy"], v["dy"],
        v["vc"], v["ic"], v["sc"], v["dc"], v["quant"],
        ratio=ratio if ratio is not None else target / (target + 4),
    )
    return ret, row, v, layout


def _oracle_plane(coeff, quant, bi, bj, bh, bw, target):
    """Dense f64 crop+resize of ONE component plane (h, w, 8, 8)."""
    deq = np.clip(coeff.astype(np.float64) * quant[None, None].astype(np.float64),
                  -1024, 1016)
    h, w = coeff.shape[:2]
    win = np.zeros((bh, bw, 8, 8))
    r0, c0 = max(0, -bi), max(0, -bj)
    r1 = min(bh, h - bi)
    c1 = min(bw, w - bj)
    if r1 > r0 and c1 > c0:
        win[r0:r1, c0:c1] = deq[bi + r0 : bi + r1, bj + c0 : bj + c1]
    flat = win.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    r_h = resize_axis_operator(bh, target).astype(np.float64)
    r_w = resize_axis_operator(bw, target).astype(np.float64)
    out = r_h @ flat @ r_w.T
    return out.reshape(target, 8, target, 8).transpose(0, 2, 1, 3)


def _unpack_row(row, target, k):
    f = split_packed_batch(row[None], target, k, "mask16")
    y, c = unpack_fields(f, "mask16")
    return np.asarray(y[0, 0]), np.asarray(c[0])


def test_op_pack_block_structure():
    """resize_axis_operator(s, t) == I_g (x) G for the shipped group blocks."""
    pack = build_op_pack(28, 64)
    for s in (2, 14, 28, 33, 56, 64):
        row = pack.spec[s - 1]
        assert row[0] == s
        _, gy, ay, by, offy = row[:5]
        g = np.asarray(pack.data[offy : offy + by * 8 * ay * 8]).reshape(by * 8, ay * 8)
        r = resize_axis_operator(s, 28)
        full = np.kron(np.eye(gy, dtype=np.float32), g)
        np.testing.assert_allclose(full, r, atol=1e-6)
        assert gy * ay == s and gy * by == 28


@pytest.mark.parametrize("mode,ratio", [(codec.CROP_CENTER, 28 / 32), (codec.CROP_FULL, 1.0)])
def test_deterministic_modes_match_oracle(tmp_path, mode, ratio):
    path = _write_jpeg(tmp_path / "a.jpg", 512, 512, seed=1)
    target = 28
    (ncomp, yh, yw, ch, cw, bi, bj, bh, bw), row, v, _ = _call(
        path, mode, target=target, k=24, ratio=ratio
    )
    assert ncomp == 3 and (yh, yw) == (64, 64)
    if mode == codec.CROP_CENTER:
        # reference ResizedCenterCrop: crop round(28/32*64)=56 centered
        assert (bh, bw) == (56, 56) and (bi, bj) == (4, 4)
    else:
        assert (bh, bw) == (64, 64) and (bi, bj) == (0, 0)

    dims, quant, y, cbcr = codec.read_coefficients(path)
    want_y = _oracle_plane(y[0], quant[0], bi, bj, bh, bw, target)
    got_y, got_c = _unpack_row(row, target, 24)
    tol = float(v["sy"].max()) / 2 + 1.0  # wire AC quant + DC rounding + f32
    assert np.abs(got_y - want_y).max() <= tol
    # chroma: halved box, ceil'd source for full mode
    csh, csw = ((bh + 1) // 2, (bw + 1) // 2) if mode == codec.CROP_FULL else (bh // 2, bw // 2)
    for comp in range(2):
        want_c = _oracle_plane(cbcr[comp], quant[1 + comp], bi // 2, bj // 2, csh, csw, 14)
        assert np.abs(got_c[comp] - want_c).max() <= float(v["sc"].max()) / 2 + 1.0


def test_mask16q_matches_packed_wire_on_identity_crop(tmp_path):
    """The quantized-unit mask16q wire must reproduce the full-canvas packed
    wire's content (same selection domain, same device dequantize) when the
    center crop is an identity resize — the packed wire is the trainability
    oracle (CROPBISECT.json: packed learns, dequantized-domain mask16 does
    not at the depth-12 proxy)."""
    from rgbnomore_tpu.augment.pipeline import (
        make_cropped_eval_pipeline,
        make_eval_pipeline,
    )
    from rgbnomore_tpu.data.index import IndexDataset
    from rgbnomore_tpu.data.loader import DctCroppedLoader, DctPackedLoader
    from rgbnomore_tpu.train.config import generate_config

    paths = [str(_write_jpeg(tmp_path / f"m{i}.jpg", 256, 256, seed=10 + i))
             for i in range(4)]
    ds = IndexDataset(np.asarray(paths, object), np.arange(4, dtype=np.int32))
    cfg = generate_config("vitti", "dct", modelver=1)

    cl = DctCroppedLoader(ds, 4, target=28, k=16, mode="center", max_src=32,
                          fmt="mask16q", shuffle=False, seed=0, num_threads=2)
    cq = next(iter(cl))
    yq, _cq, lq, wq = jax.jit(make_cropped_eval_pipeline(
        cfg, k=16, fmt="mask16q"))(cq["packed"])

    pl = DctPackedLoader(ds, 4, canvas=32, k=16, fmt="mask", shuffle=False,
                         seed=0, num_threads=2)
    pb = next(iter(pl))
    yp, _cp, lp, wp = jax.jit(make_eval_pipeline(
        cfg, canvas=32, packed=True, packed_fmt="mask", packed_k=16))(pb["packed"])

    assert np.array_equal(np.asarray(lq), np.asarray(lp))
    yq, yp = np.asarray(yq), np.asarray(yp)
    rel = np.sqrt(((yq - yp) ** 2).mean()) / np.sqrt((yp ** 2).mean())
    # identical box + identical quant domain; residue is only the K-budget
    # split (mask16q reserves DC outside K, packed lets DC compete) + int8
    # scale rounding.  The dequantized mask16 wire measures ~0.67 here.
    assert rel < 0.1, f"mask16q diverges from the packed wire: rel rms {rel}"
    # DC: mask16q carries it exactly (dedicated int16 plane) while packed
    # int8-quantizes it with the block scale — agree to the int8 half-step
    np.testing.assert_allclose(yq[..., 0, 0], yp[..., 0, 0], atol=0.05)


def test_random_mode_matches_oracle(tmp_path):
    path = _write_jpeg(tmp_path / "b.jpg", 512, 512, seed=2)
    rng = np.random.default_rng(3)
    for trial in range(5):
        u = rng.random(12)
        (ncomp, yh, yw, *_rest), row, v, _ = _call(path, codec.CROP_RANDOM, uniforms=u)
        bi, bj, bh, bw = _rest[2:]
        dims, quant, y, cbcr = codec.read_coefficients(path)
        want = _oracle_plane(y[0], quant[0], bi, bj, bh, bw, 28)
        got_y, _ = _unpack_row(row, 28, 16)
        # top-K drops coefficients: compare only the blocks' kept info via a
        # loose overall tolerance plus an exact-DC check
        np.testing.assert_allclose(got_y[..., 0, 0], np.round(want[..., 0, 0]), atol=1.0)
        err = np.abs(got_y - want)
        tol = float(v["sy"].max()) / 2 + 1.0
        assert np.quantile(err, 0.99) <= tol  # kept coefficients are tight
        assert (bh, bw)[0] in (2, 4, 14, 28, 56)


def test_crop_boxes_stay_inside_true_grid(tmp_path):
    """VERDICT item 5: a 320x480 JPEG (40x60 blocks) must never get crop
    boxes beyond its true block grid (custom_transforms.py:557-629)."""
    path = _write_jpeg(tmp_path / "c.jpg", 320, 480, seed=4)
    rng = np.random.default_rng(5)
    sizes = set()
    for _ in range(200):
        (ncomp, yh, yw, ch, cw, bi, bj, bh, bw), *_ = _call(
            path, codec.CROP_RANDOM, uniforms=rng.random(12)
        )
        assert (yh, yw) == (40, 60)
        assert 0 <= bi and bi + bh <= yh
        assert 0 <= bj and bj + bw <= yw
        assert bi % 2 == 0 and bj % 2 == 0
        sizes.add((bh, bw))
    # scale (0.05, 1)*40*60 blocks -> sides 11..49 -> snap set {14, 28}
    # (56 > min dim always retries); both must appear
    assert sizes == {(14, 14), (28, 28)}
    # no size may exceed the smaller true dimension
    assert max(s[0] for s in sizes) <= 40


def test_center_crop_non_square(tmp_path):
    """Center mode on a 40x60-block image: per-axis snap like the reference
    (custom_transforms.py:850-884)."""
    path = _write_jpeg(tmp_path / "d.jpg", 320, 480, seed=6)
    (n, yh, yw, ch, cw, bi, bj, bh, bw), row, v, _ = _call(
        path, codec.CROP_CENTER, ratio=28 / 32
    )
    # round(0.875*40)=35 -> mult path: round(35/28)=1 -> 28; round(0.875*60)=52
    # -> round(52/28)=2 -> 56 <= 60
    assert (bh, bw) == (28, 56)
    assert (bi, bj) == ((40 - 28) // 2 // 2 * 2, (60 - 56) // 2 // 2 * 2)
    dims, quant, y, cbcr = codec.read_coefficients(path)
    want = _oracle_plane(y[0], quant[0], bi, bj, bh, bw, 28)
    got_y, _ = _unpack_row(row, 28, 16)
    assert np.abs(got_y - want).max() <= float(v["sy"].max()) / 2 + 1.0


def test_tiny_image_fallback(tmp_path):
    """Images smaller than every candidate still produce a legal box (the
    reference zero-pads out-of-range crops via crop_dct)."""
    path = _write_jpeg(tmp_path / "e.jpg", 24, 24, seed=7)  # 3x3 blocks
    (n, yh, yw, ch, cw, bi, bj, bh, bw), row, v, _ = _call(
        path, codec.CROP_RANDOM, uniforms=np.full(12, 0.99)
    )
    assert (yh, yw) == (3, 3)
    # fallback: min dim 3 -> nearest even factor of 28 is 2
    assert (bh, bw) == (2, 2)
    got_y, _ = _unpack_row(row, 28, 16)
    assert np.isfinite(got_y).all()


def test_grayscale_neutral_chroma(tmp_path):
    path = _write_jpeg(tmp_path / "g.jpg", 256, 256, gray=True, seed=8)
    (ncomp, *_), row, v, _ = _call(path, codec.CROP_CENTER)
    assert ncomp == 1
    got_y, got_c = _unpack_row(row, 28, 16)
    assert np.abs(got_c).max() == 0.0  # neutral chroma (datasets.py:291-293)
    assert np.abs(got_y).max() > 0.0


def test_even_factors_match_reference():
    assert even_factors(28) == [2, 4, 14, 28]
    assert even_factors(32) == [2, 4, 8, 16, 32]


def test_loader_determinism_and_shapes(tmp_path):
    paths = [
        _write_jpeg(tmp_path / f"i{i}.jpg", 512, 512, seed=10 + i) for i in range(6)
    ]
    csv = tmp_path / "index.csv"
    csv.write_text(
        "Filepath,Label\n" + "\n".join(f"{p},{i}" for i, p in enumerate(paths)) + "\n"
    )
    ds = load_index(csv)

    def batches(epoch):
        ld = DctCroppedLoader(ds, 3, target=28, k=16, mode="train", shuffle=True,
                              seed=7, num_threads=2)
        ld.set_epoch(epoch)
        return [b["packed"].copy() for b in ld]

    a0, b0 = batches(0), batches(0)
    for x, y in zip(a0, b0):
        np.testing.assert_array_equal(x, y)
    a1 = batches(1)
    assert any(not np.array_equal(x, y) for x, y in zip(a0, a1))
    layout = packed_layout(28, 16, "mask16")
    assert a0[0].shape == (3, layout["row"])


def test_cropped_trainer_step(tmp_path):
    """Full Trainer train+eval step over the cropped wire on the CPU mesh."""
    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer, make_loaders

    paths = [
        _write_jpeg(tmp_path / f"t{i}.jpg", 512, 512, seed=20 + i) for i in range(8)
    ]
    csv = tmp_path / "index.csv"
    csv.write_text(
        "Filepath,Label\n" + "\n".join(f"{p},{i % 4}" for i, p in enumerate(paths)) + "\n"
    )
    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.depth = 1
    cfg.model.classes = 4
    cfg.train.batch_size = 8
    cfg.train.warmup = 2
    trainer = Trainer(cfg, transfer="cropped")
    loaders = make_loaders(cfg, csv, csv, global_batch=trainer.global_batch(),
                           transfer="cropped")
    trainer.create_state(steps_per_epoch=1)
    step = trainer._fused_train_step()
    batch = next(iter(loaders["train"]))
    trainer.state, m = step(trainer.state, trainer.put_batch(batch), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    res = trainer.evaluate(loaders["test"])
    assert res["count"] == 8 and np.isfinite(res["loss"])


def test_multi_step_matches_repeated_single_steps(tmp_path):
    """_fused_multi_train_step(n) must be bit-for-bit the same training as n
    single fused steps (same per-step RNG fold on state.step)."""
    import jax.numpy as jnp

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer

    paths = [
        _write_jpeg(tmp_path / f"m{i}.jpg", 256, 256, seed=40 + i) for i in range(16)
    ]
    csv = tmp_path / "index.csv"
    csv.write_text(
        "Filepath,Label\n" + "\n".join(f"{p},{i % 4}" for i, p in enumerate(paths)) + "\n"
    )
    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.depth = 1
    cfg.model.classes = 4
    cfg.train.batch_size = 8  # one row per device on the 8-device CPU mesh
    cfg.train.warmup = 2
    cfg.train.auglist = ["Brightness", "Cutout"]

    from rgbnomore_tpu.data.index import load_index
    from rgbnomore_tpu.data.loader import DctCroppedLoader

    ds = load_index(csv)
    loader = DctCroppedLoader(ds, 8, target=28, k=16, mode="train", shuffle=False,
                              num_threads=2)
    bufs = [b["packed"] for b in loader][:2]
    superbuf = np.stack(bufs)

    def fresh_trainer():
        t = Trainer(cfg, transfer="cropped")
        t.create_state(steps_per_epoch=2)
        return t

    rng = jax.random.PRNGKey(7)
    t1 = fresh_trainer()
    step = t1._fused_train_step()
    losses1 = []
    for b in bufs:
        t1.state, m = step(t1.state, {"packed": t1._put(b)}, rng)
        losses1.append(float(m["loss"]))
    t2 = fresh_trainer()
    multi = t2._fused_multi_train_step(2)
    t2.state, m2 = multi(t2.state, t2.put_superbatch(superbuf), rng)
    np.testing.assert_allclose(np.asarray(m2["loss"]), losses1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(t2.state.step) == 2


def test_cropped_eval_matches_dense_eval_pipeline(tmp_path):
    """The host center-crop wire reproduces the on-device eval pipeline
    (make_center_crop_resize on the dense canvas) within wire quantization."""
    import jax.numpy as jnp

    from rgbnomore_tpu.augment.pipeline import (
        dequantize,
        make_center_crop_resize,
        make_cropped_eval_pipeline,
        to_range,
    )

    path = _write_jpeg(tmp_path / "p.jpg", 512, 512, seed=30)
    # dense reference: canvas read -> device pipeline
    y = np.zeros((1, 1, 64, 64, 8, 8), np.int16)
    c = np.zeros((1, 2, 32, 32, 8, 8), np.int16)
    q = np.zeros((1, 3, 8, 8), np.int16)
    codec.read_into_canvas(path, y[0], c[0], q[0])
    dy, dc = dequantize(jnp.asarray(y), jnp.asarray(c), jnp.asarray(q))
    crop = make_center_crop_resize(32, 28, 64)
    wy, wc = crop(dy, dc)
    want_y, want_c = to_range(wy), to_range(wc)

    # cropped wire at high K (near-lossless ACs)
    (_, *_r), row, v, layout = _call(path, codec.CROP_CENTER, k=40)
    pipe = make_cropped_eval_pipeline(target=28, k=40)
    got_y, got_c, labels, w = pipe(jnp.asarray(row[None]))
    # wire error in DCT units <= scale/2 + DC rounding; ToRange divides by 2040
    tol = (float(v["sy"].max()) / 2 + 1.0) * 2 / 2040
    assert np.abs(np.asarray(got_y) - np.asarray(want_y)).max() <= tol + 1e-4
    assert np.abs(np.asarray(got_c) - np.asarray(want_c)).max() <= tol + 1e-4
