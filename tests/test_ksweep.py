"""Eval-wire fidelity regressions (VERDICT round-2 item 1).

The reference evaluates on the FULL dequantized coefficient spectrum
(``/root/reference/datasets.py:286-297``); this framework's cropped DCT wire
keeps the top-K ACs int8-quantized.  ``tools/ksweep_wire_accuracy.py``
measured model-output agreement of that wire against the dense path
(KSWEEP.json): 81.5% top-1 agreement at the train default K=16, 100.0% with
zero logit drift at K=48.  These tests pin

  * the defaults: eval loaders/pipelines ship K=48 while train stays K=16,
  * the measured property behind the default: dense vs K=48 logits agree on
    every sample with ~0 drift (deterministic seeds, CPU),
  * the ``mask16w`` (int16-AC) wire: bit-exact for identity crops, and
    within the 0.5 rounding bound otherwise — the corpus-independent exact
    option for data whose block energies overflow the int8 x uint8-scale.
"""

import numpy as np
import pytest

from rgbnomore_tpu import codec
from rgbnomore_tpu.augment.pipeline import split_packed_batch, unpack_fields
from rgbnomore_tpu.data.croppack import build_op_pack
from rgbnomore_tpu.data.loader import packed_layout, row_views

from test_cropped import _oracle_plane, _write_jpeg

EVAL_K = 48  # rgbnomore_tpu.train.loop.cropped_eval_defaults("DCT")


def _call_fmt(path, mode, fmt, target=28, k=63, uniforms=None, ratio=None,
              max_src=64):
    pack = build_op_pack(target, max_src)
    layout = packed_layout(target, k, fmt)
    row = np.zeros(layout["row"], np.uint8)
    v = row_views(row, layout)
    if uniforms is None:
        uniforms = np.zeros(12)
    ret = codec.read_crop_resize_pack(
        path, k, mode, uniforms, pack,
        v["vy"], v["iy"], v["sy"], v["dy"],
        v["vc"], v["ic"], v["sc"], v["dc"], v["quant"],
        ratio=ratio if ratio is not None else target / (target + 4),
        wide=fmt == "mask16w",
    )
    return ret, row, v


def _unpack_fmt(row, target, k, fmt):
    f = split_packed_batch(row[None], target, k, fmt)
    y, c = unpack_fields(f, fmt)
    return np.asarray(y[0, 0]), np.asarray(c[0])


def test_wide_wire_bit_exact_identity_crop(tmp_path):
    """mask16w at K=63 with no resize reproduces dequant+clamp EXACTLY:
    dequantized coefficients are integers, int16 holds them, no AC scale."""
    path = _write_jpeg(tmp_path / "id.jpg", 224, 224, seed=7)  # 28-block grid
    (ncomp, yh, yw, *_r), row, v = _call_fmt(path, codec.CROP_FULL, "mask16w",
                                             ratio=1.0)
    assert (yh, yw) == (28, 28)
    dims, quant, y, cbcr = codec.read_coefficients(path)
    want = np.clip(y[0].astype(np.float64) * quant[0][None, None], -1024, 1016)
    got_y, got_c = _unpack_fmt(row, 28, 63, "mask16w")
    np.testing.assert_array_equal(got_y, want)
    for comp in range(2):
        want_c = np.clip(cbcr[comp, :14, :14].astype(np.float64)
                         * quant[1 + comp][None, None], -1024, 1016)
        np.testing.assert_array_equal(got_c[comp], want_c)
    assert int(v["sy"].max()) == 1 and int(v["sc"].max()) == 1


def test_wide_wire_half_unit_after_resize(tmp_path):
    """mask16w after a real spectral resize stays within the 0.5 nearbyint
    bound of the dense f64 oracle (plus f32 resize accumulation)."""
    path = _write_jpeg(tmp_path / "rs.jpg", 512, 512, seed=8)
    (ncomp, yh, yw, ch, cw, bi, bj, bh, bw), row, v = _call_fmt(
        path, codec.CROP_CENTER, "mask16w")
    assert (bh, bw) == (56, 56)
    dims, quant, y, cbcr = codec.read_coefficients(path)
    want = _oracle_plane(y[0], quant[0], bi, bj, bh, bw, 28)
    got_y, _ = _unpack_fmt(row, 28, 63, "mask16w")
    assert np.abs(got_y - want).max() <= 0.5 + 1e-2


def test_wide_wire_topk_selection(tmp_path):
    """K < 63 mask16w keeps the K largest-|v| ACs (wire reconstruction error
    bounded by the largest dropped coefficient)."""
    path = _write_jpeg(tmp_path / "tk.jpg", 224, 224, seed=9)
    (_, *_r), row, v = _call_fmt(path, codec.CROP_FULL, "mask16w", k=8,
                                 ratio=1.0)
    (_, *_r2), row63, _ = _call_fmt(path, codec.CROP_FULL, "mask16w", k=63,
                                    ratio=1.0)
    got8, _ = _unpack_fmt(row, 28, 8, "mask16w")
    got63, _ = _unpack_fmt(row63, 28, 63, "mask16w")
    err = got63 - got8
    # per block: every kept (nonzero in got8) AC matches got63 exactly, and
    # no dropped coefficient exceeds the smallest kept magnitude
    flat8 = got8.reshape(-1, 64)[:, 1:]
    flat_err = err.reshape(-1, 64)[:, 1:]
    kept = flat8 != 0
    assert np.abs(flat_err[kept]).max() == 0
    for b in range(flat8.shape[0]):
        if kept[b].sum() == 8:  # full quota -> dropped <= min kept
            assert np.abs(flat_err[b]).max() <= np.abs(flat8[b][kept[b]]).min()


def test_eval_defaults_k48(tmp_path):
    """Trainer + make_loaders default the EVAL side of the cropped DCT wire
    to K=48 (KSWEEP.json: 100% top-1 agreement) while train stays K=16."""
    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer, cropped_eval_defaults, make_loaders

    assert cropped_eval_defaults("DCT") == (EVAL_K, "mask16")
    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.classes = 4
    cfg.model.depth = 1
    cfg.train.batch_size = 8
    trainer = Trainer(cfg, canvas=32, transfer="cropped")
    assert trainer.packed_k == 16 and trainer.packed_k_eval == EVAL_K

    rows = []
    for i in range(8):
        p = _write_jpeg(tmp_path / f"i{i}.jpg", 256, 256, seed=i)
        rows.append(f"{p},{i % 4}")
    idx = tmp_path / "index.csv"
    idx.write_text("Filepath,Label\n" + "\n".join(rows) + "\n")
    cfg.train.split = 0.25
    loaders = make_loaders(cfg, str(idx), str(idx), canvas=32, num_threads=1,
                           global_batch=trainer.global_batch(),
                           transfer="cropped", packed_k=trainer.packed_k)
    assert loaders["train"].k == 16 and loaders["train"].fmt == "mask16"
    for name in ("minival", "trainval", "test"):
        assert loaders[name].k == EVAL_K and loaders[name].fmt == "mask16"


def test_eval_k48_logits_agree_with_dense(tmp_path):
    """End-to-end regression of the measured K-sweep property: a fixed-seed
    model's predictions through the default K=48 eval wire agree with the
    dense full-spectrum path on every sample, with tiny logit drift.

    Mirrors tools/ksweep_wire_accuracy.py on an in-test corpus (q90 like the
    sweep corpus; deterministic, CPU)."""
    import jax
    import jax.numpy as jnp

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer, make_loaders

    n = 16
    rows = []
    for i in range(n):
        p = _write_jpeg(tmp_path / f"s{i}.jpg", 256, 256, seed=100 + i)
        rows.append(f"{p},{i % 5}")
    idx = tmp_path / "index.csv"
    idx.write_text("Filepath,Label\n" + "\n".join(rows) + "\n")

    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.classes = 5
    cfg.model.depth = 2
    cfg.train.batch_size = 8
    cfg.train.split = 0.2

    def logits_via(transfer):
        trainer = Trainer(cfg, canvas=32, transfer=transfer)
        loaders = make_loaders(cfg, str(idx), str(idx), canvas=32,
                               num_threads=1,
                               global_batch=trainer.global_batch(),
                               transfer=transfer)
        trainer.create_state(steps_per_epoch=1)
        pipe, model = trainer.eval_pipe, trainer.model
        packed = transfer == "cropped"

        @jax.jit
        def fn(params, batch):
            if packed:
                y, c, labels, w = pipe(batch["packed"])
            else:
                y, c = pipe(batch["y"], batch["cbcr"], batch["quant"])
                w = batch["weights"]
            return model.apply({"params": params}, y, c,
                               train=False).astype(jnp.float32), w
        out = []
        for batch in loaders["test"]:
            lg, w = jax.device_get(fn(trainer.state.params,
                                      trainer.put_batch(batch)))
            out.append(lg[w > 0])
        return np.concatenate(out)[:n]

    dense = logits_via("dense")
    wire = logits_via("cropped")  # eval side defaults to K=48
    assert np.array_equal(dense.argmax(-1), wire.argmax(-1))
    assert np.abs(dense - wire).max() <= 2e-3


def test_avx_pack_matches_scalar_oracle():
    """The dispatched mask16 packer (AVX-512 on this host) must be
    BIT-IDENTICAL to the always-compiled scalar oracle: same kept set under
    ties (ascending position order quota), same int8 quantization
    (round-half-up, truncating cast), same mask bytes and zero tail."""
    import numpy as np

    from rgbnomore_tpu.native import _dctcodec as dc

    rng = np.random.default_rng(7)
    for trial in range(2000):
        kind = trial % 5
        if kind == 0:
            blk = rng.normal(0, 100, 64).astype(np.float32)
        elif kind == 1:  # heavy ties: small integer magnitudes
            blk = rng.integers(-3, 4, 64).astype(np.float32)
        elif kind == 2:  # sparse
            blk = np.zeros(64, np.float32)
            blk[rng.choice(64, 8, replace=False)] = rng.normal(0, 500, 8)
        elif kind == 3:  # full dequant range incl the +-1024 clamp region
            blk = rng.uniform(-1024, 1016, 64).astype(np.float32)
        else:  # ternary (max tie pressure), with signed zeros
            blk = (rng.integers(0, 2, 64) * rng.choice([-1.0, 1.0], 64)).astype(np.float32)
        k = (4, 16, 32, 48, 63)[trial % 5]
        assert dc.pack_debug(blk, k, 0) == dc.pack_debug(blk, k, 1), (kind, k)
