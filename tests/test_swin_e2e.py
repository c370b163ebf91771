"""SwinV2 through the full trainer: DCT loader -> device pipeline -> train/eval."""

import numpy as np
import pytest

from rgbnomore_tpu import codec
from rgbnomore_tpu.train.config import generate_config


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("swin")
    rng = np.random.default_rng(0)
    rows = ["Filepath,Label"]
    ys, xs = np.mgrid[0:64, 0:64]
    for i in range(8):
        cls = i % 2
        img = np.stack([(128 + 80 * np.sin(ys / (3 + 2 * cls)) * np.cos(xs / 4)).astype(np.uint8)] * 3)
        p = root / f"i{i}.jpg"
        codec.write_tensor(p, img, quality=92)
        rows.append(f"{p},{cls}")
    csv = root / "idx.csv"
    csv.write_text("\n".join(rows) + "\n")
    return csv


def test_swin_dct_trainer_slice(tiny_ds, tmp_path):
    from rgbnomore_tpu.train.loop import train_and_eval

    cfg = generate_config("swinv2", "dct")
    # tiny swin: 64px canvas -> 8 blocks -> patch 4 -> 16x16 tokens, 2 stages
    cfg.model.depth = (1, 1)
    cfg.model.heads = (2, 4)
    cfg.model.window_size = 4
    cfg.model.drop_path = 0.0
    cfg.model.pretrained_window_sizes = (0, 0)
    cfg.model.classes = 2
    cfg.model.dct_blocks = 8
    cfg.model.input_size = 64
    cfg.train.epochs = 1
    cfg.train.batch_size = 8
    cfg.train.warmup = 2
    cfg.train.split = 0.25
    cfg.train.amp = False  # keep f32 on CPU test backend

    res = train_and_eval(
        cfg, str(tiny_ds), str(tiny_ds), savepath=str(tmp_path / "swin.msgpack"),
        run_train=True, run_eval=True, verbose=0, canvas=8, num_threads=2,
    )
    assert res["test"]["count"] == 8.0
    assert 0.0 <= res["test"]["accuracy"] <= 1.0


def test_swin_eval_pipeline_uses_full_resize(tiny_ds):
    """Swin's eval transform is a full-canvas resize, not a center crop."""
    from rgbnomore_tpu.augment.pipeline import make_eval_pipeline

    cfg = generate_config("swinv2", "dct")
    cfg.model.dct_blocks = 8
    pipe = make_eval_pipeline(cfg, canvas=16, packed=False)
    import jax.numpy as jnp

    y = jnp.ones((1, 1, 16, 16, 8, 8))
    c = jnp.ones((1, 2, 8, 8, 8, 8))
    q = jnp.ones((1, 3, 8, 8), jnp.int16)
    oy, oc = pipe(y, c, q)
    assert oy.shape == (1, 1, 8, 8, 8, 8)
    assert oc.shape == (1, 2, 4, 4, 8, 8)
