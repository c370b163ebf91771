"""Startup model summary (reference torchinfo.summary,
``utils/pipeline_utils.py:383-384``)."""

import numpy as np

from rgbnomore_tpu.train.config import build_model, generate_config
from rgbnomore_tpu.utils.summary import model_summary


def test_model_summary_lists_modules_and_params():
    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.depth = 2
    model = build_model(cfg)
    s = model_summary(model, cfg)
    assert "ViT" in s
    assert "patchembed" in s
    assert "float32[2,1000]" in s  # logits on the declared input shapes
    # the table totals the param count; cross-check against a real init
    import jax

    params = model.init(jax.random.PRNGKey(0),
                        *__import__("rgbnomore_tpu.train.config",
                                    fromlist=["example_inputs"]).example_inputs(cfg, 2))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert f"{n:,}" in s.replace("\n", " ")


def test_model_summary_rgb():
    cfg = generate_config("vitti", "rgb", modelver=1)
    cfg.model.depth = 1
    s = model_summary(build_model(cfg), cfg)
    assert "float32[2,1000]" in s
