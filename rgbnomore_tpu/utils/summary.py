"""Startup model summary.

The reference prints a ``torchinfo.summary`` of the model on its declared
input shapes at startup (``utils/pipeline_utils.py:383-384``), which catches
shape breaks before the first real batch.  The JAX-native equivalent is
``flax.linen.Module.tabulate``: a per-module table of input/output shapes and
parameter counts computed shape-only (``jax.eval_shape`` underneath — no
device compute, no compile).
"""

from __future__ import annotations

import jax

__all__ = ["model_summary"]


def model_summary(model, cfg, batch: int = 2, depth: int = 2) -> str:
    """Render the per-module shape/param table for ``model`` on the config's
    declared input shapes (``example_inputs``).  Pure shape evaluation —
    safe to call before any device is touched."""
    from rgbnomore_tpu.train.config import example_inputs

    return model.tabulate(
        jax.random.PRNGKey(0),
        *example_inputs(cfg, batch=batch),
        depth=depth,
        console_kwargs={"width": 120, "force_terminal": False},
    )
