#!/usr/bin/env python
"""Evaluation CLI — convenience entry mirroring the reference's eval flow.

Equivalent to ``train.py --eval`` (model loaded from ``--loadpath`` /
``--savepath``); also exposes the library helpers ``evaluate_model`` and
``benchmark_model`` re-exported from the framework (reference ``eval.py``).
"""

from __future__ import annotations

import sys

from rgbnomore_tpu.benchmark import benchmark_model  # noqa: F401  (API parity)
from rgbnomore_tpu.train.loop import Trainer, make_loaders, train_and_eval  # noqa: F401


def evaluate_model(cfg, index_train: str, index_val: str, loadpath: str, **kw) -> dict:
    """Evaluate saved weights on the test/val/trainval splits."""
    return train_and_eval(
        cfg, index_train, index_val, loadpath=loadpath,
        run_train=False, run_eval=True, **kw,
    )


if __name__ == "__main__":
    # eval-only entry: force --eval and strip any --train so `python eval.py`
    # can never silently start a training run (the reference's eval.py has no
    # CLI of its own; train.py --eval is the documented path)
    sys.argv = [a for a in sys.argv if a != "--train"]
    if "--eval" not in sys.argv:
        sys.argv.insert(1, "--eval")
    from train import main

    main()
