"""Orbax checkpointing of the full training state.

The reference saves ``{epoch, current_itr, model/optimizer/decayer/scheduler/
scaler state, loss, val_accuracy}`` per epoch (``pipeline_utils.py:471-516``)
but loses ``current_itr`` on resume (``pipeline_utils.py:571``).  Here the
whole :class:`~rgbnomore_tpu.train.steps.TrainState` (params + optimizer
state + step counter) plus epoch/metrics metadata is checkpointed, so resume
continues the schedule exactly where it left off.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint_step", "checkpoint_dir"]


def checkpoint_dir(savepath: str, model_name: str) -> Path:
    """``<dir(savepath)>/checkpoints/<model>`` as in ``pipeline_utils.py:471-488``."""
    return Path(savepath).resolve().parent / "checkpoints" / model_name


def save_checkpoint(ckpt_dir: str | Path, state, epoch: int, metrics: dict[str, Any] | None = None):
    """Save training state + metadata at step = epoch."""
    path = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave({"epoch": epoch, "metrics": metrics or {}}),
            ),
        )


def latest_checkpoint_step(ckpt_dir: str | Path) -> int | None:
    path = Path(ckpt_dir).resolve()
    if not path.exists():
        return None
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str | Path, state, step: int | None = None):
    """Restore; returns ``(state, meta)``.  ``state`` is the template."""
    path = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {path}")
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state),
                meta=ocp.args.JsonRestore(),
            ),
        )
    return restored["state"], restored["meta"]
