"""Dynamic loss scaling for fp16 AMP.

The reference pairs fp16 autocast with a ``torch.cuda.amp.GradScaler``
(growth 1.6, backoff 0.625, growth interval 600, ``pipeline_utils.py:540-541``)
whose scale is clamped to ``[2**-4, 2**18]`` every step
(``clip_gradscaler``, ``pipeline_utils.py:399-409``).  bf16 — the TPU-native
AMP dtype — has the same exponent range as f32 and needs none of this, but
``--ampdtype fp16`` is honored, so it gets the same protection here:

- the loss is multiplied by ``scale`` before the backward pass (so small
  fp16 gradients do not underflow),
- gradients are unscaled before clip/optimizer,
- non-finite gradients SKIP the parameter/optimizer update (the schedule
  still advances, like the reference's unconditional ``scheduler.step()``,
  ``train.py:174``) and back off the scale,
- ``growth_interval`` consecutive finite steps grow the scale.

All of it is branch-free (``jnp.where`` / tree-select) so the whole policy
lives inside the one jitted SPMD train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "LossScaleState",
    "init_loss_scale",
    "all_finite",
    "update_loss_scale",
    "select_tree",
    "select_opt_state",
]

GROWTH = 1.6
BACKOFF = 0.625
GROWTH_INTERVAL = 600
SCALE_MIN = 2.0**-4
SCALE_MAX = 2.0**18


class LossScaleState(NamedTuple):
    """Carried on the TrainState; a pytree of two scalars."""

    scale: jax.Array  # f32, current loss scale
    good_steps: jax.Array  # int32, consecutive finite steps since last change


def init_loss_scale(init_scale: float = 2.0**15) -> LossScaleState:
    """Fresh scaler state (torch GradScaler's default init_scale=2**16 would
    clamp-grow anyway; 2**15 leaves one doubling of headroom)."""
    return LossScaleState(
        scale=jnp.asarray(init_scale, jnp.float32),
        good_steps=jnp.asarray(0, jnp.int32),
    )


def all_finite(tree) -> jax.Array:
    """True iff every element of every leaf is finite."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in leaves]))


def update_loss_scale(
    state: LossScaleState,
    finite: jax.Array,
    growth: float = GROWTH,
    backoff: float = BACKOFF,
    growth_interval: int = GROWTH_INTERVAL,
    scale_min: float = SCALE_MIN,
    scale_max: float = SCALE_MAX,
) -> LossScaleState:
    """GradScaler.update() semantics: backoff on overflow, grow every
    ``growth_interval`` consecutive finite steps, clamp to
    ``[scale_min, scale_max]`` (reference ``pipeline_utils.py:399-409``)."""
    good = jnp.where(finite, state.good_steps + 1, 0)
    grow_now = finite & (good >= growth_interval)
    scale = jnp.where(
        finite,
        jnp.where(grow_now, state.scale * growth, state.scale),
        state.scale * backoff,
    )
    scale = jnp.clip(scale, scale_min, scale_max)
    good = jnp.where(grow_now, 0, good)
    return LossScaleState(scale=scale, good_steps=good.astype(jnp.int32))


def select_tree(pred: jax.Array, on_true, on_false):
    """Leaf-wise ``where`` over two identically-structured pytrees."""
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def select_opt_state(finite: jax.Array, candidate, current):
    """Pick the optimizer state after a maybe-skipped step, matching torch
    GradScaler semantics exactly: on overflow the reference skips
    ``optimizer.step()`` (Adam moments and its bias-correction count do NOT
    advance) but still calls ``scheduler.step()`` unconditionally
    (``train.py:174``) — so the LR-schedule count MUST advance either way.

    Optax folds the schedule into the opt_state (``ScaleByScheduleState``
    inside ``adamw``), so a whole-tree rollback would also freeze the LR
    schedule on skipped steps — shifting the entire schedule late by the
    number of overflows.  This walks the (static) state structure and takes
    the candidate's ``ScaleByScheduleState`` nodes unconditionally while
    ``where``-selecting everything else on ``finite``.
    """
    import optax

    def walk(cand, cur):
        if isinstance(cand, optax.ScaleByScheduleState):
            return cand
        if isinstance(cand, tuple):
            merged = [walk(a, b) for a, b in zip(cand, cur)]
            return type(cand)(*merged) if hasattr(cand, "_fields") else tuple(merged)
        if isinstance(cand, dict):
            return {k: walk(cand[k], cur[k]) for k in cand}
        return jnp.where(finite, cand, cur)

    return walk(candidate, current)
