"""Jitted SPMD train / eval steps.

One jitted function is the whole per-iteration pipeline: mixup, forward,
loss, backward, clip, AdamW + scheduled decay — traced once, compiled by XLA,
with the gradient all-reduce over ICI inserted by sharding propagation
(batch sharded on the ``data`` mesh axis, state replicated).

Loss semantics mirror the reference (``train.py:142-176``): cross-entropy on
(possibly mixup-softened) one-hot targets, global-norm clip 1.0, per-iteration
schedule.  Eval mirrors ``eval.py:8-51`` but replaces the no-padding
``DistributedEvalSampler`` with padded batches + example weights, so shapes
stay static and the weighted sums are exact (no double counting).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState; ``step`` doubles as the warmup/schedule iteration counter.

    Restoring a checkpoint restores ``step`` — fixing the reference bug where
    ``current_itr`` was saved but never restored (``pipeline_utils.py:571``),
    which silently restarted warmup on resume.

    ``loss_scale`` is a :class:`rgbnomore_tpu.train.scaler.LossScaleState`
    when fp16 AMP is active (the reference's GradScaler state,
    ``pipeline_utils.py:540-541``) and ``None`` otherwise.
    """

    loss_scale: Any = None


def mixup_batch(rng: jax.Array, inputs: tuple, labels: jax.Array, num_classes: int, alpha: float = 1.0):
    """Batch-level mixup with big_vision's sorted-lambda convention.

    One lambda per batch from Beta(alpha, alpha), taking the larger of
    (u, 1-u) so the original example dominates; pairs are formed by rolling
    the batch by one (``utils/cls_transforms.py:100-182``).
    """
    targets = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    u = jax.random.beta(rng, alpha, alpha)
    lam = jnp.maximum(u, 1.0 - u)
    mixed_inputs = tuple(lam * x + (1.0 - lam) * jnp.roll(x, 1, axis=0) for x in inputs)
    mixed_targets = lam * targets + (1.0 - lam) * jnp.roll(targets, 1, axis=0)
    return mixed_inputs, mixed_targets


def softmax_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean CE against (soft) target distributions, computed in f32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


# NOTE: Trainer._fused_train_step / _fused_eval_step (train/loop.py) fuse the
# on-device input pipeline in front of the same loss/update logic below; when
# changing loss, rng handling or metric semantics here, mirror it there (the
# builders below are used by the synthetic benchmarks and the multichip
# dryrun, which must measure the same step as production).
def make_train_step(
    model,
    num_classes: int,
    use_mixup: bool = True,
    mixup_alpha: float = 1.0,
) -> Callable:
    """Build the jitted train step ``(state, batch, rng) -> (state, metrics)``.

    ``batch`` is ``(inputs_tuple, labels)`` with the leading axis sharded over
    the ``data`` mesh axis; ``state`` is replicated.  ``rng`` is a base key —
    it is folded with ``state.step`` so every step draws fresh randomness
    without threading keys through the host loop.
    """

    def train_step(state: TrainState, batch, rng: jax.Array):
        inputs, labels = batch
        step_rng = jax.random.fold_in(rng, state.step)
        mix_rng, drop_rng = jax.random.split(step_rng)

        if use_mixup:
            inputs, targets = mixup_batch(mix_rng, inputs, labels, num_classes, mixup_alpha)
        else:
            targets = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, *inputs, train=True, rngs={"dropout": drop_rng}
            )
            return softmax_cross_entropy(logits, targets)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model) -> Callable:
    """Build the jitted eval step ``(params, batch) -> sums``.

    ``batch`` is ``(inputs_tuple, labels, weights)``; padded examples carry
    weight 0 so sums are exact under static shapes.  Returns per-batch
    ``(correct, loss_sum, count)`` — replicated scalars (XLA reduces across
    the mesh automatically).
    """

    def eval_step(params, batch):
        inputs, labels, weights = batch
        logits = model.apply({"params": params}, *inputs, train=False)
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_example_loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == labels) * weights)
        loss_sum = jnp.sum(per_example_loss * weights)
        count = jnp.sum(weights)
        return {"correct": correct, "loss_sum": loss_sum, "count": count}

    return jax.jit(eval_step)


def create_train_state(model, cfg, tx, rng: jax.Array, example_batch: tuple) -> TrainState:
    """Initialize parameters and wrap them with the optimizer."""
    variables = model.init(rng, *example_batch)
    return TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx)


def merge_eval_metrics(batches: list[dict[str, Any]]) -> dict[str, float]:
    """Aggregate per-batch eval sums into accuracy / mean loss."""
    correct = float(sum(float(b["correct"]) for b in batches))
    loss_sum = float(sum(float(b["loss_sum"]) for b in batches))
    count = float(sum(float(b["count"]) for b in batches))
    count = max(count, 1.0)
    return {"accuracy": correct / count, "loss": loss_sum / count, "count": count}
