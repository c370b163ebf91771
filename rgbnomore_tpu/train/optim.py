"""Optimizer and schedule: AdamW + schedule-scaled decoupled weight decay.

The reference trains with two optimizers (``pipeline_utils.py:518-543`` +
``custom_optims.py:37-43``): a decay-free AdamW and a separate ``WeightDecay``
step applying ``p -= (lr/base_lr) * wd * p`` to parameters named ``*.weight``
excluding LayerNorms.  In optax this collapses to a single ``adamw`` with
``weight_decay = wd / base_lr`` and a kernel-only mask: optax applies
``lr * weight_decay * p`` per step, which equals the reference's
``schedule(step)/base_lr * wd * p`` exactly.

Schedule (``train.py:150-176``): linear warmup ``LR*(step+1)/warmup`` for
``warmup`` steps, then per-iteration cosine decay to 0 over the remaining
steps.  Global-norm clip 1.0 precedes the optimizer, as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["warmup_cosine_schedule", "kernel_mask", "make_optimizer"]


def warmup_cosine_schedule(base_lr: float, warmup: int, total_steps: int):
    """lr(step): LR*(step+1)/warmup, then cosine LR -> 0 over the remainder."""
    decay_steps = max(1, total_steps - warmup)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(1, warmup)
        progress = jnp.clip((step - warmup) / decay_steps, 0.0, 1.0)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup, warm, cos)

    return schedule


def kernel_mask(params):
    """True for matrix/conv kernels (the reference's '*.weight' minus norms).

    Flax names Dense/Conv weights ``kernel`` (plus SwinV2's ``qkv_kernel``);
    LayerNorm weights are ``scale`` and biases ``bias``, so they are excluded
    exactly as the reference's ``"weight" in name and "lrnorm" not in name``
    filter does (``pipeline_utils.py:536-537``).
    """

    def is_kernel(path) -> bool:
        leaf = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        return leaf.endswith("kernel")

    flat = jax.tree_util.tree_map_with_path(lambda p, _: is_kernel(p), params)
    return flat


def make_optimizer(
    base_lr: float,
    weight_decay: float,
    warmup: int,
    total_steps: int,
    clip_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """Build the full optax transform chain; returns ``(tx, schedule)``."""
    schedule = warmup_cosine_schedule(base_lr, warmup, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=b1,
            b2=b2,
            eps=eps,
            weight_decay=weight_decay / base_lr,
            mask=kernel_mask,
        ),
    )
    return tx, schedule
