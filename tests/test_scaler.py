"""fp16 dynamic loss scaling: GradScaler-equivalent policy + step integration.

The reference trains fp16 with ``torch.cuda.amp.GradScaler(growth_factor=1.6,
backoff_factor=0.625, growth_interval=600)`` (``pipeline_utils.py:540-541``)
and clamps the scale to ``[2**-4, 2**18]`` per step (``clip_gradscaler``,
``pipeline_utils.py:399-409``).  These tests pin the same behavior on the
optax/Flax side, including the overflow-skips-update property inside the
jitted train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbnomore_tpu.train import scaler as ls


def test_backoff_on_overflow():
    st = ls.init_loss_scale(1024.0)
    st2 = ls.update_loss_scale(st, jnp.asarray(False))
    assert float(st2.scale) == pytest.approx(1024.0 * 0.625)
    assert int(st2.good_steps) == 0


def test_growth_after_interval():
    st = ls.init_loss_scale(1024.0)
    # growth_interval - 1 finite steps: unchanged
    for _ in range(ls.GROWTH_INTERVAL - 1):
        st = ls.update_loss_scale(st, jnp.asarray(True))
    assert float(st.scale) == 1024.0
    st = ls.update_loss_scale(st, jnp.asarray(True))
    assert float(st.scale) == pytest.approx(1024.0 * 1.6)
    assert int(st.good_steps) == 0  # counter resets after growth


def test_growth_counter_resets_on_overflow():
    st = ls.init_loss_scale(1024.0)
    for _ in range(10):
        st = ls.update_loss_scale(st, jnp.asarray(True))
    assert int(st.good_steps) == 10
    st = ls.update_loss_scale(st, jnp.asarray(False))
    assert int(st.good_steps) == 0


def test_scale_clamped_to_reference_range():
    # repeated overflows floor at 2**-4 (clip_gradscaler's min)
    st = ls.init_loss_scale(2.0**-3)
    st = ls.update_loss_scale(st, jnp.asarray(False))
    st = ls.update_loss_scale(st, jnp.asarray(False))
    assert float(st.scale) == 2.0**-4
    # growth caps at 2**18 (its max)
    st = ls.LossScaleState(
        scale=jnp.asarray(2.0**18, jnp.float32),
        good_steps=jnp.asarray(ls.GROWTH_INTERVAL - 1, jnp.int32),
    )
    st = ls.update_loss_scale(st, jnp.asarray(True))
    assert float(st.scale) == 2.0**18


def test_all_finite():
    good = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    assert bool(ls.all_finite(good))
    bad = {"a": jnp.ones((3,)), "b": jnp.array([jnp.inf, 0.0])}
    assert not bool(ls.all_finite(bad))
    nan = {"a": jnp.array([jnp.nan])}
    assert not bool(ls.all_finite(nan))


def _tiny_fp16_trainer(batch=4):
    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer

    cfg = generate_config(
        "vitti", "dct", modelver=1, batchsize=batch, amp=True, ampdtype="fp16"
    )
    cfg.model.depth = 1
    cfg.model.dct_blocks = 4
    cfg.model.classes = 5
    cfg.train.warmup = 2
    trainer = Trainer(cfg, devices=jax.devices()[:1], transfer="dense", canvas=4)
    trainer.create_state(steps_per_epoch=4)
    return trainer, cfg


def _dense_batch(cfg, batch):
    nb = cfg.model.dct_blocks
    rng = np.random.default_rng(0)
    return {
        "y": rng.integers(-50, 50, (batch, 1, nb, nb, 8, 8)).astype(np.int16),
        "cbcr": rng.integers(-50, 50, (batch, 2, nb // 2, nb // 2, 8, 8)).astype(np.int16),
        "quant": np.full((batch, 3, 8, 8), 4, np.int16),
        "labels": (np.arange(batch) % cfg.model.classes).astype(np.int32),
        "weights": np.ones((batch,), np.float32),
    }


def test_fp16_step_trains_and_carries_scaler_state():
    trainer, cfg = _tiny_fp16_trainer()
    assert trainer._fp16_scaler
    assert trainer.state.loss_scale is not None
    batch = _dense_batch(cfg, 4)
    step = trainer._fused_train_step()
    s0 = float(trainer.state.loss_scale.scale)
    trainer.state, m = step(trainer.state, trainer.put_batch(batch), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert int(trainer.state.step) == 1
    assert float(trainer.state.loss_scale.scale) == s0  # finite step: unchanged
    assert int(trainer.state.loss_scale.good_steps) == 1


def test_fp16_overflow_skips_update_and_backs_off():
    """Poison the params so the forward produces non-finite loss: the step
    must keep params bit-identical, advance the schedule counter, and back
    off the scale — exactly GradScaler.step+update semantics."""
    trainer, cfg = _tiny_fp16_trainer()
    batch = _dense_batch(cfg, 4)
    step = trainer._fused_train_step()

    # poison one kernel with inf -> grads are non-finite
    params = trainer.state.params
    flat = jax.tree_util.tree_leaves_with_path(params)
    kernel_path = next(p for p, v in flat if v.ndim >= 2)

    def poison(path, v):
        if path == kernel_path:
            return v.at[0].set(jnp.inf)
        return v

    poisoned = jax.tree_util.tree_map_with_path(poison, params)
    trainer.state = trainer.state.replace(params=poisoned)
    before = jax.tree.map(np.asarray, trainer.state.params)
    s0 = float(trainer.state.loss_scale.scale)

    trainer.state, m = step(trainer.state, trainer.put_batch(batch), jax.random.PRNGKey(0))

    after = jax.tree.map(np.asarray, trainer.state.params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)  # update skipped
    assert int(trainer.state.step) == 1  # schedule still advanced
    assert float(trainer.state.loss_scale.scale) == pytest.approx(s0 * 0.625)
    assert int(trainer.state.loss_scale.good_steps) == 0

    # GradScaler parity on the opt_state (ADVICE r3): the LR-schedule count
    # advances on a skipped step (scheduler.step is unconditional,
    # train.py:174) while Adam's bias-correction count does NOT (torch skips
    # optimizer.step() entirely).
    sched, adam = _opt_counts(trainer.state.opt_state)
    assert sched == 1
    assert adam == 0


def _opt_counts(opt_state):
    """(schedule_count, adam_count) pulled out of the optax state tree."""
    import optax

    found = {}

    def walk(x):
        if isinstance(x, optax.ScaleByScheduleState):
            found["sched"] = int(x.count)
        elif isinstance(x, optax.ScaleByAdamState):
            found["adam"] = int(x.count)
        elif isinstance(x, tuple):
            for y in x:
                walk(y)

    walk(opt_state)
    return found["sched"], found["adam"]


def test_bf16_and_f32_have_no_scaler_state():
    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer

    for amp, dtype in ((True, "bf16"), (False, "bf16")):
        cfg = generate_config("vitti", "dct", modelver=1, batchsize=4, amp=amp,
                              ampdtype=dtype)
        cfg.model.depth = 1
        cfg.model.dct_blocks = 4
        trainer = Trainer(cfg, devices=jax.devices()[:1], transfer="dense", canvas=4)
        assert not trainer._fp16_scaler
        trainer.create_state(steps_per_epoch=2)
        assert trainer.state.loss_scale is None
