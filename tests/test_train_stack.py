import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from rgbnomore_tpu.train.config import build_model, example_inputs, generate_config, update_runtime
from rgbnomore_tpu.train.optim import kernel_mask, make_optimizer, warmup_cosine_schedule
from rgbnomore_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    merge_eval_metrics,
    mixup_batch,
)
from rgbnomore_tpu.parallel import batch_sharding, make_mesh, replicated_sharding


# ---------------------------------------------------------------- config ----
def test_config_presets_match_reference():
    cfg = generate_config("vitti", "dct")
    assert cfg.model.embed_size == 192 and cfg.model.heads == 3
    assert cfg.train.wd == 1e-4 and cfg.train.lr == 3e-3
    assert "SolarizeAdd" in cfg.train.auglist and "Sharpness" not in cfg.train.auglist
    assert cfg.train.dataset == "imagenet_dct" and cfg.model.dct_blocks == 28
    # the reference builds RandomMixup(_DCT) with alpha=0.2 for both domains
    # (pipeline_utils.py:179-181), NOT the mixup-paper default 1.0
    assert cfg.train.mixup_alpha == 0.2

    cfg = generate_config("vits", "dct")
    assert cfg.train.epochs == 90 and cfg.model.embed_size == 384

    cfg = generate_config("vitb", "dct")
    assert cfg.train.amp and cfg.model.amp_dtype == "bf16" and cfg.train.batch_size == 512

    cfg = generate_config("swinv2", "dct")
    assert tuple(cfg.model.depth) == (2, 2, 6, 2) and cfg.model.window_size == 8
    assert cfg.model.drop_path == 0.2 and cfg.model.dct_blocks == 32

    cfg = generate_config("vits", "rgb")
    assert cfg.train.lr == 1e-3 and cfg.train.wd == 1e-4
    assert cfg.train.augstr == 10 and "ShearX" in cfg.train.auglist


def test_config_overrides():
    cfg = generate_config("vitti", "dct", lr=5e-4, epochs=10, batchsize=64, auglist="Invert,Cutout")
    assert cfg.train.lr == 5e-4 and cfg.train.epochs == 10
    assert cfg.train.auglist == ["Invert", "Cutout"]
    cfg = update_runtime(cfg, 8)
    assert cfg.train.batch_per_device == 8


# ------------------------------------------------------------- schedule ----
def test_warmup_cosine_schedule():
    sched = warmup_cosine_schedule(base_lr=1.0, warmup=100, total_steps=1100)
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(99)) == pytest.approx(1.0)
    assert float(sched(100)) == pytest.approx(1.0)
    mid = float(sched(100 + 500))
    assert mid == pytest.approx(0.5, abs=1e-2)
    assert float(sched(1099)) == pytest.approx(0.0, abs=1e-4)


def test_kernel_mask_selects_only_kernels(rng):
    cfg = generate_config("vitti", "dct")
    model = build_model(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), *example_inputs(cfg))["params"]
    mask = kernel_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, decayed in flat:
        name = str(path[-1].key)
        if name.endswith("kernel"):
            assert decayed, path
        else:
            assert not decayed, path  # biases and LayerNorm scales excluded


def test_weight_decay_semantics():
    """Decay per step must equal (lr_t / base_lr) * wd * p, the reference's
    schedule-relative decoupled decay (custom_optims.py:37-43)."""
    base_lr, wd = 0.1, 0.01
    tx, sched = make_optimizer(base_lr, wd, warmup=0, total_steps=10**9)
    params = {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))}}
    grads = jax.tree.map(jnp.zeros_like, params)  # isolate the decay term
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # at step 0 the cosine schedule is ~base_lr -> decay ~= wd * p
    np.testing.assert_allclose(np.asarray(updates["dense"]["kernel"]), -wd, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(updates["dense"]["bias"]), 0.0, atol=1e-8)


# ---------------------------------------------------------------- mixup ----
def test_mixup_preserves_target_mass(rng):
    x = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])
    (mx,), targets = mixup_batch(jax.random.PRNGKey(0), (x,), labels, num_classes=5)
    t = np.asarray(targets)
    np.testing.assert_allclose(t.sum(-1), 1.0, rtol=1e-6)
    lam = t.max()
    assert lam >= 0.5  # sorted-lambda convention: original dominates
    np.testing.assert_allclose(
        np.asarray(mx), lam * np.asarray(x) + (1 - lam) * np.roll(np.asarray(x), 1, 0), atol=1e-5
    )


def test_train_step_learns_with_mixup(rng):
    """The mixup train path must still drive loss well below the uniform
    floor ln(K) on a learnable task — a degenerate-targets bug (targets
    decorrelated from inputs) pins loss at exactly ln(K), which is
    indistinguishable from 'slow recipe' in long proxy runs unless guarded
    here (reference semantics: cls_transforms.py RandomMixup_DCT +
    CrossEntropyLoss on soft targets)."""
    cfg, model, state = _tiny_setup()
    y = jnp.asarray(rng.standard_normal((8, 1, 8, 8, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((8, 2, 4, 4, 8, 8)).astype(np.float32))
    labels = jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8])
    step = make_train_step(model, cfg.model.classes, use_mixup=True,
                           mixup_alpha=0.2)
    base = jax.random.PRNGKey(3)
    losses = []
    for _ in range(60):
        state, metrics = step(state, ((y, c), labels), base)
        losses.append(float(metrics["loss"]))
    floor = float(np.log(cfg.model.classes))
    assert losses[-1] < 0.5 * floor, (losses[::10], floor)


# ---------------------------------------------------------- train/eval -----
def _tiny_setup():
    cfg = generate_config("vitti", "dct")
    cfg.model.depth = 2
    cfg.model.dct_blocks = 8
    cfg.model.classes = 11
    model = build_model(cfg, dtype=jnp.float32)
    y = jnp.zeros((4, 1, 8, 8, 8, 8), jnp.float32)
    c = jnp.zeros((4, 2, 4, 4, 8, 8), jnp.float32)
    tx, _ = make_optimizer(cfg.train.lr, cfg.train.wd, warmup=2, total_steps=100)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), (y, c))
    return cfg, model, state


def test_bias_init_family_switch():
    """cfg.model.bias_init selects the family at init time: 'torch' (default,
    reference-parity fan-in uniform) draws nonzero biases; 'zeros' (the
    round-2/3 proxy family) zeroes every bias while kernels stay
    kaiming-uniform.  build_model must restore the default for later models."""
    import dataclasses

    y = jnp.zeros((1, 1, 8, 8, 8, 8), jnp.float32)
    c = jnp.zeros((1, 2, 4, 4, 8, 8), jnp.float32)

    def init_params(bias_init):
        cfg = generate_config("vitti", "dct")
        cfg.model.depth = 2
        cfg.model.dct_blocks = 8
        cfg.model.classes = 11
        cfg.model.bias_init = bias_init
        model = build_model(cfg, dtype=jnp.float32)
        return model.init(jax.random.PRNGKey(0), y, c)["params"]

    flat_t = jax.tree_util.tree_flatten_with_path(init_params("torch"))[0]
    flat_z = jax.tree_util.tree_flatten_with_path(init_params("zeros"))[0]
    biases_t = [leaf for path, leaf in flat_t if "bias" in str(path)]
    biases_z = [leaf for path, leaf in flat_z if "bias" in str(path)]
    assert biases_t and len(biases_t) == len(biases_z)
    assert any(float(jnp.abs(b).max()) > 0 for b in biases_t)
    assert all(float(jnp.abs(b).max()) == 0 for b in biases_z)
    # kernels identical across families (same PRNG stream, biases-only switch)
    kern_t = [leaf for path, leaf in flat_t if "kernel" in str(path)]
    kern_z = [leaf for path, leaf in flat_z if "kernel" in str(path)]
    for a, b in zip(kern_t, kern_z):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_reduces_loss(rng):
    cfg, model, state = _tiny_setup()
    y = jnp.asarray(rng.standard_normal((4, 1, 8, 8, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((4, 2, 4, 4, 8, 8)).astype(np.float32))
    labels = jnp.asarray([1, 2, 3, 4])
    step = make_train_step(model, cfg.model.classes, use_mixup=False)
    base = jax.random.PRNGKey(7)
    losses = []
    for _ in range(30):
        state, metrics = step(state, ((y, c), labels), base)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert int(state.step) == 30


def test_eval_step_weights_exclude_padding(rng):
    cfg, model, state = _tiny_setup()
    y = jnp.asarray(rng.standard_normal((4, 1, 8, 8, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((4, 2, 4, 4, 8, 8)).astype(np.float32))
    labels = jnp.asarray([1, 2, 3, 4])
    eval_step = make_eval_step(model)
    full = eval_step(state.params, ((y, c), labels, jnp.ones(4)))
    # mark the last example as padding: sums must equal the first-3 sums
    part = eval_step(state.params, ((y, c), labels, jnp.asarray([1.0, 1.0, 1.0, 0.0])))
    ref = eval_step(state.params, ((y[:3], c[:3]), labels[:3], jnp.ones(3)))
    assert float(part["count"]) == 3.0
    np.testing.assert_allclose(float(part["loss_sum"]), float(ref["loss_sum"]), rtol=1e-5)
    np.testing.assert_allclose(float(part["correct"]), float(ref["correct"]), rtol=1e-6)
    m = merge_eval_metrics([full, part])
    assert 0.0 <= m["accuracy"] <= 1.0 and m["count"] == 7.0


def test_eval_guard_flags_zero_weight_batches():
    """A silently-empty eval must fail loudly (round-5 val_acc-0.0 follow-up):
    real batches whose weights all unpacked to zero is a wiring bug -> raise;
    a 0-batch loader is a legitimately empty tiny-scale split -> warn+zeros;
    a genuinely weighted eval passes through merge_eval_metrics unchanged."""
    from rgbnomore_tpu.train.loop import guard_eval_sums

    ok = [{"correct": jnp.asarray(2.0), "loss_sum": jnp.asarray(3.0),
           "count": jnp.asarray(4.0)}]
    m = guard_eval_sums(ok)
    assert m["accuracy"] == 0.5 and m["count"] == 4.0

    empty = guard_eval_sums([])  # warn, not raise (count clamps to 1 for /)
    assert empty["accuracy"] == 0.0 and empty["loss"] == 0.0

    zeroed = [{"correct": jnp.asarray(0.0), "loss_sum": jnp.asarray(0.0),
               "count": jnp.asarray(0.0)}] * 3
    with pytest.raises(RuntimeError, match="no weighted examples"):
        guard_eval_sums(zeroed)


def test_train_step_multidevice_mesh(rng):
    """The full train step must compile and run on an 8-device CPU mesh with
    batch sharded on 'data' and state replicated."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    cfg, model, state = _tiny_setup()
    mesh = make_mesh(jax.devices()[:8])
    y = jnp.asarray(rng.standard_normal((16, 1, 8, 8, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((16, 2, 4, 4, 8, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 11, 16))
    bs = batch_sharding(mesh)
    rs = replicated_sharding(mesh)
    state = jax.device_put(state, rs)
    batch = ((jax.device_put(y, bs), jax.device_put(c, bs)), jax.device_put(labels, bs))
    step = make_train_step(model, cfg.model.classes, use_mixup=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # updated params remain replicated across all 8 devices
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_checkpoint_roundtrip(tmp_path, rng):
    from rgbnomore_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg, model, state = _tiny_setup()
    y = jnp.asarray(rng.standard_normal((4, 1, 8, 8, 8, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((4, 2, 4, 4, 8, 8)).astype(np.float32))
    labels = jnp.asarray([1, 2, 3, 4])
    step = make_train_step(model, cfg.model.classes, use_mixup=False)
    for _ in range(3):
        state, _ = step(state, ((y, c), labels), jax.random.PRNGKey(0))

    save_checkpoint(tmp_path / "ck", state, epoch=1, metrics={"val_acc": 0.5})
    template = _tiny_setup()[2]
    restored, meta = restore_checkpoint(tmp_path / "ck", template)
    assert int(restored.step) == 3  # step counter restored (reference bug fixed)
    assert meta["metrics"]["val_acc"] == 0.5
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
        rtol=1e-6,
    )


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 1000)
    ge.dryrun_multichip(8)
