"""Benchmark harness: the six throughput metrics of the reference.

Mirrors ``benchmark.py`` + ``eval.py:53-181`` of the reference:
  1/2. train / test dataloader FPS (host decode only)
  3/4. model fwd+bwd / fwd-only FPS on synthetic tensors
  5/6. train / test full-pipeline FPS (loader + device step)

Measurement semantics replicated: first-batch (compile/init) time excluded,
model benchmarks run ``max(N, 300)`` iterations at the per-device batch size,
FPS = total images / total seconds across all devices in this process.  The
reference's ``dist.reduce`` aggregation is unnecessary — a single process
sees the global numbers.  (The reference's benchmark also had a bug that
clobbered the model object, ``eval.py:127``; not replicated.)
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

__all__ = [
    "benchmark_dataloader",
    "benchmark_model_synthetic",
    "benchmark_pipeline",
    "benchmark_model",
]


def _synthetic_dct_batch(cfg, batch: int, canvas: int = 64, seed: int = 0):
    rng = np.random.default_rng(seed)
    return {
        "y": rng.integers(-64, 64, (batch, 1, canvas, canvas, 8, 8)).astype(np.int16),
        "cbcr": rng.integers(-64, 64, (batch, 2, canvas // 2, canvas // 2, 8, 8)).astype(np.int16),
        "quant": np.broadcast_to(
            np.linspace(1, 24, 64, dtype=np.int16).reshape(1, 1, 8, 8), (batch, 3, 8, 8)
        ).copy(),
        "labels": rng.integers(0, cfg.model.classes, (batch,)).astype(np.int32),
        "weights": np.ones((batch,), np.float32),
    }


def benchmark_dataloader(loader, max_iters: int) -> tuple[int, float]:
    """(images, seconds) excluding the first batch (``benchmark.py:10-57``)."""
    n_img = 0
    t0 = None
    for i, batch in enumerate(loader):
        if i == 0:
            t0 = time.perf_counter()  # first batch excluded
            continue
        n_img += int(batch["weights"].sum())
        if i >= max_iters:
            break
    return n_img, (time.perf_counter() - t0) if t0 else 0.0


def benchmark_model_synthetic(cfg, iters: int, mode: str = "fbp",
                              n_devices: int | None = None) -> tuple[int, float]:
    """fwd+bwd ('fbp') or fwd-only FPS on synthetic model-input tensors.

    Shapes per the reference: DCT Y (B,1,28,28,8,8) + CbCr (B,2,14,14,8,8)
    (``eval.py:114-121``), RGB (B,3,input,input) (``benchmark.py:59-123``);
    its own optimizer, >= 300 iterations.
    """
    from rgbnomore_tpu.train.config import build_model, update_runtime
    from rgbnomore_tpu.train.optim import make_optimizer
    from rgbnomore_tpu.train.steps import create_train_state, make_train_step

    n_devices = n_devices or jax.device_count()
    cfg = update_runtime(cfg, n_devices)
    batch = cfg.train.batch_per_device * n_devices
    rng = np.random.default_rng(0)
    if cfg.model.domain == "RGB":
        s = cfg.model.input_size
        inputs = (jnp.asarray(rng.standard_normal((batch, 3, s, s)).astype(np.float32)),)
    else:
        nb = cfg.model.dct_blocks
        inputs = (
            jnp.asarray(rng.standard_normal((batch, 1, nb, nb, 8, 8)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((batch, 2, nb // 2, nb // 2, 8, 8)).astype(np.float32)),
        )
    labels = jnp.asarray(rng.integers(0, cfg.model.classes, batch).astype(np.int32))

    model = build_model(cfg)
    iters = max(iters, 300)

    # NOTE: timing reads back a scalar every `chunk` steps — through remote
    # relays, block_until_ready alone can acknowledge before execution
    # completes (see BENCHMARKS.md), so a value readback is the only honest
    # sync; chunking amortizes its round trip.
    chunk = 25
    if mode == "fbp":
        tx, _ = make_optimizer(cfg.train.lr, cfg.train.wd, 100, iters)
        state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), inputs)
        step = make_train_step(model, cfg.model.classes, use_mixup=False)
        base = jax.random.PRNGKey(1)
        state, metrics = step(state, (inputs, labels), base)  # compile, excluded
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        done = 0
        while done < iters:
            for _ in range(min(chunk, iters - done)):
                state, metrics = step(state, (inputs, labels), base)
                done += 1
            _ = float(metrics["loss"])
        dt = time.perf_counter() - t0
    else:
        params = model.init(jax.random.PRNGKey(0), *inputs)
        fwd = jax.jit(lambda p, *a: model.apply(p, *a))
        out = fwd(params, *inputs)
        _ = float(out[0, 0])
        t0 = time.perf_counter()
        done = 0
        while done < iters:
            for _ in range(min(chunk, iters - done)):
                out = fwd(params, *inputs)
                done += 1
            _ = float(out[0, 0])
        dt = time.perf_counter() - t0
    return batch * iters, dt


def benchmark_pipeline(trainer, loader, iters: int, mode: str = "train") -> tuple[int, float]:
    """Full loader + device-pipeline + step throughput (``benchmark.py:290-364``)."""
    n_img = 0
    t0 = None
    if mode == "train":
        step = trainer._fused_train_step()
        rng = jax.random.PRNGKey(0)
        for i, batch in enumerate(loader):
            trainer.state, metrics = step(trainer.state, trainer.put_batch(batch), rng)
            if i == 0:
                jax.block_until_ready(trainer.state.params)
                t0 = time.perf_counter()
                continue
            n_img += int(batch["weights"].sum())
            if i >= iters:
                break
        jax.block_until_ready(trainer.state.params)
    else:
        step = trainer._fused_eval_step()
        for i, batch in enumerate(loader):
            out = step(trainer.state.params, trainer.put_batch(batch))
            if i == 0:
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                continue
            n_img += int(batch["weights"].sum())
            if i >= iters:
                break
        jax.block_until_ready(out)
    return n_img, (time.perf_counter() - t0) if t0 else 0.0


def benchmark_model(cfg, iters: int, index_train: str, index_val: str,
                    num_threads: int = 4, verbose: int = 1,
                    num_devices: int | None = None,
                    transfer: str | None = None) -> dict[str, float]:
    """Run all six measurements and log FPS (``eval.py:53-181``).

    ``verbose``: 0 silent (results only returned), 1 final table, 2 adds
    per-measurement progress — the reference's tier semantics
    (``train.py:46``).  ``transfer`` defaults to the per-domain default
    (cropped for DCT, packed for RGB).
    """
    from rgbnomore_tpu.train.loop import Trainer, make_loaders

    transfer = transfer or "cropped"  # both domains: crop-before-pack default
    devices = jax.devices()[:num_devices] if num_devices else None
    trainer = Trainer(cfg, devices=devices, transfer=transfer)
    loaders = make_loaders(cfg, index_train, index_val, num_threads=num_threads,
                           global_batch=trainer.global_batch(), transfer=trainer.transfer)
    trainer.create_state(max(1, len(loaders["train"])))

    results: dict[str, float] = {}

    def record(name: str, n: int, dt: float) -> None:
        results[name] = n / dt if dt else 0.0
        if verbose >= 2:
            log.info("%s: %d imgs in %.2fs", name, n, dt)

    record("train_loader_fps", *benchmark_dataloader(loaders["train"], iters))
    record("test_loader_fps", *benchmark_dataloader(loaders["test"], iters))
    record("model_fbp_fps",
           *benchmark_model_synthetic(cfg, iters, "fbp", n_devices=trainer.n_devices))
    record("model_fwd_fps",
           *benchmark_model_synthetic(cfg, iters, "fwd", n_devices=trainer.n_devices))
    record("train_pipeline_fps",
           *benchmark_pipeline(trainer, loaders["train"], iters, "train"))
    record("test_pipeline_fps",
           *benchmark_pipeline(trainer, loaders["test"], iters, "test"))

    if verbose >= 1:
        n_dev = trainer.n_devices
        for k, v in results.items():
            log.info("%s: %.1f img/s total (%.1f per device)", k, v, v / n_dev)
    return results
