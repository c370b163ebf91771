#!/usr/bin/env python
"""Headline benchmark: JPEG ViT-Ti DCT training throughput per chip.

Measures the full training pipeline — host JPEG entropy decode -> on-device
dequant + DCT augmentation -> ViT-Ti fwd+bwd + optimizer — on synthetic
512x512 JPEGs, matching the BASELINE.json north-star metric
("ImageNet train/eval imgs/sec/chip (decode -> augment -> ViT)").

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

``vs_baseline`` divides by REFERENCE_PIPELINE_FPS — a MEASURED same-host
denominator, not a guess.  The reference publishes no throughput numbers
(BASELINE.md), so we measured its own per-worker loader hot path (its C++
dct_manip decode + the exact imagenet_dct train transform chain,
``datasets.py:274-301`` + ``:354-369``) with its own code on THIS host:
277.7 img/s/core (tools/measure_reference_loader.py, same synthetic corpus).
The reference's train pipeline per chip is min(loader, GPU step) and this
harness allots one host core per chip, so 277.7 img/s/chip is an upper bound
on what the reference could sustain here regardless of accelerator speed —
making vs_baseline a LOWER bound on the true same-resources speedup.
>= 2.0 means the north star (2x reference throughput per chip) is met.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

# Measured: reference per-core loader rate on this host (see module docstring
# + BENCHMARKS.md "Baseline grounding"); its same-host pipeline upper bound.
REFERENCE_PIPELINE_FPS = 277.7
BATCH = 256
N_IMAGES = 2 * BATCH  # must exceed one global batch (drop_last loader)
MEASURE_ITERS = 40
# host crop-pack runs ~730 img/s/core (BENCHMARKS.md); 2 threads ~1.46k img/s
# was the round-4 setting — RGBNM_BENCH_THREADS lets the waterfall experiment
# vary loader parallelism without touching the one-JSON-line contract
LOADER_THREADS = int(os.environ.get("RGBNM_BENCH_THREADS", "2"))


def make_synthetic_dataset(root: Path, n: int) -> Path:
    """Write n synthetic 512x512 JPEGs + an index CSV; reused across runs."""
    import numpy as np

    from rgbnomore_tpu import codec

    root.mkdir(parents=True, exist_ok=True)
    index = root / "index.csv"
    if index.exists() and len(list(root.glob("*.jpg"))) >= n:
        return index
    rng = np.random.default_rng(0)
    ys, xs = np.mgrid[0:512, 0:512]
    rows = ["Filepath,Label"]
    for i in range(n):
        f = 0.02 + 0.03 * rng.random(2)
        img = np.stack(
            [
                (128 + 100 * np.sin(ys * f[0] + p) * np.cos(xs * f[1])).astype(np.uint8)
                for p in (0.0, 1.0, 2.0)
            ]
        )
        p = root / f"img_{i}.jpg"
        codec.write_tensor(p, img, quality=90)
        rows.append(f"{p},{i % 1000}")
    index.write_text("\n".join(rows) + "\n")
    return index


def main() -> None:
    import jax

    # persistent compilation cache: first compile is slow, later runs reuse it
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from rgbnomore_tpu.data.index import load_index
    from rgbnomore_tpu.data.loader import DctCroppedLoader
    from rgbnomore_tpu.train.config import generate_config, update_runtime
    from rgbnomore_tpu.train.loop import Trainer

    index = make_synthetic_dataset(Path("/tmp/rgbnomore_bench"), N_IMAGES)

    # default stays the reference's f32 vitti preset (like-for-like headline,
    # configs.py:93); RGBNM_BENCH_AMP=bf16 measures the accuracy-gated bf16
    # compute path (BWD_PROBE.json train_ab) for the BENCHMARKS.md e2e row
    amp = os.environ.get("RGBNM_BENCH_AMP", "")
    cfg = generate_config("vitti", "dct", modelver=1, batchsize=BATCH,
                          amp=True if amp else None, ampdtype=amp or None)
    cfg = update_runtime(cfg, jax.device_count())
    # crop-before-pack transfer: host samples the crop box, resizes to the
    # 28-block target and ships only the target grid (~31 KB/img vs 154 KB
    # for the full packed canvas) — the reference's data movement order
    trainer = Trainer(cfg, transfer="cropped")
    ds = load_index(index)
    loader = DctCroppedLoader(
        ds, trainer.global_batch(), target=cfg.model.dct_blocks,
        k=trainer.packed_k, mode="train", shuffle=True, drop_last=True,
        seed=0, num_threads=LOADER_THREADS, prefetch=4,
    )
    if len(loader) == 0:
        raise RuntimeError("benchmark loader produced zero batches")
    # zero-init params via eval_shape: skips the ~1 min init compile; loss
    # values are meaningless but throughput is identical
    import jax.numpy as jnp

    from rgbnomore_tpu.train.config import example_inputs
    from rgbnomore_tpu.train.optim import make_optimizer
    from rgbnomore_tpu.train.steps import TrainState

    tx, trainer.schedule = make_optimizer(
        cfg.train.lr, cfg.train.wd, cfg.train.warmup, 10_000
    )
    shapes = jax.eval_shape(
        lambda: trainer.model.init(jax.random.PRNGKey(0), *example_inputs(cfg, 2))
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]
    trainer.state = jax.device_put(
        TrainState.create(apply_fn=trainer.model.apply, params=params, tx=tx),
        trainer._rs,
    )
    step = trainer._fused_train_step()
    rng = jax.random.PRNGKey(0)

    # continuous cycling iterator: no producer restarts at epoch boundaries.
    # The link to the device can be noisy in shared environments, so measure
    # several windows and report the median window throughput (blocking only
    # at window boundaries).
    skip, windows, per_window = 5, 7, 10
    it = loader.iter_cycle(skip + windows * per_window)
    m = None
    for _ in range(skip):  # compile + warm, excluded
        trainer.state, m = step(trainer.state, trainer.put_batch(next(it)), rng)
    _ = float(m["loss"])  # FIFO drain: block_until_ready can ack pre-execution
    window_fps = []
    for _ in range(windows):
        t0 = time.perf_counter()
        n = 0
        for _ in range(per_window):
            batch = next(it)
            trainer.state, m = step(trainer.state, trainer.put_batch(batch), rng)
            n += batch["labels"].shape[0]
        _ = float(m["loss"])  # scalar readback = honest sync through the relay
        window_fps.append(n / (time.perf_counter() - t0))
    window_fps.sort()
    n_img, dt = window_fps[len(window_fps) // 2], 1.0  # median window fps

    # component: device-only step rate (batch resident), isolates host/transfer;
    # a scalar readback at the end is the only honest sync through the relay
    batch0 = next(iter(loader))
    dev = trainer.put_batch(batch0)
    trainer.state, m = step(trainer.state, dev, rng)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        trainer.state, m = step(trainer.state, dev, rng)
    _ = float(m["loss"])
    device_fps = 20 * batch0["labels"].shape[0] / (time.perf_counter() - t0)

    n_chips = jax.device_count()
    fps_per_chip = n_img / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "jpeg_vitti_train_pipeline_imgs_per_sec_per_chip",
                "value": round(fps_per_chip, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(fps_per_chip / REFERENCE_PIPELINE_FPS, 3),
                "device_step_imgs_per_sec": round(device_fps / n_chips, 1),
                "n_chips": n_chips,
            }
        )
    )


def _probe_backend(timeout: float = 90.0) -> bool:
    """True iff a fresh interpreter can enumerate devices within ``timeout``.

    Run in a subprocess because on a half-dead axon relay ``jax.devices()``
    BLOCKS instead of raising (round-3 failure mode) — the parent must be
    able to kill the probe and try again.
    """
    try:
        res = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return False
    return res.returncode == 0 and res.stdout.strip().isdigit()


def _wait_for_backend(window_s: float = 600.0) -> bool:
    """Poll backend liveness for up to ``window_s`` seconds (bounded probes,
    ~30 s apart). Mirrors the reference's always-works rendezvous intent
    (utils/pipeline_utils.py:78-88): one bad-weather minute on the TPU tunnel
    must not poison the measurement."""
    deadline = time.monotonic() + window_s
    while True:
        if _probe_backend():
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        sys.stderr.write(
            f"bench: backend not live, retrying ({remaining:.0f}s left)\n"
        )
        time.sleep(min(30.0, max(0.0, remaining)))


def _emit_error(msg: str) -> None:
    print(
        json.dumps(
            {
                "metric": "jpeg_vitti_train_pipeline_imgs_per_sec_per_chip",
                "value": 0.0,
                "unit": "imgs/sec/chip",
                "vs_baseline": 0.0,
                "error": msg[:200],
            }
        )
    )


def _orchestrate() -> int:
    """Liveness-gate, then run the measurement in a bounded-timeout child
    (retrying once), forwarding exactly ONE JSON line to stdout."""
    # claim the single-tenancy chip: tools/tpu_queue.py defers to this lock
    lock = Path("/tmp/rgbnomore_bench.lock")
    try:
        lock.write_text(str(os.getpid()))
    except OSError:
        pass
    try:
        return _orchestrate_inner()
    finally:
        try:
            lock.unlink()
        except OSError:
            pass


def _orchestrate_inner() -> int:
    if not _wait_for_backend(window_s=float(os.environ.get("BENCH_WAIT_S", 600))):
        _emit_error("backend not live after liveness window")
        return 1
    for attempt in (1, 2):
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--measure"],
                capture_output=True, text=True,
                timeout=float(os.environ.get("BENCH_MEASURE_TIMEOUT_S", 1200)),
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"bench: measurement attempt {attempt} timed out\n")
            if attempt == 1 and _wait_for_backend(window_s=300):
                continue
            _emit_error("measurement timed out")
            return 1
        json_lines = [
            l for l in res.stdout.splitlines() if l.startswith('{"metric"')
        ]
        sys.stderr.write(res.stderr[-4000:])
        if res.returncode == 0 and json_lines:
            print(json_lines[-1])
            return 0
        sys.stderr.write(
            f"bench: attempt {attempt} rc={res.returncode} "
            f"stdout tail: {res.stdout[-500:]}\n"
        )
        if attempt == 1 and not _wait_for_backend(window_s=300):
            break
    if json_lines:  # child emitted its own error line
        print(json_lines[-1])
    else:
        _emit_error(f"measurement failed rc={res.returncode}")
    return 1


if __name__ == "__main__":
    if "--measure" in sys.argv:
        try:
            main()
        except Exception as exc:  # noqa: BLE001 - always emit the JSON line
            _emit_error(str(exc))
            sys.exit(1)
    else:
        sys.exit(_orchestrate())
