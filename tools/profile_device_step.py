#!/usr/bin/env python
"""Device-step breakdown for the headline config (ViT-Ti DCT, cropped wire).

bench.py reports the device step as ONE number (~2950 img/s at batch 256).
This tool splits it into its stages to locate kernel-optimization targets
(round-2 weakness #4: the Pallas surface must contain a kernel that WINS):

  unpack     split_packed_batch + unpack_fields + to_range (wire -> dense)
  flip       per-sample horizontal flip (blocks.flip_dct + select)
  aug        RandAugmentDCT (vmapped lax.switch over the preset op list)
  pipeline   the full train input pipeline (unpack+flip+aug+to_range)
  mixup      mixup_batch on pipeline outputs
  fwd        model.apply, train=True
  fwd_bwd    value_and_grad of the softmax CE loss
  step_rest  fwd_bwd + optimizer update on FIXED inputs (no pipeline)
  full_step  the production fused step (pipeline+mixup+fwd+bwd+update)

All inputs are device-resident before timing.  Timing uses the FIFO-drain
method (utils/timing.py): block_until_ready on this relay can acknowledge
enqueue before execution, so every window ends in a tiny host readback and
per-call time is the two-queue-depth slope.  Run on the real TPU:

  PYTHONPATH=. python tools/profile_device_step.py [--batch 256] [--iters 30]

Writes STEP_PROFILE.json and prints one human-readable table.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "STEP_PROFILE.json"


def timeit(fn, args, iters: int, warmup: int = 3) -> float:
    """Seconds per call via FIFO-drain two-point timing (utils/timing.py)."""
    from rgbnomore_tpu.utils.timing import timeit_fifo

    return timeit_fifo(
        fn, args, depths=(max(2, iters // 5), iters), repeats=3, warmup=warmup
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--num-images", type=int, default=0,
                    help="corpus size (default: one batch)")
    ap.add_argument("--amp", default="",
                    help="measure with AMP compute (e.g. 'bf16'); results "
                         "land under an amp-suffixed key set")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from bench import make_synthetic_dataset
    from rgbnomore_tpu.augment.pipeline import (
        make_cropped_train_pipeline,
        split_packed_batch,
        to_range,
        unpack_fields,
    )
    from rgbnomore_tpu.data.index import load_index
    from rgbnomore_tpu.data.loader import DctCroppedLoader
    from rgbnomore_tpu.train.config import example_inputs, generate_config
    from rgbnomore_tpu.train.loop import Trainer
    from rgbnomore_tpu.train.steps import mixup_batch, softmax_cross_entropy

    batch_size = args.batch
    index = make_synthetic_dataset(
        Path("/tmp/rgbnomore_bench"), args.num_images or batch_size
    )
    cfg = generate_config(
        "vitti", "dct", modelver=1, batchsize=batch_size,
        amp=bool(args.amp), ampdtype=args.amp or None,
    )
    trainer = Trainer(cfg, transfer="cropped")
    ds = load_index(index)
    loader = DctCroppedLoader(
        ds, batch_size, target=cfg.model.dct_blocks, k=trainer.packed_k,
        mode="train", shuffle=True, drop_last=False, seed=0, num_threads=2,
    )
    batch = trainer.put_batch(next(iter(loader)))
    packed = batch["packed"]
    target, k, fmt = cfg.model.dct_blocks, trainer.packed_k, "mask16"

    rng = jax.random.PRNGKey(0)
    results: dict[str, float] = {}

    # ---- pipeline stages --------------------------------------------------
    @jax.jit
    def f_unpack(buf):
        f = split_packed_batch(buf, target, k, fmt)
        y, c = unpack_fields(f, fmt)
        return to_range(y), to_range(c)

    from rgbnomore_tpu.augment.pipeline import random_flip
    from rgbnomore_tpu.augment.randaugment import RandAugmentDCT

    aug = RandAugmentDCT(
        ops_list=list(cfg.train.auglist), num_ops=cfg.train.num_ops,
        magnitude=cfg.train.augstr, grid=target,
    )
    y0, c0 = f_unpack(packed)
    jax.block_until_ready((y0, c0))

    f_flip = jax.jit(lambda r, y, c: random_flip(r, y, c))
    f_aug = jax.jit(lambda r, y, c: aug(r, y, c))
    pipe = jax.jit(make_cropped_train_pipeline(cfg, k=k, fmt=fmt))

    results["unpack"] = timeit(f_unpack, (packed,), args.iters)
    results["flip"] = timeit(f_flip, (rng, y0, c0), args.iters)
    results["aug"] = timeit(f_aug, (rng, y0, c0), args.iters)
    results["pipeline"] = timeit(pipe, (rng, packed), args.iters)

    # A/B: the fused Pallas flip+RandAugment+ToRange pipeline (augpipe.py)
    from rgbnomore_tpu.ops.pallas.augpipe import SUPPORTED_OPS

    if set(cfg.train.auglist) <= SUPPORTED_OPS:
        pipe_fused = jax.jit(make_cropped_train_pipeline(
            cfg, k=k, fmt=fmt, fused=True,
            fused_interpret=jax.default_backend() != "tpu",
        ))
        try:
            results["pipeline_fused"] = timeit(pipe_fused, (rng, packed), args.iters)
        except Exception as e:  # Mosaic lowering failures must not kill the profile
            print(f"fused pipeline failed: {type(e).__name__}: {str(e)[:300]}")

    # ---- model stages ------------------------------------------------------
    yp, cp, labels, _ = pipe(rng, packed)
    jax.block_until_ready((yp, cp))
    params = trainer.model.init(jax.random.PRNGKey(1), *example_inputs(cfg, 2))[
        "params"
    ]
    params = jax.device_put(params, trainer._rs)
    num_classes = cfg.model.classes

    f_mixup = jax.jit(
        lambda r, y, c, l: mixup_batch(r, (y, c), l, num_classes,
                                       cfg.train.mixup_alpha)
    )
    results["mixup"] = timeit(f_mixup, (rng, yp, cp, labels), args.iters)

    drop = jax.random.PRNGKey(2)
    f_fwd = jax.jit(
        lambda p, y, c: trainer.model.apply(
            {"params": p}, y, c, train=True, rngs={"dropout": drop}
        )
    )
    results["fwd"] = timeit(f_fwd, (params, yp, cp), args.iters)

    targets = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)

    def loss_fn(p, y, c, t):
        logits = trainer.model.apply(
            {"params": p}, y, c, train=True, rngs={"dropout": drop}
        )
        return softmax_cross_entropy(logits, t)

    f_fwd_bwd = jax.jit(jax.value_and_grad(loss_fn))
    results["fwd_bwd"] = timeit(f_fwd_bwd, (params, yp, cp, targets), args.iters)

    # ---- full fused step (donation-safe: rebuild state each window is too
    # slow; reuse bench.py's loop shape instead: state threads through) ------
    from rgbnomore_tpu.train.optim import make_optimizer
    from rgbnomore_tpu.train.steps import TrainState

    tx, trainer.schedule = make_optimizer(
        cfg.train.lr, cfg.train.wd, cfg.train.warmup, 10_000
    )
    trainer.state = jax.device_put(
        TrainState.create(apply_fn=trainer.model.apply, params=params, tx=tx),
        trainer._rs,
    )
    from rgbnomore_tpu.utils.timing import timeit_fifo_carry

    step = trainer._fused_train_step()
    results["full_step"] = timeit_fifo_carry(
        lambda s: step(s, batch, rng)[0], trainer.state,
        depths=(max(2, args.iters // 5), args.iters), repeats=3,
    )

    # honest A/B: the same fused production step with the Pallas aug kernel
    if "pipeline_fused" in results:
        try:
            tr2 = Trainer(cfg, transfer="cropped", fused_aug=True)
            tr2.schedule = trainer.schedule
            # the timed step above donates its TrainState (which aliased
            # `params`); rebuild the params tree from a fresh init
            params2 = jax.tree.map(
                jnp.copy,
                tr2.model.init(jax.random.PRNGKey(1), *example_inputs(cfg, 2))[
                    "params"
                ],
            )
            tr2.state = jax.device_put(
                TrainState.create(apply_fn=tr2.model.apply, params=params2, tx=tx),
                tr2._rs,
            )
            step2 = tr2._fused_train_step()
            results["full_step_fused"] = timeit_fifo_carry(
                lambda s: step2(s, batch, rng)[0], tr2.state,
                depths=(max(2, args.iters // 5), args.iters), repeats=3,
            )
        except Exception as e:
            print(f"fused full step failed: {type(e).__name__}: {str(e)[:300]}")

    ms = {k: round(v * 1e3, 3) for k, v in results.items()}
    fps = {k: round(batch_size / v, 1) for k, v in results.items()}
    payload = {
        "batch": batch_size, "k": k, "fmt": fmt, "target": target,
        "backend": jax.default_backend(), "ms_per_call": ms, "imgs_per_sec": fps,
        "derived": {
            "step_minus_fwd_bwd_ms": round((results["full_step"] - results["fwd_bwd"]) * 1e3, 3),
            "pipeline_share_pct": round(100 * results["pipeline"] / results["full_step"], 1),
            "aug_share_pct": round(100 * results["aug"] / results["full_step"], 1),
            "unpack_share_pct": round(100 * results["unpack"] / results["full_step"], 1),
        },
    }
    prev = json.loads(OUT.read_text()) if OUT.exists() else {}
    if args.amp:
        # keep the f32 table intact; amp runs land under their own key
        prev[f"amp_{args.amp}"] = payload
        payload = prev
    else:
        payload.update({k: v for k, v in prev.items() if k.startswith("amp_")})
    OUT.write_text(json.dumps(payload, indent=1))
    width = max(len(s) for s in ms)
    for name in ms:
        print(f"{name:<{width}}  {ms[name]:>9.3f} ms  {fps[name]:>8.1f} img/s")
    print(json.dumps(payload["derived"]))


if __name__ == "__main__":
    main()
