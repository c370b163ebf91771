"""Training / evaluation orchestration: the TPU equivalent of the reference's
``train.py:traineval`` (``train.py:66-234``).

One process drives all local devices via a data mesh (no per-GPU process
spawn); the per-step work — on-device augmentation, mixup, forward, backward,
update — is a single jitted SPMD function.  The host loop only feeds int16
coefficient canvases and logs metrics.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rgbnomore_tpu.augment.pipeline import make_eval_pipeline, make_train_pipeline
from rgbnomore_tpu.data.index import load_index, split_train_minival
from rgbnomore_tpu.data.loader import DctCanvasLoader, DctPackedLoader, RgbCanvasLoader
from rgbnomore_tpu.parallel import batch_sharding, make_mesh, replicated_sharding
from rgbnomore_tpu.train import checkpoint as ckpt
from rgbnomore_tpu.train.config import Config, build_model, example_inputs, update_runtime
from rgbnomore_tpu.train.optim import make_optimizer
from rgbnomore_tpu.train.steps import (
    create_train_state,
    merge_eval_metrics,
    mixup_batch,
    softmax_cross_entropy,
)
from rgbnomore_tpu.utils.metrics import LocalWindow

log = logging.getLogger(__name__)


class SummaryWriter:
    """TensorBoard writer with a no-op fallback when tensorboard is absent."""

    def __init__(self, logdir: str | Path | None):
        self._writer = None
        if logdir is None:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._writer = TBWriter(str(logdir))
        except Exception:  # pragma: no cover - tensorboard optional
            log.warning("tensorboard unavailable; metrics will only be logged")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


def tensorboard_dir(savepath: str, cfg: Config) -> Path:
    """Writer dir derived from savepath + lr/wd/drop (``pipeline_utils.py:411-425``)."""
    stem = Path(savepath).stem
    name = f"{stem}_lr{cfg.train.lr}_wd{cfg.train.wd}_drop{cfg.train.drop}"
    return Path(savepath).resolve().parent / "tb_logs" / name


def packed_defaults(domain: str) -> tuple[str, int]:
    """Per-domain packed wire-format defaults, shared by Trainer and
    make_loaders (the two ends of the wire MUST agree byte-for-byte).

    DCT models keep the validated top-16 ``mask`` spectrum; the RGB domain
    uses ``mask16`` at the full AC spectrum (exact DC, K=63) so
    on-device-decoded pixels stay within IDCT rounding of a host libjpeg
    decode.
    """
    return ("mask", 16) if domain == "DCT" else ("mask16", 63)


def cropped_eval_defaults(domain: str) -> tuple[int, str]:
    """(K, fmt) of the EVAL side of the crop-before-pack wire, shared by
    Trainer and make_loaders.

    Train tolerates a lossy wire (the gradient already carries augmentation
    noise; RECIPE_PROXY.json trains fine at K=16), but eval top-1 must not
    move: the K-sweep against the dense full-spectrum path (KSWEEP.json,
    VERDICT round-2 item 1) measured top-1 agreement 81.5% at the train
    default K=16 and 100.0% with zero logit drift at K=48, so eval ships
    K=48.  ``mask16w`` (int16 ACs) is the corpus-independent exact option
    when block energies exceed the int8 x uint8-scale range.
    """
    return (48, "mask16") if domain == "DCT" else (63, "mask16")


class Trainer:
    """Owns mesh, model, state and the jitted step functions for one config."""

    def __init__(self, cfg: Config, devices=None, seed: int | None = None, canvas: int = 64,
                 transfer: str = "packed", packed_fmt: str | None = None,
                 packed_k: int | None = None, packed_k_eval: int | None = None,
                 eval_fmt: str | None = None, fused_aug: bool | None = False,
                 train_fmt: str | None = None):
        self.cfg = update_runtime(cfg, len(devices or jax.devices()))
        self.mesh = make_mesh(devices)
        self.n_devices = len(self.mesh.devices.ravel())
        self.seed = cfg.seed if seed is None else seed
        self.rng = jax.random.PRNGKey(self.seed)

        self.model = build_model(cfg)
        # fp16 AMP gets the reference's dynamic loss scaling (GradScaler);
        # bf16/f32 need none (same exponent range as f32)
        from rgbnomore_tpu.train.config import amp_compute_dtype

        self._fp16_scaler = bool(cfg.train.amp) and amp_compute_dtype(cfg) == jnp.float16
        self.canvas = canvas
        self.domain = cfg.model.domain
        assert transfer in ("packed", "dense", "cropped"), transfer
        self.transfer = transfer
        d_fmt, d_k = packed_defaults(self.domain)
        self.packed_fmt = packed_fmt or d_fmt
        self.packed_k = packed_k or (
            (16 if self.domain == "DCT" else 63) if transfer == "cropped" else d_k
        )
        ek, ef = cropped_eval_defaults(self.domain)
        self.packed_k_eval = packed_k_eval or (
            ek if transfer == "cropped" and self.domain == "DCT" else self.packed_k)
        self.eval_fmt = eval_fmt or ef
        packed_fmt = self.packed_fmt
        packed = transfer == "packed"
        if transfer == "cropped" and self.domain == "RGB":
            # RGB crop-before-pack: fixed-window wire, device does tail
            # decode + residual bilinear + flip + RandAugment
            from rgbnomore_tpu.augment.pipeline import (
                make_rgb_cropped_eval_pipeline,
                make_rgb_cropped_train_pipeline,
            )

            self.train_pipe = make_rgb_cropped_train_pipeline(cfg, k=self.packed_k)
            self.eval_pipe = make_rgb_cropped_eval_pipeline(cfg, k=self.packed_k)
        elif transfer == "cropped":
            # host crop-before-pack: device does unpack+flip+aug only
            from rgbnomore_tpu.augment.pipeline import (
                make_cropped_eval_pipeline,
                make_cropped_train_pipeline,
            )

            # fused_aug: the single-pass Pallas flip+RandAugment+ToRange
            # kernel (ops/pallas/augpipe.py); False = XLA switch path,
            # None = auto (TPU + supported op list).  Default stays False
            # from data: the round-4 device A/B measured the kernel SLOWER
            # than XLA (pipeline 9.8 vs 7.2 ms, full step 87.6 vs 85.6 ms at
            # batch 256 — STEP_PROFILE.json, BENCHMARKS.md "Pallas fused aug
            # pipeline").
            self.train_fmt = train_fmt or "mask16"
            self.train_pipe = make_cropped_train_pipeline(
                cfg, k=self.packed_k, fmt=self.train_fmt, fused=fused_aug)
            self.eval_pipe = make_cropped_eval_pipeline(
                cfg, k=self.packed_k_eval, fmt=self.eval_fmt)
        elif self.domain == "DCT":
            self.train_pipe = make_train_pipeline(
                cfg, canvas=canvas, packed=packed, packed_fmt=packed_fmt,
                packed_k=self.packed_k,
            )
            self.eval_pipe = make_eval_pipeline(
                cfg, canvas=canvas, packed=packed, packed_fmt=packed_fmt,
                packed_k=self.packed_k,
            )
        else:
            from rgbnomore_tpu.augment.pipeline import make_packed_rgb_decode
            from rgbnomore_tpu.augment.rgb import make_rgb_eval_pipeline, make_rgb_train_pipeline

            rgb_canvas = canvas if canvas != 64 else 512  # canvas is pixels for RGB
            rgb_train = make_rgb_train_pipeline(cfg, canvas=rgb_canvas)
            rgb_eval = make_rgb_eval_pipeline(cfg, canvas=rgb_canvas)
            if packed:
                # ship coefficients, decode to pixels on-device (see
                # augment.pipeline.make_packed_rgb_decode); the block canvas
                # and its half-resolution chroma grid must tile exactly
                if rgb_canvas % 16:
                    raise ValueError(
                        f"RGB packed transfer needs a canvas that is a "
                        f"multiple of 16 (got {rgb_canvas}); use "
                        f"transfer='dense' for odd sizes"
                    )
                decode = make_packed_rgb_decode(rgb_canvas // 8, self.packed_k, packed_fmt)

                def train_pipe(rng, packed_buf, _rt=rgb_train, _d=decode):
                    img, labels, w = _d(packed_buf)
                    return _rt(rng, img), labels, w

                def eval_pipe(packed_buf, _re=rgb_eval, _d=decode):
                    img, labels, w = _d(packed_buf)
                    return _re(img), labels, w

                self.train_pipe, self.eval_pipe = train_pipe, eval_pipe
            else:
                self.train_pipe, self.eval_pipe = rgb_train, rgb_eval
        self._train_step_inner = None
        self._eval_step_inner = None
        self.state = None

        self._bs = batch_sharding(self.mesh)
        self._rs = replicated_sharding(self.mesh)

    # ------------------------------------------------------------------ setup
    def global_batch(self) -> int:
        return self.cfg.train.batch_per_device * self.n_devices

    def create_state(self, steps_per_epoch: int):
        total_steps = steps_per_epoch * self.cfg.train.epochs
        tx, self.schedule = make_optimizer(
            self.cfg.train.lr, self.cfg.train.wd, self.cfg.train.warmup, total_steps
        )
        init_rng, self.rng = jax.random.split(self.rng)
        state = create_train_state(
            self.model, self.cfg, tx, init_rng, example_inputs(self.cfg, batch=2)
        )
        if self._fp16_scaler:
            from rgbnomore_tpu.train.scaler import init_loss_scale

            state = state.replace(loss_scale=init_loss_scale())
        self.state = jax.device_put(state, self._rs)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
        log.info(
            "model %s/%s: %.2fM params, %d devices, global batch %d, %d steps/epoch",
            self.cfg.model.arch, self.cfg.model.domain, n_params / 1e6,
            self.n_devices, self.global_batch(), steps_per_epoch,
        )
        return self.state

    # ------------------------------------------------------------------ steps
    def _train_body(self):
        """The pure per-batch train step (uncompiled): augmentation + mixup +
        fwd/bwd/update.  Jitted directly by :meth:`_fused_train_step` and
        scanned by :meth:`_fused_multi_train_step`."""
        model = self.model
        pipe = self.train_pipe
        num_classes = self.cfg.model.classes
        use_mixup = self.cfg.model.mixup
        alpha = self.cfg.train.mixup_alpha

        packed = self.transfer in ("packed", "cropped")
        rgb = self.domain == "RGB"
        use_scaler = self._fp16_scaler

        def step(state, batch, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            k_aug, k_mix, k_drop = jax.random.split(step_rng, 3)
            if rgb and packed:
                img, labels, _ = pipe(k_aug, batch["packed"])
                inputs = (img,)
            elif rgb:
                inputs = (pipe(k_aug, batch["pixels"]),)
                labels = batch["labels"]
            elif packed:
                y, c, labels, _ = pipe(k_aug, batch["packed"])
                inputs = (y, c)
            else:
                y, c = pipe(k_aug, batch["y"], batch["cbcr"], batch["quant"])
                labels = batch["labels"]
                inputs = (y, c)
            if use_mixup:
                inputs, targets = mixup_batch(k_mix, inputs, labels, num_classes, alpha)
            else:
                targets = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)

            def loss_fn(params):
                logits = model.apply(
                    {"params": params}, *inputs, train=True, rngs={"dropout": k_drop}
                )
                return softmax_cross_entropy(logits, targets)

            if use_scaler:
                # fp16 AMP: dynamic loss scaling (the reference's GradScaler,
                # pipeline_utils.py:540-541) — scale the loss before backward,
                # unscale the grads, skip the update on overflow. On a skipped
                # step the Adam moments/count roll back (torch skips
                # optimizer.step()) but the LR-schedule count still advances
                # (scheduler.step is unconditional, train.py:174) — see
                # scaler.select_opt_state.
                from rgbnomore_tpu.train import scaler as ls

                scale = state.loss_scale.scale

                def scaled_loss_fn(params):
                    return loss_fn(params) * scale

                sloss, grads = jax.value_and_grad(scaled_loss_fn)(state.params)
                grads = jax.tree.map(lambda g: (g / scale).astype(g.dtype), grads)
                finite = ls.all_finite(grads)
                candidate = state.apply_gradients(grads=grads)
                new_state = state.replace(
                    step=state.step + 1,
                    params=ls.select_tree(finite, candidate.params, state.params),
                    opt_state=ls.select_opt_state(
                        finite, candidate.opt_state, state.opt_state
                    ),
                    loss_scale=ls.update_loss_scale(state.loss_scale, finite),
                )
                return new_state, {"loss": sloss / scale}

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), {"loss": loss}

        return step

    def _fused_train_step(self):
        """Augmentation + mixup + fwd/bwd/update in ONE jitted function."""
        if self._train_step_inner is None:
            self._train_step_inner = jax.jit(self._train_body(), donate_argnums=(0,))
        return self._train_step_inner

    def _fused_multi_train_step(self, n_steps: int):
        """``n_steps`` full optimizer steps in ONE jitted dispatch via
        ``lax.scan`` — semantically identical to calling the single step
        ``n_steps`` times (per-batch RNG still folds in ``state.step``), but
        one host->device transfer of ``(n_steps, B, row)`` and one dispatch,
        amortizing the per-call relay/dispatch overhead that dominates on
        thin-link harnesses.  Packed/cropped transfers only.

        Returns ``fn(state, superbuf, rng) -> (state, {"loss": (n_steps,)})``.
        """
        assert self.transfer in ("packed", "cropped"), "multi-step needs packed rows"
        body = self._train_body()

        def multi(state, superbuf, rng):
            def scan_body(st, buf):
                st, metrics = body(st, {"packed": buf}, rng)
                return st, metrics["loss"]

            state, losses = jax.lax.scan(scan_body, state, superbuf)
            return state, {"loss": losses}

        return jax.jit(multi, donate_argnums=(0,))

    def put_superbatch(self, superbuf):
        """Device-put an ``(n_steps, B, row)`` stack, batch axis sharded."""
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(self.mesh, PartitionSpec(None, "data"))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, superbuf)
        return jax.device_put(superbuf, sh)

    def _fused_eval_step(self):
        pipe = self.eval_pipe
        model = self.model
        packed = self.transfer in ("packed", "cropped")

        rgb = self.domain == "RGB"

        def step(params, batch):
            if rgb and packed:
                img, labels, w = pipe(batch["packed"])
                inputs = (img,)
            elif rgb:
                inputs = (pipe(batch["pixels"]),)
                labels, w = batch["labels"], batch["weights"]
            elif packed:
                y, c, labels, w = pipe(batch["packed"])
                inputs = (y, c)
            else:
                y, c = pipe(batch["y"], batch["cbcr"], batch["quant"])
                labels, w = batch["labels"], batch["weights"]
                inputs = (y, c)
            logits = model.apply({"params": params}, *inputs, train=False).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per_ex = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            pred = jnp.argmax(logits, axis=-1)
            return {
                "correct": jnp.sum((pred == labels) * w),
                "loss_sum": jnp.sum(per_ex * w),
                "count": jnp.sum(w),
            }

        return jax.jit(step)

    def _put(self, x):
        if jax.process_count() > 1:
            # multi-host: every process holds only its shard of the global
            # batch; assemble the global array from process-local data
            return jax.make_array_from_process_local_data(self._bs, x)
        return jax.device_put(x, self._bs)

    def put_batch(self, batch: dict) -> dict:
        if self.transfer in ("packed", "cropped"):
            # one transfer: everything (incl. labels/weights) rides in 'packed'
            return {"packed": self._put(batch["packed"])}
        return {k: self._put(v) for k, v in batch.items()}

    # ------------------------------------------------------------------ eval
    def evaluate(self, loader) -> dict:
        eval_step = self._fused_eval_step()
        sums = []
        for batch in loader:
            sums.append(eval_step(self.state.params, self.put_batch(batch)))
        return guard_eval_sums(sums)


def guard_eval_sums(sums: list) -> dict:
    """Merge per-batch eval sums, failing loudly on a silently-empty eval.

    A silently-empty eval (all-zero weights / empty split) would report
    accuracy 0.0 and masquerade as a training failure (round-5; the dryrun
    asserts the same).  NOTE the genuine exactly-0.0 case exists: a
    constant-class predictor whose class is absent from a tiny minival
    (CROPBISECT val_acc 0.0 = argmax constantly class 1, absent from the
    54-example proxy minival).  merge_eval_metrics clamps count to >= 1 for
    the division, so check the raw weighted count here.  A 0-BATCH loader is
    a legitimately empty split at tiny corpus scale (split=1% of a handful
    of files, like the reference's ``random_split``) — warn and report
    zeros; real batches whose weights ALL unpacked to zero is a wiring bug
    — raise.
    """
    out = merge_eval_metrics(sums)
    raw_count = sum(float(s["count"]) for s in sums)
    if sums and raw_count <= 0:
        raise RuntimeError(
            f"evaluation saw no weighted examples across {len(sums)} "
            "batches; check the split/loader wiring"
        )
    if not sums:
        log.warning("evaluate: empty loader (0 batches) — reporting zeros")
    return out


def make_loaders(cfg: Config, index_train: str, index_val: str, *, canvas: int = 64,
                 num_threads: int = 4, global_batch: int | None = None,
                 transfer: str = "packed", packed_fmt: str | None = None,
                 packed_k: int | None = None, packed_k_eval: int | None = None,
                 eval_fmt: str | None = None, train_fmt: str | None = None):
    """Build train / minival / trainval / test loaders (``datasets.py:445-582``)."""
    train_all = load_index(index_train)
    test_ds = load_index(index_val)
    train_ds, minival_ds, trainval_ds = split_train_minival(
        train_all, split=cfg.train.split, seed=cfg.seed
    )
    # multi-host: each process loads its strided index shard AND only its
    # 1/P slice of every global batch (assembled in Trainer._put)
    bsz = (global_batch or cfg.train.batch_size) // jax.process_count()
    shard_kw = dict(shard_id=jax.process_index(), num_shards=jax.process_count())
    if transfer == "cropped" and cfg.model.domain == "RGB":
        from rgbnomore_tpu.data.loader import RgbCroppedLoader

        # RGB crop-before-pack: pixel-granular boxes on host, window wire
        eval_mode = "full" if cfg.model.arch == "swinv2" else "center"
        mk = lambda ds, shuffle, drop: RgbCroppedLoader(
            ds, bsz, size=cfg.model.input_size, k=packed_k or 63,
            mode="train" if shuffle else eval_mode,
            shuffle=shuffle, drop_last=drop, seed=cfg.seed,
            num_threads=num_threads, **shard_kw,
        )
    elif transfer == "cropped":
        from rgbnomore_tpu.data.loader import DctCroppedLoader

        # host crop-before-pack: train gets the random-resized-crop box
        # distribution, eval the deterministic center crop (ViT,
        # datasets.py:364) or whole-image resize (swin, datasets.py:381)
        eval_mode = "full" if cfg.model.arch == "swinv2" else "center"
        k = packed_k or 16
        ek, ef = cropped_eval_defaults("DCT")
        k_eval, fmt_eval = packed_k_eval or ek, eval_fmt or ef
        fmt_train = train_fmt or "mask16"
        mk = lambda ds, shuffle, drop: DctCroppedLoader(
            ds, bsz, target=cfg.model.dct_blocks,
            k=k if shuffle else k_eval, fmt=fmt_train if shuffle else fmt_eval,
            mode="train" if shuffle else eval_mode, max_src=canvas,
            shuffle=shuffle, drop_last=drop, seed=cfg.seed,
            num_threads=num_threads, **shard_kw,
        )
    elif cfg.model.domain == "RGB" and transfer == "dense":
        rgb_canvas = canvas if canvas != 64 else 512
        mk = lambda ds, shuffle, drop: RgbCanvasLoader(
            ds, bsz, image_size=rgb_canvas, shuffle=shuffle, drop_last=drop,
            seed=cfg.seed, num_threads=num_threads, **shard_kw,
        )
    else:
        d_fmt, d_k = packed_defaults(cfg.model.domain)
        if cfg.model.domain == "RGB":
            # coefficients over the wire, JPEG tail decode on-device
            canvas = (canvas if canvas != 64 else 512) // 8
        fmt_kw = ({"fmt": packed_fmt or d_fmt, "k": packed_k or d_k}
                  if transfer == "packed" else {})
        cls = DctPackedLoader if transfer == "packed" else DctCanvasLoader
        mk = lambda ds, shuffle, drop: cls(
            ds, bsz, canvas=canvas, shuffle=shuffle, drop_last=drop, seed=cfg.seed,
            num_threads=num_threads, **shard_kw, **fmt_kw,
        )
    return {
        "train": mk(train_ds, True, True),
        "minival": mk(minival_ds, False, False),
        "trainval": mk(trainval_ds, False, False),
        "test": mk(test_ds, False, False),
    }


def save_params(path: str | Path, params) -> None:
    """Serialize final weights (the reference's bare ``state_dict`` save,
    ``train.py:202-204``) as flax msgpack."""
    from flax import serialization

    Path(path).write_bytes(serialization.to_bytes(params))


def load_params(path: str | Path, template):
    from flax import serialization

    return serialization.from_bytes(template, Path(path).read_bytes())


def train_and_eval(
    cfg: Config,
    index_train: str,
    index_val: str,
    savepath: str = "./models/model.msgpack",
    loadpath: str = "",
    load_ckpt_dir: str = "",
    run_train: bool = True,
    run_eval: bool = True,
    verbose: int = 1,
    canvas: int = 64,
    num_threads: int = 4,
    max_steps_per_epoch: int | None = None,
    transfer: str = "packed",
    num_devices: int | None = None,
    packed_k: int | None = None,
    packed_k_eval: int | None = None,
    eval_fmt: str | None = None,
    train_fmt: str | None = None,
    ckpt_every: int = 1,
) -> dict:
    """Main train/eval flow (reference ``train.py:traineval``).  Returns final
    metrics."""
    devices = jax.devices()[:num_devices] if num_devices else None
    trainer = Trainer(cfg, devices=devices, canvas=canvas, transfer=transfer,
                      packed_k=packed_k, packed_k_eval=packed_k_eval,
                      eval_fmt=eval_fmt, train_fmt=train_fmt)
    loaders = make_loaders(
        cfg, index_train, index_val, canvas=canvas, num_threads=num_threads,
        global_batch=trainer.global_batch(), transfer=transfer,
        packed_fmt=trainer.packed_fmt, packed_k=trainer.packed_k,
        packed_k_eval=trainer.packed_k_eval, eval_fmt=trainer.eval_fmt,
        train_fmt=getattr(trainer, "train_fmt", None),
    )
    steps_per_epoch = len(loaders["train"])
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    trainer.create_state(steps_per_epoch)

    if verbose >= 1:
        log.info("config: %s", cfg)
    if verbose >= 2:
        # startup shape/param table on the declared input shapes — the
        # reference's torchinfo.summary (pipeline_utils.py:383-384)
        from rgbnomore_tpu.utils.summary import model_summary

        log.info("model summary:\n%s", model_summary(trainer.model, cfg))
    savepath = str(savepath)
    Path(savepath).resolve().parent.mkdir(parents=True, exist_ok=True)
    ckpt_dir = ckpt.checkpoint_dir(savepath, f"{cfg.model.arch}_{cfg.model.domain.lower()}")
    # multi-host: TensorBoard and the final weights file are process-0-only
    # (the reference's rank-0 gating, train.py:117/:202); Orbax checkpointing
    # is itself multihost-aware and must be called by EVERY process
    is_proc0 = jax.process_index() == 0
    writer = SummaryWriter(tensorboard_dir(savepath, cfg) if run_train and is_proc0 else None)

    start_epoch = 0
    if load_ckpt_dir:
        trainer.state, meta = ckpt.restore_checkpoint(load_ckpt_dir, trainer.state)
        start_epoch = int(meta["epoch"]) + 1
        log.info("resumed from %s at epoch %d (step %d)", load_ckpt_dir, start_epoch,
                 int(trainer.state.step))

    results: dict = {}
    if run_train:
        step_fn = trainer._fused_train_step()
        base_rng = jax.random.PRNGKey(cfg.seed + 1)
        window = LocalWindow(100)
        n_train_batches = len(loaders["train"])
        for epoch in range(start_epoch, cfg.train.epochs):
            loaders["train"].set_epoch(epoch)
            t0 = time.time()
            n_img = 0
            pending: list = []  # per-step device loss scalars, fetched lazily
            for i, batch in enumerate(loaders["train"]):
                if max_steps_per_epoch and i >= max_steps_per_epoch:
                    break
                trainer.state, metrics = step_fn(trainer.state, trainer.put_batch(batch), base_rng)
                n_img += int(batch["weights"].sum())
                # EVERY iteration's loss feeds the window (reference:
                # LocalWindow per-iter, train.py:178-187), but the device->
                # host reads happen only at the logging cadence: the scalars
                # pile up as device arrays (already materialized by then), so
                # no per-step sync serializes transfer with compute
                pending.append(metrics["loss"])
                if verbose >= 2 or i % 50 == 0 or i + 1 == n_train_batches:
                    for v in pending:
                        running = window.put(float(v), returnval=True)
                    pending.clear()
                    it = int(trainer.state.step)
                    writer.scalar("Loss/Peritr_Train", running, it)
                    if verbose >= 2:
                        print(
                            f"\r[Epoch {epoch + 1}/{cfg.train.epochs} It {i + 1}] "
                            f"loss {running:.4f} lr {float(trainer.schedule(it)):.3e}",
                            end="", flush=True,
                        )
            for v in pending:  # flush a max_steps_per_epoch early break
                window.put(float(v))
            dt = time.time() - t0
            val = trainer.evaluate(loaders["minival"])
            tval = trainer.evaluate(loaders["trainval"])
            if verbose >= 1:
                log.info(
                    "epoch %d: loss %.4f | val acc %.2f%% loss %.4f | trainval acc %.2f%% | %.1f img/s",
                    epoch + 1, window.mean(), val["accuracy"] * 100, val["loss"],
                    tval["accuracy"] * 100, n_img / max(dt, 1e-9),
                )
            writer.scalar("Loss/Train", window.mean(), epoch)
            writer.scalar("Loss/Val", val["loss"], epoch)
            writer.scalar("Acc/Val", val["accuracy"], epoch)
            writer.scalar("Loss/Train_val", tval["loss"], epoch)
            writer.scalar("Acc/Train_val", tval["accuracy"], epoch)
            writer.scalar("Learning Rate", float(trainer.schedule(int(trainer.state.step))), epoch)
            # the reference checkpoints every epoch (train.py:196-199); on
            # hosts where pulling the full TrainState is expensive (thin
            # links) ckpt_every thins the cadence, always keeping the last
            if (epoch + 1) % ckpt_every == 0 or epoch + 1 == cfg.train.epochs:
                ckpt.save_checkpoint(
                    ckpt_dir, trainer.state, epoch,
                    {"val_acc": val["accuracy"], "val_loss": val["loss"], "train_loss": window.mean()},
                )
            results.update({"val": val, "trainval": tval, "epoch": epoch})
        if is_proc0:
            save_params(savepath, trainer.state.params)
            log.info("training complete; saved weights to %s", savepath)

    if run_eval and not run_train:
        weights = loadpath or savepath
        if Path(weights).exists():
            trainer.state = trainer.state.replace(
                params=load_params(weights, trainer.state.params)
            )
            log.info("loaded weights from %s", weights)
    if run_eval:
        test = trainer.evaluate(loaders["test"])
        results["test"] = test
        writer.scalar("Acc/Test", test["accuracy"], 0)
        writer.scalar("Loss/Test", test["loss"], 0)
        if verbose >= 1:
            log.info("test acc %.2f%% loss %.4f (n=%d)", test["accuracy"] * 100,
                     test["loss"], int(test["count"]))
        # eval-only mode also scores minival + trainval (train.py:206-219);
        # after a train run 'val' is already the last epoch's eval — guard
        # explicitly (setdefault would evaluate its default eagerly and
        # discard it, a full wasted minival pass)
        if "val" not in results:
            results["val"] = trainer.evaluate(loaders["minival"])
        if not run_train:
            results["trainval"] = trainer.evaluate(loaders["trainval"])

    writer.close()
    return results
