#!/usr/bin/env python
"""SwinV2 step profile + optimization evidence (VERDICT round-2 item 7).

The swinv2_dct config is the only model-bound row in BENCH_SIX.json
(438 img/s fwd+bwd at batch 64 bf16 caps its pipeline at ~403), and round 2
shipped no evidence of WHERE the ~146 ms step goes.  This tool:

  1. captures a real JAX profiler trace of the production fused train step
     (same ``make_train_step`` the trainer jits) and prints the top-N
     self-time ops from XLA's op stats (parsed with
     tensorboard_plugin_profile — no TensorBoard UI needed);
  2. wall-clocks A/B variants of the step so any proposed change lands with
     a measured before/after.

Results -> SWIN_PROFILE.json + a table in BENCHMARKS.md.

Run (needs the real TPU; ~min for compile on a cold cache):
    PYTHONPATH=. python tools/profile_swin.py --iters 50
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "SWIN_PROFILE.json"


def build_step(cfg, batch: int):
    """The production fused fwd+bwd+update step on synthetic DCT inputs
    (exactly benchmark_model_synthetic's fbp mode, ``benchmark.py:62-110``)."""
    import jax
    import jax.numpy as jnp

    from rgbnomore_tpu.train.config import build_model
    from rgbnomore_tpu.train.optim import make_optimizer
    from rgbnomore_tpu.train.steps import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    nb = cfg.model.dct_blocks
    inputs = (
        jnp.asarray(rng.standard_normal((batch, 1, nb, nb, 8, 8)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((batch, 2, nb // 2, nb // 2, 8, 8)).astype(np.float32)),
    )
    labels = jnp.asarray(rng.integers(0, cfg.model.classes, batch).astype(np.int32))
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg.train.lr, cfg.train.wd, 100, 1000)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), inputs)
    step = make_train_step(model, cfg.model.classes, use_mixup=False)
    base = jax.random.PRNGKey(1)
    return state, step, (inputs, labels), base


def time_step(state, step, batch, base, iters: int) -> float:
    """ms per step, value-readback synced (see benchmark.py timing note)."""
    state, metrics = step(state, batch, base)  # compile, excluded
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    done = 0
    while done < iters:
        for _ in range(min(25, iters - done)):
            state, metrics = step(state, batch, base)
            done += 1
        _ = float(metrics["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def op_stats_from_trace(logdir: str, top: int = 15) -> list[dict]:
    """Parse the xplane trace into per-op self-time rows (framework op stats)."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not xspaces:
        return []
    data, _ = rtd.xspace_to_tool_data(xspaces, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data) if isinstance(data, str) else data
    # gviz table: {cols: [...], rows: [{c: [{v: ...}, ...]}]}
    try:
        cols = [c["label"] for c in rows[0]["cols"]]
        out = []
        for r in rows[0]["rows"][: top * 2]:
            rec = {cols[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])}
            out.append(rec)
        return out[:top]
    except Exception:
        return [{"raw": str(rows)[:2000]}]


def time_fwd(cfg, batch: int, iters: int, model=None) -> float:
    """ms per FORWARD pass (train=False) on synthetic inputs."""
    import jax
    import jax.numpy as jnp

    from rgbnomore_tpu.train.config import build_model

    rng = np.random.default_rng(0)
    nb = cfg.model.dct_blocks
    inputs = (
        jnp.asarray(rng.standard_normal((batch, 1, nb, nb, 8, 8)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((batch, 2, nb // 2, nb // 2, 8, 8)).astype(np.float32)),
    )
    model = model or build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), *inputs)["params"]
    fwd = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b, train=False))
    out = fwd(params, *inputs)
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, *inputs)
    _ = np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def build_step_with_model(cfg, batch: int, model):
    """build_step but with an externally-constructed (variant) model."""
    import jax
    import jax.numpy as jnp

    from rgbnomore_tpu.train.optim import make_optimizer
    from rgbnomore_tpu.train.steps import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    nb = cfg.model.dct_blocks
    inputs = (
        jnp.asarray(rng.standard_normal((batch, 1, nb, nb, 8, 8)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((batch, 2, nb // 2, nb // 2, 8, 8)).astype(np.float32)),
    )
    labels = jnp.asarray(rng.integers(0, cfg.model.classes, batch).astype(np.int32))
    tx, _ = make_optimizer(cfg.train.lr, cfg.train.wd, 100, 1000)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), inputs)
    step = make_train_step(model, cfg.model.classes, use_mixup=False)
    return state, step, (inputs, labels), jax.random.PRNGKey(1)


def swin_variant(cfg, **overrides):
    """The production swin model with constructor-field overrides."""
    from rgbnomore_tpu.train.config import build_model

    base = build_model(cfg)
    return base.copy(**overrides)


def attention_variant(mode: str):
    """A WindowAttention subclass implementing one measured hypothesis, bound
    into the model via the module tree (SwinBlock instantiates the class the
    swinv2 module namespace holds, so rebinding it swaps every layer)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from rgbnomore_tpu.models import swinv2 as sw

    class Variant(sw.WindowAttention):
        @nn.compact
        def __call__(self, x, mask, deterministic: bool = True):
            bw, n, c = x.shape
            head_dim = self.dim // self.num_heads
            logit_scale = self.param(
                "logit_scale", lambda key, shape: jnp.log(10.0 * jnp.ones(shape)),
                (self.num_heads, 1, 1))
            qkv_kernel = self.param("qkv_kernel", sw.trunc_init, (c, 3 * self.dim))
            qkv = x @ qkv_kernel.astype(self.dtype)
            if self.qkv_bias:
                q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
                v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
                qkv = qkv + jnp.concatenate(
                    [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(self.dtype)
            qkv = qkv.reshape(bw, n, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if mode != "no_cosine":
                q = q.astype(jnp.float32)
                k = k.astype(jnp.float32)
                q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
                k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
            scale = jnp.exp(jnp.minimum(logit_scale, jnp.log(1.0 / 0.01)))
            if mode in ("bf16_matmul", "no_cosine"):
                q = q.astype(self.dtype)
                k = k.astype(self.dtype)
            if mode == "no_cpb":
                bias_hnn = jnp.zeros((self.num_heads, n, n), jnp.float32)
            else:
                table = jnp.asarray(sw._relative_coords_table(
                    self.window_size, self.pretrained_window_size))
                cpb = nn.Dense(512, name="cpb_mlp1")(table)
                cpb = nn.relu(cpb)
                cpb = nn.Dense(self.num_heads, use_bias=False, name="cpb_mlp2")(cpb)
                cpb = cpb.reshape(-1, self.num_heads)
                idx = sw._relative_position_index(self.window_size).reshape(-1)
                bias_tbl = cpb[idx].reshape(n, n, self.num_heads)
                bias_hnn = (16.0 * jax.nn.sigmoid(bias_tbl)).transpose(2, 0, 1)
            nw = 1 if mask is None else mask.shape[0]
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            attn = attn * scale + bias_hnn[None]
            if mask is not None:
                attn = attn.reshape(bw // nw, nw, self.num_heads, n, n) + jnp.asarray(mask)[None, :, None]
                attn = attn.reshape(bw, self.num_heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
            out = out.reshape(bw, n, self.dim)
            return nn.Dense(self.dim, kernel_init=sw.trunc_init, dtype=self.dtype,
                            name="proj")(out)

    return Variant


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--platform", default="")
    ap.add_argument("--trace-iters", type=int, default=5)
    ap.add_argument("--skip-trace", action="store_true")
    ap.add_argument("--variants", action="store_true",
                    help="time the structural A/B variants (fwd-only, "
                         "no-droppath, bf16 attention matmuls, no-CPB, "
                         "no-cosine) instead of the xplane trace")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from rgbnomore_tpu.train.config import generate_config, update_runtime

    results = {"batch": args.batch, "iters": args.iters,
               "backend": jax.default_backend(), "variants": {}}

    cfg = generate_config("swinv2", "dct", modelver=1)
    cfg = update_runtime(cfg, 1)

    # --- baseline: the production bf16 step --------------------------------
    state, step, batch, base = build_step(cfg, args.batch)
    ms = time_step(state, step, batch, base, args.iters)
    results["variants"]["baseline_bf16"] = round(ms, 2)
    print(f"baseline_bf16: {ms:.2f} ms/step "
          f"({args.batch / ms * 1e3:.1f} img/s)", flush=True)

    # --- structural A/B variants -------------------------------------------
    if args.variants:
        from rgbnomore_tpu.models import swinv2 as sw
        from rgbnomore_tpu.train.config import build_model

        # forward-only split
        ms_f = time_fwd(cfg, args.batch, args.iters)
        results["variants"]["fwd_only"] = round(ms_f, 2)
        print(f"fwd_only: {ms_f:.2f} ms", flush=True)

        # stochastic depth off (24 bernoulli/where pairs at rate 0.2)
        m = swin_variant(cfg, drop_path_rate=0.0)
        st, stp, bt, bs = build_step_with_model(cfg, args.batch, m)
        ms_v = time_step(st, stp, bt, bs, args.iters)
        results["variants"]["no_droppath"] = round(ms_v, 2)
        print(f"no_droppath: {ms_v:.2f} ms", flush=True)

        orig = sw.WindowAttention
        for mode in ("bf16_matmul", "no_cpb", "no_cosine"):
            sw.WindowAttention = attention_variant(mode)
            try:
                m = build_model(cfg)
                st, stp, bt, bs = build_step_with_model(cfg, args.batch, m)
                ms_v = time_step(st, stp, bt, bs, args.iters)
            finally:
                sw.WindowAttention = orig
            results["variants"][mode] = round(ms_v, 2)
            print(f"{mode}: {ms_v:.2f} ms", flush=True)

        # XLA block-diagonal window pairing (models/swinv2.py
        # use_paired_attention; bit-exact vs baseline — tested on CPU)
        import copy

        cfg_p = copy.deepcopy(cfg)
        cfg_p.model.paired_attention = True
        m = build_model(cfg_p)
        st, stp, bt, bs = build_step_with_model(cfg_p, args.batch, m)
        ms_v = time_step(st, stp, bt, bs, args.iters)
        results["variants"]["paired_attention"] = round(ms_v, 2)
        print(f"paired_attention: {ms_v:.2f} ms", flush=True)

    # --- trace the baseline ------------------------------------------------
    if not args.skip_trace and not args.variants:
        logdir = "/tmp/swin_trace"
        jax.profiler.start_trace(logdir)
        st, metrics = state, None
        for _ in range(args.trace_iters):
            st, metrics = step(st, batch, base)
        _ = float(metrics["loss"])
        jax.profiler.stop_trace()
        ops = op_stats_from_trace(logdir)
        results["top_ops"] = ops
        for o in ops[:15]:
            print(json.dumps(o), flush=True)

    OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
