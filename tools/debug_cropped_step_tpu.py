#!/usr/bin/env python
"""Minimal TPU reproduction of the cropped-wire input-independence.

CROPBISECT arms crop_noaug and crop_k63 produced numerically IDENTICAL
loss/acc trajectories (different K, different aug) — only possible if the
model's logits do not depend on the wire's coefficient content inside the
production train step on TPU.  The jitted train PIPE alone is healthy on
TPU (same stats as CPU).  This drives the actual Trainer._fused_train_step
with (a) a real batch, (b) a different real batch, (c) the first batch with
every coefficient field zeroed (labels intact): if loss(a) == loss(b) or
loss(a) == loss(c), the step is input-independent and the breakage is in
the fwd/bwd composition on TPU.

Run: PYTHONPATH=. python tools/debug_cropped_step_tpu.py [--transfer cropped]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transfer", default="cropped", choices=("cropped", "packed"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    from tools.validate_recipe import make_dataset

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer, make_loaders

    print("backend", jax.default_backend(), flush=True)
    train_idx, val_idx = make_dataset(Path("/tmp/recipe_ds"))
    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.classes = 20
    cfg.model.mixup = False
    cfg.train.batch_size = 32
    tr = Trainer(cfg, transfer=args.transfer, canvas=32)
    loaders = make_loaders(
        cfg, str(train_idx), str(val_idx), canvas=32, num_threads=2,
        global_batch=32, transfer=args.transfer, packed_k=tr.packed_k,
        packed_k_eval=tr.packed_k_eval, eval_fmt=tr.eval_fmt)
    tr.create_state(steps_per_epoch=100)

    it = iter(loaders["train"])
    b1 = next(it)
    b2 = next(it)
    # zero the coefficient content but keep labels/weights.  Fields are NOT
    # ordered with labels last: mask16/mask16w layouts place the int16 DC
    # planes dy/dc AFTER labels/weights (data/loader.py packed_layout), so
    # blank each field's byte range individually (ADVICE round-4: a
    # prefix-zero control silently kept the DC content and measured a
    # DC-only step as "input-independent")
    from rgbnomore_tpu.data.loader import packed_layout

    if args.transfer == "cropped":
        layout = packed_layout(28, tr.packed_k, "mask16")
    else:
        layout = packed_layout(32, tr.packed_k, tr.packed_fmt)
    b3 = {k: v.copy() for k, v in b1.items()}
    for name, spec in layout.items():
        if name in ("row", "labels", "weights"):
            continue
        off, shape, dtype = spec
        nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
        b3["packed"][:, off:off + nbytes] = 0

    step_fn = tr._fused_train_step()
    base_rng = jax.random.PRNGKey(0)
    st = tr.state

    losses = {}
    for name, b in (("real1", b1), ("real2", b2), ("zeroed", b3)):
        # fresh state copy each time (donated)
        stc = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, st)
        _, m = step_fn(stc, tr.put_batch(b), base_rng)
        losses[name] = float(m["loss"])
        print(f"{name}: loss {losses[name]:.6f}", flush=True)

    print("real1 == real2:", losses["real1"] == losses["real2"])
    print("real1 == zeroed:", losses["real1"] == losses["zeroed"])

    # gradient norms at init, per top-level param group, real vs zeroed —
    # input coupling lives in the difference
    import jax.numpy as jnp

    body = tr._train_body()

    def grads_of(b):
        import jax as _j

        def loss_only(params):
            stx = st.replace(params=params)
            _, mm = body(stx, tr.put_batch(b), base_rng)
            return mm["loss"]

        return _j.grad(loss_only)(st.params)

    g_real = grads_of(b1)
    g_zero = grads_of(b3)
    for key in sorted(g_real.keys()):
        nr = float(jnp.sqrt(sum(jnp.vdot(x, x).real for x in jax.tree.leaves(g_real[key]))))
        nz = float(jnp.sqrt(sum(jnp.vdot(x, x).real for x in jax.tree.leaves(g_zero[key]))))
        d = jax.tree.map(lambda a, b_: a - b_, g_real[key], g_zero[key])
        nd = float(jnp.sqrt(sum(jnp.vdot(x, x).real for x in jax.tree.leaves(d))))
        print(f"grad[{key:>14s}]: real {nr:10.3e} zero {nz:10.3e} diff {nd:10.3e}")


if __name__ == "__main__":
    main()
