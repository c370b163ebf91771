#!/usr/bin/env python
"""Layered TPU-vs-host equivalence test of the cropped (mask16) wire.

Round-5 bisect: crop_noaug and crop_k63 train to NUMERICALLY IDENTICAL floors
(CROPBISECT.json) — different K, different aug, same trajectory — which is
only possible if the model's input is effectively constant on TPU.  Every
"cropped wire learns" datapoint (REFERENCE_AB depth-4) ran at ~5 s/step, i.e.
on CPU.  This isolates WHERE the content is lost on the TPU backend:

  L0  device_put round-trip of the uint8 row buffer (relay integrity)
  L1  jit(split_packed_batch) on TPU vs host row_views (slice/bitcast)
  L2  jit(unpack_fields)      on TPU vs CPU reference   (mask decompress)
  L3  jit(train pipe)         on TPU vs CPU             (flip/aug/to_range)
  L4  fused train-step loss: real batch A vs B vs properly-zeroed A
      (zeroing every coefficient field INCLUDING dy/dc, unlike the round-4
      tool whose zeroed control kept the DC planes — ADVICE.md item 1)

Run: PYTHONPATH=.:/root/.axon_site python tools/diag_tpu_unpack.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    from tools.validate_recipe import make_dataset

    from rgbnomore_tpu.augment.pipeline import (
        make_cropped_train_pipeline,
        split_packed_batch,
        unpack_fields,
    )
    from rgbnomore_tpu.data.loader import DctCroppedLoader, row_views
    from rgbnomore_tpu.data.index import load_index

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    train_idx, _ = make_dataset(Path("/tmp/recipe_ds"))
    ds = load_index(str(train_idx))
    B, K, T = 32, 16, 28
    loader = DctCroppedLoader(ds, B, target=T, k=K, mode="train", max_src=32,
                              fmt="mask16", shuffle=True, seed=0, num_threads=2)
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    buf = b1["packed"]

    # ---- L0: relay round-trip ------------------------------------------
    back = np.asarray(jax.device_put(buf, dev))
    print(f"L0 device_put roundtrip: bytes equal = {np.array_equal(back, buf)}",
          flush=True)

    # ---- L1: split_packed_batch on device vs host views ----------------
    split_j = jax.jit(lambda p: split_packed_batch(p, T, K, "mask16"))
    f_dev = jax.device_get(split_j(jax.device_put(buf, dev)))
    ok_all = True
    for name in ("vy", "iy", "sy", "dy", "vc", "ic", "sc", "dc", "quant",
                 "labels", "weights"):
        host = np.stack([row_views(buf[i], loader.layout)[name] for i in range(B)])
        got = np.asarray(f_dev[name])
        same = np.array_equal(got.astype(host.dtype), host)
        ok_all &= same
        if not same:
            bad = np.flatnonzero(
                (got.reshape(B, -1) != host.reshape(B, -1)).any(1))
            print(f"L1 split[{name}]: MISMATCH rows {bad[:5]}... "
                  f"(host sample {host.flat[:4]} got {got.flat[:4]})", flush=True)
    print(f"L1 split_packed_batch on {jax.default_backend()}: "
          f"{'OK' if ok_all else 'BROKEN'}", flush=True)

    # ---- L2: unpack_fields on device vs CPU ----------------------------
    unpack_j = jax.jit(
        lambda p: unpack_fields(split_packed_batch(p, T, K, "mask16"), "mask16"))
    y_dev, c_dev = jax.device_get(unpack_j(jax.device_put(buf, dev)))
    with jax.default_device(cpu):
        y_cpu, c_cpu = jax.device_get(
            jax.jit(lambda p: unpack_fields(
                split_packed_batch(p, T, K, "mask16"), "mask16"))(buf))
    dy = float(np.abs(np.asarray(y_dev) - np.asarray(y_cpu)).max())
    dc = float(np.abs(np.asarray(c_dev) - np.asarray(c_cpu)).max())
    print(f"L2 unpack_fields: max |dev-cpu| y={dy:.3e} c={dc:.3e} | "
          f"dev y std {np.asarray(y_dev).std():.2f} cpu y std "
          f"{np.asarray(y_cpu).std():.2f}", flush=True)

    # ---- L3: full train pipe on device vs CPU --------------------------
    from rgbnomore_tpu.train.config import generate_config

    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.classes = 20
    pipe = make_cropped_train_pipeline(cfg, k=K)
    rng = jax.random.PRNGKey(0)
    py_d, pc_d, pl_d, pw_d = jax.device_get(
        jax.jit(pipe)(rng, jax.device_put(buf, dev)))
    with jax.default_device(cpu):
        py_c, pc_c, pl_c, pw_c = jax.device_get(jax.jit(pipe)(rng, buf))
    print(f"L3 train pipe: max |dev-cpu| y={np.abs(py_d - py_c).max():.3e} "
          f"c={np.abs(pc_d - pc_c).max():.3e} labels equal="
          f"{np.array_equal(pl_d, pl_c)} | dev y std {py_d.std():.4f} "
          f"cpu y std {py_c.std():.4f}", flush=True)

    # ---- L4: fused step, real1 vs real2 vs fully-zeroed, both wires ----
    from rgbnomore_tpu.data.loader import DctPackedLoader
    from rgbnomore_tpu.train.loop import Trainer

    B4 = 128  # the flatline batch size (codegen can differ per shape)
    cfg.model.mixup = False
    cfg.train.batch_size = B4

    def probe(transfer: str):
        if transfer == "cropped":
            ld = DctCroppedLoader(ds, B4, target=T, k=K, mode="train",
                                  max_src=32, fmt="mask16", shuffle=True,
                                  seed=0, num_threads=2)
        else:
            ld = DctPackedLoader(ds, B4, canvas=32, k=K, fmt="mask",
                                 shuffle=True, seed=0, num_threads=2)
        itr = iter(ld)
        p1, p2 = next(itr), next(itr)
        p3 = {k2: v.copy() for k2, v in p1.items()}
        # zero EVERY per-sample field except labels/weights (layout-aware —
        # fixes the round-4 control that left dy/dc intact)
        for name, spec in ld.layout.items():
            if name in ("row", "labels", "weights"):
                continue
            off, shape, dtype = spec
            n = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
            p3["packed"][:, off:off + n] = 0
        tr = Trainer(cfg, transfer=transfer, canvas=32)
        tr.create_state(steps_per_epoch=100)
        step_fn = tr._fused_train_step()
        base_rng = jax.random.PRNGKey(0)
        losses = {}
        for name, b in (("real1", p1), ("real2", p2), ("zeroed", p3)):
            stc = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                               tr.state)
            _, m = step_fn(stc, tr.put_batch(b), base_rng)
            losses[name] = float(m["loss"])
        print(f"L4[{transfer}] step loss: real1 {losses['real1']:.6f} real2 "
              f"{losses['real2']:.6f} zeroed {losses['zeroed']:.6f}", flush=True)
        d12 = abs(losses["real1"] - losses["real2"])
        d1z = abs(losses["real1"] - losses["zeroed"])
        print(f"L4[{transfer}] |real1-real2|={d12:.2e} |real1-zeroed|={d1z:.2e}",
              flush=True)

    probe("cropped")
    probe("packed")


if __name__ == "__main__":
    main()
