"""Subprocess worker for the multi-host execution test.

Each worker is one JAX process with 4 virtual CPU devices; two workers
rendezvous over localhost (``jax.distributed.initialize`` — the TPU-native
replacement for the reference's TCP/NCCL rendezvous,
``utils/pipeline_utils.py:78-88``) and drive the PRODUCTION multi-host code:
``make_loaders``'s per-process index/batch sharding and
``Trainer._put``'s ``make_array_from_process_local_data`` assembly.

Usage: python _multihost_worker.py <corpus_dir> <process_id> <num_procs> <port>
Prints one JSON line with losses + eval metrics for the parent to compare.
"""

import json
import sys


def main() -> None:
    corpus, pid, nproc, port = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)

    from rgbnomore_tpu.parallel import init_distributed

    init_distributed(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    from rgbnomore_tpu.train.config import generate_config
    from rgbnomore_tpu.train.loop import Trainer, make_loaders

    cfg = generate_config("vitti", "dct", modelver=1)
    cfg.model.depth = 2
    cfg.model.dct_blocks = 8
    cfg.model.classes = 3
    cfg.train.batch_size = 8
    cfg.train.warmup = 2
    cfg.train.split = 0.25
    cfg.model.mixup = False  # keep train losses batch-order-insensitive
    cfg.train.auglist = ["Brightness", "Cutout", "TranslateX"]  # compile budget

    trainer = Trainer(cfg, canvas=8, transfer="cropped")
    loaders = make_loaders(
        cfg, f"{corpus}/index_train.csv", f"{corpus}/index_val.csv",
        canvas=8, num_threads=2, global_batch=trainer.global_batch(),
        transfer="cropped", packed_k=trainer.packed_k,
    )
    trainer.create_state(steps_per_epoch=max(1, len(loaders["train"])))

    # eval at INIT: params are identical across topologies (same seed), and
    # eval is a weighted sum -> must match the single-process run exactly
    init_eval = trainer.evaluate(loaders["test"])

    step_fn = trainer._fused_train_step()
    losses = []
    rng = jax.random.PRNGKey(cfg.seed + 1)
    it = loaders["train"].iter_cycle(3)
    for batch in it:
        trainer.state, metrics = step_fn(trainer.state, trainer.put_batch(batch), rng)
        losses.append(float(metrics["loss"]))

    post_eval = trainer.evaluate(loaders["minival"])
    print(json.dumps({
        "pid": pid,
        "nproc": jax.process_count(),
        "ndev": jax.device_count(),
        "init_eval": init_eval,
        "losses": losses,
        "post_eval": post_eval,
        "step": int(trainer.state.step),
    }))


if __name__ == "__main__":
    main()
