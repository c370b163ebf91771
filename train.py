#!/usr/bin/env python
"""Train / evaluate / benchmark CLI — flag parity with the reference train.py.

Differences from the reference (``/root/reference/train.py:13-64``), by design:
- no ``--port`` / process spawning: one process drives all local TPU devices
  via a data mesh (SPMD), and multi-host uses ``jax.distributed``;
- ``--num_gpus`` is accepted as ``--num_devices`` (alias kept);
- checkpoints are Orbax directories, final weights flax msgpack.
"""

from __future__ import annotations

import argparse
import logging


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    # model config
    p.add_argument("--model_arch", type=str, default="vits",
                   help="Model architecture (vitti, vits, vitb, vitl, swinv2)")
    p.add_argument("--no_subblock", action="store_true", help="Disable subblock conversion")
    p.add_argument("--embed_type", type=int, default=2,
                   help="Embedding type: 1 grouped, 2 separate, 3 concatenate")
    p.add_argument("--domain", type=str, default="dct", help="(DCT/RGB) input domain")
    # data config
    p.add_argument("--datapath", type=str, default="./imagenet",
                   help="Folder containing the ImageNet .tar files")
    p.add_argument("--temp_datapath", type=str, default="/tmp/imagenet_data",
                   help="Where to extract/stage the dataset")
    p.add_argument("--indexpaths", type=str, default="assets/index_train.csv,assets/index_val.csv",
                   help="train,val index CSVs (comma separated)")
    p.add_argument("--delete_dataset", action="store_true")
    p.add_argument("--no_extract", action="store_true")
    p.add_argument("--no_resize", action="store_true")
    p.add_argument("--num_devices", "--num_gpus", type=int, default=-1,
                   help="Number of accelerator devices (-1: all local)")
    p.add_argument("--num_cpus", type=int, default=4, help="Host threads for the loader")
    p.add_argument("--use_msrsync", action="store_true")
    p.add_argument("--stage_data", action="store_true",
                   help="Run dataset staging (tar extract + resize) before training")
    # pipeline config
    p.add_argument("--train", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--benchmark", type=int, default=0, help="Benchmark for N iterations")
    p.add_argument("--savepath", type=str, default="./models/ViT_v1.msgpack")
    p.add_argument("--loadpath", type=str, default="")
    p.add_argument("--load_ckpt", type=str, default="")
    p.add_argument("--transfer", type=str, default="",
                   choices=("", "cropped", "packed", "dense"),
                   help="Host->device format: 'cropped' (host crop+resize, packs only "
                        "the target grid — DCT default, ~25x fewer bytes than dense), "
                        "'packed' (sparse top-K full canvas — RGB default), 'dense' "
                        "(exact int16 canvas). Empty = per-domain default.")
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--verbose", type=int, default=1, help="0/1/2 logging verbosity")
    p.add_argument("--ckpt_every", type=int, default=1,
                   help="Checkpoint every N epochs (always keeps the final one; "
                        "the reference checkpoints every epoch)")
    p.add_argument("--packed_k", type=int, default=0,
                   help="Top-K AC coefficients kept per block on the packed/cropped "
                        "wire (0 = per-transfer default: 16 cropped/packed DCT, "
                        "63 RGB)")
    p.add_argument("--packed_k_eval", type=int, default=0,
                   help="Top-K on the EVAL side of the cropped DCT wire (0 = "
                        "default 48: measured 100%% top-1 agreement with the "
                        "dense full-spectrum path, KSWEEP.json)")
    p.add_argument("--eval_fmt", type=str, default="",
                   choices=("", "mask16", "mask16w"),
                   help="Eval wire value format for the cropped DCT transfer: "
                        "mask16 (int8 ACs, default) or mask16w (int16 ACs — "
                        "exact for identity crops, for coefficient ranges "
                        "beyond the int8 wire)")
    p.add_argument("--train_fmt", type=str, default="",
                   choices=("", "mask16", "mask16w", "mask16q"),
                   help="TRAIN wire value format for the cropped DCT transfer: "
                        "mask16 (dequantized, int8 ACs), mask16w (int16 ACs), "
                        "mask16q (JPEG quantized-unit ints, packed-wire-"
                        "equivalent selection/denoise)")
    # multi-host (DCN) rendezvous — the reference's TCP/NCCL rendezvous
    # (pipeline_utils.py:78-88) equivalent; single-host runs leave it unset
    p.add_argument("--coordinator", type=str, default="",
                   help="host:port of process 0 for multi-host training "
                        "(jax.distributed.initialize); empty = single host")
    p.add_argument("--num_processes", type=int, default=-1,
                   help="Total process count for --coordinator (-1: autodetect)")
    p.add_argument("--process_id", type=int, default=-1,
                   help="This process's rank for --coordinator (-1: autodetect)")
    # hyperparameter overrides (-1 / '' sentinel = use preset)
    p.add_argument("--epochs", type=int, default=-1)
    p.add_argument("--batch", type=int, default=-1)
    p.add_argument("--lr", type=float, default=-1)
    p.add_argument("--wd", type=float, default=-1)
    p.add_argument("--drop", type=float, default=-1)
    p.add_argument("--warmup_steps", type=int, default=-1)
    p.add_argument("--ops_list", type=str, default="")
    p.add_argument("--num_ops", type=int, default=-1)
    p.add_argument("--ops_magnitude", type=int, default=-1)
    p.add_argument("--amp", type=int, default=-1)
    p.add_argument("--ampdtype", type=str, default="")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--bias_init", type=str, default="",
                   choices=("", "torch", "zeros"),
                   help="Bias init family: 'torch' (default; the reference's "
                        "U(+-1/sqrt(fan_in)) nn.Linear/Conv family) or "
                        "'zeros'. Short-horizon runs escape the depth-12 "
                        "warmup plateau much earlier under 'zeros' "
                        "(BENCHMARKS.md round-5 closure); at the reference's "
                        "full scale the torch family is the proven one.")
    p.add_argument("--max_steps_per_epoch", type=int, default=0,
                   help="Debug: cap steps per epoch")
    return p.parse_args()


def main():
    import jax

    # persistent compilation cache: first compile is slow, later runs reuse it
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    logging.basicConfig(
        format="[%(asctime)s] %(levelname)s: %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        level=logging.INFO,
    )
    args = parse_args()

    if args.coordinator:
        # must precede every backend-initializing JAX call in this process
        from rgbnomore_tpu.parallel import init_distributed

        init_distributed(
            args.coordinator,
            **({"num_processes": args.num_processes} if args.num_processes >= 0 else {}),
            **({"process_id": args.process_id} if args.process_id >= 0 else {}),
        )

    from rgbnomore_tpu.train.config import generate_config

    cfg = generate_config(
        modelarch=args.model_arch.lower(),
        domain=args.domain,
        modelver=args.embed_type,
        subblock=not args.no_subblock,
        epochs=None if args.epochs < 0 else args.epochs,
        batchsize=None if args.batch < 0 else args.batch,
        lr=None if args.lr < 0 else args.lr,
        wd=None if args.wd < 0 else args.wd,
        drop=None if args.drop < 0 else args.drop,
        warmup_steps=None if args.warmup_steps < 0 else args.warmup_steps,
        auglist=None if args.ops_list == "" else args.ops_list,
        num_ops=None if args.num_ops < 0 else args.num_ops,
        ops_magnitude=None if args.ops_magnitude < 0 else args.ops_magnitude,
        seed=None if args.seed < 0 else args.seed,
        amp=None if args.amp < 0 else bool(args.amp),
        ampdtype=None if args.ampdtype == "" else args.ampdtype,
        deterministic=args.deterministic or None,
    )
    if args.bias_init:
        cfg.model.bias_init = args.bias_init
    from rgbnomore_tpu.train.config import configure_determinism

    configure_determinism(cfg)
    # default transfer: host crop-before-pack in BOTH domains (the
    # reference's data movement order — crop/resize on CPU before anything
    # ships, datasets.py:317-335); --transfer packed/dense keep the
    # full-canvas paths
    transfer = args.transfer or "cropped"

    if args.stage_data:
        from rgbnomore_tpu.data.staging import stage_dataset

        stage_dataset(
            args.datapath, args.temp_datapath,
            no_extract=args.no_extract, no_resize=args.no_resize,
            use_msrsync=args.use_msrsync, workers=args.num_cpus,
        )

    index_train, index_val = args.indexpaths.split(",")

    if args.benchmark > 0:
        from rgbnomore_tpu.benchmark import benchmark_model

        benchmark_model(cfg, args.benchmark, index_train, index_val,
                        num_threads=args.num_cpus, verbose=args.verbose,
                        num_devices=None if args.num_devices < 0 else args.num_devices,
                        transfer=transfer)
        return

    if args.train or args.eval:
        from rgbnomore_tpu.train.loop import train_and_eval

        train_and_eval(
            cfg,
            index_train,
            index_val,
            savepath=args.savepath,
            loadpath=args.loadpath,
            load_ckpt_dir=args.load_ckpt,
            run_train=args.train,
            run_eval=args.eval,
            verbose=args.verbose,
            num_threads=args.num_cpus,
            max_steps_per_epoch=args.max_steps_per_epoch or None,
            num_devices=None if args.num_devices < 0 else args.num_devices,
            transfer=transfer,
            packed_k=args.packed_k or None,
            packed_k_eval=args.packed_k_eval or None,
            eval_fmt=args.eval_fmt or None,
            train_fmt=args.train_fmt or None,
            ckpt_every=args.ckpt_every,
        )

    if args.delete_dataset:
        import shutil

        shutil.rmtree(args.temp_datapath, ignore_errors=True)


if __name__ == "__main__":
    main()
