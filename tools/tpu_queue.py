#!/usr/bin/env python
"""Wait for the TPU tunnel to return, then run the queued TPU jobs serially.

The harness relay (the only path to the one physical chip) occasionally dies
with every background process; it is restored from outside the container.
This watcher polls backend init in a SUBPROCESS (a hung init can't wedge the
watcher), and once a device is visible runs the round-3 queue:

  1. tools/profile_device_step.py        — fused Pallas aug-kernel A/B row
  2. tools/cocktail_run.py (alpha 0.2)   — the full-preset cocktail rerun at
                                           the reference's mixup alpha

Each job's output goes to /tmp/tpuq_<name>.log.  Exactly one process may use
the TPU at a time, so jobs run strictly serially.

Run detached:  nohup python tools/tpu_queue.py --enable --deadline-hours 2 \
                   > /tmp/tpu_queue.log 2>&1 &

SAFETY (round-4): a leftover watcher seized the chip under the round-3 driver
capture (VERDICT r3).  The watcher now (a) refuses to start without
``--enable``, (b) hard-exits at ``--deadline-hours`` (default 2) so it can
never outlive the builder session into a driver capture, and (c) skips
probing/jobs while ``/tmp/rgbnomore_bench.lock`` exists (bench.py owns it).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BENCH_LOCK = Path("/tmp/rgbnomore_bench.lock")

PROBE = (
    "import jax; d = jax.devices(); "
    "assert d and d[0].platform != 'cpu', d; print('TPU UP', d)"
)

QUEUE = [
    ("profile", [sys.executable, "tools/profile_device_step.py",
                 "--batch", "256", "--iters", "30"], 3600),
    ("cocktail_a02", [sys.executable, "tools/cocktail_run.py",
                      "--steps", "10000", "--workdir", "/tmp/cocktail_a02",
                      "--tag", "dct-cocktail-10k-alpha02"], 4 * 3600),
]


def tpu_up(timeout: int = 90) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE], timeout=timeout,
                           capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--enable", action="store_true",
                    help="required; refuse to run without it")
    ap.add_argument("--deadline-hours", type=float, default=2.0,
                    help="hard exit after this many hours, jobs cut short")
    args = ap.parse_args()
    if not args.enable:
        sys.exit("tpu_queue: refusing to run without --enable "
                 "(see SAFETY note in module docstring)")
    deadline = time.monotonic() + args.deadline_hours * 3600

    def time_left() -> float:
        return deadline - time.monotonic()

    while True:
        if time_left() <= 0:
            sys.exit("tpu_queue: deadline reached before TPU returned")
        if BENCH_LOCK.exists():
            print(f"[{time.strftime('%H:%M:%S')}] bench lock present, waiting",
                  flush=True)
        elif tpu_up():
            break
        else:
            print(f"[{time.strftime('%H:%M:%S')}] TPU down, retrying in 300s",
                  flush=True)
        time.sleep(min(300, max(1, time_left())))
    print(f"[{time.strftime('%H:%M:%S')}] TPU is back; running queue",
          flush=True)
    for name, cmd, job_timeout in QUEUE:
        if time_left() <= 0:
            print("tpu_queue: deadline reached, stopping queue", flush=True)
            break
        while BENCH_LOCK.exists() and time_left() > 0:
            print(f"[{time.strftime('%H:%M:%S')}] bench lock present, waiting",
                  flush=True)
            time.sleep(60)
        log = Path(f"/tmp/tpuq_{name}.log")
        print(f"[{time.strftime('%H:%M:%S')}] start {name}: {' '.join(cmd)}",
              flush=True)
        with log.open("w") as fh:
            try:
                rc = subprocess.run(
                    cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT,
                    timeout=min(job_timeout, max(1, time_left())),
                ).returncode
            except subprocess.TimeoutExpired:
                rc = -1
        print(f"[{time.strftime('%H:%M:%S')}] {name} done rc={rc} "
              f"(log: {log})", flush=True)
    print("QUEUE DONE", flush=True)


if __name__ == "__main__":
    main()
