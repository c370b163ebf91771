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

Run detached:  nohup python tools/tpu_queue.py > /tmp/tpu_queue.log 2>&1 &
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

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
    while not tpu_up():
        print(f"[{time.strftime('%H:%M:%S')}] TPU down, retrying in 300s",
              flush=True)
        time.sleep(300)
    print(f"[{time.strftime('%H:%M:%S')}] TPU is back; running queue",
          flush=True)
    for name, cmd, job_timeout in QUEUE:
        log = Path(f"/tmp/tpuq_{name}.log")
        print(f"[{time.strftime('%H:%M:%S')}] start {name}: {' '.join(cmd)}",
              flush=True)
        with log.open("w") as fh:
            try:
                rc = subprocess.run(cmd, cwd=REPO, stdout=fh,
                                    stderr=subprocess.STDOUT,
                                    timeout=job_timeout).returncode
            except subprocess.TimeoutExpired:
                rc = -1
        print(f"[{time.strftime('%H:%M:%S')}] {name} done rc={rc} "
              f"(log: {log})", flush=True)
    print("QUEUE DONE", flush=True)


if __name__ == "__main__":
    main()
