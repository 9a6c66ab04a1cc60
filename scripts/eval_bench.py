#!/usr/bin/env python
"""Eval-path wall-time bench (VERDICT r4 item 6).

The reference's in-training evaluation (train.py:686-809) dominates wall
time at small epoch counts: every ``save_epochs`` it generates 50k jets
(``gen_multi_batch``, train.py:226-282) and computes W1-P/W1-M/W1-EFP
(train.py:543-606) plus the FPD best-epoch criterion (train.py:794-809).
This script prints the per-component cold/warm breakdown behind bench.py's
``eval_*`` keys (the protocol itself lives in ``bench.bench_eval``).

Cold = first call (includes sampler + EFP jit compiles); warm = second
call on fresh keys — the steady-state per-eval cost a training run pays
from its second eval onward. Run on the TPU, never concurrently with
anything else. ``MPGAN_TPU_EVAL_BENCH_N`` shrinks the sample count for
CPU smoke runs (meaningless numbers, every code path exercised).
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mpgan_tpu.cli import pin_platform

pin_platform()  # honor JAX_PLATFORMS=cpu for smoke runs (axon force-registers)

from bench import bench_eval

N_EVAL = int(os.environ.get("MPGAN_TPU_EVAL_BENCH_N", 50_000))


def main() -> None:
    for num_particles, num_knn, batch, with_fpd in [
        (30, None, 256, True),
        (150, 20, 128, False),
    ]:
        label = f"{num_particles}p" + (f" knn-{num_knn}" if num_knn else " dense")
        print(f"== {label} (B={batch}, {N_EVAL} jets) ==", flush=True)
        for phase, seed in (("cold", 1), ("warm", 2)):
            times = bench_eval(
                num_particles, num_knn, batch, with_fpd, seed=seed, n_eval=N_EVAL
            )
            parts = "  ".join(f"{k}={v:.2f}s" for k, v in times.items())
            print(f"  {phase}: {parts}", flush=True)


if __name__ == "__main__":
    main()
