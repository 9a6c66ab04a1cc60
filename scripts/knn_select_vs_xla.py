#!/usr/bin/env python
"""Head-to-head: Pallas knn_select vs the XLA approx_max_k search, measured
end-to-end on TODAY's default (v3) gather kernel, generation + train step.

Eighth-session context: the isolated select kernel prices at 2.4 ms/layer
(scripts/knn150_glue_ablation.py) while the round-2 XLA search ablation
measured 1.49 ms — the select-kernel default was decided in the v1/v2
gather-kernel era and deserves a re-measure against the current pipeline.

Usage: python scripts/knn_select_vs_xla.py ; one experiment per invocation.
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

from bench import bench_generator, bench_train_step

B, N, K = 512, 150, 20


def main():
    for sel in ("1", "0"):
        os.environ["MPGAN_TPU_KNN_SELECT"] = sel
        name = "pallas_select" if sel == "1" else "xla_approx_max_k"
        jets, mfu, _ = bench_generator(N, batch=B, num_knn=K)
        print(f"gen  {name:18s} {jets:10,.0f} jets/s  mfu {mfu:.3f}", flush=True)
    for sel in ("1", "0"):
        os.environ["MPGAN_TPU_KNN_SELECT"] = sel
        name = "pallas_select" if sel == "1" else "xla_approx_max_k"
        ms = bench_train_step(N, batch=128, num_knn=K)
        print(f"train {name:18s} {ms:8.2f} ms/step (B=128)", flush=True)


if __name__ == "__main__":
    main()
