#!/usr/bin/env python
"""GAPT ceiling probe: batch sweep of the generator and full train step.

VERDICT r3 item 7: GAPT's train floor (1.51x) and MFU (0.023) were argued to
be shape-bound (5.9 MFLOP/jet — the model is tiny by design, that is its
selling point), but at 5.05 ms per B=512 train step the regime could equally
be per-program/dispatch-overhead-bound. Discriminating experiment: sweep the
batch. If throughput (jets/s) keeps rising with B, the B=512 bench line
under-reports the chip's GAPT capability and the bench should move to the
saturating batch; if it is flat, the VPU/softmax/layernorm epilogue is the
wall at any batch and the ceiling claim stands.

Reference semantics: gapt/model.py:205-344 (B=512 is the reference default
for jets, setup_training.py:815-846).

Differential single-dispatch timing (bench.py protocol). One experiment per
invocation on the shared tunnel; never run concurrently with pytest.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import bench_gapt, bench_train_step_gapt


def main() -> None:
    print("GAPT generator (30p):")
    for b in (512, 1024, 2048, 4096, 8192, 16384):
        jets, mfu, _ = bench_gapt(30, batch=b)
        print(f"  B={b:>6}: {jets:>12,.0f} jets/s   mfu={mfu:.4f}")
    print("GAPT train step (30p):")
    for b in (512, 1024, 2048, 4096, 8192):
        ms = bench_train_step_gapt(30, batch=b)
        print(f"  B={b:>6}: {ms:8.3f} ms/step = {b * 1e3 / ms:>12,.0f} trained jets/s")


if __name__ == "__main__":
    main()
