#!/usr/bin/env python
"""Sweep the dense jets-blocked kernel's jet-block size on the 30p TRAIN
step (D+G, B=256). Usage: jb_sweep_30p_train.py <block_jets>.

MPGAN_TPU_BLOCK_JETS overrides BOTH the forward and the backward jet-block
targets (ops/mp_pallas.py:_pick_jb), so this measures the coupled effect;
the backward holds every layer activation live, so its VMEM ceiling binds
first. One process per value (tpu-tunnel rule: one experiment per command).
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["MPGAN_TPU_BLOCK_JETS"] = sys.argv[1]

from bench import bench_train_step  # noqa: E402


def main():
    ms = bench_train_step(30, 256)
    print(f"jb_target={sys.argv[1]}: train step {ms:.2f} ms")


if __name__ == "__main__":
    main()
