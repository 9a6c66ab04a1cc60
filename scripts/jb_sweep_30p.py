#!/usr/bin/env python
"""Sweep the dense jets-blocked kernel's jet-block size at the 30p bench
config (MPGAN generation, B=4096). Usage: jb_sweep_30p.py <block_jets>.

MPGAN_TPU_BLOCK_JETS is read at trace time, and compiled programs cache per
shape — hence one process per value (tpu-tunnel rule: one experiment per
command).
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["MPGAN_TPU_BLOCK_JETS"] = sys.argv[1]

from bench import bench_generator  # noqa: E402


def main():
    rate, mfu, _ = bench_generator(30, 4096)
    print(f"jb_target={sys.argv[1]}: {rate:,.0f} jets/s  mfu={mfu:.3f}")


if __name__ == "__main__":
    main()
