#!/usr/bin/env python
"""fn-MLP fusion probe (VERDICT r4 item 3): does fusing fn into the edge
kernel close any of the 30p dense overlap gap?

Round 4's component account put 30p dense generation at 339k jets/s vs a
~520k perfect-MXU/VPU-overlap ceiling, with the fe kernel's VPU skeleton
(N^2 broadcast-add + mask + aggregate) only partially hidden under the MXU
chain. The fn MLP (2 x 0.56 ms) ran OUTSIDE the kernel as XLA ops that
cannot overlap with a Pallas dispatch. ``MPGAN_TPU_FUSE_FN=1`` moves fn
inside the program (ops/mp_pallas.edge_aggregate_fn — fn layer 1 decomposed
as agg@W1_top + x@W1_bot so the [agg|x] lane concat never materializes),
removing two dispatch boundaries per MP layer and giving Mosaic extra MXU
work to schedule against the skeleton.

Measures generation at the two bench configs (30p jets-mode B=4096,
150p receiver-mode B=512). bench.py differential protocol; one experiment
per invocation, never concurrently with anything.
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import bench_generator


def main() -> None:
    for label, kwargs in [
        ("30p dense B=4096", dict(num_particles=30, batch=4096)),
        ("150p dense B=512", dict(num_particles=150, batch=512)),
    ]:
        for fuse in ("0", "1"):
            os.environ["MPGAN_TPU_FUSE_FN"] = fuse
            jets, mfu, _ = bench_generator(**kwargs)
            print(
                f"{label}  fuse_fn={fuse}: {jets:,.0f} jets/s (mfu {mfu:.3f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
