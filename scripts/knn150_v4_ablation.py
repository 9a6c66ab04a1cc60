#!/usr/bin/env python
"""knn-20 v4 fused-kernel component account (VERDICT r4 item 1, round 5).

Prices every component of the v4 fused knn generation path
(`knn_pallas._fused_kernel_v4`: search + gather + edge MLP + aggregation in
ONE Pallas program per jet) by differential timing: the production e2e batch
minus the same batch with one component stubbed to a single VPU sweep
(`MPGAN_TPU_KNN_ABLATE`, timing-only — outputs are corrupted, shapes and the
remaining schedule are preserved).

Components at the bench config (B=512, N=150, k=20, fe=[96,160,192],
self_loops=True so exactly k extraction passes, generation => no dropout,
no idx/dists emission since round 5's emit_idx gating):

  distmm   [152,4]@[4,151] distance matmul + keying        (MXU, tiny)
  extract  20 serial min/eq/where passes over [152,150]    (VPU, serial)
  gather   20 x [152,150]@[150,97] one-hot sender gathers  (MXU)
  chain    edge-MLP hidden chain [3040,(128->256->256)]    (MXU, the FLOPs)
  epi      masked tree-sum aggregation + out write          (VPU)

The residual (e2e minus all components minus the all-ablated floor) is the
per-program overhead Mosaic cannot remove: operand DMA, concats, the tiled
one-hot conversion. Run on the TPU, never concurrently with anything else.

Reference for what the account must cover: mpgan/model.py:319-381 (knn
search + edge features) and PERF.md round-5 "knn-20 SOL account".
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

# subtraction probes price (prod - ablated); doubling probes price
# (doubled - prod) = the component's MARGINAL in-schedule cost (~0 means the
# work is fully hidden under other components / the grid pipeline)
SETTINGS = [
    ("production", ""),
    ("no_distmm", "distmm"),
    ("no_extract", "extract"),
    ("no_maskdiv", "epi"),
    ("gather_2x", "gather2x"),
    ("chain_2x", "chain2x"),
    ("epi_2x", "epi2x"),
]


def main() -> None:
    import bench

    batch = 512
    results = {}
    for name, ab in SETTINGS:
        os.environ["MPGAN_TPU_KNN_ABLATE"] = ab
        jax.clear_caches()
        jets, mfu, _ = bench.bench_generator(150, batch, num_knn=20)
        ms = batch * bench.ITERS / jets * 1e3 / bench.ITERS
        results[name] = ms
        print(f"{name:12s} {jets:10.1f} jets/s   batch {ms:7.3f} ms")
    os.environ.pop("MPGAN_TPU_KNN_ABLATE", None)

    e2e = results["production"]
    print(f"\ncomponent prices (batch={batch}, production {e2e:.3f} ms):")
    for name, _ in SETTINGS[1:]:
        if name.startswith("no_"):
            d = e2e - results[name]
            kind = "subtractive"
        else:
            d = results[name] - e2e
            kind = "marginal (2x - 1x)"
        print(f"  {name:10s} {d:7.3f} ms  ({d / e2e * 100:5.1f}%)  [{kind}]")
    print(
        "\nsubtractive = time freed when the component is stubbed (includes"
        " any serial-chain latency it imposed); marginal = extra time for a"
        " second copy in-schedule (~0 means the component is fully hidden"
        " under the rest of the program / grid pipeline)."
    )


if __name__ == "__main__":
    main()
