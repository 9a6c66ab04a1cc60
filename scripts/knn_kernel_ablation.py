#!/usr/bin/env python
"""Ablation: where does the knn gather+MLP kernel's time go?

Round-3 context: the v2 (relayout-free, one-hot-matmul) rewrite of the knn
gather kernel landed within ~2% of v1 end-to-end, falsifying the hypothesis
that Mosaic relayouts dominate it (they dominated the DENSE kernel, PERF.md
round 2). This script times the forward kernels in isolation at the bench
config (B=512, N=150, k=20, fe=[96,160,192] on 32-feature nodes) and strips
components to locate the wall:

  v1_full / v2_full       — the production kernels
  v2_nohidden             — gather + first layer + aggregation only
                            (hidden chain deleted): MXU chain cost by diff
  v3_full / v3_nohidden   — neighbour-major rows: receiver broadcast and
                            k-aggregation as aligned VPU copies/adds, only
                            the sender gather on the MXU

Differential single-dispatch timing (bench.py protocol). One experiment per
invocation on the shared tunnel; run AFTER any bench.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import ITERS, _differential_time
from mpgan_tpu.ops import knn_pallas as kp


def _difftime(run, *args):
    return _differential_time(run, *args) / ITERS


def main():
    B, N, K, F = 512, 150, 20, 32
    H = [96, 160, 192]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32) * 0.3)
    mask = jnp.asarray(
        (np.arange(N)[None, :] < rng.integers(1, N + 1, size=B)[:, None]).astype(
            np.float32
        )[..., None]
    )
    idx = jnp.asarray(rng.integers(0, N, size=(B, N, K)).astype(np.int32))

    sizes = [2 * F] + H
    ws = [
        jnp.asarray(rng.normal(size=(sizes[i], sizes[i + 1])).astype(np.float32) * 0.1)
        for i in range(len(H))
    ]
    bs = [jnp.asarray(rng.normal(size=(s,)).astype(np.float32) * 0.1) for s in H]
    weights_v1 = tuple(p for w, b in zip(ws, bs) for p in (w, b))

    # v2 operands: first layer decomposed
    u1 = x @ ws[0][:F]
    u2m = jnp.concatenate([x @ ws[0][F:] + bs[0], mask], axis=-1)
    weights_v2 = tuple(p for w, b in zip(ws[1:], bs[1:]) for p in (w, b))

    def timed(name, fn, *args):
        @jax.jit
        def run(n_iters, *a):
            def body(i, acc):
                # thread the carry into the first operand so XLA cannot
                # hoist the loop-invariant kernel call out of the loop
                out = fn(a[0] + acc * 0, *a[1:])
                return acc + jnp.sum(out) * 1e-9

            return jax.lax.fori_loop(0, n_iters, body, 0.0)

        ms = _difftime(run, *args) * 1e3
        print(f"{name:18s} {ms:7.3f} ms  (B={B} N={N} K={K})")
        return ms

    timed(
        "v1_full",
        lambda x, m, i: kp.knn_edge_aggregate(
            x, m, i, None, None, weights_v1, None, 0.2, True, 0.0
        ),
        x, mask, idx,
    )
    timed(
        "v2_full",
        lambda a, b, i: kp.knn_edge_aggregate_v2(
            a, b, i, None, None, weights_v2, None, 0.2, True, 0.0
        ),
        u1, u2m, idx,
    )
    timed(
        "v2_nohidden",
        lambda a, b, i: kp.knn_edge_aggregate_v2(
            a, b, i, None, None, (), None, 0.2, True, 0.0
        ),
        u1, u2m, idx,
    )
    timed(
        "v3_full",
        lambda a, b, i: kp.knn_edge_aggregate_v3(
            a, b, i, None, None, weights_v2, None, 0.2, True, 0.0
        ),
        u1, u2m, idx,
    )
    timed(
        "v3_nohidden",
        lambda a, b, i: kp.knn_edge_aggregate_v3(
            a, b, i, None, None, (), None, 0.2, True, 0.0
        ),
        u1, u2m, idx,
    )


if __name__ == "__main__":
    main()
