#!/usr/bin/env python
"""Ablation: where does the knn-20 generator's neighbour-search time go?

PERF.md round 2 attributed ~4 ms of the 18.6 ms knn-20 generation step
(B=512, N=150) to `lax.approx_max_k` + pairwise distances. This script
times the search in isolation and races three candidate implementations:

  a) current: broadcast diffs -> norm -> approx_max_k(recall=1.0)
  b) matmul distances (|x1|^2 + |x2|^2 - 2 x1.x2^T via MXU) -> approx_max_k
  c) matmul distances -> lax.top_k
  d) matmul distances -> in-kernel iterative k-min (VPU argmin x k)  [if worth it]

Differential single-dispatch timing (same protocol as bench.py). One
experiment per invocation on the shared tunnel; run AFTER any bench.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# reuse bench.py's differential single-dispatch timing protocol so these
# numbers stay comparable with the recorded bench artifacts
import pathlib
import sys  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from bench import ITERS, _differential_time


def _difftime(run, *args):
    return _differential_time(run, *args) / ITERS


def dists_bcast(x, x_far, c):
    diffs = x_far[:, None, :, :c] - x[:, :, None, :c]
    return jnp.linalg.norm(diffs + 1e-12, axis=-1)


def dists_matmul(x, x_far, c):
    a, b = x[..., :c], x_far[..., :c]
    sq_a = jnp.sum(a * a, axis=-1)  # [B, N]
    sq_b = jnp.sum(b * b, axis=-1)
    cross = jnp.einsum("bic,bjc->bij", a, b)
    d2 = sq_a[:, :, None] + sq_b[:, None, :] - 2.0 * cross
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def main():
    B, N, K, C = 512, 150, 21, int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    counts = rng.integers(1, N + 1, size=B)
    mask = jnp.asarray(
        (np.arange(N)[None, :] < counts[:, None]).astype(np.float32)[..., None]
    )
    x_far = ((1 - 1e4) * mask + 1e4) * x

    def close(v):
        return jnp.sum(v[0].astype(jnp.float32) * 1e-6) + jnp.sum(v[1][..., -1])

    @jax.jit
    def run_a(n_iters, x, x_far):
        def body(i, acc):
            d = dists_bcast(x + acc * 0, x_far, C)
            nt, order = jax.lax.approx_max_k(-d, K, recall_target=1.0, aggregate_to_topk=True)
            return acc + close((order, nt)) * 1e-9
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    @jax.jit
    def run_b(n_iters, x, x_far):
        def body(i, acc):
            d = dists_matmul(x + acc * 0, x_far, C)
            nt, order = jax.lax.approx_max_k(-d, K, recall_target=1.0, aggregate_to_topk=True)
            return acc + close((order, nt)) * 1e-9
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    @jax.jit
    def run_c(n_iters, x, x_far):
        def body(i, acc):
            d = dists_matmul(x + acc * 0, x_far, C)
            nt, order = jax.lax.top_k(-d, K)
            return acc + close((order, nt)) * 1e-9
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    @jax.jit
    def run_dist_only(n_iters, x, x_far):
        def body(i, acc):
            d = dists_bcast(x + acc * 0, x_far, C)
            return acc + jnp.sum(d[:, 0, :]) * 1e-9
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    @jax.jit
    def run_dist_only_mm(n_iters, x, x_far):
        def body(i, acc):
            d = dists_matmul(x + acc * 0, x_far, C)
            return acc + jnp.sum(d[:, 0, :]) * 1e-9
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    for name, fn in [
        ("a_bcast+approx_max_k", run_a),
        ("b_matmul+approx_max_k", run_b),
        ("c_matmul+top_k", run_c),
        ("dist_bcast_only", run_dist_only),
        ("dist_matmul_only", run_dist_only_mm),
    ]:
        ms = _difftime(fn, x, x_far) * 1e3
        print(f"{name:24s} {ms:7.3f} ms  (B={B} N={N} K={K} C={C})")


if __name__ == "__main__":
    main()
