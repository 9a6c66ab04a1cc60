#!/usr/bin/env python
"""Ablation: where does GAPT generation time go? (mfu_30p_gapt = 0.011)

Times the full generator forward and its components in isolation at the
bench shape (B=4096, N=30, E=64, 4 heads, 4 SAB layers) with the same
differential single-dispatch protocol as bench.py. Candidate hypotheses:

  - the per-head attention einsums are 16k tiny [30, 16] x [16, 30]
    batched matmuls — MXU-hostile shapes (rows pad 30 -> 128?);
  - the projections are fine ([B*N, 64] x [64, 64] is big and dense);
  - softmax / mask plumbing on [B, 4, 30, 30] is VPU-bound.
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


def main():
    B, N, E, H = 4096, 30, 64, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, E)).astype(np.float32) * 0.2)
    w_in = jnp.asarray(rng.normal(size=(3 * E, E)).astype(np.float32) * 0.1)
    b_in = jnp.zeros((3 * E,), jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(E, E)).astype(np.float32) * 0.1)
    b_out = jnp.zeros((E,), jnp.float32)
    hd = E // H

    def proj_only(x):
        y = x @ w_in.T + b_in
        return y

    def attn_core(x):
        qkv = x @ w_in.T + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, H, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        return out.transpose(0, 2, 1, 3).reshape(B, N, E) @ w_out.T + b_out

    def attn_noproj(x):
        # einsums + softmax only, reusing x as q/k/v heads
        qh = x.reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, qh) / np.sqrt(hd)
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, qh)
        return out

    def make_run(fn):
        @jax.jit
        def run(n_iters, x):
            def body(i, acc):
                return acc + jnp.sum(fn(x + acc * 1e-20)) * 1e-9
            return jax.lax.fori_loop(0, n_iters, body, 0.0)
        return run

    from mpgan_tpu.models.registry import build_suite
    from mpgan_tpu.training.config import from_args_dict

    args = from_args_dict({"model": "gapt", "jets": "g", "num_hits": N})
    suite = build_suite(args)
    params, state = suite.g_init(jax.random.PRNGKey(0), suite.g_cfg)
    labels = jnp.asarray(
        (rng.integers(1, N + 1, size=B) / N)[:, None].astype(np.float32)
    )

    @jax.jit
    def run_full(n_iters, x, labels):
        def body(i, acc):
            noise, _ = suite.noise.sample(jax.random.fold_in(jax.random.PRNGKey(1), i), B)
            out, _ = suite.g_apply(suite.g_cfg, params, state, noise, labels)
            return acc + jnp.sum(out) * 1e-9
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    print(f"full GAPT gen fwd:     {_difftime(run_full, x, labels) * 1e3:7.3f} ms")
    for name, fn in [
        ("qkv proj only", proj_only),
        ("one full MHA (proj+attn)", attn_core),
        ("attn einsums+softmax only", attn_noproj),
    ]:
        print(f"{name:26s} {_difftime(make_run(fn), x) * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
