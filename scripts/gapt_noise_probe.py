#!/usr/bin/env python
"""Price the latent-noise draw in the GAPT generation line (round 5).

Context: the round-4 batch sweep measured the B=768-1536 plateau at
~1.33-1.42M jets/s with `bench_gapt`, but the end-of-round BENCH_r04
record (same function, same B=1024) shows 1.07M. Two hypotheses:

1. **process-order**: bench.py runs the GAPT line after six 150p/30p
   MPGAN experiments in the same process; the sweep ran it first in a
   fresh process. Compilation-cache state, HBM fragmentation or XLA
   autotuning could differ.
2. **noise draw**: `jax.random.normal` (threefry-2x32 + erfinv) on the
   [B, 30, 64] latent is serial VPU work in the same regime the GAPT
   *train* step's dropout hash finding exposed (1.55 ms = 33% of that
   step was threefry).

Variants (one per invocation — shared-tunnel discipline):
  production  — suite.noise.sample as benched (threefry normal)
  nonoise     — iota-derived constant latent (prices the draw by
                subtraction; the generator still consumes a fresh
                per-iteration tensor so nothing upstream is dead-coded)
  rbg         — same draw under jax's 'rbg' key impl (XLA
                RngBitGenerator — the TPU hardware-PRNG path probed for
                dropout in round 4)

Usage: python scripts/gapt_noise_probe.py {production|nonoise|rbg} [batch]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import ITERS, _differential_time


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "production"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from mpgan_tpu.models.registry import build_suite
    from mpgan_tpu.training.config import from_args_dict

    args = from_args_dict({"model": "gapt", "jets": "g", "num_hits": 30})
    suite = build_suite(args)
    params, state = suite.g_init(jax.random.PRNGKey(0), suite.g_cfg)
    labels = jnp.asarray(
        (np.random.default_rng(0).integers(1, 31, size=batch) / 30)[:, None].astype(np.float32)
    )
    shape = (batch,) + suite.noise.shape
    std = suite.noise.std

    @jax.jit
    def run(n_iters, params, state, key, labels):
        def body(i, acc):
            k = jax.random.fold_in(key, i)
            if variant == "nonoise":
                # fresh per-iteration tensor without an RNG draw: a scaled
                # iota shifted by the loop index (keeps the generator live)
                base = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
                noise = (base - 31.5) * (std / 18.0) + i * 1e-6
            else:
                noise = jax.random.normal(k, shape) * std
            out, _ = suite.g_apply(suite.g_cfg, params, state, noise, labels)
            return acc + jnp.sum(out) * 1e-9
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    key = jax.random.PRNGKey(1)
    if variant == "rbg":
        key = jax.random.key(1, impl="rbg")
    best = _differential_time(run, params, state, key, labels)
    rate = batch * ITERS / best
    print(f"gapt_noise_probe variant={variant} B={batch}: {rate:,.0f} jets/s")


if __name__ == "__main__":
    main()
