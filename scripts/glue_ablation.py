#!/usr/bin/env python
"""Ablation: the generation paths' non-kernel "glue" — noise sampling and
the mask_c rank — priced in isolation, plus the full generator before/after
each candidate.

Round-3 eighth-session context: dense-30p generation runs at ~66% of its
padded-MXU ceiling while dense-150p sits at ~84% (PERF.md); GAPT's whole
batch is ~5.5 ms at B=4096, so O(B*N) per-batch costs that hide at 150p are
a real slice at 30p. Two candidates:

- noise: `jax.random.normal` under the default threefry2x32 PRNG burns VPU
  on the bit generator; the `rbg` impl rides XLA's native RngBitGenerator
  (the TPU-accelerated path; fold_in/split still hash the 4-word key with
  threefry, which is per-batch, not per-element).
- mask_c: the reference's double argsort (mpgan/model.py:695-699) is two
  lane-shuffle-heavy sorts; the comparison-matrix rank (ops/masking.py) is
  one [B, N, N] elementwise compare + row sum.

Usage: python scripts/glue_ablation.py [n_particles batch]
(defaults 30 4096; run 150 512 for the flagship shape). One experiment per
invocation on the shared tunnel; never concurrently with pytest.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import ITERS, _differential_time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
F = 32


def timed(name, fn, *args):
    @jax.jit
    def run(n_iters, *a):
        def body(i, acc):
            out = fn(a[0] + acc * 0, *a[1:], i)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    for _ in range(3):
        try:
            ms = _differential_time(run, *args) / ITERS * 1e3
        except RuntimeError as e:
            print(f"{name:24s} retry ({e})", flush=True)
            continue
        print(f"{name:24s} {ms:7.3f} ms  (B={B} N={N})", flush=True)
        return ms
    print(f"{name:24s} SKIPPED (persistent link spikes)", flush=True)
    return float("nan")


def main():
    rng = np.random.default_rng(0)
    counts = rng.integers(1, N + 1, size=B)
    labels = jnp.asarray((counts / N)[:, None].astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32) * 0.2)
    zeros = jnp.zeros((1,))

    key_tf = jax.random.PRNGKey(1)
    key_rbg = jax.random.key(1, impl="rbg")

    # --- noise variants ------------------------------------------------------
    def noise_threefry(z, key, i):
        return jax.random.normal(jax.random.fold_in(key, i), (B, N, F)) * 0.2 + z[0] * 0

    timed("noise_threefry", noise_threefry, zeros, key_tf)

    def noise_rbg(z, key, i):
        return jax.random.normal(jax.random.fold_in(key, i), (B, N, F)) * 0.2 + z[0] * 0

    timed("noise_rbg", noise_rbg, zeros, key_rbg)

    def bits_rbg(z, key, i):
        k = jax.random.fold_in(key, i)
        return (
            jax.random.bits(k, (B, N, F), jnp.uint32).astype(jnp.float32) * 1e-12 + z[0] * 0
        )

    timed("bits_rbg", bits_rbg, zeros, key_rbg)

    def bits_threefry(z, key, i):
        k = jax.random.fold_in(key, i)
        return (
            jax.random.bits(k, (B, N, F), jnp.uint32).astype(jnp.float32) * 1e-12 + z[0] * 0
        )

    timed("bits_threefry", bits_threefry, zeros, key_tf)

    # --- mask_c variants -----------------------------------------------------
    njp = (labels[:, -1] * N).astype(jnp.int32) - 1

    def mask_argsort(z, i):
        x = z[:, :, 0]
        ranks = jnp.argsort(jnp.argsort(x, axis=1), axis=1)
        return (ranks <= njp[:, None])[..., None].astype(jnp.float32)

    timed("mask_c_double_argsort", mask_argsort, noise)

    def mask_cmp(z, i):
        from mpgan_tpu.ops.masking import mask_from_counts

        return mask_from_counts(z[:, :, 0], njp)

    timed("mask_c_compare_rank", mask_cmp, noise)

    # --- full generator, threefry vs rbg key ---------------------------------
    from mpgan_tpu.models.mpgan import mp_generator_apply, mp_generator_init
    from mpgan_tpu.training.config import build_mpgan_generator, from_args_dict

    args = from_args_dict({"model": "mpgan", "jets": "g", "num_hits": N, "use_pallas": True})
    g_cfg = build_mpgan_generator(args)
    params, state = mp_generator_init(jax.random.PRNGKey(0), g_cfg)

    def full_gen(z, params, key, i):
        nz = jax.random.normal(jax.random.fold_in(key, i), (B, N, F)) * 0.2
        out, _ = mp_generator_apply(g_cfg, params, state, nz + z[0] * 0, labels)
        return out

    ms_tf = timed("full_gen_threefry", full_gen, zeros, params, key_tf)
    ms_rbg = timed("full_gen_rbg", full_gen, zeros, params, key_rbg)
    print(
        f"\nfull gen: {B / ms_tf * 1e3:,.0f} jets/s (threefry) -> "
        f"{B / ms_rbg * 1e3:,.0f} jets/s (rbg key)",
        flush=True,
    )


if __name__ == "__main__":
    main()
