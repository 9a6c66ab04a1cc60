#!/usr/bin/env python
"""Ablation: knn-150p generation's non-kernel residual.

Eighth-session accounting: full knn-20 generation at B=512 is ~13.0 ms
(39.5k jets/s) while the priced parts are 2 x 3.62 ms gather kernels +
2 x ~0.7 ms select kernels = ~8.6 ms — leaving ~4.4 ms (33%) of residual.
Suspects, priced here in isolation:

  full_gen          — the production knn generator apply (bench line)
  full_gen_nopd     — same with pos_diffs=0 (drops the dists gather + w_d)
  dists_gather      — the exact-reference dists path alone
                      (take_along_axis + norm, mp.py knn path)
  dists_onehot      — same values via one-hot matmul gather
  select            — the Pallas knn_select kernel alone
  fn_mlp            — one node MLP [B,N,192+32+..] -> 256 -> 256 -> 32

One experiment per invocation on the shared tunnel; never concurrently
with pytest.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import ITERS, _differential_time

B, N, K, F = 512, 150, 20, 32


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
            print(f"{name:18s} retry ({e})", flush=True)
            continue
        print(f"{name:18s} {ms:7.3f} ms  (B={B} N={N} k={K})", flush=True)
        return ms
    print(f"{name:18s} SKIPPED (persistent link spikes)", flush=True)
    return float("nan")


def main():
    from mpgan_tpu.models.mpgan import mp_generator_apply, mp_generator_init
    from mpgan_tpu.ops.knn_pallas import knn_select
    from mpgan_tpu.training.config import build_mpgan_generator, from_args_dict

    rng = np.random.default_rng(0)
    counts = rng.integers(1, N + 1, size=B)
    labels = jnp.asarray((counts / N)[:, None].astype(np.float32))
    zeros = jnp.zeros((1,))
    key = jax.random.PRNGKey(1)

    base = {
        "model": "mpgan", "jets": "g", "num_hits": N, "use_pallas": True,
        "fully_connected": False, "num_knn": K,
    }

    for name, extra in [
        ("full_gen", {}),
        ("full_gen_nopd", {"pos_diffs": False}),
        ("full_gen_pd", {"pos_diffs": True}),
    ]:
        args = from_args_dict({**base, **extra})
        g_cfg = build_mpgan_generator(args)
        params, state = mp_generator_init(jax.random.PRNGKey(0), g_cfg)

        def full(z, params, i, _cfg=g_cfg, _state=state):
            nz = jax.random.normal(jax.random.fold_in(key, i), (B, N, F)) * 0.2
            out, _ = mp_generator_apply(_cfg, params, _state, nz + z[0] * 0, labels)
            return out

        timed(name, full, zeros, params)

    # the dists path in isolation (mp.py knn branch: select -> gather -> norm)
    x = jnp.asarray(np.tanh(rng.normal(size=(B, N, 3))).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(N)[None, :] < counts[:, None]).astype(np.float32)[..., None]
    )
    x_far = ((1 - 1e4) * mask + 1e4) * x
    idx = knn_select(x, x_far, K, False)
    idx = jax.block_until_ready(idx)

    def dists_gather(z, idx, i):
        flat = idx.reshape(B, N * K)
        x2g = jnp.take_along_axis(x_far + z[0] * 0, flat[..., None], axis=1).reshape(
            B, N, K, -1
        )
        diffs = x2g - x[:, :, None, :]
        return jnp.linalg.norm(diffs + 1e-12, axis=-1)

    timed("dists_gather", dists_gather, zeros, idx)

    def dists_onehot(z, idx, i):
        onehot = (idx[..., None] == jnp.arange(N)[None, None, None, :]).astype(x.dtype)
        x2g = jnp.einsum("bnkj,bjc->bnkc", onehot, x_far + z[0] * 0)
        diffs = x2g - x[:, :, None, :]
        return jnp.linalg.norm(diffs + 1e-12, axis=-1)

    timed("dists_onehot", dists_onehot, zeros, idx)

    def select_only(z, i):
        return knn_select(x + z[0] * 0, x_far + z[0] * 0, K, False)

    timed("select", select_only, zeros)

    # node MLP at the knn config's width
    h = jnp.asarray(rng.normal(size=(B, N, 192 + F + 1)).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.normal(size=(192 + F + 1, 256)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32) * 0.05)
    w3 = jnp.asarray(rng.normal(size=(256, F)).astype(np.float32) * 0.05)

    def fn_mlp(z, i):
        a = h + z[0] * 0
        a = jnp.maximum(a @ w1, 0.2 * (a @ w1))
        a = jnp.maximum(a @ w2, 0.2 * (a @ w2))
        return a @ w3

    timed("fn_mlp", fn_mlp, zeros)


if __name__ == "__main__":
    main()
