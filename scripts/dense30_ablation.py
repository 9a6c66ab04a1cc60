#!/usr/bin/env python
"""Ablation: where does 30-particle dense generation spend its time?

Round-3 seventh-session context: 30p generation runs at 344k jets/s =
MFU 0.317 — about 66% of the padded-MXU ceiling (~521k jets/s once the fn
MLP and first-layer embeddings are added to the 354 MFLOP/jet edge chain),
while dense-150p sits at ~84% padded duty. This script prices every
component of the 30p forward path in isolation at the bench config
(B=4096, N=30, fe=[96,160,192], fn=[256,256], hidden_node_size=32) to find
the missing ~34%:

  full_gen          — the production generator apply (bench line)
  noise             — jax.random.normal [B,30,32] alone
  mask_c            — counts_from_labels + double-argsort mask
  u_embed           — the four first-layer [B,N,32]->[B,N,96] matmuls
  kernel_l1/l2      — the fused edge kernels with prebuilt u1/u2
  kernel_l1_nohid   — same with the hidden chain deleted (epilogue price;
                      output width drops 192->96, so it UNDERprices the
                      mask-multiply + reduce slightly)
  kernel_l1_drop    — kernel_l1 with in-kernel dropout 0.5 (train-mode
                      D-pass hash price, forward only)
  fn_l1/l2          — the node MLPs [B,N,224]->256->256->{32,3}
  tanh_concat       — final activation + mask concat

Differential single-dispatch timing (bench.py protocol). One experiment per
invocation on the shared tunnel; run AFTER any bench, never concurrently
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
from mpgan_tpu.models.mpgan import mp_generator_apply, mp_generator_init
from mpgan_tpu.ops.masking import counts_from_labels, mask_from_counts
from mpgan_tpu.ops.mp_pallas import edge_aggregate
from mpgan_tpu.training.config import build_mpgan_generator, from_args_dict

B, N, F = 4096, 30, 32
H = [96, 160, 192]
FN = [256, 256]


def _difftime(run, *args):
    return _differential_time(run, *args) / ITERS


def timed(name, fn, *args):
    @jax.jit
    def run(n_iters, *a):
        def body(i, acc):
            # thread the carry into the first operand so XLA cannot hoist
            # the loop-invariant call out of the loop
            out = fn(a[0] + acc * 0, *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    # tiny ops are noise-prone on the shared tunnel; retry link spikes
    for attempt in range(3):
        try:
            ms = _difftime(run, *args) * 1e3
        except RuntimeError as e:
            print(f"{name:18s} retry ({e})", flush=True)
            continue
        print(f"{name:18s} {ms:7.3f} ms  (B={B} N={N})", flush=True)
        return ms
    print(f"{name:18s} SKIPPED (persistent link spikes)", flush=True)
    return float("nan")


def main():
    rng = np.random.default_rng(0)
    counts = rng.integers(1, N + 1, size=B)
    labels = jnp.asarray((counts / N)[:, None].astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32) * 0.2)
    mask = jnp.asarray(
        (np.arange(N)[None, :] < counts[:, None]).astype(np.float32)[..., None]
    )

    # --- full generator (bench protocol, noise regenerated per iter) -------
    args = from_args_dict({"model": "mpgan", "jets": "g", "num_hits": N, "use_pallas": True})
    g_cfg = build_mpgan_generator(args)
    params, state = mp_generator_init(jax.random.PRNGKey(0), g_cfg)

    @jax.jit
    def run_full(n_iters, params, state, key, labels):
        def body(i, acc):
            z = jax.random.normal(jax.random.fold_in(key, i), (B, N, F)) * 0.2
            out, _ = mp_generator_apply(g_cfg, params, state, z, labels)
            return acc + jnp.sum(out) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    full_ms = _difftime(run_full, params, state, jax.random.PRNGKey(1), labels) * 1e3
    print(f"{'full_gen':18s} {full_ms:7.3f} ms  (B={B} N={N})", flush=True)

    # --- noise ---------------------------------------------------------------
    def noise_only(key_seed):
        return jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(1), key_seed[0].astype(jnp.int32)),
            (B, N, F),
        ) * 0.2

    timed("noise", noise_only, jnp.zeros((1,)))

    # --- mask_c (double argsort rank) ---------------------------------------
    def mask_c(z, labels):
        njp = counts_from_labels(labels, N)
        return mask_from_counts(z[:, :, 0], njp)

    timed("mask_c", mask_c, noise, labels)

    # --- first-layer embeddings (per MP layer: two [B,N,32]x[32,96]) --------
    w_r = jnp.asarray(rng.normal(size=(F, H[0])).astype(np.float32) * 0.1)
    w_s = jnp.asarray(rng.normal(size=(F, H[0])).astype(np.float32) * 0.1)

    def u_embed(x):
        return (x @ w_r) + (x @ w_s)

    timed("u_embed_l1", u_embed, noise)

    # --- the fused edge kernel, prebuilt u1/u2 ------------------------------
    u1 = noise @ w_r
    u2 = noise @ w_s
    w2 = jnp.asarray(rng.normal(size=(H[0], H[1])).astype(np.float32) * 0.1)
    b2 = jnp.zeros((H[1],), jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(H[1], H[2])).astype(np.float32) * 0.1)
    b3 = jnp.zeros((H[2],), jnp.float32)
    hidden = (w2, b2, w3, b3)

    def kern(u1, u2, mask):
        return edge_aggregate(u1, u2, mask, hidden, None, 0.2, True, 32, 0.0, True)

    timed("kernel_l1", kern, u1, u2, mask)

    def kern_nohid(u1, u2, mask):
        return edge_aggregate(u1, u2, mask, (), None, 0.2, True, 32, 0.0, True)

    timed("kernel_l1_nohid", kern_nohid, u1, u2, mask)

    seed = jnp.asarray(7.0, jnp.float32)

    def kern_drop(u1, u2, mask):
        return edge_aggregate(u1, u2, mask, hidden, seed, 0.2, True, 32, 0.5, True)

    timed("kernel_l1_drop", kern_drop, u1, u2, mask)

    # --- fn MLP ([B,N,224] -> 256 -> 256 -> out) -----------------------------
    agg_x = jnp.asarray(rng.normal(size=(B, N, H[2] + F)).astype(np.float32) * 0.3)
    wf1 = jnp.asarray(rng.normal(size=(H[2] + F, FN[0])).astype(np.float32) * 0.1)
    wf2 = jnp.asarray(rng.normal(size=(FN[0], FN[1])).astype(np.float32) * 0.1)
    wf3_l1 = jnp.asarray(rng.normal(size=(FN[1], F)).astype(np.float32) * 0.1)
    wf3_l2 = jnp.asarray(rng.normal(size=(FN[1], 3)).astype(np.float32) * 0.1)

    def fn_mlp(h, w_out):
        a = jnp.maximum(h @ wf1, 0.2 * (h @ wf1))
        a = jnp.maximum(a @ wf2, 0.2 * (a @ wf2))
        return a @ w_out

    timed("fn_l1", fn_mlp, agg_x, wf3_l1)
    timed("fn_l2", fn_mlp, agg_x, wf3_l2)

    # --- final tanh + mask concat -------------------------------------------
    out3 = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    def tail(y, mask):
        return jnp.concatenate([jnp.tanh(y), mask - 0.5], axis=2)

    timed("tanh_concat", tail, out3, mask)

    print(
        "\naccounting: full_gen vs 2*(u_embed + kernel + fn) + noise + mask_c"
        " + tanh_concat; the residual is XLA glue (concat into fn input,"
        " sum-check) and under-priced widths (fn_l1 out 32 vs 3).",
        flush=True,
    )


if __name__ == "__main__":
    main()
