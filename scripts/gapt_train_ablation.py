#!/usr/bin/env python
"""GAPT train step: component ablation + the batched-D attack (VERDICT r4
item 2).

Round 4 measured `train_step_ms_30p_gapt_b512` = 4.66 ms (109.8k trained
jets/s, floor 1.64x) and claimed the wall is per-step serial structure (14
attention/FF launches x 2 nets x 2 steps of mostly-VPU work) — an argument,
not a measurement. This script prices the step's components on hardware:

  full_twopass     — the production step (D real/fake as 2 passes)
  full_batched     — ONE 2B-row [real | fake] D pass (StepConfig.batched_d;
                     legal: GAPT D has no batch/spectral norm, only the
                     dropout draw stream moves). Built as the round-5
                     structural attack, measured-REJECTED: 5.008 ms vs
                     4.707 two-pass — the doubled-row attention pass costs
                     more than the saved dispatches.
  d_only_twopass   — D update alone, two-pass
  d_only_batched   — D update alone, batched
  g_only           — G update alone
  fwd_only         — the 3 forwards of the D step without autodiff/optimizer
  nodropout        — full_batched with gen/disc dropout 0 (prices the
                     dropout mask draws + muls through fwd+bwd)
  sab1             — full_batched with sab_layers=1 in BOTH nets: the
                     per-SAB-layer marginal price; the intercept of the
                     layer line is the fixed cost (optimizer + loss + glue +
                     final FC/embed chains)

Timing: bench.py differential protocol (fori_loop, best-of-3, dispatch cost
cancelled). One experiment per invocation; never concurrently with pytest.
Reference semantics being priced: train.py:398-523 at the gapt defaults
(setup_training.py:551-617), B=512.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import ITERS, _differential_time
from mpgan_tpu.models.registry import build_suite
from mpgan_tpu.training.config import from_args_dict
from mpgan_tpu.training.optimizers import build_optimizer
from mpgan_tpu.training.train_step import StepConfig, init_train_state, make_train_steps

B, N = 512, 30


def _build(batched_d, sab_layers=2, dropout=None):
    over = {"model": "gapt", "model_D": "gapt", "jets": "g", "num_hits": N,
            "sab_layers_gen": sab_layers * 2, "sab_layers_disc": sab_layers}
    if dropout is not None:
        over["gen_dropout"] = dropout
        over["disc_dropout"] = dropout
    args = from_args_dict(over)
    suite = build_suite(args)
    g_opt = build_optimizer(args.optimizer, args.lr_gen)
    d_opt = build_optimizer(args.optimizer, args.lr_disc)
    state = init_train_state(
        jax.random.PRNGKey(0), suite.g_init, suite.d_init,
        suite.g_cfg, suite.d_cfg, g_opt, d_opt,
    )
    d_step, g_step = make_train_steps(
        step_cfg=StepConfig(loss=args.loss, batched_d=batched_d),
        g_apply=suite.g_apply, d_apply=suite.d_apply,
        g_cfg=suite.g_cfg, d_cfg=suite.d_cfg, spec=suite.noise,
        g_opt=g_opt, d_opt=d_opt,
    )
    return suite, state, d_step, g_step


def _data():
    rng = np.random.default_rng(0)
    counts = rng.integers(1, N + 1, size=B)
    mask = (np.arange(N)[None, :] < counts[:, None]).astype(np.float32)[..., None]
    data = jnp.asarray(
        np.concatenate(
            [np.tanh(rng.normal(size=(B, N, 3))).astype(np.float32) * mask, mask - 0.5],
            axis=2,
        )
    )
    labels = jnp.asarray((counts / N)[:, None].astype(np.float32))
    return data, labels


def timed(name, step_fn):
    data, labels = _data()

    @jax.jit
    def run(n_iters, state, data, labels):
        def body(i, st):
            return step_fn(st, data, labels)

        st = jax.lax.fori_loop(0, n_iters, body, state)
        # readback must depend on BOTH nets' params: a g-only sum lets XLA
        # dead-code-eliminate a d-only step entirely (measured 0.3 ms for a
        # "D update" before this fix)
        return jnp.sum(jax.tree.leaves(st.g_params)[0]) + jnp.sum(
            jax.tree.leaves(st.d_params)[0]
        )

    # state must be built before jit closes over shapes
    ms = None
    try:
        ms = _differential_time(run, run_state_init, data, labels) / ITERS * 1e3
    except Exception as e:  # noqa: BLE001
        print(f"{name:18s} FAILED: {e}", flush=True)
        return None
    print(f"{name:18s} {ms:7.3f} ms/step   ({B * 1e3 / ms:,.0f} trained jets/s)", flush=True)
    return ms


def main():
    global run_state_init
    results = {}

    variants = [
        ("full_twopass", False, 2, None, "both"),
        ("full_batched", True, 2, None, "both"),
        ("d_only_twopass", False, 2, None, "d"),
        ("d_only_batched", True, 2, None, "d"),
        ("g_only", True, 2, None, "g"),
        ("nodropout", True, 2, 0.0, "both"),
        ("sab1", True, 1, None, "both"),
        # two-pass family (the production step after the batched-D
        # measured-rejection): same component prices without the concat
        ("nodropout_tp", False, 2, 0.0, "both"),
        ("sab1_tp", False, 1, None, "both"),
    ]
    only = set(sys.argv[1:])  # rerun selected variants (tunnel-spike retries)
    for name, batched, sab, drop, which in variants:
        if only and name not in only:
            continue
        suite, state, d_step, g_step = _build(batched, sab_layers=sab, dropout=drop)
        run_state_init = state
        if which == "both":
            def step(st, d, l, d_step=d_step, g_step=g_step):
                st, _ = d_step(st, d, l)
                st, _ = g_step(st, d, l)
                return st
        elif which == "d":
            def step(st, d, l, d_step=d_step):
                st, _ = d_step(st, d, l)
                return st
        else:
            def step(st, d, l, g_step=g_step):
                st, _ = g_step(st, d, l)
                return st
        results[name] = timed(name, step)

    if only and "fwd_only" not in only:
        return
    # forwards-only price (no autodiff, no optimizer): 3 forwards of the
    # D step (D real, G fwd eval, D fake) at the production widths
    suite, state, _, _ = _build(True)
    data, labels = _data()

    @jax.jit
    def fwd_only(n_iters, gp, gs, dp, ds, key, data, labels):
        def body(i, acc):
            noise, _ = suite.noise.sample(jax.random.fold_in(key, i), B)
            fake, _ = suite.g_apply(suite.g_cfg, gp, gs, noise, labels)
            r1, _ = suite.d_apply(suite.d_cfg, dp, ds, data, labels,
                                  train=True, rng=jax.random.fold_in(key, 2 * i))
            r2, _ = suite.d_apply(suite.d_cfg, dp, ds, fake, labels,
                                  train=True, rng=jax.random.fold_in(key, 2 * i + 1))
            return acc + jnp.sum(r1) + jnp.sum(r2) + jnp.sum(fake) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    ms = _differential_time(
        fwd_only, state.g_params, state.g_state, state.d_params, state.d_state,
        jax.random.PRNGKey(3), data, labels,
    ) / ITERS * 1e3
    print(f"{'fwd_only(3 passes)':18s} {ms:7.3f} ms/step", flush=True)

    if results.get("full_twopass") and results.get("full_batched"):
        d = results["full_twopass"] - results["full_batched"]
        print(f"\nbatched-D saving: {d:+.3f} ms "
              f"({d / results['full_twopass'] * 100:+.1f}% of the two-pass step)")
    if results.get("full_batched") and results.get("sab1"):
        per_layer = results["full_batched"] - results["sab1"]
        print(f"per-SAB-layer marginal (both nets, fwd+bwd, both steps): "
              f"{per_layer:.3f} ms; fixed intercept ~ "
              f"{results['sab1'] - per_layer:.3f} ms")


if __name__ == "__main__":
    main()
