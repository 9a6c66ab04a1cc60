#!/usr/bin/env python
"""Dense-150p train step: component ablation for the speed-of-light account.

VERDICT r3 item 3: the dense-150p train step (138.7 ms at B=128 after the
round-3 dropout-hash work) had no ceiling analysis. The padded-FLOP model
(PERF.md round 4 "Training speed of light") counts 16 forward-equivalents of
the fe edge chain per D+G step:

  D-step:  G fwd (no grad) + D(real) fwd + D(fake) fwd
           + 2 backwards at 3x (recompute + dz-chain + wgrads)   = 3 + 6
  G-step:  G fwd + D fwd + D backward at 2x (wgrads skipped)
           + G backward at 3x                                    = 2 + 5

This script measures where the wall clock goes against that model:

  d_step / g_step      — the two halves separately (model: 9 vs 7 units)
  dropout0             — full step with disc_dropout=0 (hash + mask-mul cost)
  fwd_only             — 5 forwards, no grad (model: 5 units)

Differential single-dispatch timing (bench.py protocol); one experiment per
invocation; never run concurrently with pytest.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import ITERS, _differential_time


def _setup(num_particles=150, batch=128, disc_dropout=None):
    from mpgan_tpu.models.mpgan import (
        mp_discriminator_apply,
        mp_discriminator_init,
        mp_generator_apply,
        mp_generator_init,
    )
    from mpgan_tpu.training.config import (
        build_mpgan_discriminator,
        build_mpgan_generator,
        from_args_dict,
    )
    from mpgan_tpu.training.optimizers import build_optimizer
    from mpgan_tpu.training.sampling import NoiseSpec
    from mpgan_tpu.training.train_step import StepConfig, init_train_state, make_train_steps

    overrides = {"model": "mpgan", "jets": "g", "num_hits": num_particles, "use_pallas": True}
    if disc_dropout is not None:
        overrides["disc_dropout"] = disc_dropout
    args = from_args_dict(overrides)
    g_cfg = build_mpgan_generator(args)
    d_cfg = build_mpgan_discriminator(args)
    spec = NoiseSpec((num_particles, 32), 0.2)
    g_opt = build_optimizer("rmsprop", args.lr_gen)
    d_opt = build_optimizer("rmsprop", args.lr_disc)
    state = init_train_state(
        jax.random.PRNGKey(0), mp_generator_init, mp_discriminator_init,
        g_cfg, d_cfg, g_opt, d_opt,
    )
    d_step, g_step = make_train_steps(
        step_cfg=StepConfig(loss="ls"),
        g_apply=mp_generator_apply, d_apply=mp_discriminator_apply,
        g_cfg=g_cfg, d_cfg=d_cfg, spec=spec, g_opt=g_opt, d_opt=d_opt,
    )
    rng = np.random.default_rng(0)
    counts = rng.integers(1, num_particles + 1, size=batch)
    mask = (np.arange(num_particles)[None, :] < counts[:, None]).astype(np.float32)[..., None]
    data = jnp.asarray(
        np.concatenate(
            [np.tanh(rng.normal(size=(batch, num_particles, 3))).astype(np.float32) * mask,
             mask - 0.5], axis=2,
        )
    )
    labels = jnp.asarray((counts / num_particles)[:, None].astype(np.float32))
    suite = dict(
        g_cfg=g_cfg, d_cfg=d_cfg, spec=spec,
        g_apply=mp_generator_apply, d_apply=mp_discriminator_apply,
    )
    return state, d_step, g_step, data, labels, suite


def _time_steps(state, steps, data, labels):
    @jax.jit
    def run(n_iters, state, data, labels):
        def body(i, st):
            for s in steps:
                st, _ = s(st, data, labels)
            return st
        st = jax.lax.fori_loop(0, n_iters, body, state)
        # read back BOTH nets: a d_step-only loop leaves g_params untouched
        # and a g-only readback would let XLA DCE the whole loop (measured:
        # 0.03 ms "d_step")
        return jnp.sum(st.g_params["mp_layers"][0]["fe"]["layers"][0]["w"]) + jnp.sum(
            st.d_params["mp_layers"][0]["fe"]["layers"][0]["w"]
        )

    return _differential_time(run, state, data, labels) / ITERS * 1e3


def _time_fwd_only(state, data, labels, suite, batch):
    """The 5 forwards of one train step, no autodiff: G eval + D real +
    D fake + G train + D train."""
    g_cfg, d_cfg, spec = suite["g_cfg"], suite["d_cfg"], suite["spec"]
    g_apply, d_apply = suite["g_apply"], suite["d_apply"]

    @jax.jit
    def run(n_iters, state, data, labels):
        def body(i, acc):
            key = jax.random.fold_in(jax.random.PRNGKey(7), i)
            ks = jax.random.split(key, 5)
            noise, _ = spec.sample(ks[0], batch)
            fake_e, _ = g_apply(g_cfg, state.g_params, state.g_state, noise, labels,
                                train=False)
            ro, _ = d_apply(d_cfg, state.d_params, state.d_state, data, labels,
                            train=True, rng=ks[1])
            fo, _ = d_apply(d_cfg, state.d_params, state.d_state, fake_e, labels,
                            train=True, rng=ks[2])
            fake_t, _ = g_apply(g_cfg, state.g_params, state.g_state, noise, labels,
                                train=True, rng=ks[3])
            fo2, _ = d_apply(d_cfg, state.d_params, state.d_state, fake_t, labels,
                             train=True, rng=ks[4])
            return acc + jnp.sum(ro) + jnp.sum(fo) + jnp.sum(fo2) + jnp.sum(fake_t) * 0.0
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    return _differential_time(run, state, data, labels) / ITERS * 1e3


def main() -> None:
    batch = 128
    state, d_step, g_step, data, labels, suite = _setup(batch=batch)
    full = _time_steps(state, [d_step, g_step], data, labels)
    print(f"full D+G step:        {full:8.2f} ms  ({batch * 1e3 / full:,.0f} jets/s)")
    d_only = _time_steps(state, [d_step], data, labels)
    print(f"d_step only:          {d_only:8.2f} ms  (model 9/16 = {full * 9 / 16:.2f})")
    g_only = _time_steps(state, [g_step], data, labels)
    print(f"g_step only:          {g_only:8.2f} ms  (model 7/16 = {full * 7 / 16:.2f})")
    fwd = _time_fwd_only(state, data, labels, suite, batch)
    print(f"5 forwards, no grad:  {fwd:8.2f} ms  (model 5/16 = {full * 5 / 16:.2f})")

    state0, d0, g0, data0, labels0, _ = _setup(batch=batch, disc_dropout=0.0)
    drop0 = _time_steps(state0, [d0, g0], data0, labels0)
    print(f"full step, dropout 0: {drop0:8.2f} ms  (hash+mask cost {full - drop0:+.2f})")


if __name__ == "__main__":
    main()
