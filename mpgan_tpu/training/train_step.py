"""The GAN train step: D-update and G-update as pure jitted functions.

Re-derives the reference's ``train_D`` / ``train_G`` (train.py:398-523) as
functional updates over a ``TrainState``. Faithfulness notes (these shape GAN
dynamics and were verified against the torch implementation):

- During the D step the generator runs in eval mode (``G.eval()``,
  train.py:421) — dropout off — but spectral-norm power iteration still
  advances (the torch SpectralNorm updates buffers on *every* forward,
  spectral_normalization.py:62-64), so the G state is threaded and returned.
- During the G step the discriminator stays in train mode (the reference
  never calls ``D.eval()`` in ``train_G``), so D dropout is active, and D's
  spectral-norm state advances.
- With augmentation enabled, the reference computes the D real output on
  *unaugmented* data and only augments for the fake pass and the gradient
  penalty (train.py:425-447) — reproduced as-is.
- The WGAN-GP penalty differentiates through a third D forward on
  interpolated samples (train.py:286-324); grad-of-grad is native under jit.

Batch size and the use of labels are static; the host loop
(mpgan_tpu/training/loop.py) handles the ``num_critic``/``num_gen``
interleave (train.py:841-878).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax

import optax

from ..ops.augment import AugmentConfig, augment
from ..ops.mp import skip_weight_grads
from .losses import d_loss, g_loss, gradient_penalty
from .sampling import NoiseSpec


class TrainState(NamedTuple):
    g_params: Any
    g_state: Any
    d_params: Any
    d_state: Any
    g_opt_state: Any
    d_opt_state: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class StepConfig:
    loss: str = "ls"
    gp_lambda: float = 0.0
    label_smoothing: bool = False
    label_noise: float = 0.0
    augment: AugmentConfig | None = None
    aug_prob: float = 1.0
    # bf16 mixed-precision training (opt-in, fresh trainings only): f32
    # master params/opt-state, with params/state/data/noise cast to bf16
    # around the G/D applies — matmuls hit the MXU in one bf16 pass and the
    # activation traffic (the HBM-bandwidth bottleneck at N=150) halves.
    # Loss math and optimizer updates stay f32. Imported-weight *evaluation*
    # keeps its f32 parity contract — this flag touches training only.
    bf16: bool = False
    # Run the D step's real and fake passes as ONE concatenated 2B-row
    # forward (and, under autodiff, one backward) instead of two serial
    # passes (train.py:425-447 runs them serially because torch is eager;
    # there is no semantic reason to at fixed batch statistics). LEGAL ONLY
    # when D's per-sample output is batch-independent and stateless across
    # passes: no batch norm (batch stats would mix real/fake) and no
    # spectral norm (the power iteration would advance once per D step
    # instead of twice). Dropout draws change stream (one rng covers the
    # 2B rows) — statistically identical, not replayable against the
    # two-pass schedule. Halves the serial D-chain launch count: built for
    # GAPT, whose train step is launch-bound (PERF.md round 4). MEASURED-
    # REJECTED as the production default (round 5): 4.707 ms two-pass vs
    # 5.008 ms batched at the GAPT B=512 bench config — the doubled-row
    # attention pass costs more than the saved dispatches (scripts/
    # gapt_train_ablation.py). Kept opt-in as runnable rejection evidence.
    batched_d: bool = False


def _cast_floats(tree: Any, dtype) -> Any:
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jax.numpy.issubdtype(x.dtype, jax.numpy.floating)
        else x,
        tree,
    )


def init_train_state(
    rng: jax.Array,
    g_init: Callable,
    d_init: Callable,
    g_cfg: Any,
    d_cfg: Any,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
) -> TrainState:
    kg, kd, krest = jax.random.split(rng, 3)
    g_params, g_state = g_init(kg, g_cfg)
    d_params, d_state = d_init(kd, d_cfg)
    return TrainState(
        g_params=g_params,
        g_state=g_state,
        d_params=d_params,
        d_state=d_state,
        g_opt_state=g_opt.init(g_params),
        d_opt_state=d_opt.init(d_params),
        rng=krest,
    )


def make_train_steps(
    *,
    step_cfg: StepConfig,
    g_apply: Callable,
    d_apply: Callable,
    g_cfg: Any,
    d_cfg: Any,
    spec: NoiseSpec,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    use_labels: bool = True,
    encode_real: Callable[[jax.Array], jax.Array] | None = None,
    post_gen: Callable[[jax.Array], jax.Array] | None = None,
    pmean_axis: str | None = None,
) -> tuple[Callable, Callable]:
    """Build ``(d_step, g_step)`` pure functions.

    ``d_step(state, data, labels?) -> (state, metrics)``
    ``g_step(state, data, labels?) -> (state, metrics)`` (data only sets the
    run batch size, matching train.py:497).

    ``encode_real`` optionally maps real clouds into the training
    representation before D sees them (PCGAN's pre-trained ``G_inv`` latent
    encoding, train.py:837-839); ``post_gen`` applies post-generation hooks
    to G's output (mask_manual pT cutoff, train.py:208-210).

    ``pmean_axis``: set when the step runs under ``shard_map`` over a data
    mesh axis — gradients and metrics are ``pmean``-ed over the axis
    (data-parallel SGD) and per-shard RNG keys are decorrelated by folding
    in the axis index.
    """
    aug_cfg = step_cfg.augment if (step_cfg.augment and step_cfg.augment.any) else None

    if step_cfg.bf16:
        # mixed precision: cast params/state/inputs to bf16 around each
        # apply; outputs and returned model state come back f32 so the loss
        # math, optimizer updates and the TrainState pytree stay f32 master.
        # The cast is differentiable, so grads land on the f32 params.
        bf16, f32 = jax.numpy.bfloat16, jax.numpy.float32
        _g_apply_raw, _d_apply_raw = g_apply, d_apply

        def g_apply(cfg, params, state, noise, labels, **kw):  # noqa: F811
            out, new_state = _g_apply_raw(
                cfg, _cast_floats(params, bf16), _cast_floats(state, bf16),
                _cast_floats(noise, bf16), labels, **kw
            )
            return out.astype(f32), _cast_floats(new_state, f32)

        def d_apply(cfg, params, state, data, labels, **kw):  # noqa: F811
            out, new_state = _d_apply_raw(
                cfg, _cast_floats(params, bf16), _cast_floats(state, bf16),
                _cast_floats(data, bf16), labels, **kw
            )
            return out.astype(f32), _cast_floats(new_state, f32)

    def _maybe_aug(rng, x):
        if aug_cfg is None:
            return x
        return augment(aug_cfg, rng, x, step_cfg.aug_prob)

    def _localize(keys):
        if pmean_axis is None:
            return keys
        ai = jax.lax.axis_index(pmean_axis)
        return [jax.random.fold_in(key, ai) for key in keys]

    def d_step(state: TrainState, data: jax.Array, labels: jax.Array | None = None):
        rng, *keys = jax.random.split(state.rng, 9)
        k_noise, k_real, k_fake, k_gp_drop, k_gp, k_tgt, k_aug_r, k_aug_f = _localize(keys)
        batch_size = data.shape[0]
        if encode_real is not None:
            data = encode_real(data)

        noise, _ = spec.sample(k_noise, batch_size, data.dtype)

        def loss_fn(d_params):
            # fresh fake batch; G in eval mode, SN advancing (train.py:421,428)
            fake, g_state1 = g_apply(
                g_cfg, state.g_params, state.g_state, noise, labels, train=False
            )
            if post_gen is not None:
                fake = post_gen(fake)
            data_aug = _maybe_aug(k_aug_r, data)
            fake_aug = _maybe_aug(k_aug_f, fake)
            if step_cfg.batched_d:
                # one 2B-row pass over [real | fake] (see StepConfig.batched_d
                # for the legality conditions; real rows stay unaugmented,
                # train.py:425)
                both = jax.numpy.concatenate([data, fake_aug], axis=0)
                labels2 = (
                    None if labels is None
                    else jax.numpy.concatenate([labels, labels], axis=0)
                )
                out, d_state2 = d_apply(
                    d_cfg, d_params, state.d_state, both, labels2,
                    train=True, rng=k_real,
                )
                real_out, fake_out = out[:batch_size], out[batch_size:]
            else:
                # real pass on unaugmented data (train.py:425)
                real_out, d_state1 = d_apply(
                    d_cfg, d_params, state.d_state, data, labels, train=True, rng=k_real
                )
                fake_out, d_state2 = d_apply(
                    d_cfg, d_params, d_state1, fake_aug, labels, train=True, rng=k_fake
                )
            total, parts = d_loss(
                step_cfg.loss,
                real_out,
                fake_out,
                rng=k_tgt,
                label_smoothing=step_cfg.label_smoothing,
                label_noise=step_cfg.label_noise,
            )
            if step_cfg.gp_lambda:
                gp = gradient_penalty(
                    lambda x: d_apply(
                        d_cfg, d_params, d_state2, x, labels, train=True, rng=k_gp_drop
                    )[0],
                    k_gp,
                    data_aug,
                    fake_aug,
                    step_cfg.gp_lambda,
                )
                parts = dict(parts, gp=gp)
                total = total + gp
            return total, (parts, d_state2, g_state1)

        grads, (parts, d_state, g_state) = jax.grad(loss_fn, has_aux=True)(state.d_params)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            parts = jax.lax.pmean(parts, pmean_axis)
            d_state = jax.lax.pmean(d_state, pmean_axis)
            g_state = jax.lax.pmean(g_state, pmean_axis)
        updates, d_opt_state = d_opt.update(grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        new_state = state._replace(
            d_params=d_params,
            d_state=d_state,
            g_state=g_state,
            d_opt_state=d_opt_state,
            rng=rng,
        )
        return new_state, parts

    def g_step(state: TrainState, data: jax.Array, labels: jax.Array | None = None):
        rng, *keys = jax.random.split(state.rng, 5)
        k_noise, k_g, k_d, k_aug = _localize(keys)
        batch_size = labels.shape[0] if labels is not None else data.shape[0]
        noise, _ = spec.sample(k_noise, batch_size, data.dtype)

        def loss_fn(g_params):
            fake, g_state1 = g_apply(
                g_cfg, g_params, state.g_state, noise, labels, train=True, rng=k_g
            )
            if post_gen is not None:
                fake = post_gen(fake)
            fake = _maybe_aug(k_aug, fake)
            # D stays in train mode during the G step (no D.eval() in train_G).
            # Only D's INPUT gradient is consumed here (grads are w.r.t.
            # g_params); the trace-time hint lets fused MP kernels skip the
            # weight-cotangent contractions XLA cannot DCE out of them.
            with skip_weight_grads():
                fake_out, d_state1 = d_apply(
                    d_cfg, state.d_params, state.d_state, fake, labels,
                    train=True, rng=k_d,
                )
            return g_loss(step_cfg.loss, fake_out), (g_state1, d_state1)

        (loss_val, (g_state, d_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params
        )
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            loss_val = jax.lax.pmean(loss_val, pmean_axis)
            g_state = jax.lax.pmean(g_state, pmean_axis)
            d_state = jax.lax.pmean(d_state, pmean_axis)
        updates, g_opt_state = g_opt.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        new_state = state._replace(
            g_params=g_params,
            g_state=g_state,
            d_state=d_state,
            g_opt_state=g_opt_state,
            rng=rng,
        )
        return new_state, {"G": loss_val}

    if not use_labels:
        _d_step, _g_step = d_step, g_step

        def d_step(state, data):  # noqa: F811
            return _d_step(state, data, None)

        def g_step(state, data):  # noqa: F811
            return _g_step(state, data, None)

    return d_step, g_step
