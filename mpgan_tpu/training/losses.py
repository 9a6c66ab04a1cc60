"""GAN loss functions: og (BCE) / ls (MSE, default) / w / hinge, with optional
label smoothing, label flipping and WGAN-GP gradient penalty
(train.py:286-476).

All functions are pure and jit-friendly; the gradient penalty differentiates
through the discriminator w.r.t. its *inputs* (double backward under jit).

One reference quirk is deliberately not reproduced: with label smoothing the
reference draws targets of shape ``[B]`` against outputs of shape ``[B, 1]``
(train.py:354-358), which silently broadcasts to ``[B, B]`` inside
``MSELoss``/``BCELoss``. Targets here are ``[B, 1]``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _bce(outputs: jax.Array, targets: jax.Array) -> jax.Array:
    eps = 1e-12
    outputs = jnp.clip(outputs, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(outputs) + (1 - targets) * jnp.log(1 - outputs))


def _mse(outputs: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean((outputs - targets) ** 2)


def d_targets(
    rng: jax.Array | None,
    batch_size: int,
    label_smoothing: bool,
    label_noise: float,
) -> tuple[jax.Array, jax.Array]:
    """Real/fake targets with optional smoothing (U(0.7,1.2)/U(0,0.3)) and
    random label flipping (train.py:352-363)."""
    y_real = jnp.ones((batch_size, 1))
    y_fake = jnp.zeros((batch_size, 1))
    if label_smoothing:
        k1, k2, rng = jax.random.split(rng, 3)
        y_real = jax.random.uniform(k1, (batch_size, 1), minval=0.7, maxval=1.2)
        y_fake = jax.random.uniform(k2, (batch_size, 1), minval=0.0, maxval=0.3)
    if label_noise:
        k1, k2 = jax.random.split(rng)
        flip_r = jax.random.uniform(k1, (batch_size, 1)) < label_noise
        flip_f = jax.random.uniform(k2, (batch_size, 1)) < label_noise
        y_real = jnp.where(flip_r, 0.0, y_real)
        y_fake = jnp.where(flip_f, 1.0, y_fake)
    return y_real, y_fake


def d_loss(
    loss: str,
    real_outputs: jax.Array,
    fake_outputs: jax.Array,
    *,
    rng: jax.Array | None = None,
    label_smoothing: bool = False,
    label_noise: float = 0.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Discriminator loss (train.py:331-395); returns (total, per-part dict)."""
    if loss in ("og", "ls"):
        y_real, y_fake = d_targets(rng, real_outputs.shape[0], label_smoothing, label_noise)
        fn = _bce if loss == "og" else _mse
        d_real = fn(real_outputs, y_real)
        d_fake = fn(fake_outputs, y_fake)
    elif loss == "w":
        d_real = -jnp.mean(real_outputs)
        d_fake = jnp.mean(fake_outputs)
    elif loss == "hinge":
        d_real = jnp.mean(jax.nn.relu(1.0 - real_outputs))
        d_fake = jnp.mean(jax.nn.relu(1.0 + fake_outputs))
    else:
        raise ValueError(f"unknown loss {loss!r}")
    total = d_real + d_fake
    return total, {"Dr": d_real, "Df": d_fake, "D": total}


def g_loss(loss: str, fake_outputs: jax.Array) -> jax.Array:
    """Generator loss (train.py:465-476)."""
    if loss == "og":
        return _bce(fake_outputs, jnp.ones_like(fake_outputs))
    if loss == "ls":
        return _mse(fake_outputs, jnp.ones_like(fake_outputs))
    if loss in ("w", "hinge"):
        return -jnp.mean(fake_outputs)
    raise ValueError(f"unknown loss {loss!r}")


def gradient_penalty(
    d_fn: Callable[[jax.Array], jax.Array],
    rng: jax.Array,
    real_data: jax.Array,
    gen_data: jax.Array,
    gp_lambda: float,
) -> jax.Array:
    """WGAN-GP penalty (train.py:286-324): unit-gradient-norm constraint on
    D at points interpolated between real and generated samples.

    ``d_fn`` maps a data batch to D outputs ``[B, 1]`` (closing over params,
    state and any dropout rng). The per-sample interpolation weight has shape
    ``[B, 1, 1]`` (``[B, 1]`` for latent GANs like PCGAN).
    """
    alpha_shape = (real_data.shape[0],) + (1,) * (real_data.ndim - 1)
    alpha = jax.random.uniform(rng, alpha_shape, dtype=real_data.dtype)
    interpolated = alpha * real_data + (1 - alpha) * gen_data

    grads = jax.grad(lambda x: jnp.sum(d_fn(x)))(interpolated)
    grads = grads.reshape(grads.shape[0], -1)
    grad_norm = jnp.sqrt(jnp.sum(grads**2, axis=1) + 1e-12)
    return gp_lambda * jnp.mean((grad_norm - 1.0) ** 2)
