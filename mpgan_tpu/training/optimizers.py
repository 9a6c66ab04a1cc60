"""Optimizers with exact torch semantics, as optax transformations.

The reference uses ``torch.optim`` RMSprop (the default), Adadelta, and Adam
with L2 weight decay (setup_training.py:1500-1539). optax's built-ins differ
in epsilon placement and decay conventions, so these are re-derived from the
torch update rules to keep GAN training dynamics matched:

- RMSprop: ``s = a*s + (1-a) g^2;  p -= lr * g / (sqrt(s) + eps)``
  (alpha=0.99, eps=1e-8, no momentum, not centered),
- Adadelta: ``s = r*s + (1-r) g^2; d = sqrt(acc+eps)/sqrt(s+eps) * g;
  acc = r*acc + (1-r) d^2; p -= lr*d`` (rho=0.9, eps=1e-6),
- Adam + L2: ``g += wd*p`` then standard bias-corrected Adam (eps=1e-8) —
  torch couples the decay into the moments (not AdamW).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RMSPropState(NamedTuple):
    sq_avg: optax.Updates


def rmsprop_torch(lr: float, alpha: float = 0.99, eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        return RMSPropState(jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        sq_avg = jax.tree.map(lambda s, g: alpha * s + (1 - alpha) * g * g, state.sq_avg, updates)
        new_updates = jax.tree.map(lambda g, s: -lr * g / (jnp.sqrt(s) + eps), updates, sq_avg)
        return new_updates, RMSPropState(sq_avg)

    return optax.GradientTransformation(init_fn, update_fn)


class AdadeltaState(NamedTuple):
    sq_avg: optax.Updates
    acc_delta: optax.Updates


def adadelta_torch(lr: float, rho: float = 0.9, eps: float = 1e-6) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdadeltaState(zeros, jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        sq_avg = jax.tree.map(lambda s, g: rho * s + (1 - rho) * g * g, state.sq_avg, updates)
        delta = jax.tree.map(
            lambda acc, s, g: jnp.sqrt(acc + eps) / jnp.sqrt(s + eps) * g,
            state.acc_delta, sq_avg, updates,
        )
        acc_delta = jax.tree.map(
            lambda acc, d: rho * acc + (1 - rho) * d * d, state.acc_delta, delta
        )
        new_updates = jax.tree.map(lambda d: -lr * d, delta)
        return new_updates, AdadeltaState(sq_avg, acc_delta)

    return optax.GradientTransformation(init_fn, update_fn)


class AdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def adam_torch(
    lr: float,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(jnp.zeros([], jnp.int32), zeros, jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        if weight_decay:
            if params is None:
                raise ValueError("adam with weight decay needs params")
            updates = jax.tree.map(lambda g, p: g + weight_decay * p, updates, params)
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: beta1 * m + (1 - beta1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: beta2 * v + (1 - beta2) * g * g, state.nu, updates)
        bc1 = 1 - beta1 ** count.astype(jnp.float32)
        bc2 = 1 - beta2 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda m, v: -lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu
        )
        return new_updates, AdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    name: str,
    lr: float,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 5e-4,
) -> optax.GradientTransformation:
    """Optimizer factory mirroring setup_training.optimizers
    (setup_training.py:1511-1523; the Adam branch always uses wd=5e-4)."""
    if name == "rmsprop":
        return rmsprop_torch(lr)
    if name == "adadelta":
        return adadelta_torch(lr)
    if name in ("adam", "None"):
        return adam_torch(lr, beta1=beta1, beta2=beta2, weight_decay=weight_decay)
    raise ValueError(f"unknown optimizer {name!r}")
