"""Symmetry augmentations for point clouds (mpgan/augment.py).

Used by the MNIST workload: per-sample random 90-degree rotations, axis flips,
translations, and log-normal scalings of the 2D coordinates (the third feature
— intensity — is left untouched), each mixed in with probability ``p``
(``rand_mix``, mpgan/augment.py:5-16). Pure functions of an explicit PRNG key.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    aug_t: bool = False
    aug_f: bool = False
    aug_r90: bool = False
    aug_s: bool = False
    translate_ratio: float = 0.125
    scale_sd: float = 0.125
    translate_pn_ratio: float = 0.05

    @property
    def any(self) -> bool:
        return self.aug_t or self.aug_f or self.aug_r90 or self.aug_s


def _rand_mix(rng, x1, x2, p):
    mix = jax.random.uniform(rng, (x1.shape[0], 1, 1)) < p
    return jnp.where(mix, x2, x1)


def _rand_flip(rng, x):
    flip_xy = jnp.round(jax.random.uniform(rng, (x.shape[0], 1, 2))) * 2 - 1
    ones = jnp.ones((x.shape[0], 1, 1), x.dtype)
    return x * jnp.concatenate([flip_xy, ones], axis=2)


def _rand_90_rotation(rng, x):
    angle = jnp.floor(jax.random.uniform(rng, (x.shape[0], 1, 1)) * 4) * (jnp.pi / 2)
    sin, cos = jnp.sin(angle), jnp.cos(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot = jnp.concatenate(
        [
            jnp.concatenate([cos, -sin, zeros], axis=2),
            jnp.concatenate([sin, cos, zeros], axis=2),
            jnp.concatenate([zeros, zeros, ones], axis=2),
        ],
        axis=1,
    )  # [B, 3, 3]
    return jnp.einsum("bij,bnj->bni", rot, x)


def _rand_translate(rng, x, ratio):
    shift_xy = (jax.random.uniform(rng, (x.shape[0], 1, 2)) - 0.5) * ratio
    zeros = jnp.zeros((x.shape[0], 1, 1), x.dtype)
    return x + jnp.concatenate([shift_xy, zeros], axis=2)


def _rand_scale(rng, x, sd):
    scale = jnp.exp(jax.random.normal(rng, (x.shape[0], 1, 1)) * sd)
    ones = jnp.ones((x.shape[0], 1, 1), x.dtype)
    mult = jnp.concatenate([jnp.repeat(scale, 2, axis=2), ones], axis=2)
    return x * mult


def augment(cfg: AugmentConfig, rng: jax.Array, x: jax.Array, p: float) -> jax.Array:
    """Apply the enabled augmentations in reference order (r90, flip,
    translate, scale — mpgan/augment.py:19-29), each mixed with prob ``p``."""
    keys = jax.random.split(rng, 8)
    if cfg.aug_r90:
        x = _rand_mix(keys[0], x, _rand_90_rotation(keys[1], x), p)
    if cfg.aug_f:
        x = _rand_mix(keys[2], x, _rand_flip(keys[3], x), p)
    if cfg.aug_t:
        x = _rand_mix(keys[4], x, _rand_translate(keys[5], x, cfg.translate_ratio), p)
    if cfg.aug_s:
        x = _rand_mix(keys[6], x, _rand_scale(keys[7], x, cfg.scale_sd), p)
    return x
