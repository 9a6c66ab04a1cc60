"""Noise sampling and jet generation (train.py:100-282).

Per-model noise shapes follow ``get_gen_noise`` (train.py:116-141):

- mpgan: ``[B, N(+1 if mask_learn_sep), latent_node_size]`` or ``[B,
  lfc_latent_size]`` with lfc, scaled by ``noise_std`` (default 0.2),
- gapt: ``[B, N, embed_dim]``,
- rgan / graphcnngan: ``[B, latent_dim]``,
- treegan: ``[B, 1, treegang_features[0]]``,
- pcgan: ``[B, pcgan_latent_dim]`` (+ unit-std point noise
  ``[B, N, z2_dim]`` when decoding points).

``generate`` / ``generate_multi_batch`` are the sampling API used by training,
evaluation and the gen CLI. Generation jits once per (model, batch) shape and
streams batches to host.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseSpec:
    """Static description of the generator's input noise."""

    shape: tuple[int, ...]  # per-sample shape (without batch dim)
    std: float = 0.2
    point_shape: tuple[int, ...] | None = None  # pcgan point-decoder noise

    def sample(self, rng: jax.Array, num_samples: int, dtype=jnp.float32):
        k1, k2 = jax.random.split(rng)
        noise = jax.random.normal(k1, (num_samples,) + self.shape, dtype) * self.std
        point_noise = None
        if self.point_shape is not None:
            point_noise = jax.random.normal(k2, (num_samples,) + self.point_shape, dtype)
        return noise, point_noise


def noise_spec(model: str, model_args: dict[str, Any], num_particles: int, noise_std: float = 0.2) -> NoiseSpec:
    """Mirror of get_gen_noise's shape logic (train.py:116-141)."""
    if model in ("mpgan", "old_mpgan"):
        if model_args.get("lfc"):
            return NoiseSpec((model_args["lfc_latent_size"],), noise_std)
        extra = int(bool(model_args.get("mask_learn_sep")))
        return NoiseSpec((num_particles + extra, model_args["latent_node_size"]), noise_std)
    if model == "gapt":
        return NoiseSpec((num_particles, model_args["embed_dim"]), noise_std)
    if model in ("rgan", "graphcnngan"):
        return NoiseSpec((model_args["latent_dim"],), noise_std)
    if model == "treegan":
        return NoiseSpec((1, model_args["treegang_features"][0]), noise_std)
    if model == "pcgan":
        point_shape = None
        if model_args.get("sample_points"):
            point_shape = (num_particles, model_args["pcgan_z2_dim"])
        return NoiseSpec((model_args["pcgan_latent_dim"],), noise_std, point_shape)
    raise ValueError(f"unknown model {model!r}")


GenApply = Callable[..., tuple[jax.Array, dict]]


def generate(
    g_apply: GenApply,
    g_cfg: Any,
    params: dict,
    state: dict,
    spec: NoiseSpec,
    rng: jax.Array,
    num_samples: int,
    labels: jax.Array | None = None,
    **apply_kwargs: Any,
) -> jax.Array:
    """Generate ``num_samples`` clouds in one shot (eval mode, state discarded
    — SN state is not advanced by evaluation sampling)."""
    noise, _ = spec.sample(rng, num_samples)
    out, _ = g_apply(g_cfg, params, state, noise, labels, train=False, **apply_kwargs)
    return out


def generate_multi_batch(
    g_apply: GenApply,
    g_cfg: Any,
    params: dict,
    state: dict,
    spec: NoiseSpec,
    rng: jax.Array,
    num_samples: int,
    batch_size: int,
    labels: np.ndarray | None = None,
    post_fn: Callable[[jax.Array, jax.Array | None], jax.Array] | None = None,
    **apply_kwargs: Any,
) -> np.ndarray:
    """Batched generation (train.py:226-282): fixed-size jitted batches, the
    final partial batch over-generates and is truncated. ``post_fn`` applies
    post-generation hooks (mask_manual, PCGAN point decoding) inside the jit.
    """

    @partial(jax.jit, static_argnames=())
    def _batch(key, batch_labels):
        noise, point_noise = spec.sample(key, batch_size)
        out, _ = g_apply(g_cfg, params, state, noise, batch_labels, train=False, **apply_kwargs)
        if post_fn is not None:
            out = post_fn(out, point_noise)
        return out

    chunks = []
    num_batches = (num_samples + batch_size - 1) // batch_size
    keys = jax.random.split(rng, num_batches)
    for i in range(num_batches):
        if labels is not None:
            sl = labels[i * batch_size : (i + 1) * batch_size]
            if sl.shape[0] < batch_size:  # pad final batch to keep shapes static
                pad = np.repeat(sl[-1:], batch_size - sl.shape[0], axis=0)
                sl = np.concatenate([sl, pad], axis=0)
            sl = jnp.asarray(sl)
        else:
            sl = None
        chunks.append(np.asarray(_batch(keys[i], sl)))
    return np.concatenate(chunks, axis=0)[:num_samples]
