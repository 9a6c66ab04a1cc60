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

    def _batch(key, batch_labels):
        noise, point_noise = spec.sample(key, batch_size)
        out, _ = g_apply(g_cfg, params, state, noise, batch_labels, train=False, **apply_kwargs)
        if post_fn is not None:
            out = post_fn(out, point_noise)
        return out

    num_batches = (num_samples + batch_size - 1) // batch_size
    keys = jax.random.split(rng, num_batches)

    # all batches ride ONE lax.scan dispatch with a single host fetch at the
    # end — a host loop with a per-batch np.asarray sync pays a full
    # device round trip per batch (35+ ms each over a remote link)
    if labels is not None:
        labels = np.asarray(labels)[:num_samples]
        pad = np.repeat(labels[-1:], num_batches * batch_size - len(labels), axis=0)
        labels_all = jnp.asarray(
            np.concatenate([labels, pad], axis=0).reshape(num_batches, batch_size, -1)
        )

        @jax.jit
        def _all(keys, labels_all):
            return jax.lax.scan(
                lambda _, x: (0, _batch(x[0], x[1])), 0, (keys, labels_all)
            )[1]

        outs = _all(keys, labels_all)
    else:

        @jax.jit
        def _all(keys):
            return jax.lax.scan(lambda _, k: (0, _batch(k, None)), 0, keys)[1]

        outs = _all(keys)
    out = np.asarray(outs)
    return out.reshape(num_batches * batch_size, *out.shape[2:])[:num_samples]
