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


# Compiled samplers, keyed on everything burned into the trace. params/state
# are jit ARGUMENTS (not closure constants), so repeated eval-time calls with
# fresh weights reuse one compiled program instead of retracing the whole
# generator scan every save_epochs. Identity-keyed objects are kept alive by
# the cache entry itself so their ids cannot be reused.
_SAMPLER_CACHE: dict = {}


def _cached_scan_all(g_apply, g_cfg, spec, batch_size, post_fn, mesh, kwargs_items, has_labels):
    key = (
        id(g_apply), id(g_cfg), id(post_fn), id(mesh),
        spec, batch_size, kwargs_items, has_labels,
    )
    hit = _SAMPLER_CACHE.get(key)
    if hit is not None:
        return hit[0]
    apply_kwargs = dict(kwargs_items)

    def _batch(params, state, key, batch_labels):
        noise, point_noise = spec.sample(key, batch_size)
        if mesh is not None:
            shard = batch_size // mesh.size
            start = jax.lax.axis_index("data") * shard
            noise = jax.lax.dynamic_slice_in_dim(noise, start, shard, axis=0)
            if point_noise is not None:
                point_noise = jax.lax.dynamic_slice_in_dim(point_noise, start, shard, axis=0)
        out, _ = g_apply(g_cfg, params, state, noise, batch_labels, train=False, **apply_kwargs)
        if post_fn is not None:
            out = post_fn(out, point_noise)
        return out

    if has_labels:
        def _scan_all(params, state, keys, labels_all):
            return jax.lax.scan(
                lambda _, x: (0, _batch(params, state, x[0], x[1])), 0, (keys, labels_all)
            )[1]
    else:
        def _scan_all(params, state, keys):
            return jax.lax.scan(
                lambda _, k: (0, _batch(params, state, k, None)), 0, keys
            )[1]

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        # params/state/keys replicated; labels + outputs sharded per batch
        in_specs = (P(), P(), P(), P(None, "data")) if has_labels else (P(), P(), P())
        fn = jax.jit(
            jax.shard_map(
                _scan_all, mesh=mesh,
                in_specs=in_specs, out_specs=P(None, "data"),
                check_vma=False,
            )
        )
    else:
        fn = jax.jit(_scan_all)

    if len(_SAMPLER_CACHE) >= 16:
        _SAMPLER_CACHE.pop(next(iter(_SAMPLER_CACHE)))
    _SAMPLER_CACHE[key] = (fn, g_apply, g_cfg, post_fn, mesh)
    return fn


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
    mesh=None,
    **apply_kwargs: Any,
) -> np.ndarray:
    """Batched generation (train.py:226-282): fixed-size jitted batches, the
    final partial batch over-generates and is truncated. ``post_fn`` applies
    post-generation hooks (mask_manual, PCGAN point decoding) inside the jit;
    pass a STABLE callable — the compiled sampler is cached by its identity,
    so a lambda built per call forces a fresh compile each time.

    With ``mesh`` set the scan runs under ``shard_map`` over the ``data``
    axis: each chip generates its contiguous ``batch_size / n_dev`` rows of
    every batch (params/state replicated, outputs sharded on the batch axis),
    so eval-time 50k-jet generation uses the whole pod instead of one chip
    (the reference's gen path is single-GPU, gen.py:113-123). Every chip
    draws the full per-batch noise and slices its own rows — noise creation
    is negligible next to the generator forward, and it keeps the sharded
    output bit-identical to the single-device path.
    """
    if mesh is not None and batch_size % mesh.size != 0:
        mesh = None  # batch not divisible across chips: single-device fallback

    num_batches = (num_samples + batch_size - 1) // batch_size
    keys = jax.random.split(rng, num_batches)
    _all = _cached_scan_all(
        g_apply, g_cfg, spec, batch_size, post_fn, mesh,
        tuple(sorted(apply_kwargs.items())), labels is not None,
    )

    # all batches ride ONE lax.scan dispatch with a single host fetch at the
    # end — a host loop with a per-batch np.asarray sync pays a full
    # device round trip per batch (35+ ms each over a remote link)
    if labels is not None:
        labels = np.asarray(labels)[:num_samples]
        pad = np.repeat(labels[-1:], num_batches * batch_size - len(labels), axis=0)
        # preserve the labels' own rank: a 1-D label array stays [nb, B], not
        # [nb, B, 1] (the per-batch host path passed g_apply [B] slices)
        labels_all = jnp.asarray(
            np.concatenate([labels, pad], axis=0).reshape(
                num_batches, batch_size, *labels.shape[1:]
            )
        )
        outs = _all(params, state, keys, labels_all)
    else:
        outs = _all(params, state, keys)
    out = np.asarray(outs)
    return out.reshape(num_batches * batch_size, *out.shape[2:])[:num_samples]
