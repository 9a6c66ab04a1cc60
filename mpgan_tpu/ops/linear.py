"""Functional MLP ("LinearNet") core.

Re-implements the behavior of the reference's ``LinearNet`` module
(mpgan/model.py:11-88) as pure init/apply functions over pytrees:

- stack of Linear layers with LeakyReLU(alpha) activations,
- ``final_linear`` leaves the last layer without activation/normalization,
- dropout is applied after *every* layer including a final linear one
  (mpgan/model.py:83 — the dropout sits outside the activation branch),
- optional BatchNorm1d *after* the activation (mpgan/model.py:80-82),
- optional spectral norm on every layer except a final linear one
  (mpgan/model.py:65-68).

Trainable parameters and mutable state (spectral-norm ``u`` vectors, batch-norm
running moments) are kept in separate pytrees so the train step can
differentiate w.r.t. params while threading state functionally.

Weight layout follows torch ``nn.Linear`` (``w: [out, in]``, ``y = x @ w.T + b``)
so the reference's shipped ``trained_models`` state dicts map 1:1 onto these
pytrees (see mpgan_tpu/utils/torch_import.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .spectral_norm import spectral_normalize

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def hash_dropout(x: jax.Array, p: float, rng: jax.Array) -> jax.Array:
    """Torch-semantics dropout (keep w.p. ``1-p``, scale by ``1/(1-p)``) from
    the outer-sum hash instead of ``jax.random.bernoulli``.

    threefry-2x32 costs ~25 VPU ops per 32-bit word; on dropout-heavy XLA
    paths the mask draws dominate (measured: dropout = 1.546 ms of GAPT's
    4.707 ms train step, scripts/gapt_train_ablation.py). This is the same
    hash the Pallas kernels use in-kernel (mp_pallas._dropmul: rank-1 row
    and column keys, broadcast outer sum, 3-op finisher — statistical
    contract in tests/test_mp_pallas.py::test_dropout_hash_quality), keyed
    on the raw key words, so a given ``rng`` still yields one fixed mask
    (replay/determinism semantics identical to bernoulli; the stream
    differs, which is free — the reference's torch streams were never
    reproduced here either, mpgan/model.py:83).
    """
    keep = 1.0 - p
    kd = rng
    if jnp.issubdtype(kd.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(kd)
    kd = jnp.ravel(kd).astype(jnp.uint32)
    seed = kd[0] * np.uint32(0xC2B2AE3D) + kd[-1] * np.uint32(0x27D4EB2F)
    cols = x.shape[-1]
    rows_n = x.size // cols
    rows = jax.lax.broadcasted_iota(jnp.uint32, (rows_n, 1), 0)
    rkey = rows * np.uint32(0x9E3779B1) + seed
    ckey = jax.lax.broadcasted_iota(jnp.uint32, (1, cols), 1) * np.uint32(0x85EBCA77)
    h = rkey + ckey
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 15)
    threshold = np.uint32(min(int(p * 2**32), 2**32 - 1))
    mult = jnp.where(h >= threshold, np.float32(1.0 / keep), np.float32(0.0))
    return x * mult.reshape(x.shape).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Static architecture config for an MLP stack.

    ``sizes`` is the full list of layer widths including input and output
    (the reference's ``layers`` with ``input_size``/``output_size`` folded in,
    mpgan/model.py:49-54).
    """

    sizes: tuple[int, ...]
    final_linear: bool = False
    leaky_relu_alpha: float = 0.2
    dropout_p: float = 0.0
    batch_norm: bool = False
    spectral_norm: bool = False

    @staticmethod
    def build(
        layers: Sequence[int],
        input_size: int = 0,
        output_size: int = 0,
        final_linear: bool = False,
        **kwargs: Any,
    ) -> "MLPConfig":
        sizes = list(layers)
        if input_size:
            sizes.insert(0, input_size)
        if output_size:
            sizes.append(output_size)
        return MLPConfig(sizes=tuple(sizes), final_linear=final_linear, **kwargs)

    @property
    def num_layers(self) -> int:
        return len(self.sizes) - 1

    def layer_has_activation(self, i: int) -> bool:
        return i != self.num_layers - 1 or not self.final_linear

    def layer_has_sn(self, i: int) -> bool:
        return self.spectral_norm and self.layer_has_activation(i)


def linear_init(rng: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    """torch ``nn.Linear`` default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both weight (kaiming uniform, a=sqrt(5)) and bias."""
    wk, bk = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim) if in_dim > 0 else 0.0
    w = jax.random.uniform(wk, (out_dim, in_dim), dtype, -bound, bound)
    b = jax.random.uniform(bk, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def mlp_init(rng: jax.Array, cfg: MLPConfig, dtype=jnp.float32) -> tuple[dict, dict]:
    """Returns ``(params, state)`` pytrees for the MLP stack."""
    params: dict = {"layers": []}
    state: dict = {}
    keys = jax.random.split(rng, cfg.num_layers + 1)
    for i in range(cfg.num_layers):
        params["layers"].append(linear_init(keys[i], cfg.sizes[i], cfg.sizes[i + 1], dtype))

    if cfg.batch_norm:
        params["bn"] = [
            {"scale": jnp.ones((cfg.sizes[i + 1],), dtype), "bias": jnp.zeros((cfg.sizes[i + 1],), dtype)}
            for i in range(cfg.num_layers)
            if cfg.layer_has_activation(i)
        ]
        state["bn"] = [
            {
                "mean": jnp.zeros((cfg.sizes[i + 1],), dtype),
                "var": jnp.ones((cfg.sizes[i + 1],), dtype),
            }
            for i in range(cfg.num_layers)
            if cfg.layer_has_activation(i)
        ]

    if cfg.spectral_norm:
        sn_keys = jax.random.split(keys[-1], cfg.num_layers)
        sn_u = []
        for i in range(cfg.num_layers):
            if cfg.layer_has_sn(i):
                u = jax.random.normal(sn_keys[i], (cfg.sizes[i + 1],), dtype)
                sn_u.append(u / (jnp.linalg.norm(u) + 1e-12))
            else:
                sn_u.append(None)
        state["sn_u"] = sn_u

    return params, state


def _batch_norm(x, scale, bias, mean, var, train: bool):
    if train:
        # torch BatchNorm1d normalizes with biased batch statistics and
        # updates running stats with the unbiased variance.
        axes = tuple(range(x.ndim - 1))
        bmean = jnp.mean(x, axis=axes)
        bvar = jnp.var(x, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = bvar * n / max(n - 1, 1)
        new_mean = (1 - _BN_MOMENTUM) * mean + _BN_MOMENTUM * bmean
        new_var = (1 - _BN_MOMENTUM) * var + _BN_MOMENTUM * unbiased
        y = (x - bmean) * jax.lax.rsqrt(bvar + _BN_EPS) * scale + bias
        return y, new_mean, new_var
    y = (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * scale + bias
    return y, mean, var


def mlp_apply(
    cfg: MLPConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    update_sn: bool = True,
    compute_dtype=None,
) -> tuple[jax.Array, dict]:
    """Run ``x`` (``[..., sizes[0]]``) through the stack; returns ``(y, new_state)``.

    ``update_sn`` controls whether the spectral-norm power iteration advances
    (the reference advances it on every forward, including eval-mode ones —
    spectral_normalization.py:62-64 — so the default is True).
    """
    new_state: dict = {}
    if cfg.batch_norm:
        new_state["bn"] = []
    if cfg.spectral_norm:
        new_state["sn_u"] = []

    if cfg.dropout_p > 0 and train and rng is None:
        raise ValueError("dropout in train mode needs an rng")
    drop_keys = (
        jax.random.split(rng, cfg.num_layers) if (cfg.dropout_p > 0 and train) else None
    )

    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    bn_idx = 0
    for i in range(cfg.num_layers):
        w = params["layers"][i]["w"]
        b = params["layers"][i]["b"]

        if cfg.layer_has_sn(i):
            u = state["sn_u"][i]
            w_sn, u_new, _ = spectral_normalize(w, u)
            w = w_sn
            new_state["sn_u"].append(u_new if update_sn else u)
        elif cfg.spectral_norm:
            new_state["sn_u"].append(None)

        if compute_dtype is not None:
            w = w.astype(compute_dtype)
            b = b.astype(compute_dtype)

        x = (
            jax.lax.dot_general(
                x, w, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=x.dtype
            )
            + b
        )

        if cfg.layer_has_activation(i):
            x = jax.nn.leaky_relu(x, negative_slope=cfg.leaky_relu_alpha)
            if cfg.batch_norm:
                bn_p = params["bn"][bn_idx]
                bn_s = state["bn"][bn_idx]
                x, m, v = _batch_norm(x, bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"], train)
                new_state["bn"].append({"mean": m, "var": v})
                bn_idx += 1

        # dropout after every layer, incl. final linear (mpgan/model.py:83)
        if cfg.dropout_p > 0 and train:
            x = hash_dropout(x, cfg.dropout_p, drop_keys[i])

    return x, new_state
