"""rGAN baselines (ext_models/ext_models.py:14-72, from arXiv:1707.02392).

Generator: plain MLP ``latent -> fc layers -> N * feat`` with tanh, reshaped
to a cloud. Discriminator: per-particle 1x1-conv MLP (equivalent to a shared
Linear per particle), global max pool, MLP head with sigmoid.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...ops.linear import linear_init


@dataclasses.dataclass(frozen=True)
class RGANGConfig:
    latent_dim: int
    fc_layers: tuple[int, ...]
    num_hits: int
    node_feat_size: int
    leaky_relu_alpha: float = 0.2


def rgan_g_init(rng: jax.Array, cfg: RGANGConfig, dtype=jnp.float32):
    sizes = [cfg.latent_dim, *cfg.fc_layers, cfg.num_hits * cfg.node_feat_size]
    keys = jax.random.split(rng, len(sizes) - 1)
    params = {
        "layers": [linear_init(k, sizes[i], sizes[i + 1], dtype) for i, k in enumerate(keys)]
    }
    return params, {}


def rgan_g_apply(cfg, params, state, x, labels=None, *, train=False, rng=None, update_sn=True):
    for i, layer in enumerate(params["layers"]):
        x = x @ layer["w"].T + layer["b"]
        if i < len(params["layers"]) - 1:
            x = jax.nn.leaky_relu(x, cfg.leaky_relu_alpha)
    x = jnp.tanh(x)
    return x.reshape(-1, cfg.num_hits, cfg.node_feat_size), state


@dataclasses.dataclass(frozen=True)
class RGANDConfig:
    sfc_layers: tuple[int, ...]
    fc_layers: tuple[int, ...]
    num_hits: int
    node_feat_size: int
    leaky_relu_alpha: float = 0.2


def rgan_d_init(rng: jax.Array, cfg: RGANDConfig, dtype=jnp.float32):
    s_sizes = [cfg.node_feat_size, *cfg.sfc_layers]
    f_sizes = [cfg.sfc_layers[-1], *cfg.fc_layers, 1]
    keys = jax.random.split(rng, len(s_sizes) + len(f_sizes) - 2)
    params = {
        "sfc": [
            linear_init(keys[i], s_sizes[i], s_sizes[i + 1], dtype)
            for i in range(len(s_sizes) - 1)
        ],
        "fc": [
            linear_init(keys[len(s_sizes) - 1 + i], f_sizes[i], f_sizes[i + 1], dtype)
            for i in range(len(f_sizes) - 1)
        ],
    }
    return params, {}


def rgan_d_apply(cfg, params, state, x, labels=None, *, train=False, rng=None, update_sn=True):
    # per-particle shared MLP (the reference's 1x1 Conv1d stack,
    # ext_models.py:44-51) with leaky relu after every layer
    for layer in params["sfc"]:
        x = jax.nn.leaky_relu(x @ layer["w"].T + layer["b"], cfg.leaky_relu_alpha)
    x = jnp.max(x, axis=1)  # [B, sfc[-1]]
    for i, layer in enumerate(params["fc"]):
        x = x @ layer["w"].T + layer["b"]
        if i < len(params["fc"]) - 1:
            x = jax.nn.leaky_relu(x, cfg.leaky_relu_alpha)
    return jax.nn.sigmoid(x), state
