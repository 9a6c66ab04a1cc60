"""PointNet-Mix discriminator (ext_models/ext_models.py:160-207, the
strong-baseline D from arXiv:2102.05743): per-particle MLP, concatenated
max+mean pooling, MLP head with sigmoid. Mask-aware input fix-up zeroes
masked particles (ext_models.py:196-202)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...ops.linear import linear_init


@dataclasses.dataclass(frozen=True)
class PointNetMixDConfig:
    pointfc_layers: tuple[int, ...]  # e.g. (64, 128, 1024)
    fc_layers: tuple[int, ...]  # e.g. (512,)
    num_hits: int
    node_feat_size: int
    mask: bool = False
    leaky_relu_alpha: float = 0.2


def pointnet_d_init(rng: jax.Array, cfg: PointNetMixDConfig, dtype=jnp.float32):
    p_sizes = [cfg.node_feat_size, *cfg.pointfc_layers]
    f_sizes = [cfg.pointfc_layers[-1] * 2, *cfg.fc_layers, 1]
    keys = jax.random.split(rng, len(p_sizes) + len(f_sizes) - 2)
    params = {
        "pointfc": [
            linear_init(keys[i], p_sizes[i], p_sizes[i + 1], dtype)
            for i in range(len(p_sizes) - 1)
        ],
        "fc": [
            linear_init(keys[len(p_sizes) - 1 + i], f_sizes[i], f_sizes[i + 1], dtype)
            for i in range(len(f_sizes) - 1)
        ],
    }
    return params, {}


def pointnet_d_apply(cfg, params, state, x, labels=None, *, train=False, rng=None, update_sn=True):
    if cfg.mask:
        # un-shift pt, zero out masked particles, re-shift (ext_models.py:198-202)
        pt = x[:, :, 2] + 0.5
        mask = x[:, :, 3:4] >= 0
        x = jnp.concatenate([x[:, :, :2], pt[..., None]], axis=2)
        x = jnp.where(mask, x, 0.0)
        x = jnp.concatenate([x[:, :, :2], x[:, :, 2:3] - 0.5], axis=2)
    for layer in params["pointfc"]:
        x = jax.nn.leaky_relu(x @ layer["w"].T + layer["b"], cfg.leaky_relu_alpha)
    x = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=1)
    for i, layer in enumerate(params["fc"]):
        x = x @ layer["w"].T + layer["b"]
        if i < len(params["fc"]) - 1:
            x = jax.nn.leaky_relu(x, cfg.leaky_relu_alpha)
    return jax.nn.sigmoid(x), state
