"""PCGAN stack (ext_models/pcgan_model.py, from arXiv:1810.05795
"Point Cloud GAN").

Training pipeline (SURVEY.md C14): real clouds are encoded to a 256-d latent
by the pre-trained DeepSets inference network ``G_inv`` (Tanh variant,
PermEqui1_max layers); a small latent GAN (``latent_G``/``latent_D``) is
trained adversarially in that space (train.py:837-839); at eval time latents
are decoded back to clouds by the pre-trained per-point decoder ``G_pc``
conditioned on per-point unit Gaussian noise (train.py:212-213).

The shipped ``pcgan_G_inv_{g,q,t}.pt`` weights import via
``mpgan_tpu.utils.torch_import.load_torch_state_dict`` +
``pcgan_weights_from_torch``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...ops.linear import linear_init


@dataclasses.dataclass(frozen=True)
class PCGANConfig:
    node_feat_size: int = 3
    latent_dim: int = 128  # sampling latent (latent_G input)
    z1_dim: int = 256  # object latent
    z2_dim: int = 10  # per-point latent
    d_dim: int = 256
    pool: str = "max1"
    latent_g_layers: tuple[int, ...] = (256, 512)
    latent_d_layers: tuple[int, ...] = (512, 256)


# -- latent GAN (repo-added heads, pcgan_model.py:322-357) -------------------


def latent_g_init(rng: jax.Array, cfg: PCGANConfig, dtype=jnp.float32):
    sizes = [cfg.latent_dim, *cfg.latent_g_layers, cfg.z1_dim]
    keys = jax.random.split(rng, len(sizes) - 1)
    return {
        "layers": [linear_init(k, sizes[i], sizes[i + 1], dtype) for i, k in enumerate(keys)]
    }, {}


def latent_g_apply(cfg, params, state, x, labels=None, *, train=False, rng=None, update_sn=True):
    for i, layer in enumerate(params["layers"]):
        x = x @ layer["w"].T + layer["b"]
        if i < len(params["layers"]) - 1:
            x = jax.nn.leaky_relu(x, 0.2)
    return x, state


def latent_d_init(rng: jax.Array, cfg: PCGANConfig, dtype=jnp.float32):
    sizes = [cfg.z1_dim, *cfg.latent_d_layers, 1]
    keys = jax.random.split(rng, len(sizes) - 1)
    return {
        "layers": [linear_init(k, sizes[i], sizes[i + 1], dtype) for i, k in enumerate(keys)]
    }, {}


def latent_d_apply(cfg, params, state, x, labels=None, *, train=False, rng=None, update_sn=True):
    for i, layer in enumerate(params["layers"]):
        x = x @ layer["w"].T + layer["b"]
        if i < len(params["layers"]) - 1:
            x = jax.nn.leaky_relu(x, 0.2)
    return x, state  # no sigmoid: trained with the WGAN loss


# -- pre-trained inference network G_inv (pcgan_model.py:45-93) --------------


def g_inv_init(rng: jax.Array, cfg: PCGANConfig, dtype=jnp.float32):
    keys = jax.random.split(rng, 5)
    sizes = [cfg.node_feat_size, cfg.d_dim, cfg.d_dim, cfg.d_dim]
    params = {"phi": [], "ro": []}
    for i in range(3):
        layer = {"gamma": linear_init(keys[i], sizes[i], sizes[i + 1], dtype)}
        if cfg.pool in ("max", "mean"):  # PermEqui2 variants have a Lambda map
            layer["lambda"] = linear_init(jax.random.fold_in(keys[i], 1), sizes[i], sizes[i + 1], dtype)
            layer["lambda"].pop("b")
        params["phi"].append(layer)
    params["ro"] = [
        linear_init(keys[3], cfg.d_dim, cfg.d_dim, dtype),
        linear_init(keys[4], cfg.d_dim, cfg.z1_dim, dtype),
    ]
    return params, {}


def g_inv_apply(cfg, params, state, x, labels=None, *, train=False, rng=None, update_sn=True):
    """DeepSets encoder: PermEqui layers + Tanh, max pool, ``ro`` head.
    ``x: [B, N, feat] -> [B, z1_dim]``."""
    for layer in params["phi"]:
        if cfg.pool == "max1":  # PermEqui1_max: Gamma(x - max(x))
            xm = jnp.max(x, axis=1, keepdims=True)
            x = (x - xm) @ layer["gamma"]["w"].T + layer["gamma"]["b"]
        elif cfg.pool == "max":  # PermEqui2_max: Gamma(x) - Lambda(max(x))
            xm = jnp.max(x, axis=1, keepdims=True) @ layer["lambda"]["w"].T
            x = x @ layer["gamma"]["w"].T + layer["gamma"]["b"] - xm
        else:  # mean
            xm = jnp.mean(x, axis=1, keepdims=True) @ layer["lambda"]["w"].T
            x = x @ layer["gamma"]["w"].T + layer["gamma"]["b"] - xm
        x = jnp.tanh(x)
    x = jnp.max(x, axis=1)  # [B, d_dim]
    x = jnp.tanh(x @ params["ro"][0]["w"].T + params["ro"][0]["b"])
    return x @ params["ro"][1]["w"].T + params["ro"][1]["b"], state


# -- pre-trained point decoder G_pc (pcgan_model.py:219-248) -----------------


def g_pc_init(rng: jax.Array, cfg: PCGANConfig, dtype=jnp.float32):
    hid = max(250, 2 * cfg.z1_dim)
    keys = jax.random.split(rng, 7)
    params = {
        "fc": linear_init(keys[0], cfg.z1_dim, hid, dtype),
        "fu": linear_init(keys[1], cfg.z2_dim, hid, dtype),
        "main": [linear_init(keys[2 + i], hid, hid, dtype) for i in range(4)],
        "out": linear_init(keys[6], hid, cfg.node_feat_size, dtype),
    }
    params["fu"].pop("b")  # bias=False (pcgan_model.py:229)
    return params, {}


def g_pc_apply(cfg, params, state, z1, z2, *, train=False, rng=None, update_sn=True):
    """``z1: [B, 1 or N, z1_dim]`` object latent (broadcast over points),
    ``z2: [B, N, z2_dim]`` per-point noise -> clouds ``[B, N, feat]``."""
    x = z1 @ params["fc"]["w"].T + params["fc"]["b"] + z2 @ params["fu"]["w"].T
    for layer in params["main"]:
        x = jax.nn.softplus(x)
        x = x @ layer["w"].T + layer["b"]
    x = jax.nn.softplus(x)
    return x @ params["out"]["w"].T + params["out"]["b"], state


# -- torch weight import -----------------------------------------------------


def g_inv_weights_from_torch(sd, cfg: PCGANConfig):
    """Map a ``G_inv_Tanh`` state dict (phi.{0,2,4}.Gamma/Lambda, ro.{0,2})."""
    params = {"phi": [], "ro": []}
    for i in range(3):
        base = f"phi.{2 * i}."
        layer = {
            "gamma": {
                "w": jnp.asarray(sd[base + "Gamma.weight"]),
                "b": jnp.asarray(sd[base + "Gamma.bias"]),
            }
        }
        if base + "Lambda.weight" in sd:
            layer["lambda"] = {"w": jnp.asarray(sd[base + "Lambda.weight"])}
        params["phi"].append(layer)
    params["ro"] = [
        {"w": jnp.asarray(sd["ro.0.weight"]), "b": jnp.asarray(sd["ro.0.bias"])},
        {"w": jnp.asarray(sd["ro.2.weight"]), "b": jnp.asarray(sd["ro.2.bias"])},
    ]
    return params, {}


def g_pc_weights_from_torch(sd, cfg: PCGANConfig):
    params = {
        "fc": {"w": jnp.asarray(sd["fc.weight"]), "b": jnp.asarray(sd["fc.bias"])},
        "fu": {"w": jnp.asarray(sd["fu.weight"])},
        "main": [
            {"w": jnp.asarray(sd[f"main.{2 * i + 1}.weight"]), "b": jnp.asarray(sd[f"main.{2 * i + 1}.bias"])}
            for i in range(4)
        ],
        "out": {"w": jnp.asarray(sd["main.9.weight"]), "b": jnp.asarray(sd["main.9.bias"])},
    }
    return params, {}
