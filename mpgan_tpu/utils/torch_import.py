"""PyTorch state-dict -> pytree import for the reference's shipped weights.

The reference ships 40+ trained G/D checkpoints (trained_models/*/G_best_epoch.pt,
trained_models/README.md:1-4) whose physics fidelity is the validation target
(BASELINE.md "import trained_models weights and reproduce physics metrics").
This module maps those ``torch.save``d state dicts onto our params/state
pytrees. torch is only needed at import time — the converted pytrees are plain
jnp arrays.

Key layout mapping (reference module -> pytree):

- ``LinearNet``: ``net.{i}.weight/bias`` -> ``layers[i].w/b``; spectral-norm
  wrapped layers store ``net.{i}.module.{weight_bar,bias,weight_u,weight_v}``
  (mpgan/spectral_normalization.py:44-60),
- ``MPNet``: ``mp_layers.{i}.fe/fn`` -> ``mp_layers[i].fe/fn``,
- ``MPGenerator``: ``lfc_layer`` -> ``lfc``; ``fmg_layer`` -> ``fmg``,
- ``MPDiscriminator``: ``fnd_layer`` -> ``fnd``,
- GAPT: ``sabs.{i}.mab.attention.{in_proj_weight,in_proj_bias,out_proj.*}``,
  ``pma.S``, ``pma.mab.*``, ``input_embedding``, ``final_fc``.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ..models.gapt import GAPTConfig
from ..models.mpgan import MPGeneratorConfig, MPDiscriminatorConfig
from ..ops.linear import MLPConfig


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a ``.pt`` state dict into numpy arrays (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # whole-pickle fallback (setup_training.py:1414-1416)
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


def _arr(sd: Mapping[str, np.ndarray], key: str) -> jnp.ndarray:
    if key not in sd:
        raise KeyError(f"missing key {key!r}; available: {sorted(sd)[:10]}...")
    return jnp.asarray(sd[key])


def mlp_from_torch(
    sd: Mapping[str, np.ndarray], prefix: str, cfg: MLPConfig
) -> tuple[dict, dict]:
    """Convert a ``LinearNet`` subtree at ``prefix`` (e.g. ``"fe."``)."""
    params: dict[str, Any] = {"layers": []}
    state: dict[str, Any] = {}
    if cfg.spectral_norm:
        state["sn_u"] = []
    if cfg.batch_norm:
        params["bn"] = []
        state["bn"] = []
    for i in range(cfg.num_layers):
        if cfg.layer_has_sn(i):
            base = f"{prefix}net.{i}.module."
            params["layers"].append(
                {"w": _arr(sd, base + "weight_bar"), "b": _arr(sd, base + "bias")}
            )
            state["sn_u"].append(_arr(sd, base + "weight_u"))
        else:
            base = f"{prefix}net.{i}."
            params["layers"].append({"w": _arr(sd, base + "weight"), "b": _arr(sd, base + "bias")})
            if cfg.spectral_norm:
                state["sn_u"].append(None)
        if cfg.batch_norm and cfg.layer_has_activation(i):
            bn = f"{prefix}bn.{len(params['bn'])}."
            params["bn"].append({"scale": _arr(sd, bn + "weight"), "bias": _arr(sd, bn + "bias")})
            state["bn"].append(
                {"mean": _arr(sd, bn + "running_mean"), "var": _arr(sd, bn + "running_var")}
            )
    return params, state


def mp_generator_from_torch(
    sd: Mapping[str, np.ndarray], cfg: MPGeneratorConfig
) -> tuple[dict, dict]:
    params: dict[str, Any] = {"mp_layers": []}
    state: dict[str, Any] = {"mp_layers": []}
    for i, layer_cfg in enumerate(cfg.layers):
        fe_p, fe_s = mlp_from_torch(sd, f"mp_layers.{i}.fe.", layer_cfg.fe)
        fn_p, fn_s = mlp_from_torch(sd, f"mp_layers.{i}.fn.", layer_cfg.fn)
        params["mp_layers"].append({"fe": fe_p, "fn": fn_p})
        state["mp_layers"].append({"fe": fe_s, "fn": fn_s})
    if cfg.lfc:
        params["lfc"] = {"w": _arr(sd, "lfc_layer.weight"), "b": _arr(sd, "lfc_layer.bias")}
    if cfg.fmg_cfg is not None:
        params["fmg"], state["fmg"] = mlp_from_torch(sd, "fmg_layer.", cfg.fmg_cfg)
    return params, state


def mp_discriminator_from_torch(
    sd: Mapping[str, np.ndarray], cfg: MPDiscriminatorConfig
) -> tuple[dict, dict]:
    params: dict[str, Any] = {"mp_layers": []}
    state: dict[str, Any] = {"mp_layers": []}
    for i, layer_cfg in enumerate(cfg.layers):
        fe_p, fe_s = mlp_from_torch(sd, f"mp_layers.{i}.fe.", layer_cfg.fe)
        fn_p, fn_s = mlp_from_torch(sd, f"mp_layers.{i}.fn.", layer_cfg.fn)
        params["mp_layers"].append({"fe": fe_p, "fn": fn_p})
        state["mp_layers"].append({"fe": fe_s, "fn": fn_s})
    if cfg.fnd_cfg is not None:
        params["fnd"], state["fnd"] = mlp_from_torch(sd, "fnd_layer.", cfg.fnd_cfg)
    return params, state


def _mab_from_torch(sd: Mapping[str, np.ndarray], prefix: str, cfg: GAPTConfig):
    mab_cfg = cfg.mab_cfg()
    params: dict[str, Any] = {
        "attention": {
            "in_proj_w": _arr(sd, prefix + "attention.in_proj_weight"),
            "in_proj_b": _arr(sd, prefix + "attention.in_proj_bias"),
            "out_w": _arr(sd, prefix + "attention.out_proj.weight"),
            "out_b": _arr(sd, prefix + "attention.out_proj.bias"),
        }
    }
    params["ff"], ff_state = mlp_from_torch(sd, prefix + "ff.", mab_cfg.ff)
    if mab_cfg.layer_norm:
        for name in ("norm1", "norm2"):
            params[name] = {
                "scale": _arr(sd, f"{prefix}{name}.weight"),
                "bias": _arr(sd, f"{prefix}{name}.bias"),
            }
    return params, {"ff": ff_state}


def _sab_from_torch(sd: Mapping[str, np.ndarray], prefix: str, cfg: GAPTConfig):
    if not cfg.use_isab:
        p, s = _mab_from_torch(sd, prefix + "mab.", cfg)
        return {"mab": p}, {"mab": s}
    p0, s0 = _mab_from_torch(sd, prefix + "mab0.", cfg)
    p1, s1 = _mab_from_torch(sd, prefix + "mab1.", cfg)
    return {"I": _arr(sd, prefix + "I"), "mab0": p0, "mab1": p1}, {"mab0": s0, "mab1": s1}


def gapt_g_from_torch(sd: Mapping[str, np.ndarray], cfg: GAPTConfig) -> tuple[dict, dict]:
    params: dict[str, Any] = {"sabs": []}
    state: dict[str, Any] = {"sabs": []}
    for i in range(cfg.sab_layers):
        p, s = _sab_from_torch(sd, f"sabs.{i}.", cfg)
        params["sabs"].append(p)
        state["sabs"].append(s)
    params["final_fc"], state["final_fc"] = mlp_from_torch(sd, "final_fc.", cfg.final_fc_cfg())
    return params, state


def rgan_g_from_torch(sd: Mapping[str, np.ndarray]) -> tuple[dict, dict]:
    """rGANG: Linear layers at even Sequential indices (ext_models.py:21-31)."""
    n = len([k for k in sd if k.endswith(".weight")])
    params = {
        "layers": [
            {"w": _arr(sd, f"model.{2 * i}.weight"), "b": _arr(sd, f"model.{2 * i}.bias")}
            for i in range(n)
        ]
    }
    return params, {}


def graphcnn_g_from_torch(sd: Mapping[str, np.ndarray], cfg) -> tuple[dict, dict]:
    """GraphCNNGANG: old-PyG NNConv layout (``layers.{i}.root [in, out]``,
    edge MLP ``layers.{i}.nn``, wrapped ``bn_layers.{i}.module``)."""
    params: dict = {
        "dense": {"w": _arr(sd, "dense.weight"), "b": _arr(sd, "dense.bias")},
        "convs": [],
        "bn": [],
    }
    state: dict = {"bn": []}
    num = len(cfg.all_sizes) - 1
    for i in range(num):
        params["convs"].append(
            {
                "edge": {"w": _arr(sd, f"layers.{i}.nn.weight"), "b": _arr(sd, f"layers.{i}.nn.bias")},
                # old PyG root is [in, out]; ours is torch-Linear [out, in]
                "root": {"w": _arr(sd, f"layers.{i}.root").T, "b": _arr(sd, f"layers.{i}.bias")},
            }
        )
        bn = f"bn_layers.{i}.module."
        params["bn"].append({"scale": _arr(sd, bn + "weight"), "bias": _arr(sd, bn + "bias")})
        state["bn"].append(
            {"mean": _arr(sd, bn + "running_mean"), "var": _arr(sd, bn + "running_var")}
        )
    return params, state


def treegan_g_from_torch(sd: Mapping[str, np.ndarray], cfg) -> tuple[dict, dict]:
    params: dict = {"layers": []}
    for depth in range(cfg.layer_num):
        base = f"gcn.TreeGCN_{depth}."
        params["layers"].append(
            {
                "w_root": [_arr(sd, base + f"W_root.{i}.weight") for i in range(depth + 1)],
                "w_branch": _arr(sd, base + "W_branch"),
                "w_loop1": _arr(sd, base + "W_loop.0.weight"),
                "w_loop2": _arr(sd, base + "W_loop.1.weight"),
                "bias": _arr(sd, base + "bias"),
            }
        )
    return params, {}


def generator_from_torch(model: str, sd: Mapping[str, np.ndarray], cfg) -> tuple[dict, dict]:
    """Dispatch a trained-model G state dict onto the right importer.

    Note the shipped ``mplfc_*`` checkpoints are in the *modern* MPGenerator
    layout despite their cards saying ``old_mpgan`` — detected via the
    ``mp_layers.`` key prefix.
    """
    if model == "mpgan" or (model == "old_mpgan" and any(k.startswith("mp_layers.") for k in sd)):
        return mp_generator_from_torch(sd, cfg)
    if model == "old_mpgan":
        from ..models.old_mpgan import old_mpgan_from_torch

        return old_mpgan_from_torch(sd, cfg)
    if model == "gapt":
        return gapt_g_from_torch(sd, cfg)
    if model == "rgan":
        return rgan_g_from_torch(sd)
    if model == "graphcnngan":
        return graphcnn_g_from_torch(sd, cfg)
    if model == "treegan":
        return treegan_g_from_torch(sd, cfg)
    if model == "pcgan":
        return rgan_g_from_torch(sd)  # latent_G is the same Sequential layout
    raise ValueError(f"unknown model {model!r}")


def gapt_d_from_torch(sd: Mapping[str, np.ndarray], cfg: GAPTConfig) -> tuple[dict, dict]:
    params: dict[str, Any] = {"sabs": []}
    state: dict[str, Any] = {"sabs": []}
    params["input_embedding"], state["input_embedding"] = mlp_from_torch(
        sd, "input_embedding.", cfg.embed_cfg()
    )
    for i in range(cfg.sab_layers):
        p, s = _sab_from_torch(sd, f"sabs.{i}.", cfg)
        params["sabs"].append(p)
        state["sabs"].append(s)
    pma_p, pma_s = _mab_from_torch(sd, "pma.mab.", cfg)
    params["pma"] = {"S": _arr(sd, "pma.S"), "mab": pma_p}
    state["pma"] = pma_s
    params["final_fc"], state["final_fc"] = mlp_from_torch(sd, "final_fc.", cfg.final_fc_cfg())
    return params, state
