"""Legacy MPGAN ("old_mpgan" / ``Graph_GAN``, mpgan/old_model.py:9-575).

Kept for loading the reference's shipped legacy checkpoints (the
``mpfc``/``mplfc``/``fcmp`` trained-model families set
``model: 'old_mpgan'``). Semantically it is the modern MPNet with these
differences:

- every fn (node network) ends at ``hidden_node_size``; the generator's
  output features are a *slice* ``x[..., :node_feat_size]`` with tanh applied
  to the slice only (old_model.py:418-423),
- the discriminator's first MP layer uses only physical coordinates for
  distance edge features even with ``all_ef`` (old_model.py:481-486) — the
  same rule the modern builder encodes via ``mp_args_first_layer_disc``,
- ``mask_c`` reads the particle count from ``labels[:, clabels]`` instead of
  ``labels[:, -1]`` (old_model.py:298; identical when clabels == 0 and the
  only jet feature is the count, as in all shipped configs),
- the mask network ``fmg`` applies an activation on its *final* layer too
  (old_model.py:286-294),
- ``mask_feat_bin`` uses an inverted sign convention (old_model.py:426-430),
- a non-``dea`` discriminator slices feature 0 and mask-averages it
  (old_model.py:453-462),
- masking can be delayed until ``mask_epoch`` (old_model.py:268-269).

Parameter layout mirrors the torch module (``fe.{i}.{j}`` / ``fn.{i}.{j}`` /
``fnd.{i}`` / ``lfc`` / ``fmg.{i}``) for direct weight import.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.linear import MLPConfig, linear_init, mlp_apply, mlp_init
from ..ops.masking import mask_from_counts, split_mask
from ..ops.mp import MPLayerConfig, mp_layer_apply, mp_layer_init
from .mpgan import MaskConfig, _build_layers


@dataclasses.dataclass(frozen=True)
class OldMPGANConfig:
    is_gen: bool
    num_particles: int
    node_feat_size: int
    hidden_node_size: int
    layers: tuple[MPLayerConfig, ...]
    mask: MaskConfig
    clabels: int = 0
    gtanh: bool = True
    lfc: bool = False
    lfc_latent_size: int = 128
    first_layer_node_size: int = 32
    dea: bool = True
    dea_sum: bool = True
    fnd_cfg: MLPConfig | None = None
    fmg_cfg: MLPConfig | None = None
    mask_manual: bool = False
    mask_real_only: bool = False
    mask_epoch: int = 0
    final_sigmoid: bool = True  # D only; off for w/hinge losses

    @staticmethod
    def build(args: Any, gen: bool) -> "OldMPGANConfig":
        """From a (processed) reference args object, mirroring
        Graph_GAN.__init__ (old_model.py:12-197)."""
        first_node = (
            (args.latent_node_size or args.hidden_node_size)
            if gen
            else args.node_feat_size
        )
        linear_args = {
            "leaky_relu_alpha": args.leaky_relu_alpha,
            "dropout_p": args.gen_dropout if gen else args.disc_dropout,
            "batch_norm": args.batch_norm_gen if gen else args.batch_norm_disc,
            "spectral_norm": args.spectral_norm_gen if gen else args.spectral_norm_disc,
        }
        mp_args = {
            "pos_diffs": args.pos_diffs,
            "all_ef": args.all_ef,
            "coords": args.coords,
            "delta_coords": args.deltacoords,
            "delta_r": args.deltar,
            "clabels": args.clabels if args.clabels_hl else 0,
            "mask_fne_np": args.mask_fne_np,
            "fully_connected": args.fully_connected,
            "num_knn": args.num_knn,
            "self_loops": args.self_loops,
            "sum_agg": args.sum,
        }
        first_args = {"clabels": args.clabels if args.clabels_fl else 0}
        if not gen:
            first_args["all_ef"] = False
        mp_iters = (args.mp_iters_gen if gen else args.mp_iters_disc) or args.mp_iters
        fe1 = args.fe1g if gen else args.fe1d
        layers = _build_layers(
            args.num_hits, first_node, mp_iters, list(args.fe), list(args.fn),
            list(fe1) if fe1 else None, None, args.hidden_node_size,
            args.hidden_node_size,  # old model: every fn ends at hidden size
            mp_args, first_args, linear_args,
        )
        mask = MaskConfig(
            mask_learn=args.mask_learn,
            mask_learn_bin=args.mask_learn_bin,
            mask_learn_sep=args.mask_learn_sep,
            mask_c=args.mask_c,
            mask_fne_np=args.mask_fne_np,
            mask_feat_bin=args.mask_feat_bin,
            mask_fnd_np=args.mask_fnd_np,
            fmg=tuple(args.fmg),
        )
        fnd_cfg = None
        if not gen and args.dea:
            fnd_cfg = MLPConfig.build(
                list(args.fnd),
                input_size=args.hidden_node_size + int(args.mask_fnd_np),
                output_size=1, final_linear=True, **linear_args,
            )
        fmg_cfg = None
        if gen and (args.mask_learn or args.mask_learn_sep):
            # the legacy fmg activates every layer (old_model.py:286-294)
            fmg_cfg = MLPConfig.build(
                list(args.fmg), input_size=first_node,
                output_size=1 if args.mask_learn else args.num_hits,
                final_linear=False, **linear_args,
            )
        return OldMPGANConfig(
            is_gen=gen,
            num_particles=args.num_hits,
            node_feat_size=args.node_feat_size,
            hidden_node_size=args.hidden_node_size,
            layers=layers,
            mask=mask,
            clabels=args.clabels,
            gtanh=args.gtanh,
            lfc=args.lfc and gen,
            lfc_latent_size=args.lfc_latent_size,
            first_layer_node_size=first_node,
            dea=args.dea if not gen else False,
            dea_sum=args.sum,
            fnd_cfg=fnd_cfg,
            fmg_cfg=fmg_cfg,
            mask_manual=args.mask_manual,
            mask_real_only=args.mask_real_only,
            mask_epoch=args.mask_epoch,
            final_sigmoid=args.loss not in ("w", "hinge"),
        )


def old_mpgan_init(rng: jax.Array, cfg: OldMPGANConfig, dtype=jnp.float32):
    keys = jax.random.split(rng, len(cfg.layers) + 3)
    params: dict = {"mp_layers": []}
    state: dict = {"mp_layers": []}
    for i, layer_cfg in enumerate(cfg.layers):
        p, s = mp_layer_init(keys[i], layer_cfg, dtype)
        params["mp_layers"].append(p)
        state["mp_layers"].append(s)
    if cfg.lfc:
        params["lfc"] = linear_init(
            keys[-3], cfg.lfc_latent_size, cfg.num_particles * cfg.first_layer_node_size, dtype
        )
    if cfg.fnd_cfg is not None:
        params["fnd"], state["fnd"] = mlp_init(keys[-2], cfg.fnd_cfg, dtype)
    if cfg.fmg_cfg is not None:
        params["fmg"], state["fmg"] = mlp_init(keys[-1], cfg.fmg_cfg, dtype)
    return params, state


def old_mpgan_apply(
    cfg: OldMPGANConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    labels: jax.Array | None = None,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    update_sn: bool = True,
    epoch: int = 0,
) -> tuple[jax.Array, dict]:
    """Graph_GAN.forward (old_model.py:243-466)."""
    m = cfg.mask
    n_rngs = len(cfg.layers) + 2
    rngs = jax.random.split(rng, n_rngs) if rng is not None else [None] * n_rngs
    new_state: dict = {"mp_layers": []}

    if cfg.lfc:
        w, b = params["lfc"]["w"], params["lfc"]["b"]
        x = (x @ w.T + b).reshape(x.shape[0], cfg.num_particles, cfg.first_layer_node_size)

    mask = None
    num_jet_particles = None
    if cfg.is_gen:
        mask_bool = (m.mask_learn or m.mask_c or m.mask_learn_sep) and epoch >= cfg.mask_epoch
        if m.mask_learn:
            raw, fmg_state = mlp_apply(
                cfg.fmg_cfg, params["fmg"], state["fmg"], x, train=train, rng=rngs[-1]
            )
            mask = jnp.sign(raw) if m.mask_learn_bin else jax.nn.sigmoid(raw)
            new_state["fmg"] = fmg_state
        elif m.mask_c:
            # legacy label indexing (old_model.py:298)
            nump = (labels[:, cfg.clabels] * cfg.num_particles).astype(jnp.int32) - 1
            mask = mask_from_counts(x[:, :, 0], nump)
        elif m.mask_learn_sep:
            nump_in = x[:, -1, :]
            x = x[:, :-1, :]
            logits, fmg_state = mlp_apply(
                cfg.fmg_cfg, params["fmg"], state["fmg"], nump_in, train=train, rng=rngs[-1]
            )
            mask = mask_from_counts(x[:, :, 0], jnp.argmax(logits, axis=1))
            new_state["fmg"] = fmg_state
        if m.mask_fne_np and mask is not None:
            num_jet_particles = jnp.mean(mask, axis=1)
    else:
        mask_bool = (
            cfg.mask_manual or cfg.mask_real_only or m.mask_learn or m.mask_c or m.mask_learn_sep
        ) and epoch >= cfg.mask_epoch
        if mask_bool or m.mask_fnd_np:
            _, mask = split_mask(x)
        if cfg.mask_manual or m.mask_learn or m.mask_c or m.mask_learn_sep:
            x = x[:, :, : cfg.node_feat_size]
        if m.mask_fne_np and mask is not None:
            num_jet_particles = jnp.mean(mask, axis=1)

    mp_mask = mask if mask_bool else None
    for i, layer_cfg in enumerate(cfg.layers):
        x, s = mp_layer_apply(
            layer_cfg, params["mp_layers"][i], state["mp_layers"][i], x,
            mask=mp_mask, labels=labels, num_jet_particles=num_jet_particles,
            train=train, rng=rngs[i], update_sn=update_sn,
        )
        new_state["mp_layers"].append(s)

    if cfg.is_gen:
        out = x[:, :, : cfg.node_feat_size]
        if cfg.gtanh:
            out = jnp.tanh(out)
        if mask_bool:
            out = jnp.concatenate([out, mask - 0.5], axis=2)
        if m.mask_feat_bin:
            # inverted sign vs the modern model (old_model.py:426-430)
            inv = (out[:, :, 3:4] < 0).astype(out.dtype) - 0.5
            out = jnp.concatenate([out[:, :, :3], inv], axis=2)
        return out, new_state

    if cfg.dea:
        if mask_bool:
            x = jnp.sum(x * mask, axis=1)
            if not cfg.dea_sum:
                x = x / (jnp.sum(mask, axis=1) + 1e-12)
        else:
            x = jnp.sum(x, axis=1) if cfg.dea_sum else jnp.mean(x, axis=1)
        if m.mask_fnd_np:
            x = jnp.concatenate([jnp.mean(mask, axis=1), x], axis=1)
        x, fnd_state = mlp_apply(
            cfg.fnd_cfg, params["fnd"], state["fnd"], x, train=train, rng=rngs[-2]
        )
        new_state["fnd"] = fnd_state
    else:
        x = x[:, :, :1]
        if mask_bool:
            x = jnp.sum(x * mask, axis=1) / (jnp.sum(mask, axis=1) + 1e-12)
        else:
            x = jnp.mean(x, axis=1)
    if cfg.final_sigmoid:
        x = jax.nn.sigmoid(x)
    return x, new_state


def old_mpgan_from_torch(sd, cfg: OldMPGANConfig):
    """Import a ``Graph_GAN`` state dict (fe.{i}.{j}.* / fn.{i}.{j}.* /
    fnd.{i}.* / lfc.* / fmg.{i}.*, incl. spectral-norm wrapped layers)."""

    from ..utils.torch_import import _arr

    def import_stack(prefix: str, mlp_cfg: MLPConfig, bn_prefix: str | None = None):
        p: dict = {"layers": []}
        s: dict = {}
        if mlp_cfg.spectral_norm:
            s["sn_u"] = []
        for j in range(mlp_cfg.num_layers):
            if mlp_cfg.spectral_norm:
                base = f"{prefix}.{j}.module."
                p["layers"].append(
                    {"w": _arr(sd, base + "weight_bar"), "b": _arr(sd, base + "bias")}
                )
                s["sn_u"].append(_arr(sd, base + "weight_u"))
            else:
                base = f"{prefix}.{j}."
                p["layers"].append({"w": _arr(sd, base + "weight"), "b": _arr(sd, base + "bias")})
        return p, s

    params: dict = {"mp_layers": []}
    state: dict = {"mp_layers": []}
    for i, layer_cfg in enumerate(cfg.layers):
        fe_p, fe_s = import_stack(f"fe.{i}", layer_cfg.fe)
        fn_p, fn_s = import_stack(f"fn.{i}", layer_cfg.fn)
        params["mp_layers"].append({"fe": fe_p, "fn": fn_p})
        state["mp_layers"].append({"fe": fe_s, "fn": fn_s})
    if cfg.lfc:
        params["lfc"] = {"w": _arr(sd, "lfc.weight"), "b": _arr(sd, "lfc.bias")}
    if cfg.fnd_cfg is not None:
        params["fnd"], state["fnd"] = import_stack("fnd", cfg.fnd_cfg)
    if cfg.fmg_cfg is not None:
        params["fmg"], state["fmg"] = import_stack("fmg", cfg.fmg_cfg)
    return params, state
