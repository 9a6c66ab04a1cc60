"""Model registry: args -> (configs, init/apply fns, noise spec).

The functional analogue of ``setup_training.models`` + ``get_model_args``
(setup_training.py:1350-1497): every generator/discriminator family exposes
``init(rng, cfg) -> (params, state)`` and
``apply(cfg, params, state, x, labels, *, train, rng, update_sn) ->
(out, new_state)``, so the train step and sampling API are model-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from ..training import config as cfg_mod
from ..training.sampling import NoiseSpec, noise_spec
from . import ext
from .gapt import gapt_d_apply, gapt_d_init, gapt_g_apply, gapt_g_init
from .mpgan import (
    mp_discriminator_apply,
    mp_discriminator_init,
    mp_generator_apply,
    mp_generator_init,
)


@dataclasses.dataclass
class ModelSuite:
    model: str
    model_d: str
    g_cfg: Any
    d_cfg: Any
    g_init: Callable
    d_init: Callable
    g_apply: Callable
    d_apply: Callable
    noise: NoiseSpec
    # maps real clouds into the training representation (PCGAN G_inv latents)
    encode_real: Callable | None = None
    # decodes generator output into clouds at eval time (PCGAN G_pc)
    decode_eval: Callable | None = None
    # post-generation hook applied to G output (mask_manual pT cutoff,
    # train.py:208-210)
    post_gen: Callable | None = None


def _model_args(args: cfg_mod.Args) -> dict[str, Any]:
    """Noise-shape args per get_model_args (setup_training.py:1459-1497)."""
    return {
        "lfc": args.lfc,
        "lfc_latent_size": args.lfc_latent_size,
        "mask_learn_sep": args.mask_learn_sep,
        "latent_node_size": args.latent_node_size or args.hidden_node_size,
        "embed_dim": args.gapt_embed_dim,
        "latent_dim": args.latent_dim,
        "treegang_features": list(args.treegang_features),
        "pcgan_latent_dim": args.pcgan_latent_dim,
        "pcgan_z2_dim": args.pcgan_z2_dim,
        "sample_points": False,
    }


def build_suite(args: cfg_mod.Args, pcgan_weights_dir: str | None = None) -> ModelSuite:
    model = args.model
    model_d = args.model_D or {"mpgan": "mpgan", "pcgan": "pcgan", "gapt": "gapt"}.get(
        model, "rgan"
    )
    spec = noise_spec(model, _model_args(args), args.num_hits, args.sd)

    if model == "mpgan":
        g_cfg = cfg_mod.build_mpgan_generator(args)
        g_init, g_apply = mp_generator_init, mp_generator_apply
    elif model == "old_mpgan":
        from .old_mpgan import OldMPGANConfig, old_mpgan_apply, old_mpgan_init

        g_cfg = OldMPGANConfig.build(args, gen=True)
        g_init, g_apply = old_mpgan_init, old_mpgan_apply
    elif model == "gapt":
        g_cfg = cfg_mod.build_gapt(args, gen=True)
        g_init, g_apply = gapt_g_init, gapt_g_apply
    elif model in ("rgan", "graphcnngan", "treegan", "pcgan"):
        g_cfg, g_init, g_apply = ext.build_generator(args)
    else:
        raise ValueError(f"unknown model {model!r}")

    if model_d == "mpgan":
        d_cfg = cfg_mod.build_mpgan_discriminator(args)
        d_init, d_apply = mp_discriminator_init, mp_discriminator_apply
    elif model_d == "old_mpgan":
        from .old_mpgan import OldMPGANConfig, old_mpgan_apply, old_mpgan_init

        d_cfg = OldMPGANConfig.build(args, gen=False)
        d_init, d_apply = old_mpgan_init, old_mpgan_apply
    elif model_d == "gapt":
        d_cfg = cfg_mod.build_gapt(args, gen=False)
        d_init, d_apply = gapt_d_init, gapt_d_apply
    elif model_d in ("rgan", "pointnet", "pcgan"):
        d_cfg, d_init, d_apply = ext.build_discriminator(args, model_d)
    else:
        raise ValueError(f"unknown model_D {model_d!r}")

    encode_real = decode_eval = None
    if model == "pcgan":
        encode_real, decode_eval = _pcgan_hooks(args, pcgan_weights_dir)

    post_gen = None
    if args.get("mask_manual"):
        from ..ops.masking import mask_manual as _mask_manual

        def post_gen(gen_data):
            # pT cutoff 0 (the reference's placeholder, setup_training.py:1495)
            return _mask_manual(
                gen_data, 0.0, mask_exp=args.mask_exp, mask_real_only=args.mask_real_only
            )

    return ModelSuite(
        model=model,
        model_d=model_d,
        g_cfg=g_cfg,
        d_cfg=d_cfg,
        g_init=g_init,
        d_init=d_init,
        g_apply=g_apply,
        d_apply=d_apply,
        noise=spec,
        encode_real=encode_real,
        decode_eval=decode_eval,
        post_gen=post_gen,
    )


def _pcgan_hooks(args: cfg_mod.Args, weights_dir: str | None):
    """PCGAN's pre-trained inference net encodes real clouds to latents for
    training (train.py:837-839) and the point decoder turns generated
    latents back into clouds at eval (train.py:212-213). The shipped
    ``pcgan_G_inv_<jet>.pt`` / ``pcgan_G_pc_<jet>.pt`` weights load from
    ``weights_dir`` (setup_training.py:1429-1456); without them the hooks
    are unavailable and training/eval of the pcgan family raises."""
    import pathlib

    from ..utils.torch_import import load_torch_state_dict
    from .ext.pcgan import (
        PCGANConfig,
        g_inv_apply,
        g_inv_weights_from_torch,
        g_pc_apply,
        g_pc_weights_from_torch,
    )

    if weights_dir is None:
        return None, None
    cfg = PCGANConfig(
        node_feat_size=args.node_feat_size,
        latent_dim=args.pcgan_latent_dim,
        z1_dim=args.pcgan_z1_dim,
        z2_dim=args.pcgan_z2_dim,
        d_dim=args.pcgan_d_dim,
        pool=args.pcgan_pool,
    )
    inv_path = pathlib.Path(weights_dir) / f"pcgan_G_inv_{args.jets}.pt"
    encode_real = None
    if inv_path.exists():
        inv_params, inv_state = g_inv_weights_from_torch(load_torch_state_dict(str(inv_path)), cfg)

        def encode_real(x):
            return g_inv_apply(cfg, inv_params, inv_state, x)[0]

    pc_path = pathlib.Path(weights_dir) / f"pcgan_G_pc_{args.jets}.pt"
    decode_eval = None
    if pc_path.exists():
        pc_params, pc_state = g_pc_weights_from_torch(load_torch_state_dict(str(pc_path)), cfg)

        def decode_eval(latents, point_noise):
            return g_pc_apply(cfg, pc_params, pc_state, latents[:, None, :], point_noise)[0]

    return encode_real, decode_eval
