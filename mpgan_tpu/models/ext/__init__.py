"""External baseline model families (SURVEY.md C10-C14, ext_models/).

Each family follows the framework-wide functional contract
(``init(rng, cfg)`` / ``apply(cfg, params, state, x, labels, ...)``) so the
GAN engine, sampling API and evaluation stack drive them unchanged.
"""

from __future__ import annotations

from typing import Any

from .rgan import RGANGConfig, RGANDConfig, rgan_g_init, rgan_g_apply, rgan_d_init, rgan_d_apply
from .pointnet import PointNetMixDConfig, pointnet_d_init, pointnet_d_apply
from .treegan import TreeGANGConfig, treegan_g_init, treegan_g_apply
from .graphcnn import GraphCNNGANGConfig, graphcnn_g_init, graphcnn_g_apply
from .pcgan import (
    PCGANConfig,
    latent_g_init,
    latent_g_apply,
    latent_d_init,
    latent_d_apply,
    g_inv_init,
    g_inv_apply,
    g_pc_init,
    g_pc_apply,
)

__all__ = [
    "build_generator",
    "build_discriminator",
    "RGANGConfig",
    "RGANDConfig",
    "PointNetMixDConfig",
    "TreeGANGConfig",
    "GraphCNNGANGConfig",
    "PCGANConfig",
]


def build_generator(args: Any):
    if args.model == "rgan":
        cfg = RGANGConfig(
            latent_dim=args.latent_dim,
            fc_layers=tuple(args.rgang_fc),
            num_hits=args.num_hits,
            node_feat_size=args.node_feat_size,
            leaky_relu_alpha=args.leaky_relu_alpha,
        )
        return cfg, rgan_g_init, rgan_g_apply
    if args.model == "graphcnngan":
        cfg = GraphCNNGANGConfig(
            latent_dim=args.latent_dim,
            layers=tuple(args.graphcnng_layers),
            num_hits=args.num_hits,
            node_feat_size=args.node_feat_size,
            num_knn=args.num_knn,
            final_tanh=args.graphcnng_tanh,
            leaky_relu_alpha=args.leaky_relu_alpha,
        )
        return cfg, graphcnn_g_init, graphcnn_g_apply
    if args.model == "treegan":
        cfg = TreeGANGConfig(
            features=tuple(args.treegang_features),
            degrees=tuple(args.treegang_degrees),
            support=args.treegang_support,
        )
        return cfg, treegan_g_init, treegan_g_apply
    if args.model == "pcgan":
        cfg = PCGANConfig(
            node_feat_size=args.node_feat_size,
            latent_dim=args.pcgan_latent_dim,
            z1_dim=args.pcgan_z1_dim,
            z2_dim=args.pcgan_z2_dim,
            d_dim=args.pcgan_d_dim,
            pool=args.pcgan_pool,
        )
        return cfg, latent_g_init, latent_g_apply
    raise ValueError(f"unknown ext generator {args.model!r}")


def build_discriminator(args: Any, model_d: str):
    if model_d == "rgan":
        cfg = RGANDConfig(
            sfc_layers=tuple(args.rgand_sfc if args.rgand_sfc else [64, 128, 256, 512]),
            fc_layers=tuple(args.rgand_fc if args.rgand_fc else [128, 64]),
            num_hits=args.num_hits,
            node_feat_size=args.node_feat_size,
            leaky_relu_alpha=args.leaky_relu_alpha,
        )
        return cfg, rgan_d_init, rgan_d_apply
    if model_d == "pointnet":
        cfg = PointNetMixDConfig(
            pointfc_layers=tuple(args.pointnetd_pointfc),
            fc_layers=tuple(args.pointnetd_fc),
            num_hits=args.num_hits,
            node_feat_size=args.node_feat_size,
            mask=args.get("mask", False),
            leaky_relu_alpha=args.leaky_relu_alpha,
        )
        return cfg, pointnet_d_init, pointnet_d_apply
    if model_d == "pcgan":
        cfg = PCGANConfig(
            node_feat_size=args.node_feat_size,
            latent_dim=args.pcgan_latent_dim,
            z1_dim=args.pcgan_z1_dim,
            z2_dim=args.pcgan_z2_dim,
            d_dim=args.pcgan_d_dim,
            pool=args.pcgan_pool,
        )
        return cfg, latent_d_init, latent_d_apply
    raise ValueError(f"unknown ext discriminator {model_d!r}")
