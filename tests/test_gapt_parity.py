"""Parity tests for GAPT (set-transformer GAN) vs the reference torch modules."""

import ast

import numpy as np
import jax.numpy as jnp
import pytest

from mpgan_tpu.models.gapt import gapt_d_apply, gapt_g_apply
from mpgan_tpu.training.config import build_gapt, from_args_dict
from mpgan_tpu.utils.torch_import import gapt_d_from_torch, gapt_g_from_torch


def _card(**overrides):
    d = dict(
        model="gapt", model_D="gapt", num_hits=30, node_feat_size=3,
        gapt_embed_dim=32, num_heads=4, sab_layers_gen=2, sab_layers_disc=2,
        sab_fc_layers=[], final_fc_layers_gen=[], final_fc_layers_disc=[],
        gapt_mask=True, use_isab=False, num_isab_nodes=10,
        layer_norm_gen=False, layer_norm_disc=False,
        gen_dropout=0.0, disc_dropout=0.0, leaky_relu_alpha=0.2,
        batch_norm_gen=False, batch_norm_disc=False,
        spectral_norm_gen=False, spectral_norm_disc=False,
    )
    d.update(overrides)
    return d


def _ref_models(reference_path, torch, card, gen):
    import setup_training as ref_setup

    ref_args = ref_setup.objectview(dict(card))
    torch.manual_seed(0)
    return ref_setup.setup_gapt(ref_args, gen=gen).eval()


@pytest.mark.parametrize(
    "overrides",
    [
        {},
        {"layer_norm_gen": True, "layer_norm_disc": True},
        {"sab_fc_layers": [64]},
        {"use_isab": True},
        {"spectral_norm_gen": True, "spectral_norm_disc": True},
    ],
)
def test_gapt_parity(reference_path, torch, overrides):
    card = _card(**overrides)
    args = from_args_dict(card, apply_processing=False)

    G_ref = _ref_models(reference_path, torch, card, gen=True)
    g_cfg = build_gapt(args, gen=True)
    g_sd = {k: np.asarray(v.detach().numpy()) for k, v in G_ref.state_dict().items()}
    g_params, g_state = gapt_g_from_torch(g_sd, g_cfg)

    rng = np.random.RandomState(5)
    noise = (rng.randn(6, 30, card["gapt_embed_dim"]) * 0.2).astype(np.float32)
    counts = rng.randint(5, 31, size=6).astype(np.float32)
    labels = (counts / 30.0)[:, None].astype(np.float32)

    with torch.no_grad():
        ref_out = G_ref(torch.from_numpy(noise), torch.from_numpy(labels)).numpy()
    ours, _ = gapt_g_apply(g_cfg, g_params, g_state, jnp.asarray(noise), jnp.asarray(labels))
    assert ours.shape == ref_out.shape == (6, 30, 4)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-3, atol=1e-5)

    D_ref = _ref_models(reference_path, torch, card, gen=False)
    d_cfg = build_gapt(args, gen=False)
    d_sd = {k: np.asarray(v.detach().numpy()) for k, v in D_ref.state_dict().items()}
    d_params, d_state = gapt_d_from_torch(d_sd, d_cfg)

    with torch.no_grad():
        ref_score = D_ref(torch.from_numpy(ref_out)).numpy()
    ours_score, _ = gapt_d_apply(d_cfg, d_params, d_state, jnp.asarray(ours))
    np.testing.assert_allclose(
        np.asarray(ours_score)[:, 0], ref_score.reshape(-1), rtol=1e-3, atol=1e-5
    )
