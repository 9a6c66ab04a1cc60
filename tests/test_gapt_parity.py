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


def test_packed_attention_group_selection_and_large_n_fallback():
    """Jet-head packing picks ~128-row groups for small clouds and disables
    itself (g=1, unpacked path) for N >= 128; both paths agree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpgan_tpu.ops.attention import _pack_group, mha_apply, mha_init

    assert _pack_group(16, 30, 30) == 4
    assert _pack_group(16, 150, 150) == 1  # no packing at large N
    assert _pack_group(7, 30, 30) == 1  # prime batch*heads: no divisor
    assert _pack_group(16, 1, 30) == 4  # PMA: 1 query row, N keys

    # N=150 exercises the unpacked branch end-to-end
    params = mha_init(jax.random.PRNGKey(0), 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 150, 32)) * 0.3
    out = mha_apply(params, 4, x, x, x)
    assert out.shape == (2, 150, 32)
    assert bool(jnp.isfinite(out).all())

    # batch-size invariance under packing: a b=4 call (bh=16 -> g=4 packs
    # across jets) must reproduce the b=1 call's rows exactly (any cross-jet
    # leakage through the packed block mask would show here)
    xq = jax.random.normal(jax.random.PRNGKey(2), (4, 20, 32)) * 0.3
    mask = jnp.zeros((4, 20, 20), bool).at[:, :, 15:].set(True)
    packed = mha_apply(params, 4, xq, xq, xq, mask)
    one = mha_apply(params, 4, xq[:1], xq[:1], xq[:1], mask[:1])
    np.testing.assert_allclose(np.asarray(packed[:1]), np.asarray(one), rtol=1e-5, atol=1e-6)
