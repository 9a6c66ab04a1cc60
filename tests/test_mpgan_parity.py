"""Golden-value parity tests: our JAX MPGAN vs the reference torch modules.

The reference modules are *imported* (never copied) from /root/reference and
run with identical weights; outputs must match to fp32 tolerance. This is the
"golden-value tests importing trained_models weights" strategy from
SURVEY.md §4 — the reference itself has no test suite.
"""

import ast

import numpy as np
import jax.numpy as jnp
import pytest

from mpgan_tpu.models.mpgan import (
    mp_discriminator_apply,
    mp_generator_apply,
)
from mpgan_tpu.ops.mp import MPLayerConfig, mp_layer_apply
from mpgan_tpu.training.config import (
    build_mpgan_discriminator,
    build_mpgan_generator,
    from_args_dict,
    from_args_txt,
)
from mpgan_tpu.utils.torch_import import (
    load_torch_state_dict,
    mlp_from_torch,
    mp_discriminator_from_torch,
    mp_generator_from_torch,
)


def _ref_mplayer(torch, **kwargs):
    from mpgan.model import MPLayer

    torch.manual_seed(0)
    return MPLayer(**kwargs).eval()


def _import_mplayer(net, cfg):
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    fe_p, fe_s = mlp_from_torch(sd, "fe.", cfg.fe)
    fn_p, fn_s = mlp_from_torch(sd, "fn.", cfg.fn)
    return {"fe": fe_p, "fn": fn_p}, {"fe": fe_s, "fn": fn_s}


@pytest.mark.parametrize(
    "mp_kwargs",
    [
        {},
        {"pos_diffs": True, "all_ef": True},
        {"pos_diffs": True, "all_ef": False, "delta_r": True},
        {"fully_connected": False, "num_knn": 5},
        {"fully_connected": False, "num_knn": 5, "self_loops": False},
        {"sum": False},
    ],
)
def test_mp_layer_parity(reference_path, torch, mp_kwargs):
    ref_kwargs = dict(
        input_node_size=8, fe_layers=[24, 16], fn_layers=[32], output_node_size=8
    )
    net = _ref_mplayer(torch, **ref_kwargs, **mp_kwargs)

    our_kwargs = dict(mp_kwargs)
    if "sum" in our_kwargs:
        our_kwargs["sum_agg"] = our_kwargs.pop("sum")
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, **our_kwargs
    )
    params, state = _import_mplayer(net, cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(4, 12, 8).astype(np.float32)
    counts = np.array([12, 5, 8, 1])
    mask = (np.arange(12)[None, :] < counts[:, None]).astype(np.float32)[..., None]

    with torch.no_grad():
        ref = net(
            torch.from_numpy(x), use_mask=True, mask=torch.from_numpy(mask)
        ).numpy()
    ours, _ = mp_layer_apply(cfg, params, state, jnp.asarray(x), mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def _mp_g_args(reference_path):
    return from_args_txt(str(reference_path / "trained_models/mp_g/args.txt"))


@pytest.mark.parametrize("jet", ["g", "t", "q"])
def test_generator_parity_trained_weights(reference_path, torch, jet):
    """Flagship golden test: trained_models/mp_{g,t,q} generator weights
    produce identical jets in torch and JAX from the same noise."""
    import setup_training as ref_setup

    args_txt = reference_path / f"trained_models/mp_{jet}/args.txt"
    ref_args = ref_setup.objectview(ast.literal_eval(args_txt.read_text()))
    G_ref = ref_setup.setup_mpgan(ref_args, gen=True).eval()
    sd_path = str(reference_path / f"trained_models/mp_{jet}/G_best_epoch.pt")
    G_ref.load_state_dict(torch.load(sd_path, map_location="cpu"))

    cfg = build_mpgan_generator(from_args_txt(str(args_txt)))
    params, state = mp_generator_from_torch(load_torch_state_dict(sd_path), cfg)

    rng = np.random.RandomState(7)
    noise = (rng.randn(16, 30, 32) * 0.2).astype(np.float32)
    counts = rng.randint(5, 31, size=16).astype(np.float32)
    labels = (counts / 30.0)[:, None].astype(np.float32)

    with torch.no_grad():
        ref = G_ref(torch.from_numpy(noise), torch.from_numpy(labels)).numpy()
    ours, _ = mp_generator_apply(cfg, params, state, jnp.asarray(noise), jnp.asarray(labels))
    assert ours.shape == ref.shape == (16, 30, 4)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=2e-5)
    # the mask feature matches the conditioned particle counts exactly
    np.testing.assert_array_equal(
        (np.asarray(ours)[:, :, -1] > 0).sum(1), counts.astype(np.int64)
    )


def test_discriminator_parity_random_weights(reference_path, torch):
    import setup_training as ref_setup

    args_txt = reference_path / "trained_models/mp_g/args.txt"
    ref_args = ref_setup.objectview(ast.literal_eval(args_txt.read_text()))
    torch.manual_seed(1)
    D_ref = ref_setup.setup_mpgan(ref_args, gen=False).eval()
    sd = {k: np.asarray(v.detach().numpy()) for k, v in D_ref.state_dict().items()}

    cfg = build_mpgan_discriminator(_mp_g_args(reference_path))
    params, state = mp_discriminator_from_torch(sd, cfg)

    rng = np.random.RandomState(8)
    x = np.tanh(rng.randn(6, 30, 3)).astype(np.float32)
    counts = rng.randint(1, 31, size=6)
    mask = (np.arange(30)[None, :] < counts[:, None]).astype(np.float32)[..., None]
    data = np.concatenate([x, mask - 0.5], axis=2)

    with torch.no_grad():
        ref = D_ref(torch.from_numpy(data)).numpy()
    ours, _ = mp_discriminator_apply(cfg, params, state, jnp.asarray(data))
    assert ours.shape == ref.shape == (6, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_generator_parity_spectral_norm(reference_path, torch):
    """Spectral-norm G: power-iteration state advances identically."""
    import setup_training as ref_setup

    card = ast.literal_eval((reference_path / "trained_models/mp_g/args.txt").read_text())
    card["spectral_norm_gen"] = True
    ref_args = ref_setup.objectview(card)
    torch.manual_seed(3)
    G_ref = ref_setup.setup_mpgan(ref_args, gen=True).eval()
    sd = {k: np.asarray(v.detach().numpy()) for k, v in G_ref.state_dict().items()}

    args = from_args_dict(card, apply_processing=False)
    cfg = build_mpgan_generator(args)
    params, state = mp_generator_from_torch(sd, cfg)

    rng = np.random.RandomState(9)
    noise = (rng.randn(4, 30, 32) * 0.2).astype(np.float32)
    labels = (rng.randint(1, 31, size=4).astype(np.float32) / 30.0)[:, None]

    with torch.no_grad():
        ref1 = G_ref(torch.from_numpy(noise), torch.from_numpy(labels)).numpy()
        ref2 = G_ref(torch.from_numpy(noise), torch.from_numpy(labels)).numpy()
    ours1, state1 = mp_generator_apply(cfg, params, state, jnp.asarray(noise), jnp.asarray(labels))
    ours2, _ = mp_generator_apply(cfg, params, state1, jnp.asarray(noise), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(ours1), ref1, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours2), ref2, rtol=1e-3, atol=1e-4)
