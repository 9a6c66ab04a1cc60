"""Legacy Graph_GAN parity vs the reference, using the shipped
mpfc/mplfc trained weights (the ``old_mpgan`` model families)."""

import ast

import numpy as np
import jax.numpy as jnp
import pytest

from mpgan_tpu.models.old_mpgan import (
    OldMPGANConfig,
    old_mpgan_apply,
    old_mpgan_from_torch,
)
from mpgan_tpu.training.config import from_args_txt
from mpgan_tpu.utils.torch_import import load_torch_state_dict


def test_old_mpgan_generator_trained_weights(reference_path, torch):
    import setup_training as ref_setup
    from mpgan.old_model import Graph_GAN

    card_path = reference_path / "trained_models/mpfc_g/args.txt"
    sd_path = reference_path / "trained_models/mpfc_g/G_best_epoch.pt"
    card = ast.literal_eval(card_path.read_text())

    ref_args = ref_setup.objectview(dict(card))
    G_ref = Graph_GAN(gen=True, args=ref_args).eval()
    G_ref.load_state_dict(torch.load(str(sd_path), map_location="cpu"))

    args = from_args_txt(str(card_path))
    cfg = OldMPGANConfig.build(args, gen=True)
    params, state = old_mpgan_from_torch(load_torch_state_dict(str(sd_path)), cfg)

    rng = np.random.RandomState(11)
    noise = (rng.randn(8, 128) * 0.2).astype(np.float32)

    with torch.no_grad():
        ref = G_ref(torch.from_numpy(noise)).numpy()
    ours, _ = old_mpgan_apply(cfg, params, state, jnp.asarray(noise))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=2e-5)


def test_mplfc_trained_weights_new_format(reference_path, torch):
    """mplfc_g's card says model='old_mpgan' but its shipped weights are in
    the modern MPGenerator layout (mp_layers.* / lfc_layer.*) — load them
    with the modern model (lfc + mask_c)."""
    from mpgan_tpu.models.mpgan import mp_generator_apply
    from mpgan_tpu.training.config import build_mpgan_generator
    from mpgan_tpu.utils.torch_import import mp_generator_from_torch
    import setup_training as ref_setup

    card_path = reference_path / "trained_models/mplfc_g/args.txt"
    sd_path = reference_path / "trained_models/mplfc_g/G_best_epoch.pt"
    card = ast.literal_eval(card_path.read_text())
    ref_args = ref_setup.objectview(dict(card))
    G_ref = ref_setup.setup_mpgan(ref_args, gen=True).eval()
    G_ref.load_state_dict(torch.load(str(sd_path), map_location="cpu"))

    args = from_args_txt(str(card_path))
    cfg = build_mpgan_generator(args)
    params, state = mp_generator_from_torch(load_torch_state_dict(str(sd_path)), cfg)

    rng = np.random.RandomState(11)
    noise = (rng.randn(8, 128) * 0.2).astype(np.float32)
    counts = rng.randint(5, 31, size=8).astype(np.float32)
    labels = (counts / 30.0)[:, None].astype(np.float32)

    with torch.no_grad():
        ref = G_ref(torch.from_numpy(noise), torch.from_numpy(labels)).numpy()
    ours, _ = mp_generator_apply(cfg, params, state, jnp.asarray(noise), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=2e-5)
    np.testing.assert_array_equal(
        (np.asarray(ours)[:, :, -1] > 0).sum(1), counts.astype(np.int64)
    )


def test_old_mpgan_discriminator_trained_weights(reference_path, torch):
    """fcmp_g's D is an old_mpgan discriminator."""
    import setup_training as ref_setup
    from mpgan.old_model import Graph_GAN

    card_path = reference_path / "trained_models/fcmp_g/args.txt"
    card = ast.literal_eval(card_path.read_text())
    ref_args = ref_setup.objectview(dict(card))
    torch.manual_seed(0)
    D_ref = Graph_GAN(gen=False, args=ref_args).eval()
    sd = {k: np.asarray(v.detach().numpy()) for k, v in D_ref.state_dict().items()}

    args = from_args_txt(str(card_path))
    cfg = OldMPGANConfig.build(args, gen=False)
    params, state = old_mpgan_from_torch(sd, cfg)

    rng = np.random.RandomState(12)
    x = np.tanh(rng.randn(6, 30, 3)).astype(np.float32)
    with torch.no_grad():
        ref = D_ref(torch.from_numpy(x)).numpy()
    ours, _ = old_mpgan_apply(cfg, params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)
