"""Physics-fidelity check without the real dataset: the imported mp_g
generator must produce the same *distribution* as the torch reference — W1
distances between the two implementations' outputs (different noise draws)
must be at the same-distribution level, far below the distance to a
random-weight generator."""

import ast

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# end-to-end tier: minutes-long training/eval runs; excluded from the
# fast logic tier via `pytest -m "not kernel and not slow"`
pytestmark = pytest.mark.slow

from mpgan_tpu.data.jetnet import gen_jet_corrections
from mpgan_tpu.data.normalize import FPND_FEATURE_MAXES, FeaturewiseLinearBounded
from mpgan_tpu.evaluation import w1m, w1p
from mpgan_tpu.models.mpgan import mp_generator_apply, mp_generator_init
from mpgan_tpu.training.config import build_mpgan_generator, from_args_txt
from mpgan_tpu.utils.torch_import import load_torch_state_dict, mp_generator_from_torch


def _unnorm(norm_jets):
    norm = FeaturewiseLinearBounded(
        feature_norms=1.0,
        feature_shifts=[0.0, 0.0, -0.5, -0.5],
        feature_maxes=FPND_FEATURE_MAXES["g"],
    )
    return gen_jet_corrections(norm(np.asarray(norm_jets), inverse=True))


def test_mp_g_distribution_parity(reference_path, torch):
    import setup_training as ref_setup

    card_path = reference_path / "trained_models/mp_g/args.txt"
    sd_path = str(reference_path / "trained_models/mp_g/G_best_epoch.pt")
    ref_args = ref_setup.objectview(ast.literal_eval(card_path.read_text()))
    G_ref = ref_setup.setup_mpgan(ref_args, gen=True).eval()
    G_ref.load_state_dict(torch.load(sd_path, map_location="cpu"))

    args = from_args_txt(str(card_path))
    cfg = build_mpgan_generator(args)
    params, state = mp_generator_from_torch(load_torch_state_dict(sd_path), cfg)

    n_samples = 1000
    rng = np.random.RandomState(0)
    counts = rng.randint(5, 31, size=n_samples).astype(np.float32)
    labels = (counts / 30.0)[:, None].astype(np.float32)

    # torch side (its own noise draw), chunked: one 1000-jet dense forward
    # peaks at ~GBs of [N^2-edge, width] activations on the 1-core box
    torch.manual_seed(0)
    chunks = []
    with torch.no_grad():
        for lo in range(0, n_samples, 250):
            lab = torch.from_numpy(labels[lo : lo + 250])
            chunks.append(G_ref(torch.randn(lab.shape[0], 30, 32) * 0.2, lab).numpy())
    ref_out = np.concatenate(chunks)

    # JAX side (independent noise draw)
    noise = jax.random.normal(jax.random.PRNGKey(1), (n_samples, 30, 32)) * 0.2
    ours, _ = mp_generator_apply(cfg, params, state, noise, jnp.asarray(labels))

    ref_jets, _ = _unnorm(ref_out)
    our_jets, _ = _unnorm(ours)

    w1m_same, w1m_std = w1m(ref_jets, our_jets, num_eval_samples=500, num_batches=2)

    # distance to a random-init generator with the same architecture
    rnd_params, rnd_state = mp_generator_init(jax.random.PRNGKey(7), cfg)
    rnd_out, _ = mp_generator_apply(cfg, rnd_params, rnd_state, noise, jnp.asarray(labels))
    rnd_jets, _ = _unnorm(rnd_out)
    w1m_rand, _ = w1m(ref_jets, rnd_jets, num_eval_samples=500, num_batches=2)

    # same-distribution: statistically indistinguishable vs the random model
    assert w1m_same < 0.2 * w1m_rand, (w1m_same, w1m_rand)
    assert w1m_same < 5 * (w1m_std + 1e-4)

    w1p_same, _ = w1p(ref_jets, our_jets, num_eval_samples=500, num_batches=2)
    w1p_rand, _ = w1p(ref_jets, rnd_jets, num_eval_samples=500, num_batches=2)
    assert (w1p_same < 0.2 * w1p_rand + 1e-6).all(), (w1p_same, w1p_rand)
