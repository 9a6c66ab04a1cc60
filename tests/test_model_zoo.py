"""Model zoo sweep: every shipped trained-model family's generator weights
import cleanly and generate finite jets with the conditioned multiplicity
(trained_models/README.md:1-4 — all 14 families x 3 jet types)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpgan_tpu.models.registry import build_suite
from mpgan_tpu.training.config import from_args_txt
from mpgan_tpu.utils.torch_import import generator_from_torch, load_torch_state_dict

FAMILIES = [
    "fc", "fcmp", "fcpnet", "graphcnn", "graphcnnmp", "graphcnnpnet",
    "mp", "mpfc", "mplfc", "mppnet", "pcgan",
    "treeganfc", "treeganmp", "treeganpnet",
]


@pytest.mark.parametrize("family", FAMILIES)
@pytest.mark.parametrize("jet", ["g", "t", "q"])
def test_zoo_generator_import(reference_path, family, jet):
    card = reference_path / f"trained_models/{family}_{jet}/args.txt"
    sd_path = reference_path / f"trained_models/{family}_{jet}/G_best_epoch.pt"
    if not sd_path.exists():
        pytest.skip(f"{family}_{jet} weights not shipped")

    args = from_args_txt(str(card))
    if args.model == "old_mpgan":
        sd = load_torch_state_dict(str(sd_path))
        if any(k.startswith("mp_layers.") for k in sd):
            args.model = "mpgan"  # mplfc ships modern-layout weights
    suite = build_suite(args)
    sd = load_torch_state_dict(str(sd_path))
    params, state = generator_from_torch(args.model, sd, suite.g_cfg)

    batch = 8
    noise, _ = suite.noise.sample(jax.random.PRNGKey(0), batch)
    labels = None
    if args.get("mask_c") or args.get("gapt_mask"):
        counts = np.random.RandomState(0).randint(5, args.num_hits + 1, size=batch)
        labels = jnp.asarray((counts / args.num_hits)[:, None].astype(np.float32))

    out, _ = suite.g_apply(suite.g_cfg, params, state, noise, labels)
    n_out = args.num_hits if args.model != "pcgan" else None
    assert np.isfinite(np.asarray(out)).all(), f"{family}: non-finite output"
    if args.model == "pcgan":
        assert out.shape == (batch, args.pcgan_z1_dim)
    else:
        expected_feats = args.node_feat_size + (1 if args.get("mask") else 0)
        assert out.shape == (batch, n_out, expected_feats)
    if labels is not None and args.model in ("mpgan", "old_mpgan"):
        counts_out = (np.asarray(out)[:, :, -1] > 0).sum(1)
        np.testing.assert_array_equal(counts_out, counts)
