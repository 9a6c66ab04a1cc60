"""PCGAN end-to-end: latent GAN training with the shipped pre-trained
G_inv encoder (train.py:837-839) and mask_manual post-generation."""

import numpy as np
import jax
import pytest

from mpgan_tpu.data.jetnet import JetNetDataset
from mpgan_tpu.models.registry import build_suite
from mpgan_tpu.training.config import from_args_dict
from mpgan_tpu.training.loop import Trainer


def test_pcgan_training_with_shipped_g_inv(tmp_path, reference_path):
    weights_dir = reference_path / "ext_models/pcgan_models"
    if not (weights_dir / "pcgan_G_inv_g.pt").exists():
        pytest.skip("pcgan weights not shipped")

    args = from_args_dict(
        dict(
            name="pcgan_smoke", model="pcgan", jets="g", num_hits=30,
            batch_size=64, num_epochs=1, save_epochs=5, save_model_epochs=1,
            eval_tot_samples=100, w1_num_samples=[50],
            dir_path=str(tmp_path), load_model=False, save_zero=False,
            pcgan_weights_dir=str(weights_dir),
        )
    )
    assert args.loss == "w" and args.num_critic == 5  # pcgan preset

    kw = dict(jet_type="g", data_dir=None, num_particles=30,
              synthetic_num_jets=400, mask_feature=False)
    train_ds = JetNetDataset(**kw, split="train")
    valid_ds = JetNetDataset(**kw, split="valid")

    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    assert trainer.suite.encode_real is not None
    trainer.train()
    assert np.isfinite(trainer.losses["G"][-1])
    assert np.isfinite(trainer.losses["D"][-1])


def test_mask_manual_post_gen():
    """mask_manual appends a pT-cutoff mask feature after generation
    (mask_utils.py:5-24 via the suite post_gen hook)."""
    args = from_args_dict(
        {"model": "mpgan", "mask_manual": True, "mask_c": False, "num_hits": 10,
         "hidden_node_size": 8, "fe": [12], "fn": [16]}
    )
    suite = build_suite(args)
    assert suite.post_gen is not None
    params, state = suite.g_init(jax.random.PRNGKey(0), suite.g_cfg)
    noise, _ = suite.noise.sample(jax.random.PRNGKey(1), 4)
    out, _ = suite.g_apply(suite.g_cfg, params, state, noise, None)
    masked = suite.post_gen(out)
    assert masked.shape == out.shape[:2] + (out.shape[2] + 1,)
    # mask feature encodes pT > 0 as +0.5 / -0.5
    mask_feat = np.asarray(masked[..., -1])
    assert set(np.unique(mask_feat)) <= {-0.5, 0.5}
    np.testing.assert_array_equal(mask_feat > 0, np.asarray(out[..., 2]) > 0)
