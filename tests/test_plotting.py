"""Plot-parity tests (SURVEY.md C24): the per-jet-type binning tables, the
100-particle binning variant, the FGD-infinity eval panels and the loss-type
curve selection all match the reference's plotting.py."""

import numpy as np
import pytest

from mpgan_tpu.utils import plotting


def test_mass_bins_per_jet_type():
    # plotting.py:143-146: g/q/t -> (0, 0.225, 51); w/z -> (0, 0.12, 51)
    for jt in ("g", "q", "t"):
        b = plotting._mbins(jt)
        assert b[0] == 0 and np.isclose(b[-1], 0.225) and len(b) == 51
    for jt in ("w", "z"):
        b = plotting._mbins(jt)
        assert b[0] == 0 and np.isclose(b[-1], 0.12) and len(b) == 51


def test_particle_bins_100p_variant():
    # plotting.py:34-44: 100p g/q/w/z runs widen eta/phi and tighten pT
    b30 = plotting._pbins("g", 30)
    assert np.isclose(b30[0][0], -0.3) and len(b30[0]) == 100
    b100 = plotting._pbins("g", 100)
    assert np.isclose(b100[0][0], -0.5) and np.isclose(b100[0][1] - b100[0][0], 0.005)
    assert np.isclose(b100[2][1] - b100[2][0], 0.001)
    # t jets keep the wide bins at every size (plotting.py:50-56)
    bt = plotting._pbins("t", 30)
    assert np.isclose(bt[0][0], -0.5)


@pytest.fixture
def clouds():
    rng = np.random.default_rng(0)
    real = np.tanh(rng.normal(size=(64, 30, 3))).astype(np.float32) * 0.2
    gen = np.tanh(rng.normal(size=(64, 30, 3))).astype(np.float32) * 0.2
    real[..., 2] = np.abs(real[..., 2])
    gen[..., 2] = np.abs(gen[..., 2])
    mask = (rng.uniform(size=(64, 30, 1)) > 0.3).astype(np.float32)
    return real, gen, mask


def test_part_feats_jet_mass_with_w1_titles(tmp_path, clouds):
    real, gen, mask = clouds
    losses = {"w1p": [[0.01, 0.02, 0.03, 0.001, 0.002, 0.003]], "w1m": [[0.005, 0.0005]]}
    out = plotting.plot_part_feats_jet_mass(
        "g", real, gen, mask, mask, "pm", str(tmp_path), num_particles=30, losses=losses
    )
    assert (tmp_path / "pm.pdf").exists() and out.endswith("pm.pdf")


def test_part_feats_three_panel(tmp_path, clouds):
    real, gen, mask = clouds
    out = plotting.plot_part_feats("t", real, gen, None, None, "p", str(tmp_path))
    assert (tmp_path / "p.pdf").exists() and out


def test_efp_plot_fixed_ranges(tmp_path):
    rng = np.random.default_rng(1)
    real = np.abs(rng.normal(size=(128, 20))) * 0.01
    gen = np.abs(rng.normal(size=(128, 20))) * 0.01
    # per-jet-type fixed binranges (plotting.py:200-205) must not depend on data
    assert plotting._EFP_BINRANGES["g"][0] == 0.2
    assert plotting._EFP_BINRANGES["default"][0] == 0.22
    out = plotting.plot_efps("g", real, gen, "efp", str(tmp_path))
    assert (tmp_path / "efp.pdf").exists() and out


def test_jet_feats_plot(tmp_path):
    rng = np.random.default_rng(2)
    masses = np.abs(rng.normal(size=256)) * 0.1
    efps = np.abs(rng.normal(size=(256, 20))) * 0.001
    out = plotting.plot_jet_feats("q", masses, masses, efps, efps, "jf", str(tmp_path))
    assert (tmp_path / "jf.pdf").exists() and out


def test_losses_plot_wgan_selects_critic_only(tmp_path):
    losses = {"D": [1.0, 0.5], "Dr": [1, 1], "Df": [1, 1], "G": [2.0, 1.0], "gp": [0.1, 0.05]}
    plotting.plot_losses(losses, "w", "lw", str(tmp_path))
    plotting.plot_losses(losses, "ls", "lls", str(tmp_path))
    assert (tmp_path / "lw.pdf").exists() and (tmp_path / "lls.pdf").exists()


def test_eval_grid_with_fgd_panels(tmp_path):
    # 3 evals at save_epochs=5 -> epochs 5, 10, 15 (plotting.py:371-457)
    losses = {
        "w1p": [[0.1] * 6] * 3,
        "w1m": [[0.01, 0.001]] * 3,
        "fpd": [[0.5, 0.05], [0.4, 0.04], [0.3, 0.03]],
        "cov_mmd": [[0.5, 0.02]] * 3,
        "fpnd": [1.0, 0.8, 0.5],
    }
    out = plotting.plot_eval(losses, 15, 5, "eval", str(tmp_path))
    assert (tmp_path / "eval.pdf").exists() and out


def test_fid_and_mnist_raster(tmp_path):
    plotting.plot_fid([10.0, 5.0, 2.0], "run", str(tmp_path))
    assert (tmp_path / "run_fid.pdf").exists()
    clouds = np.random.default_rng(3).uniform(-0.5, 0.5, size=(9, 50, 3)).astype(np.float32)
    plotting.mnist_cloud_image(clouds, "digits", str(tmp_path), num=9)
    assert (tmp_path / "digits.pdf").exists()


def test_eval_grid_w1efp_companion(tmp_path):
    losses = {
        "w1m": [[0.01, 0.001]] * 3,
        "w1efp": [([0.1] * 5 + [0.01] * 5)] * 3,
    }
    plotting.plot_eval(losses, 15, 5, "ev", str(tmp_path))
    assert (tmp_path / "ev.pdf").exists()
    assert (tmp_path / "ev_w1efp.pdf").exists()
