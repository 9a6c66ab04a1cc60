"""Training visualization (native version of plotting.py, SURVEY.md C24):
particle-feature + jet-mass histograms, EFP histograms, loss curves,
eval-metric-vs-epoch grids, FID curves, and MNIST cloud rasters.

Uses matplotlib's Agg backend; every function writes a PDF and returns the
path. Binning follows the reference's per-jet-type choices
(plotting.py:16-95).
"""

from __future__ import annotations

import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ..evaluation.jet_features import jet_features

_FEATURE_LABELS = [
    r"particle $\eta^{rel}$",
    r"particle $\phi^{rel}$",
    r"particle $p_T^{rel}$",
]

# per-jet-type binning (plotting.py:29-95)
_BINS = {
    "g": [np.linspace(-0.3, 0.3, 100), np.linspace(-0.3, 0.3, 100), np.linspace(0, 0.2, 100),
          np.linspace(0, 0.25, 51)],
    "q": [np.linspace(-0.3, 0.3, 100), np.linspace(-0.3, 0.3, 100), np.linspace(0, 0.2, 100),
          np.linspace(0, 0.25, 51)],
    "t": [np.linspace(-0.5, 0.5, 100), np.linspace(-0.5, 0.5, 100), np.linspace(0, 0.2, 100),
          np.linspace(0, 0.21, 51)],
    "w": [np.linspace(-0.5, 0.5, 100), np.linspace(-0.5, 0.5, 100), np.linspace(0, 0.2, 100),
          np.linspace(0, 0.21, 51)],
    "z": [np.linspace(-0.5, 0.5, 100), np.linspace(-0.5, 0.5, 100), np.linspace(0, 0.2, 100),
          np.linspace(0, 0.21, 51)],
}


def plot_part_feats_jet_mass(
    jet_type: str,
    real_jets: np.ndarray,
    gen_jets: np.ndarray,
    real_mask: np.ndarray | None,
    gen_mask: np.ndarray | None,
    name: str,
    figs_path: str,
) -> str:
    """Histograms of the three particle features + jet mass, real vs generated
    (plotting.py:97-189)."""
    bins = _BINS.get(jet_type, _BINS["g"])
    real_masses = jet_features(real_jets)["mass"]
    gen_masses = jet_features(gen_jets)["mass"]

    def flat(jets, mask, f):
        vals = jets[..., f].reshape(-1)
        if mask is not None:
            vals = vals[mask.reshape(-1) > 0.5]
        return vals

    fig, axes = plt.subplots(1, 4, figsize=(22, 5))
    for f in range(3):
        ax = axes[f]
        ax.hist(flat(real_jets, real_mask, f), bins[f], histtype="step", label="Real", color="red")
        ax.hist(flat(gen_jets, gen_mask, f), bins[f], histtype="step", label="Generated", color="blue")
        ax.set_xlabel(_FEATURE_LABELS[f])
        ax.set_ylabel("Number of particles")
        ax.legend()
    axes[3].hist(real_masses, bins[3], histtype="step", label="Real", color="red")
    axes[3].hist(gen_masses, bins[3], histtype="step", label="Generated", color="blue")
    axes[3].set_xlabel(r"jet relative mass $m/p_T$")
    axes[3].set_ylabel("Number of jets")
    axes[3].legend()
    out = str(pathlib.Path(figs_path) / f"{name}.pdf")
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return out


def plot_efps(jet_type, real_efps, gen_efps, name, figs_path) -> str:
    """Histograms of a subset of EFPs (plotting.py:192-234)."""
    num = min(6, real_efps.shape[1])
    fig, axes = plt.subplots(1, num, figsize=(5 * num, 4))
    axes = np.atleast_1d(axes)
    for i in range(num):
        lo = 0.0
        hi = np.quantile(real_efps[:, i], 0.995)
        bins = np.linspace(lo, max(hi, 1e-12), 80)
        axes[i].hist(real_efps[:, i], bins, histtype="step", label="Real", color="red")
        axes[i].hist(gen_efps[:, i], bins, histtype="step", label="Generated", color="blue")
        axes[i].set_xlabel(f"EFP {i}")
        axes[i].legend()
    out = str(pathlib.Path(figs_path) / f"{name}.pdf")
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return out


def plot_losses(losses: dict, loss: str, name: str, losses_path: str) -> str:
    """G/D loss curves per epoch (plotting.py:340-368)."""
    fig = plt.figure()
    for key, label in (("Dr", "D real loss"), ("Df", "D fake loss"), ("G", "G loss"), ("D", "D loss")):
        if key in losses and len(losses[key]):
            plt.plot(losses[key], label=label)
    if "gp" in losses and len(losses["gp"]):
        plt.plot(losses["gp"], label="Gradient penalty")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.legend(loc=1, prop={"size": 7})
    out = str(pathlib.Path(losses_path) / f"{name}.pdf")
    plt.savefig(out)
    plt.close(fig)
    return out


def plot_eval(losses: dict, epoch: int, save_epochs: int, name: str, losses_path: str) -> str:
    """Evaluation metrics vs epoch (plotting.py:371-457): one panel per metric
    (W1-P per feature, W1-M, W1-EFP mean, FPND, FPD)."""
    panels = [k for k in ("w1p", "w1m", "w1efp", "fpnd", "fpd", "fid") if losses.get(k)]
    if not panels:
        return ""
    fig, axes = plt.subplots(1, len(panels), figsize=(6 * len(panels), 4))
    axes = np.atleast_1d(axes)
    x = np.arange(0, epoch + 1, save_epochs)
    for ax, key in zip(axes, panels):
        vals = np.asarray(losses[key], dtype=float)
        xs = x[: len(vals)]
        if vals.ndim == 2:
            # multi-value metrics store [means..., stds...]
            half = vals.shape[1] // 2
            for f in range(half):
                ax.plot(xs, vals[: len(xs), f], label=f"{key}[{f}]")
            ax.legend(prop={"size": 7})
        else:
            ax.plot(xs, vals[: len(xs)])
        ax.set_yscale("log")
        ax.set_xlabel("Epoch")
        ax.set_title(key)
    out = str(pathlib.Path(losses_path) / f"{name}.pdf")
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return out


def plot_fid(fid: list, name: str, losses_path: str) -> str:
    """MNIST FID curve (plotting.py:460-475)."""
    fig = plt.figure()
    plt.plot(fid)
    plt.xlabel("Epoch")
    plt.ylabel("FID")
    plt.yscale("log")
    out = str(pathlib.Path(losses_path) / f"{name}_fid.pdf")
    plt.savefig(out)
    plt.close(fig)
    return out


def mnist_cloud_image(clouds: np.ndarray, name: str, figs_path: str, num: int = 100) -> str:
    """Rasterize generated MNIST clouds into a 10x10 image grid
    (train_mnist.py:571-609)."""
    num = min(num, len(clouds))
    side = int(np.ceil(np.sqrt(num)))
    fig, axes = plt.subplots(side, side, figsize=(side, side))
    for i, ax in enumerate(np.ravel(axes)):
        ax.axis("off")
        if i >= num:
            continue
        img = np.zeros((28, 28))
        xy = np.clip(((clouds[i, :, :2] + 0.5) * 28).astype(int), 0, 27)
        np.add.at(img, (xy[:, 1], xy[:, 0]), clouds[i, :, 2] + 0.5)
        ax.imshow(img, cmap="gray")
    out = str(pathlib.Path(figs_path) / f"{name}.pdf")
    fig.savefig(out)
    plt.close(fig)
    return out
