"""Frechet distances on physics features.

``fpd`` — the Frechet Physics Distance (arXiv:2211.10295): Frechet/Gaussian
distance between real and generated distributions of the full degree <= 4
EFP set — 20 primes plus 15 composite products, the 35 non-constant columns
of energyflow's ``("d<=", 4)`` basis that the reference feeds it via
``jetnet.utils.efps`` (train.py:750-755) — with features standardized by the
real-sample moments. The reference wires FPD into best-epoch selection
(train.py:794-809).

Constant-column convention: energyflow's ``("d<=", 4)`` EFPSet contains one
degree-0 graph whose value is identically 1; we drop it. A constant column
contributes exactly zero to the Frechet distance (zero mean difference, zero
variance, zero cross-covariance), so FPD values are numerically identical
with or without it — only the SET of non-constant features must match the
protocol for comparability, and columns may appear in any consistent order
(the distance is permutation-invariant).

``fgd_inf`` — the bias-corrected FGD-infinity estimator from the same paper:
FGD is computed at several batch sizes and linearly extrapolated in 1/N to
infinite sample size.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg

from .efp import efps


def _psd_sqrt(sigma: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via eigh with eigenvalue clipping."""
    w, v = linalg.eigh((sigma + sigma.T) / 2.0)
    return (v * np.sqrt(np.clip(w, 0.0, None))) @ v.T


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """d^2 = |mu1 - mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)) (Dowson-Landau).

    ``Tr sqrt(C1 C2)`` is computed as ``sum sqrt(eig(S1 C2 S1))`` with
    ``S1 = sqrt(C1)`` — everything stays symmetric-eigh with clipped
    eigenvalues. ``scipy.linalg.sqrtm`` on the (non-symmetric, frequently
    near-singular) product C1 C2 can silently overflow to ~1e296 on
    degenerate EFP covariances; observed live during GAN training."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    # degenerate generators can produce non-finite features (a jet with
    # negative-pT particles makes the EFP z-weights unbounded); scipy eigh
    # raises ValueError on non-finite input, which must not kill a training
    # run mid-eval — an infinite distance is the honest value
    if not all(
        np.isfinite(a).all() for a in (mu1, mu2, sigma1, sigma2)
    ):
        return float("inf")
    diff = mu1 - mu2
    s1_half = _psd_sqrt(sigma1)
    inner = s1_half @ sigma2 @ s1_half
    w = linalg.eigvalsh((inner + inner.T) / 2.0)
    tr_covmean = float(np.sum(np.sqrt(np.clip(w, 0.0, None))))
    d2 = float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)
    return max(d2, 0.0)  # clamp float-noise negatives on (near-)identical inputs


def _gaussian_moments(x: np.ndarray):
    return np.mean(x, axis=0), np.cov(x, rowvar=False)


def fgd_inf(
    real_features: np.ndarray,
    gen_features: np.ndarray,
    min_samples: int = 20000,
    max_samples: int = 50000,
    num_batches: int = 20,
    num_points: int = 10,
    seed: int = 42,
) -> tuple[float, float]:
    """FGD extrapolated to infinite sample size: fit FGD(N) ~ a + b/N over
    ``num_points`` batch sizes and report (intercept, fit-std). Returns
    ``(value, std)``."""
    rng = np.random.default_rng(seed)
    n = min(len(real_features), len(gen_features))
    max_samples = min(max_samples, n)
    min_samples = min(min_samples, max_samples // 2 if max_samples >= 40 else max_samples)
    batches = np.linspace(min_samples, max_samples, num_points).astype(int)

    vals = np.zeros((num_points, num_batches))
    for i, bs in enumerate(batches):
        for j in range(num_batches):
            ri = rng.choice(len(real_features), size=bs, replace=False)
            gi = rng.choice(len(gen_features), size=bs, replace=False)
            mu1, s1 = _gaussian_moments(real_features[ri])
            mu2, s2 = _gaussian_moments(gen_features[gi])
            vals[i, j] = frechet_distance(mu1, s1, mu2, s2)

    if not np.isfinite(vals).all():
        # contaminated features must score as inf, loudly: small batches can
        # draw clean subsamples, and fitting only the finite points would
        # report a finite FGD for a generator emitting inf/NaN jets
        return float("inf"), float("inf")
    means = vals.mean(axis=1)
    x = 1.0 / batches
    # linear fit y = a + b x; intercept a is FGD_inf
    coeffs, cov = np.polyfit(x, means, 1, cov=True)
    return float(coeffs[1]), float(np.sqrt(cov[1, 1]))


def fpd(
    real_jets: np.ndarray,
    gen_jets: np.ndarray,
    min_samples: int = 20000,
    max_samples: int = 50000,
    seed: int = 42,
    real_efps: np.ndarray | None = None,
    gen_efps: np.ndarray | None = None,
) -> tuple[float, float]:
    """Frechet Physics Distance: FGD-infinity on the standardized full
    d<=4 EFP basis (35 columns: 20 primes + 15 composites; see module
    docstring for the constant-column convention). Pass precomputed
    ``*_efps`` to reuse the reference's EFP cache pattern (train.py:744-757).
    Returns ``(value, std)``."""
    if real_efps is None:
        real_efps = efps(real_jets, select="d<=4-all")
    if gen_efps is None:
        gen_efps = efps(gen_jets, select="d<=4-all")
    mean, std = real_efps.mean(axis=0), real_efps.std(axis=0)
    std = np.where(std > 0, std, 1.0)
    real_n = (real_efps - mean) / std
    gen_n = (gen_efps - mean) / std
    return fgd_inf(real_n, gen_n, min_samples=min_samples, max_samples=max_samples, seed=seed)
