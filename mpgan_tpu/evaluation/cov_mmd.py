"""Coverage and MMD between jet sets (native version of
``jetnet.evaluation.cov_mmd``; the reference defines the protocol flags at
setup_training.py:320-331 — 100 samples x 10 batches — with the metric calls
staged at train.py:604-606).

Jet-to-jet ground distance is the Energy Mover's Distance (Komiske et al.,
arXiv:1902.02346) with R = 1: optimal transport of pt between the two jets'
(eta, phi) supports, with the total-pt difference charged at distance R.
Instead of one LP per jet pair (what energyflow does on CPU), all pairwise
EMDs in a batch are computed together by vectorized Sinkhorn iterations with
a small entropic regularizer — a batched, accelerator-friendly formulation
(regularization 5e-3 keeps the approximation well under the ranking
resolution needed for coverage/MMD).

- Coverage: fraction of real jets that are the nearest real neighbour of at
  least one generated jet.
- MMD: average over real jets of the distance to the closest generated jet.
"""

from __future__ import annotations

import numpy as np


def _pairwise_emd(
    gen: np.ndarray,
    real: np.ndarray,
    r: float = 1.0,
    epsilon: float = 5e-3,
    num_iters: int = 200,
) -> np.ndarray:
    """All-pairs EMD between two jet sets ``[A, N, 3]`` x ``[B, N, 3]`` ->
    ``[A, B]`` via batched Sinkhorn on the ghost-particle-balanced problem."""
    a, b = len(gen), len(real)
    n1, n2 = gen.shape[1], real.shape[1]

    # angular cost [A, B, N1+1, N2+1]: last row/col is the ghost at distance r
    d_eta = gen[:, None, :, None, 0] - real[None, :, None, :, 0]
    d_phi = gen[:, None, :, None, 1] - real[None, :, None, :, 1]
    cost = np.sqrt(d_eta**2 + d_phi**2).astype(np.float64)
    cost = np.pad(cost, ((0, 0), (0, 0), (0, 1), (0, 1)), constant_values=r)
    cost[:, :, -1, -1] = 0.0

    pt1 = np.clip(gen[:, :, 2], 0, None).astype(np.float64)
    pt2 = np.clip(real[:, :, 2], 0, None).astype(np.float64)
    s1 = pt1.sum(axis=1)  # [A]
    s2 = pt2.sum(axis=1)  # [B]
    total = np.maximum(np.maximum(s1[:, None], s2[None, :]), 1e-30)  # [A, B]

    # ghost masses balance the two sides
    mu = np.broadcast_to(pt1[:, None, :], (a, b, n1))
    mu = np.concatenate([mu, (total - s1[:, None])[..., None]], axis=2) / total[..., None]
    nu = np.broadcast_to(pt2[None, :, :], (a, b, n2))
    nu = np.concatenate([nu, (total - s2[None, :])[..., None]], axis=2) / total[..., None]

    k_mat = np.exp(-cost / epsilon)
    u = np.ones_like(mu)
    for _ in range(num_iters):
        v = nu / np.maximum(np.einsum("abij,abi->abj", k_mat, u), 1e-300)
        u = mu / np.maximum(np.einsum("abij,abj->abi", k_mat, v), 1e-300)
    plan = u[..., :, None] * k_mat * v[..., None, :]
    return np.einsum("abij,abij->ab", plan, cost) * total


def cov_mmd(
    real_jets: np.ndarray,
    gen_jets: np.ndarray,
    num_eval_samples: int = 100,
    num_batches: int = 10,
    seed: int = 42,
) -> tuple[float, float]:
    """Returns ``(coverage, mmd)`` averaged over ``num_batches`` batches of
    ``num_eval_samples`` jets each."""
    rng = np.random.default_rng(seed)
    covs, mmds = [], []
    for _ in range(num_batches):
        ri = rng.choice(len(real_jets), size=num_eval_samples, replace=False)
        gi = rng.choice(len(gen_jets), size=num_eval_samples, replace=False)
        dists = _pairwise_emd(gen_jets[gi][:, :, :3], real_jets[ri][:, :, :3])
        covs.append(len(np.unique(dists.argmin(axis=1))) / num_eval_samples)
        mmds.append(dists.min(axis=0).mean())
    return float(np.mean(covs)), float(np.mean(mmds))
