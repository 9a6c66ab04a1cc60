"""Tests for the native data layer and evaluation stack."""

import numpy as np
import pytest

from mpgan_tpu.data import (
    BatchLoader,
    FeaturewiseLinearBounded,
    JetNetDataset,
    MNISTGraphDataset,
    gen_jet_corrections,
    synthetic_jets,
)
from mpgan_tpu.evaluation import (
    cov_mmd,
    efp_multigraphs,
    efps,
    fpd,
    frechet_distance,
    jet_features,
    w1efp,
    w1m,
    w1p,
    wasserstein1d,
)
from mpgan_tpu.evaluation.efp import _select_graphs


def test_efp_multigraph_counts():
    graphs = efp_multigraphs(4)
    by_degree = {}
    for g in graphs:
        by_degree.setdefault(len(g), []).append(g)
    # prime EFP counts by degree (energyflow: 1, 2, 5, 12)
    assert [len(by_degree[d]) for d in (1, 2, 3, 4)] == [1, 2, 5, 12]
    assert len(graphs) == 20
    assert len(_select_graphs("n4d4")) == 5


def test_efp_values_analytic():
    # 3-particle jet, hand-computable
    jets = np.array(
        [[[0.0, 0.0, 0.5], [0.3, -0.4, 0.3], [-0.3, 0.4, 0.2]]], dtype=np.float64
    )
    eta, phi, pt = jets[0, :, 0], jets[0, :, 1], jets[0, :, 2]
    z = pt / pt.sum()
    theta = np.sqrt(
        (eta[:, None] - eta[None, :]) ** 2 + (phi[:, None] - phi[None, :]) ** 2
    )
    vals = efps(jets, select="d<=4", use_jax=False)

    # graph 0 = single edge: sum_ij z_i z_j theta_ij
    expected_dot = np.einsum("i,j,ij->", z, z, theta)
    np.testing.assert_allclose(vals[0, 0], expected_dot, rtol=1e-10)

    graphs = efp_multigraphs(4)
    # check every graph against a brute-force loop evaluation
    for gi, graph in enumerate(graphs):
        verts = sorted({v for e in graph for v in e})
        nv = len(verts)
        total = 0.0
        for assign in np.ndindex(*([3] * nv)):
            term = np.prod([z[assign[v]] for v in verts])
            for a, b in graph:
                term *= theta[assign[a], assign[b]]
            total += term
        np.testing.assert_allclose(vals[0, gi], total, rtol=1e-9, err_msg=str(graph))


def test_efp_jax_matches_numpy():
    particles, _ = synthetic_jets("g", 64, 30)
    v_np = efps(particles[..., :3], use_jax=False)
    v_jx = efps(particles[..., :3], use_jax=True)
    np.testing.assert_allclose(v_np, v_jx, rtol=2e-3, atol=1e-9)


def test_wasserstein1d_matches_scipy():
    from scipy.stats import wasserstein_distance

    rng = np.random.default_rng(0)
    a, b = rng.normal(0, 1, 1000), rng.normal(0.3, 1.2, 800)
    np.testing.assert_allclose(wasserstein1d(a, b), wasserstein_distance(a, b), rtol=1e-9)


def test_jet_mass():
    # two massless back-to-back particles in phi: m^2 = 2 pt1 pt2 (cosh(deta) - cos(dphi))
    jets = np.array([[[0.0, 0.0, 1.0], [0.0, np.pi, 1.0]]])
    m = jet_features(jets)["mass"][0]
    np.testing.assert_allclose(m, 2.0, rtol=1e-6)  # E=2, p=0
    # single massless particle -> zero mass
    jets1 = np.array([[[0.5, 0.3, 1.0]]])
    assert jet_features(jets1)["mass"][0] < 1e-5


def test_w1_metrics_discriminate():
    real, _ = synthetic_jets("g", 4000, 30, seed=1)
    real2, _ = synthetic_jets("g", 4000, 30, seed=2)
    fake = real2.copy()
    fake[..., 2] *= 1.3  # distorted pt spectrum

    real_j, real2_j, fake_j = real[..., :3], real2[..., :3], fake[..., :3]
    same_m, _ = w1m(real_j, real2_j, num_eval_samples=2000, num_batches=2)
    diff_m, _ = w1m(real_j, fake_j, num_eval_samples=2000, num_batches=2)
    assert diff_m > same_m

    same_p, _ = w1p(real_j, real2_j, num_eval_samples=2000, num_batches=2)
    diff_p, _ = w1p(real_j, fake_j, num_eval_samples=2000, num_batches=2)
    assert diff_p[2] > same_p[2]  # pt feature moved

    # EFPs use pt-normalized weights, so scale angles instead
    fake_ang = real2_j.copy()
    fake_ang[..., 0] *= 1.4
    same_e, _ = w1efp(real_j, real2_j, num_eval_samples=2000, num_batches=2)
    diff_e, _ = w1efp(real_j, fake_ang, num_eval_samples=2000, num_batches=2)
    assert diff_e.mean() > same_e.mean()


def test_frechet_distance_properties():
    mu = np.zeros(5)
    sigma = np.eye(5)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-8)
    d = frechet_distance(mu, sigma, mu + 1.0, sigma)
    assert d == pytest.approx(5.0, rel=1e-6)


def test_frechet_distance_degenerate_covariances():
    """Near-singular covariance products overflowed scipy.sqrtm to ~1e296
    (observed live during a TPU training eval); the eigh-based path must
    stay finite and exact on rank-deficient inputs."""
    rng = np.random.default_rng(0)
    # rank-3 covariance in 20 dims, like degenerate EFP columns
    a = rng.normal(size=(20, 3))
    sigma = a @ a.T
    mu = rng.normal(size=20)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
    # 1-D analytic check: d^2 = (mu1-mu2)^2 + (s1-s2)^2 for variances s^2
    d = frechet_distance([1.0], [[4.0]], [3.0], [[9.0]])
    assert d == pytest.approx((1 - 3) ** 2 + (2 - 3) ** 2, rel=1e-9)
    # constant feature columns (zero variance rows/cols) stay finite
    x = rng.normal(size=(500, 20))
    x[:, 5] = 1.0
    y = rng.normal(size=(500, 20))
    y[:, 5] = 1.0
    from mpgan_tpu.evaluation.fpd import _gaussian_moments

    m1, s1 = _gaussian_moments(x)
    m2, s2 = _gaussian_moments(y)
    val = frechet_distance(m1, s1, m2, s2)
    assert np.isfinite(val) and 0 <= val < 100


def test_fpd_discriminates():
    real, _ = synthetic_jets("g", 6000, 30, seed=1)
    real2, _ = synthetic_jets("g", 6000, 30, seed=2)
    fake = real2.copy()
    fake[..., 0] *= 1.5  # broadened eta
    v_same, _ = fpd(real[..., :3], real2[..., :3], min_samples=1000, max_samples=3000)
    v_diff, _ = fpd(real[..., :3], fake[..., :3], min_samples=1000, max_samples=3000)
    assert v_diff > v_same


def test_fpd_protocol_full_d4_basis():
    """FPD protocol contract (train.py:750-755 via jetnet.utils.efps with
    energyflow ``("d<=", 4)``): the features are the FULL 35-column d<=4
    basis — 20 primes + 15 composite products — not the primes alone.

    (a) ``fpd()`` defaults reproduce an explicit ``d<=4-all`` computation
        bit-for-bit; (b) the prime-only value genuinely differs (a Frechet
        distance is not invariant to dropping features), pinning that the
        wiring matters; (c) hand-built composite columns (products of prime
        columns) fed directly into the Frechet distance agree with (a)."""
    from mpgan_tpu.evaluation.efp import efp_composites, efps

    real, _ = synthetic_jets("g", 3000, 20, seed=3)
    fake, _ = synthetic_jets("g", 3000, 20, seed=4)
    fake[..., 0] *= 1.3
    real, fake = real[..., :3], fake[..., :3]
    kw = dict(min_samples=800, max_samples=2400)

    v_default, _ = fpd(real, fake, **kw)
    re_all = efps(real, select="d<=4-all")
    ge_all = efps(fake, select="d<=4-all")
    v_explicit, _ = fpd(real, fake, real_efps=re_all, gen_efps=ge_all, **kw)
    assert v_default == v_explicit

    re_p = efps(real, select="d<=4")
    ge_p = efps(fake, select="d<=4")
    v_primes, _ = fpd(real, fake, real_efps=re_p, gen_efps=ge_p, **kw)
    assert v_default != v_primes

    # (c) rebuild the composite columns by hand from the prime columns
    comp = efp_composites(4)
    re_hand = np.concatenate(
        [re_p] + [np.prod(re_p[:, list(c)], axis=1, keepdims=True) for c in comp], axis=1
    )
    ge_hand = np.concatenate(
        [ge_p] + [np.prod(ge_p[:, list(c)], axis=1, keepdims=True) for c in comp], axis=1
    )
    v_hand, _ = fpd(real, fake, real_efps=re_hand, gen_efps=ge_hand, **kw)
    np.testing.assert_allclose(v_hand, v_default, rtol=1e-9)


def test_fpd_invariant_to_constant_column():
    """The constant-column convention (fpd.py module docstring): energyflow's
    d<=4 set carries a degree-0 constant EFP we drop; appending a constant
    column to both sides must not change the distance (zero mean-diff, zero
    (co)variance), so 35-col values are comparable to 36-col protocol runs."""
    from mpgan_tpu.evaluation.fpd import fgd_inf

    rng = np.random.default_rng(7)
    real = rng.normal(size=(3000, 35))
    gen = rng.normal(loc=0.15, size=(3000, 35))
    kw = dict(min_samples=800, max_samples=2400, num_batches=5)
    base, _ = fgd_inf(real, gen, **kw)
    ones = np.ones((3000, 1))
    with_const, _ = fgd_inf(
        np.concatenate([real, ones], 1), np.concatenate([gen, ones], 1), **kw
    )
    np.testing.assert_allclose(with_const, base, rtol=1e-7, atol=1e-9)


def test_cov_mmd():
    real, _ = synthetic_jets("g", 500, 10, seed=1)
    real2, _ = synthetic_jets("g", 500, 10, seed=2)
    fake = real2.copy()
    fake[..., 0] += 1.0  # shifted eta
    cov_same, mmd_same = cov_mmd(real, real2, num_eval_samples=50, num_batches=2)
    cov_diff, mmd_diff = cov_mmd(real, fake, num_eval_samples=50, num_batches=2)
    assert mmd_diff > mmd_same
    assert 0 <= cov_same <= 1 and 0 <= cov_diff <= 1


def test_jetnet_dataset_synthetic():
    ds = JetNetDataset("g", data_dir=None, num_particles=30, split="train",
                       synthetic_num_jets=1000)
    assert ds.particle_data.shape == (700, 30, 4)
    assert ds.jet_data.shape == (700, 1)
    assert 0 < ds.jet_data.min() and ds.jet_data.max() <= 1.0
    # normalized features bounded
    assert np.abs(ds.particle_data[..., 0]).max() <= 1.0 + 1e-6
    # mask feature encoded with -0.5 shift: values in {-0.5, 0.5}
    assert set(np.unique(ds.particle_data[..., 3])) <= {-0.5, 0.5}

    # unnormalization round trip
    unnorm = ds.particle_normalisation(ds.particle_data, inverse=True)
    jets, mask = gen_jet_corrections(unnorm)
    assert jets.shape == (700, 30, 3)
    assert (jets[..., 2] >= 0).all()
    assert mask.sum(1).min() >= 1


def test_normalizer_roundtrip():
    norm = FeaturewiseLinearBounded(
        feature_norms=1.0, feature_shifts=[0.0, 0.0, -0.5], feature_maxes=[1.5, 0.5, 0.9]
    )
    x = np.random.default_rng(0).normal(0, 0.3, (10, 5, 3)).astype(np.float32)
    np.testing.assert_allclose(norm(norm(x), inverse=True), x, rtol=1e-5, atol=1e-6)


def test_batch_loader():
    data = np.arange(100)[:, None].astype(np.float32)
    labels = np.arange(100)[:, None].astype(np.float32)
    loader = BatchLoader(data, labels, batch_size=32, shuffle=True, seed=1)
    assert len(loader) == 3
    batches = list(loader)
    assert all(b[0].shape == (32, 1) for b in batches)
    # data/label alignment preserved under shuffle
    for d, l in batches:
        np.testing.assert_array_equal(d, l)


def test_mnist_dataset_synthetic():
    ds = MNISTGraphDataset(None, num_thresholded=75, num=3, synthetic_num_samples=50)
    assert ds.X.shape == (50, 75, 3)
    assert ds.X[..., :2].min() >= -0.5 and ds.X[..., :2].max() < 0.5


def test_fpd_survives_nonfinite_features():
    """A degenerate generator (negative-pT jets -> unbounded EFP z-weights)
    can hand fpd inf/NaN features; the metric must report inf, not raise
    (observed killing a 100-epoch TPU run at its epoch-10 eval)."""
    rng = np.random.default_rng(0)
    real = np.abs(rng.normal(size=(2000, 20)))
    gen = np.abs(rng.normal(size=(2000, 20)))
    gen[5, 3] = np.inf
    gen[17, 0] = np.nan
    from mpgan_tpu.evaluation.fpd import fgd_inf

    val, std = fgd_inf(real, gen, min_samples=500, max_samples=2000, num_batches=5)
    # contaminated inputs must score inf, never a silently-finite fit
    assert np.isinf(val) and np.isinf(std)
    # direct moment-level check
    m = np.mean(gen, axis=0)
    s = np.cov(gen, rowvar=False)
    assert frechet_distance(np.mean(real, axis=0), np.cov(real, rowvar=False), m, s) == float("inf")
