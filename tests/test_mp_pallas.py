"""Fused Pallas MP kernel vs the jnp path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# slow tier: interpret-mode Pallas kernels run orders of magnitude
# slower than compiled code; excluded from the fast logic tier via
# `pytest -m "not kernel"` (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.kernel

import mpgan_tpu.ops.mp_pallas as mpp
from mpgan_tpu.ops.mp import MPLayerConfig, mp_layer_apply
from mpgan_tpu.models.mpgan import mp_generator_apply, mp_generator_init
from mpgan_tpu.training.config import build_mpgan_generator, from_args_dict
import dataclasses


def _data(b=2, n=30, f=8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, f).astype(np.float32) * 0.3)
    counts = rng.randint(1, n + 1, size=b)
    mask = jnp.asarray(
        (np.arange(n)[None, :] < counts[:, None]).astype(np.float32)[..., None]
    )
    return x, mask


@pytest.mark.parametrize("sum_agg", [True, False])
@pytest.mark.parametrize("n,ti", [(30, 30), (30, 16), (13, 8)])
def test_edge_aggregate_matches_reference(sum_agg, n, ti):
    rng = np.random.RandomState(1)
    b, h1, h2 = 2, 24, 16
    u1 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32))
    u2 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, n, 1) > 0.3).astype(np.float32))
    hidden = (
        jnp.asarray(rng.randn(h1, h2).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(h2).astype(np.float32) * 0.2),
    )
    ref = mpp.edge_aggregate_reference(u1, u2, mask, hidden, 0.2, sum_agg)
    out = mpp.edge_aggregate(u1, u2, mask, hidden, None, 0.2, sum_agg, ti)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("clabels,mask_fne_np", [(0, False), (2, False), (0, True), (1, True)])
def test_fused_layer_matches_jnp(clabels, mask_fne_np):
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, clabels=clabels, mask_fne_np=mask_fne_np
    )
    from mpgan_tpu.ops.mp import mp_layer_init

    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data()
    labels = jnp.asarray(np.random.RandomState(2).rand(2, 3).astype(np.float32))
    njp = jnp.asarray(np.array([5.0, 12.0], np.float32))

    y_ref, _ = mp_layer_apply(
        cfg, params, state, x, mask=mask, labels=labels, num_jet_particles=njp
    )
    y_fused, _ = mp_layer_apply(
        cfg, params, state, x, mask=mask, labels=labels, num_jet_particles=njp,
        use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), rtol=5e-4, atol=1e-5)


def test_fused_generator_matches_jnp():
    args = from_args_dict(
        {"model": "mpgan", "num_hits": 20, "hidden_node_size": 16, "fe": [24, 16], "fn": [32]}
    )
    cfg = build_mpgan_generator(args)
    cfg_fused = dataclasses.replace(cfg, use_pallas=True)
    params, state = mp_generator_init(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(3)
    noise = jnp.asarray((rng.randn(4, 20, 16) * 0.2).astype(np.float32))
    labels = jnp.asarray((rng.randint(1, 21, size=4) / 20.0)[:, None].astype(np.float32))

    y_ref, _ = mp_generator_apply(cfg, params, state, noise, labels)
    y_fused, _ = mp_generator_apply(cfg_fused, params, state, noise, labels)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), rtol=5e-4, atol=1e-5)


def test_fused_layer_gradients_match():
    cfg = MPLayerConfig.build(8, [24, 16], [32], 8)
    from mpgan_tpu.ops.mp import mp_layer_init

    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data()

    def loss(params, use_pallas):
        y, _ = mp_layer_apply(cfg, params, state, x, mask=mask, use_pallas=use_pallas)
        return jnp.sum(y**2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    flat_r, _ = jax.tree.flatten(g_ref)
    flat_f, _ = jax.tree.flatten(g_fused)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_fused_dropout():
    """In-kernel dropout: deterministic per seed, correct keep statistics,
    exact forward/backward mask replay."""
    rng = np.random.RandomState(5)
    b, n, h1, h2 = 2, 16, 24, 16
    u1 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32))
    u2 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32))
    mask = jnp.ones((b, n, 1), jnp.float32)
    hidden = (
        jnp.asarray(rng.randn(h1, h2).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(h2).astype(np.float32) * 0.2),
    )
    seed = jnp.asarray(123.0)

    out_ref = mpp.edge_aggregate(u1, u2, mask, hidden, None, 0.2, True, 8, 0.0)
    out_a = mpp.edge_aggregate(u1, u2, mask, hidden, seed, 0.2, True, 8, 0.5)
    out_b = mpp.edge_aggregate(u1, u2, mask, hidden, seed, 0.2, True, 8, 0.5)
    out_c = mpp.edge_aggregate(u1, u2, mask, hidden, seed + 1, 0.2, True, 8, 0.5)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))  # same seed
    assert not np.allclose(np.asarray(out_a), np.asarray(out_c))  # new seed
    assert not np.allclose(np.asarray(out_a), np.asarray(out_ref))  # dropout active

    # with no layers after the dropout, E[out] equals the no-dropout output
    # (through nonlinear layers the expectation is biased, as in any dropout)
    ref_lin = mpp.edge_aggregate(u1, u2, mask, (), None, 0.2, True, 8, 0.0)
    outs = [
        np.asarray(mpp.edge_aggregate(u1, u2, mask, (), seed + i, 0.2, True, 8, 0.5))
        for i in range(120)
    ]
    mean = np.mean(outs, axis=0)
    scale = np.abs(np.asarray(ref_lin)).mean()
    assert np.abs(mean - np.asarray(ref_lin)).mean() < 0.25 * scale
    # keep fraction ~ 0.5: count zeros in the dropout multiplier effect
    # (out elements are sums, so instead check variance is nonzero)
    assert np.std(outs, axis=0).mean() > 0.1

    # gradient flows and is finite with dropout on
    g = jax.grad(
        lambda u: jnp.sum(mpp.edge_aggregate(u, u2, mask, hidden, seed, 0.2, True, 8, 0.5) ** 2)
    )(u1)
    assert np.isfinite(np.asarray(g)).all()


def test_need_wgrads_false_skips_weight_grads_keeps_input_grads():
    """``need_wgrads=False`` (the G-step hint, mp.skip_weight_grads) must
    leave input gradients bit-identical while returning exact zeros for the
    hidden-layer weight cotangents — in both blocking modes (n=30 jets-mode,
    n=40/b=2 forward-jets/backward-receiver split)."""
    for b, n in ((4, 30), (2, 40)):
        rng = np.random.RandomState(11)
        h1, h2 = 24, 16
        u1 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32))
        u2 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32))
        mask = jnp.asarray((rng.rand(b, n, 1) > 0.3).astype(np.float32))
        hidden = (
            jnp.asarray(rng.randn(h1, h2).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(h2).astype(np.float32) * 0.2),
        )
        seed = jnp.asarray(3.0)

        def f(u1, u2, mask, hidden, need):
            out = mpp.edge_aggregate(u1, u2, mask, hidden, seed, 0.2, True, 8, 0.5, need)
            return jnp.sum(jnp.sin(out))

        g_full = jax.grad(f, argnums=(0, 1, 2, 3))(u1, u2, mask, hidden, True)
        g_skip = jax.grad(f, argnums=(0, 1, 2, 3))(u1, u2, mask, hidden, False)
        for a, bb in zip(g_full[:3], g_skip[:3]):  # du1, du2, dmask identical
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
        for d in jax.tree.leaves(g_skip[3]):  # weight cotangents exact zeros
            assert not np.any(np.asarray(d))
        assert any(np.any(np.asarray(d)) for d in jax.tree.leaves(g_full[3]))


def test_fused_dropout_grad_replay_cross_mode():
    """Finite-difference gradient check with dropout: the backward must
    replay the forward's masks exactly even when fwd and bwd pick different
    blocking modes (at n=40, b=2 the forward uses the jet-blocked kernel and
    the backward the receiver-blocked one)."""
    rng = np.random.RandomState(7)
    b, n, h1, h2 = 2, 40, 24, 16
    u1 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32))
    u2 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32))
    mask = jnp.ones((b, n, 1), jnp.float32)
    hidden = (
        jnp.asarray(rng.randn(h1, h2).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(h2).astype(np.float32) * 0.2),
    )
    seed = jnp.asarray(7.0)

    def f(u):
        out = mpp.edge_aggregate(u, u2, mask, hidden, seed, 0.2, True, 8, 0.5)
        return jnp.sum(jnp.sin(out))

    g = jax.grad(f)(u1)
    v = jnp.asarray(rng.randn(*u1.shape).astype(np.float32))
    eps = 1e-3
    fd = (float(f(u1 + eps * v)) - float(f(u1 - eps * v))) / (2 * eps)
    analytic = float(jnp.vdot(g, v))
    np.testing.assert_allclose(analytic, fd, rtol=2e-2, atol=1e-3)


def test_dropout_hash_quality():
    """Statistical contract of the stateless dropout hash (mp_pallas._dropmul,
    outer-sum keys + 3-op finisher): exact-ish keep rate, and no visible
    correlation between adjacent/strided rows, columns, seeds, or layer
    salts. Guards the hash against cheapening past the point of usefulness
    (the round-3 rewrite cut its VPU cost ~1.66x; this test is the quality
    floor any future variant must clear)."""
    rows, cols = 4096, 512

    def keepmask(p, seed, salt, offset=0):
        m = mpp._dropmul(
            (rows, cols), p, jnp.asarray(seed, jnp.float32), salt,
            jnp.asarray(offset, jnp.uint32),
        )
        return np.asarray(m) > 0

    for p in (0.5, 0.2):
        k = keepmask(p, 7, 0)
        assert abs(k.mean() - (1 - p)) < 2e-3, (p, k.mean())

    def corr(a, b):
        a = a.ravel().astype(np.float64) - a.mean()
        b = b.ravel().astype(np.float64) - b.mean()
        return float((a * b).mean() / np.sqrt((a * a).mean() * (b * b).mean()))

    k = keepmask(0.5, 99, 1).astype(np.float64)
    assert abs(corr(k[:-1], k[1:])) < 0.01  # adjacent rows
    assert abs(corr(k[:, :-1], k[:, 1:])) < 0.01  # adjacent cols
    assert abs(corr(k[:-8], k[8:])) < 0.01  # sublane stride
    assert abs(corr(k[:, :-128], k[:, 128:])) < 0.01  # lane stride
    assert abs(corr(k, keepmask(0.5, 99, 2).astype(np.float64))) < 0.01  # salts
    assert abs(corr(k, keepmask(0.5, 100, 1).astype(np.float64))) < 0.01  # seeds
    # offset keying: shifting the global row offset by r shifts the mask by
    # exactly r rows (the blocking-mode consistency contract)
    k_off = keepmask(0.5, 99, 1, offset=16)
    np.testing.assert_array_equal(k[16:], k_off[:-16])


@pytest.mark.parametrize("n", [30, 150])
def test_fuse_fn_generator_parity(n, monkeypatch):
    """The eval-path fn-fused edge kernel (VERDICT r4 item 3; default ON in
    jets-mode, MPGAN_TPU_FUSE_FN forces) matches the unfused path in both
    kernel modes (jets-mode n=30, receiver-mode n=150)."""
    args = from_args_dict({"model": "mpgan", "jets": "g", "num_hits": n})
    from mpgan_tpu.models.registry import build_suite

    suite = build_suite(args)
    gp, gs = suite.g_init(jax.random.PRNGKey(0), suite.g_cfg)
    noise, _ = suite.noise.sample(jax.random.PRNGKey(1), 4)
    labels = jnp.full((4, 1), 0.5)

    monkeypatch.setenv("MPGAN_TPU_FUSE_FN", "0")
    y0, _ = suite.g_apply(suite.g_cfg, gp, gs, noise, labels)
    monkeypatch.setenv("MPGAN_TPU_FUSE_FN", "1")
    y1, _ = suite.g_apply(suite.g_cfg, gp, gs, noise, labels)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-6)


def test_fuse_fn_train_mode_unaffected(monkeypatch):
    """The fusion is eval-only: train-mode layers keep the custom-VJP edge
    kernel (differentiable), even with the env flag set."""
    cfg = MPLayerConfig.build(8, [24, 16], [32], 8)
    from mpgan_tpu.ops.mp import mp_layer_init

    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data()
    monkeypatch.setenv("MPGAN_TPU_FUSE_FN", "1")

    def loss(p):
        y, _ = mp_layer_apply(
            cfg, p, state, x, mask=mask, train=True, rng=jax.random.PRNGKey(3),
            use_pallas=True,
        )
        return jnp.sum(y * y)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))
