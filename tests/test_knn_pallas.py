"""Fused knn edge kernel vs the jnp knn path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# slow tier: interpret-mode Pallas kernels run orders of magnitude
# slower than compiled code; excluded from the fast logic tier via
# `pytest -m "not kernel"` (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.kernel

from mpgan_tpu.ops.mp import MPLayerConfig, mp_layer_apply, mp_layer_init


def _data(b=2, n=20, f=8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, f).astype(np.float32) * 0.3)
    counts = rng.randint(n // 2, n + 1, size=b)
    mask = jnp.asarray(
        (np.arange(n)[None, :] < counts[:, None]).astype(np.float32)[..., None]
    )
    return x, mask


@pytest.mark.parametrize("pos_diffs,self_loops,masked", [
    (False, True, True),
    (True, True, False),
    (True, False, True),
])
def test_fused_knn_matches_jnp(pos_diffs, self_loops, masked):
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, fully_connected=False, num_knn=5,
        pos_diffs=pos_diffs, all_ef=True, self_loops=self_loops,
    )
    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data()
    mask = mask if masked else None

    y_ref, _ = mp_layer_apply(cfg, params, state, x, mask=mask, use_pallas=False)
    y_fused, _ = mp_layer_apply(cfg, params, state, x, mask=mask, use_pallas=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), rtol=5e-4, atol=1e-5)


def test_fused_knn_gradients_match():
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, fully_connected=False, num_knn=5, pos_diffs=True
    )
    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data()

    def loss(params, use_pallas):
        y, _ = mp_layer_apply(cfg, params, state, x, mask=mask, use_pallas=use_pallas)
        return jnp.sum(y**2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def _hash_dropmul_jnp(shape, p, seed, salt, offset):
    """jnp re-derivation of the kernel's stateless dropout hash — pins the
    hash semantics so fwd/bwd replay can be checked exactly (outer-sum
    row/col keys + 3-op finisher, mp_pallas._dropmul)."""
    rkey = (
        (jnp.arange(shape[0], dtype=jnp.uint32)[:, None] + jnp.uint32(offset))
        * jnp.uint32(0x9E3779B1)
        + jnp.uint32(seed) * jnp.uint32(0xC2B2AE3D)
        + jnp.uint32((salt * 0x27D4EB2F) & 0xFFFFFFFF)
    )
    ckey = jnp.arange(shape[1], dtype=jnp.uint32)[None, :] * jnp.uint32(0x85EBCA77)
    h = rkey + ckey
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 15)
    thr = jnp.uint32(min(int(p * 2**32), 2**32 - 1))
    return jnp.where(h >= thr, 1.0 / (1.0 - p), 0.0)


def test_fused_knn_dropout_exact_grad_replay():
    """With the dropout hash emulated in jnp, the kernel's forward AND
    custom-VJP gradient must match jnp autograd exactly (any fwd/bwd mask
    replay or in-kernel gather mismatch would show here)."""
    from mpgan_tpu.ops.knn_pallas import knn_edge_aggregate

    rng = np.random.RandomState(5)
    b, n, k, f_dim, h1 = 2, 12, 4, 8, 24
    x = jnp.asarray(rng.randn(b, n, f_dim).astype(np.float32) * 0.4)
    mask = jnp.asarray((rng.rand(b, n, 1) > 0.2).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, size=(b, n, k)).astype(np.int32))
    w = jnp.asarray(rng.randn(2 * f_dim, h1).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(h1).astype(np.float32) * 0.1)
    seed = jnp.asarray(3.0)

    def f(xx):
        out = knn_edge_aggregate(xx, mask, idx, None, None, (w, bias), seed, 0.2, True, 0.5)
        return jnp.sum(jnp.sin(out))

    def ref_f(xx):
        outs = []
        for jet in range(b):
            x1 = jnp.repeat(xx[jet], k, axis=0)  # [n*k, F]
            x2 = xx[jet][idx[jet].reshape(-1)]
            smask = mask[jet][idx[jet].reshape(-1)]
            z = jnp.concatenate([x1, x2], axis=-1) @ w + bias
            act = jnp.maximum(z, 0.2 * z)
            act = act * _hash_dropmul_jnp(act.shape, 0.5, 3, 0, jet * (n * k))
            outs.append((act * smask).reshape(n, k, h1).sum(1))
        return jnp.sum(jnp.sin(jnp.stack(outs)))

    np.testing.assert_allclose(float(f(x)), float(ref_f(x)), rtol=1e-5)
    g = jax.grad(f)(x)
    g_ref = jax.grad(ref_f)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_knn_v2_matches_v1_with_dropout(monkeypatch):
    """The v2 (relayout-free, first-layer-decomposed) and v1 (in-kernel pair
    assembly) gather kernels share the stateless dropout hash, row ordering
    and layer salts, so with identical seeds their outputs and gradients
    must agree to f32 summation-order tolerance even with dropout ON. Any
    drift in v2's one-hot gather/broadcast/aggregation matmuls or its
    first-layer decomposition (bias/cond folding, w_d distance column)
    shows here."""
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, fully_connected=False, num_knn=5,
        pos_diffs=True, all_ef=True, clabels=2, mask_fne_np=True,
        linear_args={"dropout_p": 0.3},
    )
    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data(b=2, n=16, seed=3)
    rng = np.random.RandomState(9)
    labels = jnp.asarray(rng.rand(2, 2).astype(np.float32))
    njp = jnp.sum(mask, axis=(1, 2)) / 16

    def run(version):
        monkeypatch.setenv("MPGAN_TPU_KNN_KERNEL", version)

        def f(p, xx):
            y, _ = mp_layer_apply(
                cfg, p, state, xx, mask=mask, labels=labels,
                num_jet_particles=njp, train=True, rng=jax.random.PRNGKey(7),
                use_pallas=True,
            )
            return jnp.sum(jnp.sin(y)), y

        (loss, y), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
            params, x
        )
        return y, grads

    y1, g1 = run("1")
    y2, g2 = run("2")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=5e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_knn_v3_matches_v2_with_dropout(monkeypatch):
    """The v3 (neighbour-major) gather kernel keys its dropout hash on the
    same global receiver-major pair ids as v1/v2 (via the explicit id
    matrix, knn_pallas._v3_ids), so with identical seeds its outputs and
    gradients must agree with v2 even with dropout ON. N is deliberately
    NOT a multiple of 8 so the receiver sublane padding (dummy rows, padded
    cotangents, idx/dists transposition) is exercised."""
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, fully_connected=False, num_knn=5,
        pos_diffs=True, all_ef=True, clabels=2, mask_fne_np=True,
        linear_args={"dropout_p": 0.3},
    )
    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data(b=2, n=14, seed=3)
    rng = np.random.RandomState(9)
    labels = jnp.asarray(rng.rand(2, 2).astype(np.float32))
    njp = jnp.sum(mask, axis=(1, 2)) / 14

    def run(version):
        monkeypatch.setenv("MPGAN_TPU_KNN_KERNEL", version)

        def f(p, xx):
            y, _ = mp_layer_apply(
                cfg, p, state, xx, mask=mask, labels=labels,
                num_jet_particles=njp, train=True, rng=jax.random.PRNGKey(7),
                use_pallas=True,
            )
            return jnp.sum(jnp.sin(y)), y

        (loss, y), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
            params, x
        )
        return y, grads

    y2, g2 = run("2")
    y3, g3 = run("3")
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y2), rtol=5e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g3), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_knn_v4_matches_v3_with_dropout(monkeypatch):
    """The round-5 fully fused kernel (select + gather + edge MLP +
    aggregation in one program, MPGAN_TPU_KNN_KERNEL=4) must reproduce the
    v3 pipeline's outputs AND gradients — same search, same emitted
    distances, same dropout ids, same backward kernel — including through
    the distance cotangent into x (detached-selection contract). N is not a
    multiple of 8 so the receiver sublane padding is exercised."""
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, fully_connected=False, num_knn=5,
        pos_diffs=True, all_ef=True, clabels=2, mask_fne_np=True,
        linear_args={"dropout_p": 0.3},
    )
    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data(b=2, n=14, seed=3)
    rng = np.random.RandomState(9)
    labels = jnp.asarray(rng.rand(2, 2).astype(np.float32))
    njp = jnp.sum(mask, axis=(1, 2)) / 14

    def run(version):
        monkeypatch.setenv("MPGAN_TPU_KNN_KERNEL", version)

        def f(p, xx):
            y, _ = mp_layer_apply(
                cfg, p, state, xx, mask=mask, labels=labels,
                num_jet_particles=njp, train=True, rng=jax.random.PRNGKey(7),
                use_pallas=True,
            )
            return jnp.sum(jnp.sin(y)), y

        (loss, y), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
            params, x
        )
        return y, grads

    y3, g3 = run("3")
    y4, g4 = run("4")
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y3), rtol=5e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g4), jax.tree.leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("gather_mode", ["pass", "concat"])
def test_knn_v4_bench_config_shape_no_dists(monkeypatch, gather_mode):
    """The knn-20 bench path runs pos_diffs=False (no distance column, the
    select operating on all node features) with self_loops=True and a mask:
    cover exactly that shape in both fused gather modes, against v3."""
    monkeypatch.setenv("MPGAN_TPU_KNN_FUSED_GATHER", gather_mode)
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, fully_connected=False, num_knn=5,
        pos_diffs=False, self_loops=True,
    )
    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data(b=2, n=14, seed=5)

    def run(version):
        monkeypatch.setenv("MPGAN_TPU_KNN_KERNEL", version)

        def f(p, xx):
            y, _ = mp_layer_apply(
                cfg, p, state, xx, mask=mask, labels=None,
                num_jet_particles=None, train=False, rng=None, use_pallas=True,
            )
            return jnp.sum(jnp.sin(y)), y

        (loss, y), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
            params, x
        )
        return y, grads

    y3, g3 = run("3")
    y4, g4 = run("4")
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y3), rtol=5e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g4), jax.tree.leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_knn_v4_jets_blocking_invariant(monkeypatch):
    """MPGAN_TPU_KNN_JETS blocks several jets into one fused program; with
    dropout ON the per-jet hash ids must key on the GLOBAL jet index
    (knn_pallas._v3_ids_at), so outputs and gradients are identical across
    block sizes."""
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, fully_connected=False, num_knn=5,
        pos_diffs=True, all_ef=True, linear_args={"dropout_p": 0.3},
    )
    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data(b=4, n=14, seed=3)
    monkeypatch.setenv("MPGAN_TPU_KNN_KERNEL", "4")

    def run(jets):
        monkeypatch.setenv("MPGAN_TPU_KNN_JETS", jets)

        def f(p, xx):
            y, _ = mp_layer_apply(
                cfg, p, state, xx, mask=mask, labels=None,
                num_jet_particles=None, train=True, rng=jax.random.PRNGKey(7),
                use_pallas=True,
            )
            return jnp.sum(jnp.sin(y)), y

        (loss, y), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
            params, x
        )
        return y, grads

    y1, g1 = run("1")
    y2, g2 = run("2")
    y4, g4 = run("4")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y1), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_knn_v4_self_loops_false(monkeypatch):
    """self_loops=False drops the first sorted column inside the fused
    kernel's extraction loop — verify against v3 (whose select kernel does
    the same), unmasked."""
    cfg = MPLayerConfig.build(
        6, [16, 12], [16], 6, fully_connected=False, num_knn=4,
        pos_diffs=True, self_loops=False,
    )
    params, state = mp_layer_init(jax.random.PRNGKey(1), cfg)
    x, _ = _data(b=2, n=11, f=6, seed=8)

    def run(version):
        monkeypatch.setenv("MPGAN_TPU_KNN_KERNEL", version)
        y, _ = mp_layer_apply(
            cfg, params, state, x, mask=None, labels=None,
            num_jet_particles=None, train=False, rng=None, use_pallas=True,
        )
        return y

    np.testing.assert_allclose(
        np.asarray(run("4")), np.asarray(run("3")), rtol=5e-4, atol=1e-5
    )


def test_knn_v3_need_wgrads_false_skips_weight_grads():
    """v3's need_wgrads hint: du1/du2m/ddists bit-identical, hidden weight
    and w_d cotangents exact zeros (mirrors the v2 contract)."""
    from mpgan_tpu.ops.knn_pallas import knn_edge_aggregate_v3

    rng = np.random.RandomState(2)
    b, n, k, h1, h2 = 2, 12, 4, 24, 16
    u1 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32) * 0.3)
    u2m = jnp.asarray(rng.randn(b, n, h1 + 1).astype(np.float32) * 0.3)
    idx = jnp.asarray(rng.randint(0, n, size=(b, n, k)).astype(np.int32))
    dists = jnp.asarray(rng.rand(b, n, k).astype(np.float32))
    w_d = jnp.asarray(rng.randn(h1).astype(np.float32) * 0.2)
    hidden = (
        jnp.asarray(rng.randn(h1, h2).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(h2).astype(np.float32) * 0.2),
    )
    seed = jnp.asarray(5.0)

    def f(u1, u2m, dists, w_d, hidden, need):
        out = knn_edge_aggregate_v3(
            u1, u2m, idx, dists, w_d, hidden, seed, 0.2, True, 0.5, need
        )
        return jnp.sum(jnp.sin(out))

    g_full = jax.grad(f, argnums=(0, 1, 2, 3, 4))(u1, u2m, dists, w_d, hidden, True)
    g_skip = jax.grad(f, argnums=(0, 1, 2, 3, 4))(u1, u2m, dists, w_d, hidden, False)
    for a, bb in zip(g_full[:3], g_skip[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    assert not np.any(np.asarray(g_skip[3]))
    for d in jax.tree.leaves(g_skip[4]):
        assert not np.any(np.asarray(d))
    assert np.any(np.asarray(g_full[3]))
    assert any(np.any(np.asarray(d)) for d in jax.tree.leaves(g_full[4]))


def test_knn_v2_need_wgrads_false_skips_weight_grads():
    """need_wgrads=False must keep du1/du2m/ddists bit-identical and return
    exact zeros for the hidden-layer weight and w_d cotangents (the G-step
    hint, mp.skip_weight_grads)."""
    from mpgan_tpu.ops.knn_pallas import knn_edge_aggregate_v2

    rng = np.random.RandomState(2)
    b, n, k, h1, h2 = 2, 12, 4, 24, 16
    u1 = jnp.asarray(rng.randn(b, n, h1).astype(np.float32) * 0.3)
    u2m = jnp.asarray(rng.randn(b, n, h1 + 1).astype(np.float32) * 0.3)
    idx = jnp.asarray(rng.randint(0, n, size=(b, n, k)).astype(np.int32))
    dists = jnp.asarray(rng.rand(b, n, k).astype(np.float32))
    w_d = jnp.asarray(rng.randn(h1).astype(np.float32) * 0.2)
    hidden = (
        jnp.asarray(rng.randn(h1, h2).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(h2).astype(np.float32) * 0.2),
    )
    seed = jnp.asarray(5.0)

    def f(u1, u2m, dists, w_d, hidden, need):
        out = knn_edge_aggregate_v2(
            u1, u2m, idx, dists, w_d, hidden, seed, 0.2, True, 0.5, need
        )
        return jnp.sum(jnp.sin(out))

    g_full = jax.grad(f, argnums=(0, 1, 2, 3, 4))(u1, u2m, dists, w_d, hidden, True)
    g_skip = jax.grad(f, argnums=(0, 1, 2, 3, 4))(u1, u2m, dists, w_d, hidden, False)
    for a, bb in zip(g_full[:3], g_skip[:3]):  # du1, du2m, ddists identical
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    assert not np.any(np.asarray(g_skip[3]))  # dw_d zero
    for d in jax.tree.leaves(g_skip[4]):  # hidden weight cotangents zero
        assert not np.any(np.asarray(d))
    assert np.any(np.asarray(g_full[3]))
    assert any(np.any(np.asarray(d)) for d in jax.tree.leaves(g_full[4]))


def test_knn_select_matches_xla_search():
    """The Pallas selection kernel picks the exact k-smallest sender set the
    XLA search (approx_max_k at recall 1.0) picks, for self-loop and
    no-self-loop variants, masked and unmasked."""
    from mpgan_tpu.ops.knn_pallas import knn_select
    from mpgan_tpu.ops.mp import MPLayerConfig, _knn_search

    for self_loops in (True, False):
        for masked in (True, False):
            cfg = MPLayerConfig.build(
                8, [24], [32], 8, fully_connected=False, num_knn=6,
                all_ef=True, self_loops=self_loops,
            )
            x, mask = _data(b=3, n=20, seed=4)
            m = mask if masked else None
            idx_ref, _ = _knn_search(cfg, x, m)
            x_far = ((1 - 1e4) * m + 1e4) * x if m is not None else x
            idx_new = knn_select(x, x_far, 6, self_loops)
            # compare as SETS per receiver (tie order may differ). The
            # kernel's index-in-mantissa keys coarsen comparisons by ~2^-15
            # relative; among mask-pushed senders (distances ~1e4) that
            # window spans real gaps, so WHICH masked sender fills a slot
            # may differ — model-irrelevant, their contributions are zeroed
            # by the gathered sender mask (verified by
            # test_fused_knn_matches_jnp). Unmasked selections must agree.
            a = np.sort(np.asarray(idx_new), axis=-1)
            bset = np.sort(np.asarray(idx_ref), axis=-1)
            diff = a != bset
            # any divergence must be a near-tie inside the kernel's
            # documented 2^-15 relative comparison coarsening (the
            # index-in-mantissa key) — e.g. two mask-pushed senders, or two
            # real senders at physically indistinguishable distances
            xn = np.asarray(x)
            xf = np.asarray(x_far)
            for bi, ri, si in zip(*np.nonzero(diff)):
                j1, j2 = a[bi, ri, si], bset[bi, ri, si]
                d1 = np.sum((xf[bi, j1] - xn[bi, ri]) ** 2)
                d2 = np.sum((xf[bi, j2] - xn[bi, ri]) ** 2)
                rel = abs(d1 - d2) / max(d1, d2)
                assert rel < 2.0 ** -14, (
                    f"non-tie selection diverged: self_loops={self_loops} "
                    f"masked={masked} b={bi} recv={ri}: {j1} vs {j2} rel={rel}"
                )


def test_knn_select_ascending_distance_order():
    """Within a row, indices come out in ascending-distance order (the
    reference's sort order, relevant when dists ride as edge features)."""
    from mpgan_tpu.ops.knn_pallas import knn_select

    x, _ = _data(b=2, n=16, seed=7)
    idx = np.asarray(knn_select(x, x, 5, True))
    xn = np.asarray(x)
    for b in range(2):
        d = np.linalg.norm(xn[b][:, None, :] - xn[b][None, :, :], axis=-1)
        for i in range(16):
            dd = d[i, idx[b, i]]
            assert np.all(np.diff(dd) >= -1e-6), (b, i, dd)


def test_knn_select_nm_matches_select_plus_gather():
    """The fused neighbour-major select kernel (search + exact edge
    distances in one program, knn_pallas.knn_select_nm) must be
    value-identical to the pipeline it replaces — knn_select followed by
    the XLA one-hot gather + reference norm — in indices (exact), distances
    (to fma-fusion noise: same op order and HIGHEST-precision gathers, but
    XLA may fuse the sum-of-squares with fma in one lowering and not the
    other — observed 1-ulp diffs on CPU) and gradients (vs the XLA glue's
    autodiff)."""
    from mpgan_tpu.ops.gather import one_hot_gather
    from mpgan_tpu.ops.knn_pallas import knn_select, knn_select_nm
    from mpgan_tpu.ops.mp_pallas import _pad_senders

    for n, k, self_loops, want_dists, masked in [
        (20, 6, True, True, True),
        (13, 4, False, True, False),
        (9, 3, True, False, True),
    ]:
        b = 3
        x, mask = _data(b=b, n=n, seed=11)
        x_far = ((1 - 1e4) * mask + 1e4) * x if masked else x
        np8 = _pad_senders(n)

        idx_old = knn_select(x, x_far, k, self_loops)  # [B, N, k]
        idx_nm, dists_nm = knn_select_nm(x, x_far, k, self_loops, want_dists)
        assert idx_nm.shape == (b, k * np8, 1)
        idx_rm = jnp.swapaxes(idx_nm.reshape(b, k, np8)[:, :, :n], 1, 2)
        np.testing.assert_array_equal(np.asarray(idx_rm), np.asarray(idx_old))

        if not want_dists:
            assert dists_nm is None
            continue
        x2g = one_hot_gather(x_far, idx_old)
        dists_ref = jnp.linalg.norm(x2g - x[:, :, None, :] + 1e-12, axis=-1)
        d_rm = jnp.swapaxes(dists_nm.reshape(b, k, np8)[:, :, :n], 1, 2)
        np.testing.assert_allclose(
            np.asarray(d_rm), np.asarray(dists_ref), rtol=2e-6, atol=1e-7
        )

        def f_new(x, xf):
            _, d = knn_select_nm(x, xf, k, self_loops, True)
            return jnp.sum(jnp.sin(d.reshape(b, k, np8)[:, :, :n]))

        def f_old(x, xf):
            idx = knn_select(x, xf, k, self_loops)
            x2g = one_hot_gather(xf, idx)
            d = jnp.linalg.norm(x2g - x[:, :, None, :] + 1e-12, axis=-1)
            return jnp.sum(jnp.sin(jnp.swapaxes(d, 1, 2)))

        g_new = jax.grad(f_new, argnums=(0, 1))(x, x_far)
        g_old = jax.grad(f_old, argnums=(0, 1))(x, x_far)
        for a, bb in zip(g_new, g_old):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=1e-6, atol=1e-7
            )


def test_knn_select_nm_rejects_k_exceeding_senders():
    from mpgan_tpu.ops.knn_pallas import knn_select_nm

    x, _ = _data(b=2, n=8, seed=0)
    with pytest.raises(ValueError, match="exceeds"):
        knn_select_nm(x, x, 9, True, True)
    with pytest.raises(ValueError, match="exceeds"):
        knn_select_nm(x, x, 8, False, False)


def test_knn_select_rejects_k_exceeding_senders():
    """k (+1 dropped self) > N must fail loudly, like the XLA search did —
    the extraction loop would otherwise emit silent sentinel indices."""
    from mpgan_tpu.ops.knn_pallas import knn_select

    x, _ = _data(b=2, n=8, seed=0)
    with pytest.raises(ValueError, match="exceeds"):
        knn_select(x, x, 9, True)
    with pytest.raises(ValueError, match="exceeds"):
        knn_select(x, x, 8, False)  # 8 + dropped self > 8
    assert knn_select(x, x, 8, True).shape == (2, 8, 8)  # k == N is fine


def test_fused_knn_coords_only_selection():
    """pos_diffs without all_ef selects neighbours on the first num_coords
    features only (mpgan/model.py:347-359 slices coords) — the fused path's
    sel_cols slice must match the jnp path."""
    cfg = MPLayerConfig.build(
        8, [24, 16], [32], 8, fully_connected=False, num_knn=5,
        pos_diffs=True, all_ef=False,
    )
    assert not cfg.all_ef and cfg.pos_diffs
    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x, mask = _data(seed=11)
    y_ref, _ = mp_layer_apply(cfg, params, state, x, mask=mask, use_pallas=False)
    y_fused, _ = mp_layer_apply(cfg, params, state, x, mask=mask, use_pallas=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), rtol=5e-4, atol=1e-5)


def test_block_receivers_respects_mosaic_sublane_constraint(monkeypatch):
    """Every knn gather kernel carries [tr, lanes] receiver-axis blocks
    (xr/u1/du1/out), which Mosaic only accepts when tr % 8 == 0 or tr == n.
    The picker used to guarantee only (tr*k) % 8 == 0, so a sweep override
    like ROW_TARGET=1024 at n=150 picked tr=50 and crashed the v2 kernel
    mid-trace on hardware; it must degrade to the whole jet instead."""
    from mpgan_tpu.ops.knn_pallas import _block_receivers

    monkeypatch.setenv("MPGAN_TPU_KNN_ROW_TARGET", "1024")
    assert _block_receivers(150, 20) == 150  # tr=50 is illegal, fall back
    assert _block_receivers(128, 20) == 32  # legal 8-aligned block honored
    monkeypatch.delenv("MPGAN_TPU_KNN_ROW_TARGET")
    tr = _block_receivers(150, 20)
    assert tr == 150 or tr % 8 == 0
