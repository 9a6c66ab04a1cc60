"""Unit tests for the functional NN core: MLP semantics, spectral norm,
masking — each checked for parity against the reference torch modules."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpgan_tpu.ops.gather import one_hot_gather
from mpgan_tpu.ops.linear import MLPConfig, mlp_apply, mlp_init
from mpgan_tpu.ops.masking import counts_from_labels, mask_from_counts
from mpgan_tpu.ops.spectral_norm import spectral_normalize
from mpgan_tpu.utils.torch_import import mlp_from_torch


def test_mlp_shapes_and_final_linear():
    cfg = MLPConfig.build([64], input_size=16, output_size=8, final_linear=True)
    params, state = mlp_init(jax.random.PRNGKey(0), cfg)
    y, _ = mlp_apply(cfg, params, state, jnp.ones((4, 16)))
    assert y.shape == (4, 8)
    # final-linear output is unbounded (no activation applied)
    cfg2 = MLPConfig.build([64], input_size=16, output_size=8, final_linear=False)
    params2, state2 = mlp_init(jax.random.PRNGKey(0), cfg2)
    y2, _ = mlp_apply(cfg2, params2, state2, -jnp.ones((4, 16)) * 100)
    # leaky relu with alpha=0.2: strongly negative pre-activations shrink 5x
    assert jnp.all(y2 > -1e4)


def test_mlp_matches_reference_linearnet(reference_path, torch):
    from mpgan.model import LinearNet  # reference module, imported for parity only

    torch.manual_seed(0)
    net = LinearNet([32, 64], input_size=10, output_size=5, final_linear=True).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    cfg = MLPConfig.build([32, 64], input_size=10, output_size=5, final_linear=True)
    params, state = mlp_from_torch(sd, "", cfg)

    x = np.random.RandomState(1).randn(7, 10).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours, _ = mlp_apply(cfg, params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_mlp_spectral_norm_matches_reference(reference_path, torch):
    from mpgan.model import LinearNet

    torch.manual_seed(0)
    net = LinearNet([16], input_size=8, output_size=4, final_linear=True, spectral_norm=True)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    cfg = MLPConfig.build([16], input_size=8, output_size=4, final_linear=True, spectral_norm=True)
    params, state = mlp_from_torch(sd, "", cfg)

    x = np.random.RandomState(2).randn(5, 8).astype(np.float32)
    # the torch module advances u/v in-place on every forward; ours returns new state
    with torch.no_grad():
        ref1 = net(torch.from_numpy(x)).numpy()
        ref2 = net(torch.from_numpy(x)).numpy()
    ours1, state1 = mlp_apply(cfg, params, state, jnp.asarray(x))
    ours2, _ = mlp_apply(cfg, params, state1, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours1), ref1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours2), ref2, rtol=1e-4, atol=1e-5)
    # power iteration actually advanced
    assert not np.allclose(np.asarray(ours1), np.asarray(ours2))


def test_spectral_normalize_sigma():
    # sigma estimate converges to the true top singular value
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(12, 20).astype(np.float32))
    u = jnp.asarray(rng.randn(12).astype(np.float32))
    u = u / jnp.linalg.norm(u)
    w_sn, u, v = spectral_normalize(w, u, power_iterations=50)
    top_sv = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
    est = float(u @ (w @ v))
    assert abs(est - top_sv) / top_sv < 1e-4
    assert np.linalg.svd(np.asarray(w_sn), compute_uv=False)[0] == pytest.approx(1.0, rel=1e-4)


def test_mask_from_counts_matches_reference_trick(torch):
    # the argsort-rank trick (mpgan/model.py:695-699) against a torch oracle
    rng = np.random.RandomState(3)
    x0 = rng.randn(6, 30).astype(np.float32)
    labels = rng.randint(1, 31, size=(6,)).astype(np.float32) / 30.0
    njp = counts_from_labels(jnp.asarray(labels)[:, None], 30)
    ours = np.asarray(mask_from_counts(jnp.asarray(x0), njp))[:, :, 0]

    t = torch.from_numpy(x0)
    t_njp = (torch.from_numpy(labels) * 30).int() - 1
    ref = (t.argsort(1).argsort(1) <= t_njp.unsqueeze(1)).float().numpy()
    np.testing.assert_array_equal(ours, ref)
    # each jet has exactly count real particles
    np.testing.assert_array_equal(ours.sum(1), (labels * 30).astype(np.int32))


def test_mask_from_counts_ties_match_stable_argsort():
    # the comparison-matrix rank must break exact-equality ties by original
    # index, exactly like the stable double argsort it replaces (relevant
    # for bf16 noise, where ties are likelier)
    rng = np.random.RandomState(7)
    x0 = np.round(rng.randn(8, 30) * 2).astype(np.float32) / 2  # many duplicates
    njp = jnp.asarray(rng.randint(0, 30, size=(8,)), jnp.int32)
    ours = np.asarray(mask_from_counts(jnp.asarray(x0), njp))[:, :, 0]
    ranks = jnp.argsort(jnp.argsort(jnp.asarray(x0), axis=1, stable=True), axis=1, stable=True)
    ref = np.asarray((ranks <= njp[:, None]).astype(jnp.float32))
    np.testing.assert_array_equal(ours, ref)
    np.testing.assert_array_equal(ours.sum(1), np.asarray(njp) + 1)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("idx_shape", [(7, 12), (7, 5, 4)])
def test_one_hot_gather_bit_identical_to_take_along_axis(dtype, idx_shape):
    # the one-hot matmul gather replaces every device-side take_along_axis
    # (ops/gather.py); its contract is BIT-identical values for finite
    # sources, in f32 (HIGHEST-precision split recombines exactly) and bf16
    rng = np.random.RandomState(11)
    src = jnp.asarray(rng.randn(7, 9, 6).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.randint(0, 9, size=idx_shape), jnp.int32)
    ours = one_hot_gather(src, idx)
    flat = idx.reshape(7, -1)
    ref = jnp.take_along_axis(src, flat[..., None], axis=1).reshape(
        *idx_shape, src.shape[-1]
    )
    assert ours.dtype == src.dtype
    np.testing.assert_array_equal(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32)
    )


def test_mlp_dropout_and_bn():
    cfg = MLPConfig.build([32], input_size=8, output_size=4, dropout_p=0.5, batch_norm=True)
    params, state = mlp_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    y_train, new_state = mlp_apply(cfg, params, state, x, train=True, rng=jax.random.PRNGKey(2))
    y_eval, _ = mlp_apply(cfg, params, new_state, x, train=False)
    assert y_train.shape == y_eval.shape == (16, 4)
    # bn running stats moved
    assert not np.allclose(
        np.asarray(state["bn"][0]["mean"]), np.asarray(new_state["bn"][0]["mean"])
    )


def test_knn_delta_coords_rejected_loudly():
    """knn + delta_coords is an invalid layout everywhere — the reference's
    _getA_knn emits only the dists column (mpgan/model.py:372-381) while
    fe's declared input counts the diff columns (model.py:173-187), so it
    can never run. mp_layer_apply must reject it up front with a clear
    error on every path (the fused v2 kernel's first-layer column
    decomposition would otherwise silently read wrong W1 slices)."""
    from mpgan_tpu.ops.mp import MPLayerConfig, mp_layer_apply, mp_layer_init

    cfg = MPLayerConfig.build(
        4, [8], [8], 4, fully_connected=False, num_knn=3,
        pos_diffs=True, delta_coords=True, clabels=1,
    )
    params, state = mp_layer_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    labels = jnp.ones((2, 1))
    for use_pallas in (True, False):
        with pytest.raises(ValueError, match="num_ef"):
            mp_layer_apply(
                cfg, params, state, x, labels=labels, use_pallas=use_pallas
            )


def test_hash_dropout_semantics():
    """linear.hash_dropout (the XLA-path replacement for bernoulli dropout,
    round 5: the threefry draws were 33% of the GAPT train step) keeps the
    torch dropout contract: keep w.p. 1-p with 1/(1-p) scaling,
    deterministic per rng key, distinct across keys, grads flow through
    kept elements only."""
    from mpgan_tpu.ops.linear import hash_dropout

    x = jnp.ones((512, 30, 64))
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    y1 = hash_dropout(x, 0.5, k1)
    # keep rate at p=0.5 within 0.5% on ~1M elements
    assert abs(float((y1 > 0).mean()) - 0.5) < 5e-3
    # kept elements scaled by exactly 1/keep
    np.testing.assert_allclose(float(y1.max()), 2.0, rtol=1e-6)
    assert set(np.unique(np.asarray(y1))) <= {0.0, 2.0}
    # same key -> identical mask; different key -> ~independent mask
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(hash_dropout(x, 0.5, k1)))
    diff = float((np.sign(np.asarray(y1)) != np.sign(np.asarray(hash_dropout(x, 0.5, k2)))).mean())
    assert abs(diff - 0.5) < 5e-3
    # gradient is the mask itself (zero where dropped, 1/keep where kept)
    g = np.asarray(jax.grad(lambda z: jnp.sum(hash_dropout(z, 0.3, k1)))(x))
    assert np.all((g == 0.0) | (np.abs(g - 1 / 0.7) < 1e-5))
    # p=0 edge: identity via the mlp path contract (hash_dropout never
    # called at p=0, but guard the direct call anyway)
    np.testing.assert_array_equal(
        np.asarray(hash_dropout(x, 0.0, k1)), np.asarray(x)
    )
