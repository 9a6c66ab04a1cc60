"""Parity tests for the fused whole-generator GAPT Pallas kernel
(ops/gapt_pallas.py) against the jnp path (models/gapt.gapt_g_apply),
run in interpreter mode on CPU (tests/conftest.py pins the backend).

The kernel must match the jnp path to float-associativity noise on every
eligible config, and ineligible configs must silently take the jnp path
(bit-identical outputs).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpgan_tpu.models.gapt import GAPTConfig, gapt_g_apply, gapt_g_init
from mpgan_tpu.ops.gapt_pallas import _pick_block, fused_gapt_eligible

pytestmark = pytest.mark.kernel


def _run(cfg, batch, seed=0):
    params, state = gapt_g_init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(batch, cfg.num_particles, cfg.embed_dim)).astype(np.float32))
    labels = jnp.asarray(
        (rng.integers(1, cfg.num_particles + 1, size=batch) / cfg.num_particles)[
            :, None
        ].astype(np.float32)
    )
    ref, _ = gapt_g_apply(
        dataclasses.replace(cfg, use_pallas=False), params, state, x, labels
    )
    fused, fused_state = gapt_g_apply(
        dataclasses.replace(cfg, use_pallas=True), params, state, x, labels
    )
    return ref, fused, state, fused_state


@pytest.mark.parametrize(
    "n,e,h,layers,mask,batch",
    [
        (30, 64, 4, 4, True, 64),  # the jets-default generator
        (30, 64, 4, 4, False, 64),
        (25, 32, 2, 2, True, 40),  # G=5 packing, non-divisible gpb fallback
        (100, 32, 4, 1, True, 16),  # G=1: no packing, per-jet attention
        (30, 64, 4, 2, True, 8),  # single block (one grid step)
    ],
)
def test_fused_matches_jnp(n, e, h, layers, mask, batch):
    cfg = GAPTConfig(
        num_particles=n, feat_size=3, is_generator=True,
        sab_layers=layers, num_heads=h, embed_dim=e, use_mask=mask,
    )
    assert fused_gapt_eligible(cfg, train=False, batch=batch)
    ref, fused, state, fused_state = _run(cfg, batch)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-6)
    # eval-mode state passes through unchanged
    assert jax.tree.structure(fused_state) == jax.tree.structure(state)
    if mask:
        # the mask channel is exact (same argsort-rank mask, mask - 0.5)
        np.testing.assert_array_equal(np.asarray(fused[..., -1]), np.asarray(ref[..., -1]))


@pytest.mark.parametrize(
    "override",
    [
        {"layer_norm": True},
        {"use_isab": True},
        {"sab_fc_layers": (128,)},
        {"final_fc_layers": (32,)},
        {"linear_args": (("spectral_norm", True),)},
        {"linear_args": (("batch_norm", True),)},
    ],
)
def test_ineligible_configs_fall_back(override):
    cfg = GAPTConfig(
        num_particles=30, feat_size=3, is_generator=True,
        sab_layers=2, num_heads=4, embed_dim=64, **override,
    )
    assert not fused_gapt_eligible(cfg, train=False, batch=64)
    # dispatch with use_pallas=True must produce the jnp path bit-identically
    ref, fused, _, _ = _run(cfg, 64)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_train_mode_falls_back():
    cfg = GAPTConfig(
        num_particles=30, feat_size=3, is_generator=True,
        sab_layers=2, num_heads=4, embed_dim=64,
    )
    assert not fused_gapt_eligible(cfg, train=True, batch=64)


def test_unblockable_batch_falls_back():
    cfg = GAPTConfig(
        num_particles=30, feat_size=3, is_generator=True,
        sab_layers=2, num_heads=4, embed_dim=64,
    )
    # G=4 at N=30: batch 7 has no g*gpb divisor
    assert _pick_block(7, 4) is None
    assert not fused_gapt_eligible(cfg, train=False, batch=7)
    ref, fused, _, _ = _run(cfg, 7)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_fused_grad_path_not_required():
    """The fused path is eval-only; training keeps jnp autodiff. A grad
    through gapt_g_apply in train mode must therefore work regardless of
    use_pallas."""
    cfg = GAPTConfig(
        num_particles=30, feat_size=3, is_generator=True,
        sab_layers=2, num_heads=4, embed_dim=64, use_pallas=True,
    )
    params, state = gapt_g_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 30, 64)).astype(np.float32))
    labels = jnp.asarray((rng.integers(1, 31, size=8) / 30)[:, None].astype(np.float32))

    def loss(p):
        out, _ = gapt_g_apply(cfg, p, state, x, labels, train=True, rng=jax.random.PRNGKey(1))
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    assert jnp.isfinite(jax.tree.reduce(lambda a, b: a + jnp.sum(b), g, 0.0))
