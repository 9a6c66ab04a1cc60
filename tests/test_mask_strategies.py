"""Masking-strategy coverage: mask_learn / mask_learn_sep (fixed here —
they crash in the reference's modern model, mpgan/model.py:626) and
spectral norm through the fused kernel path."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpgan_tpu.models.mpgan import (
    MaskConfig,
    MPGeneratorConfig,
    mp_generator_apply,
    mp_generator_init,
)


def _gen_cfg(mask: MaskConfig, output_node_size=3, **kw):
    return MPGeneratorConfig.build(
        num_particles=10, input_node_size=8, output_node_size=output_node_size,
        mp_iters=2, fe_layers=[12], fn_layers=[16], hidden_node_size=8,
        mask=mask, **kw,
    )


def test_mask_learn_generator():
    cfg = _gen_cfg(MaskConfig(mask_c=False, mask_learn=True, mask_learn_bin=True))
    params, state = mp_generator_init(jax.random.PRNGKey(0), cfg)
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 8)) * 0.2
    out, _ = mp_generator_apply(cfg, params, state, noise)
    assert out.shape == (4, 10, 4)
    # binary learned mask: sign() gives +-1, encoded -0.5 offset -> {-1.5, 0.5}
    assert set(np.unique(np.asarray(out[..., -1]))) <= {-1.5, 0.5}


def test_mask_learn_sep_generator():
    cfg = _gen_cfg(MaskConfig(mask_c=False, mask_learn_sep=True))
    params, state = mp_generator_init(jax.random.PRNGKey(0), cfg)
    # one extra noise "particle" feeds the count network (train.py:120-127)
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 11, 8)) * 0.2
    out, _ = mp_generator_apply(cfg, params, state, noise)
    assert out.shape == (4, 10, 4)
    assert set(np.unique(np.asarray(out[..., -1]))) <= {-0.5, 0.5}
    # count = argmax of fmg logits + mask_from_counts: at least 1 particle
    assert (np.asarray(out[..., -1] > 0).sum(1) >= 1).all()


def test_mask_feat_bin_generator():
    cfg = _gen_cfg(
        MaskConfig(mask_c=False, mask_feat_bin=True), output_node_size=4
    )
    params, state = mp_generator_init(jax.random.PRNGKey(0), cfg)
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 8)) * 0.2
    out, _ = mp_generator_apply(cfg, params, state, noise)
    assert out.shape == (4, 10, 4)
    assert set(np.unique(np.asarray(out[..., -1]))) <= {-1.5, 0.5}


@pytest.mark.kernel  # interpret-mode Pallas: slow tier
def test_spectral_norm_through_fused_path():
    """The fused kernel path must apply + advance spectral norm exactly like
    the jnp path (power iteration happens outside the kernel)."""
    cfg = _gen_cfg(MaskConfig(mask_c=True), linear_args={"spectral_norm": True})
    cfg_fused = dataclasses.replace(cfg, use_pallas=True)
    params, state = mp_generator_init(jax.random.PRNGKey(0), cfg)
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 8)) * 0.2
    labels = jnp.asarray(
        (np.random.RandomState(0).randint(1, 11, size=4) / 10.0)[:, None].astype(np.float32)
    )

    y_ref, s_ref = mp_generator_apply(cfg, params, state, noise, labels)
    y_fused, s_fused = mp_generator_apply(cfg_fused, params, state, noise, labels)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), rtol=5e-4, atol=1e-5)
    # spectral-norm u vectors advanced identically
    for a, b in zip(jax.tree.leaves(s_fused), jax.tree.leaves(s_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    # and actually moved
    assert not np.allclose(
        np.asarray(jax.tree.leaves(s_fused)[0]), np.asarray(jax.tree.leaves(state)[0])
    )
