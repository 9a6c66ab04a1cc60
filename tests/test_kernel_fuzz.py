"""Seeded config-lattice fuzz for the fused MP kernel paths (interpret mode).

The MP layer's argument lattice (mpgan/model.py:173-204) — dense/knn x edge
features (pos_diffs / all_ef / delta_r / delta_coords / coords) x
conditioning (clabels / mask_fne_np) x dropout x spectral norm x batch norm
x masking x sum/mean aggregation x receiver blocking x knn kernel
generation x select kernel — has far more corners than the hand-written
parity tests cover (the round-3 delta_coords hole was caught by review, not
tests). This sweep samples the lattice with a fixed seed and asserts, for
every sampled point, either

- fused-vs-jnp parity of outputs AND gradients (params + input), with
  dropout forced off for the comparison (the jnp path draws dropout masks
  from ``jax.random``, the kernels from the stateless hash — they are
  intentionally different RNGs), or
- a loud ``ValueError`` for combinations the layer cannot express
  (knn + pos_diffs with num_ef != 1), never a silent wrong slice.

Sampled points with dropout ON additionally pin the kernel-side dropout
contracts: dense blocking-invariance (the hash is keyed on global pair ids,
so block_receivers must not change the result) and knn cross-generation
agreement (v1's in-kernel pair assembly vs v3's neighbour-major
decomposition share hash, seeds and salts).
"""

import dataclasses
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.kernel

from mpgan_tpu.ops.mp import (
    MPLayerConfig,
    fused_eligible,
    mp_layer_apply,
    mp_layer_init,
)

N_CASES = 48


def _sample(r: random.Random) -> dict:
    s = {}
    s["fully_connected"] = r.random() < 0.5
    s["pos_diffs"] = r.random() < 0.6
    s["all_ef"] = r.random() < 0.5
    s["delta_r"] = r.random() < 0.6
    s["delta_coords"] = r.random() < 0.35
    s["coords"] = r.choice(["polarrel", "cartesian"])
    s["clabels"] = r.choice([0, 0, 1, 2])
    s["mask_fne_np"] = r.random() < 0.35
    s["sum_agg"] = r.random() < 0.7
    s["self_loops"] = r.random() < 0.7
    s["dropout_p"] = r.choice([0.0, 0.0, 0.3])
    s["spectral_norm"] = r.random() < 0.3
    s["batch_norm"] = r.random() < 0.15
    s["masked"] = r.random() < 0.75
    s["num_knn"] = r.choice([3, 4])
    s["n"] = r.choice([13, 16]) if s["fully_connected"] else r.choice([9, 14])
    s["f"] = r.choice([4, 6])
    s["h1"] = r.choice([8, 16])
    s["h2"] = r.choice([8, 12])
    s["out"] = r.choice([4, 6])
    s["block"] = r.choice([8, 16])
    s["kernel"] = r.choice(["1", "2", "3", "4"])
    s["select"] = r.choice(["0", "1"])
    return s


def _without_dropout(cfg: MPLayerConfig) -> MPLayerConfig:
    return dataclasses.replace(
        cfg,
        fe=dataclasses.replace(cfg.fe, dropout_p=0.0),
        fn=dataclasses.replace(cfg.fn, dropout_p=0.0),
    )


@pytest.mark.parametrize("case", range(N_CASES))
def test_config_lattice_fuzz(case, monkeypatch):
    r = random.Random(4242 + case)
    s = _sample(r)
    monkeypatch.setenv("MPGAN_TPU_BLOCK_RECEIVERS", str(s["block"]))
    monkeypatch.setenv("MPGAN_TPU_KNN_KERNEL", s["kernel"])
    monkeypatch.setenv("MPGAN_TPU_KNN_SELECT", s["select"])

    cfg = MPLayerConfig.build(
        s["f"],
        [s["h1"], s["h2"]],
        [s["h2"]],
        s["out"],
        linear_args={
            "dropout_p": s["dropout_p"],
            "spectral_norm": s["spectral_norm"],
            "batch_norm": s["batch_norm"],
        },
        pos_diffs=s["pos_diffs"],
        all_ef=s["all_ef"],
        delta_r=s["delta_r"],
        delta_coords=s["delta_coords"],
        coords=s["coords"],
        clabels=s["clabels"],
        mask_fne_np=s["mask_fne_np"],
        fully_connected=s["fully_connected"],
        num_knn=s["num_knn"],
        self_loops=s["self_loops"],
        sum_agg=s["sum_agg"],
    )
    params, state = mp_layer_init(jax.random.PRNGKey(case), cfg)

    nprng = np.random.RandomState(case)
    b, n = 2, s["n"]
    x = jnp.asarray(nprng.randn(b, n, s["f"]).astype(np.float32) * 0.4)
    mask = None
    if s["masked"]:
        counts = nprng.randint(1, n + 1, size=b)
        mask = jnp.asarray(
            (np.arange(n)[None, :] < counts[:, None]).astype(np.float32)[..., None]
        )
    labels = jnp.asarray(nprng.rand(b, 3).astype(np.float32))
    njp = jnp.asarray(nprng.randint(1, n + 1, size=b).astype(np.float32) / n)
    train = s["dropout_p"] > 0 or s["batch_norm"]
    kw = dict(
        mask=mask,
        labels=labels,
        num_jet_particles=njp,
        train=train,
        rng=jax.random.PRNGKey(1000 + case),
    )

    if not cfg.fully_connected:
        invalid = cfg.pos_diffs and cfg.num_ef != 1
        err = "knn MP layers"
    else:
        # combos where the pairwise builder and the declared num_ef disagree
        # (the reference's getA view() crashes on these, mpgan/model.py:309)
        diff_w = cfg.input_node_size if cfg.all_ef else cfg.num_coords
        if cfg.delta_r and cfg.delta_coords:
            built = diff_w + 1
        elif cfg.delta_r or cfg.all_ef:
            built = 1
        elif cfg.delta_coords:
            built = diff_w
        else:
            built = 0
        invalid = cfg.pos_diffs and built != cfg.num_ef
        err = "inconsistent dense"
    if invalid:
        with pytest.raises(ValueError, match=err):
            mp_layer_apply(cfg, params, state, x, use_pallas=True, **kw)
        with pytest.raises(ValueError, match=err):
            mp_layer_apply(cfg, params, state, x, use_pallas=False, **kw)
        return

    # --- fused vs jnp parity, dropout off ---
    cfg0 = _without_dropout(cfg)

    def f(p, xx, use_pallas):
        y, _ = mp_layer_apply(cfg0, p, state, xx, use_pallas=use_pallas, **kw)
        return jnp.sum(jnp.sin(y)), y

    (_, y_ref), g_ref = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        params, x, False
    )
    (_, y_fused), g_fused = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        params, x, True
    )
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=5e-4, atol=2e-5
    )
    for a, bb in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-3, atol=2e-5
        )

    # --- dropout-on contracts (kernel paths only) ---
    if s["dropout_p"] == 0 or not fused_eligible(cfg, train=True):
        return

    def fd(p, xx):
        y, _ = mp_layer_apply(cfg, p, state, xx, use_pallas=True, **kw)
        return jnp.sum(jnp.sin(y)), y

    (_, y_a), g_a = jax.value_and_grad(fd, argnums=(0, 1), has_aux=True)(params, x)

    if cfg.fully_connected:
        # blocking invariance: the dropout hash is keyed on global pair ids
        other = "16" if s["block"] == 8 else "8"
        monkeypatch.setenv("MPGAN_TPU_BLOCK_RECEIVERS", other)
    else:
        # cross-generation agreement: v1 and v3 share hash/seeds/salts
        other_kernel = "3" if s["kernel"] == "1" else "1"
        monkeypatch.setenv("MPGAN_TPU_KNN_KERNEL", other_kernel)

    (_, y_b), g_b = jax.value_and_grad(fd, argnums=(0, 1), has_aux=True)(params, x)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_a), rtol=5e-4, atol=2e-5)
    for a, bb in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_a)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-3, atol=2e-5)
