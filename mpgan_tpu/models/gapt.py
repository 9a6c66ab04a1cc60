"""GAPT — Generative Adversarial Particle Transformer.

Functional re-implementation of ``GAPT_G`` / ``GAPT_D``
(gapt/model.py:205-344): stacks of set-attention blocks (SAB, or ISAB with
learned inducing points), with the generator masking via the same
conditional-count argsort trick as MPGAN and the discriminator pooling through
a 1-seed PMA before the final FC head.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.attention import MABConfig, mab_apply, mab_init, packed_attn_bias, sab_mask
from ..ops.gapt_pallas import fused_gapt_eligible, gapt_g_fused
from ..ops.linear import MLPConfig, mlp_apply, mlp_init
from ..ops.masking import counts_from_labels, mask_from_counts, split_mask


@dataclasses.dataclass(frozen=True)
class GAPTConfig:
    """Shared config for GAPT generator and discriminator
    (gapt/model.py:206-249, 278-330)."""

    num_particles: int
    feat_size: int  # output feats for G, input feats for D
    is_generator: bool
    sab_layers: int = 2
    num_heads: int = 4
    embed_dim: int = 32
    sab_fc_layers: tuple[int, ...] = ()
    layer_norm: bool = False
    dropout_p: float = 0.0
    final_fc_layers: tuple[int, ...] = ()
    use_mask: bool = True
    use_isab: bool = False
    num_isab_nodes: int = 10
    linear_args: tuple[tuple[str, Any], ...] = ()
    # opt-in (True) routes eligible eval-mode forwards through the fused
    # whole-generator kernel (ops/gapt_pallas.py) — measured SLOWER than
    # the XLA path at GAPT shapes; kept as the runnable ceiling probe
    use_pallas: bool | None = None

    def _linear_args(self) -> dict:
        return dict(self.linear_args)

    def mab_cfg(self) -> MABConfig:
        return MABConfig.build(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            ff_layers=list(self.sab_fc_layers),
            layer_norm=self.layer_norm,
            dropout_p=self.dropout_p,
            final_linear=False,
            linear_args=self._linear_args(),
        )

    def final_fc_cfg(self) -> MLPConfig:
        return MLPConfig.build(
            list(self.final_fc_layers),
            input_size=self.embed_dim,
            output_size=self.feat_size if self.is_generator else 1,
            final_linear=True,
            **self._linear_args(),
        )

    def embed_cfg(self) -> MLPConfig:
        """D-side input embedding (gapt/model.py:311-313): a one-layer
        LinearNet with activation (not final-linear)."""
        return MLPConfig.build(
            [], input_size=self.feat_size, output_size=self.embed_dim,
            **self._linear_args(),
        )


def _xavier_uniform(rng, shape, dtype):
    fan_in, fan_out = shape[-1], shape[-2]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def _sab_init(rng, cfg: GAPTConfig, dtype):
    """One SAB (a single MAB) or ISAB (inducing points + two MABs)."""
    mab_cfg = cfg.mab_cfg()
    if not cfg.use_isab:
        p, s = mab_init(rng, mab_cfg, dtype)
        return {"mab": p}, {"mab": s}
    k_i, k0, k1 = jax.random.split(rng, 3)
    p0, s0 = mab_init(k0, mab_cfg, dtype)
    p1, s1 = mab_init(k1, mab_cfg, dtype)
    inducing = _xavier_uniform(k_i, (1, cfg.num_isab_nodes, cfg.embed_dim), dtype)
    return {"I": inducing, "mab0": p0, "mab1": p1}, {"mab0": s0, "mab1": s1}


def _sab_apply(
    cfg: GAPTConfig, params, state, x, mask, *, train, rng, update_sn, packed_bias=None
):
    mab_cfg = cfg.mab_cfg()
    n = x.shape[1]
    if not cfg.use_isab:
        y, s = mab_apply(
            mab_cfg, params["mab"], state["mab"], x, x, sab_mask(mask, n),
            train=train, rng=rng, update_sn=update_sn, packed_bias=packed_bias,
        )
        return y, {"mab": s}
    # ISAB (gapt/model.py:178-191): H = MAB(I, x); out = MAB(x, H)
    r0, r1 = jax.random.split(rng) if rng is not None else (None, None)
    inducing = jnp.broadcast_to(params["I"], (x.shape[0],) + params["I"].shape[1:])
    h, s0 = mab_apply(
        mab_cfg, params["mab0"], state["mab0"], inducing, x,
        sab_mask(mask, cfg.num_isab_nodes), train=train, rng=r0, update_sn=update_sn,
    )
    y, s1 = mab_apply(
        mab_cfg, params["mab1"], state["mab1"], x, h, None,
        train=train, rng=r1, update_sn=update_sn,
    )
    return y, {"mab0": s0, "mab1": s1}


def gapt_g_init(rng: jax.Array, cfg: GAPTConfig, dtype=jnp.float32):
    keys = jax.random.split(rng, cfg.sab_layers + 1)
    params: dict = {"sabs": []}
    state: dict = {"sabs": []}
    for i in range(cfg.sab_layers):
        p, s = _sab_init(keys[i], cfg, dtype)
        params["sabs"].append(p)
        state["sabs"].append(s)
    params["final_fc"], state["final_fc"] = mlp_init(keys[-1], cfg.final_fc_cfg(), dtype)
    return params, state


def gapt_g_apply(
    cfg: GAPTConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    labels: jax.Array | None = None,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    update_sn: bool = True,
) -> tuple[jax.Array, dict]:
    """Generator forward (gapt/model.py:251-274). ``x: [B, N, embed_dim]``
    noise; returns ``[B, N, feat_size(+1 if masked)]``."""
    n_rngs = cfg.sab_layers + 1
    rngs = jax.random.split(rng, n_rngs) if rng is not None else [None] * n_rngs

    if cfg.use_mask:
        njp = counts_from_labels(labels, cfg.num_particles)
        mask = mask_from_counts(x[:, :, 0], njp)
    else:
        mask = None

    # the fused whole-generator kernel is opt-in only: the round-4 probe
    # measured it 3.6x SLOWER than the XLA path at every batch (see
    # ops/gapt_pallas.py docstring + PERF.md round 4) — XLA's batched
    # einsums are the right strategy at GAPT's tiny shapes
    if cfg.use_pallas and fused_gapt_eligible(cfg, train, x.shape[0]):
        # eval-mode serving path: whole generator in one Pallas program;
        # nothing mutable updates on an eligible config, so state passes
        # through unchanged (structure matches the jnp path's new_state)
        return gapt_g_fused(cfg, params, x, mask), state

    # the SAB stack reuses one key mask: hoist the packed-attention bias
    # out of the per-layer mha calls (ops/attention.packed_attn_bias)
    pbias = (
        packed_attn_bias(sab_mask(mask, cfg.num_particles), cfg.num_heads,
                         cfg.num_particles, cfg.num_particles)
        if (mask is not None and not cfg.use_isab)
        else None
    )

    new_state: dict = {"sabs": []}
    for i in range(cfg.sab_layers):
        x, s = _sab_apply(
            cfg, params["sabs"][i], state["sabs"][i], x, mask,
            train=train, rng=rngs[i], update_sn=update_sn, packed_bias=pbias,
        )
        new_state["sabs"].append(s)

    x, fc_state = mlp_apply(
        cfg.final_fc_cfg(), params["final_fc"], state["final_fc"], x,
        train=train, rng=rngs[-1], update_sn=update_sn,
    )
    new_state["final_fc"] = fc_state
    x = jnp.tanh(x)
    if mask is not None:
        x = jnp.concatenate([x, mask - 0.5], axis=2)
    return x, new_state


def gapt_d_init(rng: jax.Array, cfg: GAPTConfig, dtype=jnp.float32):
    keys = jax.random.split(rng, cfg.sab_layers + 3)
    params: dict = {"sabs": []}
    state: dict = {"sabs": []}
    params["input_embedding"], state["input_embedding"] = mlp_init(keys[0], cfg.embed_cfg(), dtype)
    for i in range(cfg.sab_layers):
        p, s = _sab_init(keys[i + 1], cfg, dtype)
        params["sabs"].append(p)
        state["sabs"].append(s)
    # PMA with one learned seed (gapt/model.py:158-174, 319-322)
    k_seed, k_mab = jax.random.split(keys[-2])
    params["pma"] = {"S": _xavier_uniform(k_seed, (1, 1, cfg.embed_dim), dtype)}
    params["pma"]["mab"], state_pma = mab_init(k_mab, cfg.mab_cfg(), dtype)
    state["pma"] = state_pma
    params["final_fc"], state["final_fc"] = mlp_init(keys[-1], cfg.final_fc_cfg(), dtype)
    return params, state


def gapt_d_apply(
    cfg: GAPTConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    labels: jax.Array | None = None,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    update_sn: bool = True,
) -> tuple[jax.Array, dict]:
    """Discriminator forward (gapt/model.py:332-344).
    ``x: [B, N, feat_size(+1 if masked)]`` -> sigmoid score ``[B, 1]``."""
    n_rngs = cfg.sab_layers + 3
    rngs = jax.random.split(rng, n_rngs) if rng is not None else [None] * n_rngs

    if cfg.use_mask:
        x, mask = split_mask(x)
    else:
        mask = None

    x, emb_state = mlp_apply(
        cfg.embed_cfg(), params["input_embedding"], state["input_embedding"], x,
        train=train, rng=rngs[0], update_sn=update_sn,
    )
    new_state: dict = {"sabs": [], "input_embedding": emb_state}

    pbias = (
        packed_attn_bias(sab_mask(mask, cfg.num_particles), cfg.num_heads,
                         cfg.num_particles, cfg.num_particles)
        if (mask is not None and not cfg.use_isab)
        else None
    )
    for i in range(cfg.sab_layers):
        x, s = _sab_apply(
            cfg, params["sabs"][i], state["sabs"][i], x, mask,
            train=train, rng=rngs[i + 1], update_sn=update_sn, packed_bias=pbias,
        )
        new_state["sabs"].append(s)

    seed = jnp.broadcast_to(params["pma"]["S"], (x.shape[0], 1, cfg.embed_dim))
    pooled, pma_state = mab_apply(
        cfg.mab_cfg(), params["pma"]["mab"], state["pma"], seed, x,
        sab_mask(mask, 1), train=train, rng=rngs[-2], update_sn=update_sn,
    )
    new_state["pma"] = pma_state

    out, fc_state = mlp_apply(
        cfg.final_fc_cfg(), params["final_fc"], state["final_fc"], pooled[:, 0, :],
        train=train, rng=rngs[-1], update_sn=update_sn,
    )
    new_state["final_fc"] = fc_state
    return jax.nn.sigmoid(out), new_state
