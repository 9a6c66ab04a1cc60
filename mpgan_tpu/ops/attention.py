"""Masked multi-head attention and set-transformer blocks (MAB/SAB/PMA/ISAB).

Functional re-implementation of the reference GAPT blocks
(gapt/model.py:93-202), which are themselves adapted from
juho-lee/set_transformer. Parameter layout mirrors torch
``nn.MultiheadAttention`` (packed ``in_proj`` of shape ``[3E, E]`` plus an
``out_proj``) so the reference's trained GAPT weights import 1:1.

Clouds are tiny (N <= 150), so attention here is a plain fused
softmax(QK^T/sqrt(d))V — XLA keeps the whole [B, H, N, N] score tensor in
registers/VMEM for these shapes; no flash-style tiling is needed for parity
workloads (a Pallas path would only pay off for N >> 1000).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from .linear import MLPConfig, hash_dropout, mlp_apply, mlp_init

_LN_EPS = 1e-5


def mha_init(rng: jax.Array, embed_dim: int, dtype=jnp.float32) -> dict:
    """torch ``nn.MultiheadAttention`` default init: xavier-uniform packed
    in-proj, zero in-proj bias; out-proj like a Linear with zero bias."""
    k1, k2 = jax.random.split(rng)
    bound = math.sqrt(6.0 / (3 * embed_dim + embed_dim))
    in_proj_w = jax.random.uniform(k1, (3 * embed_dim, embed_dim), dtype, -bound, bound)
    out_bound = 1.0 / math.sqrt(embed_dim)
    out_w = jax.random.uniform(k2, (embed_dim, embed_dim), dtype, -out_bound, out_bound)
    return {
        "in_proj_w": in_proj_w,
        "in_proj_b": jnp.zeros((3 * embed_dim,), dtype),
        "out_w": out_w,
        "out_b": jnp.zeros((embed_dim,), dtype),
    }


def packed_attn_bias(
    attn_mask: jax.Array, num_heads: int, lq: int, lk: int
) -> jax.Array | None:
    """Precompute the additive packed-attention bias for ``mha_apply``.

    An SAB stack applies the SAME key mask at every layer; building the
    packed block-diagonal mask inside each ``mha_apply`` call repeats that
    VPU work per layer (measured 172 ns/jet across the default GAPT
    generator, scripts/gapt_gen_ablation.py). This helper builds it once as
    an additive bias (``0`` attend / ``-inf`` ignore, exactly equivalent to
    the ``where(mask, -inf, scores)`` select); callers thread it through
    ``mab_apply(packed_bias=...)``. Returns None when the jet-head packing
    is disabled for these shapes (``_pack_group`` == 1) — the unpacked
    branch masks directly from ``attn_mask``.
    """
    b = attn_mask.shape[0]
    g = _pack_group(b * num_heads, lq, lk)
    if g <= 1:
        return None
    bg = b * num_heads // g
    am = jnp.broadcast_to(attn_mask[:, None, :, :], (b, num_heads, lq, lk))
    am = am.reshape(bg, g, lq, lk)
    packed_mask = jnp.where(
        jnp.eye(g, dtype=bool)[None, :, None, :, None],
        am[:, :, :, None, :],
        True,
    ).reshape(bg, g * lq, g * lk)
    return jnp.where(packed_mask, -jnp.inf, 0.0)


def mha_apply(
    params: dict,
    num_heads: int,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    attn_mask: jax.Array | None = None,
    packed_bias: jax.Array | None = None,
) -> jax.Array:
    """Multi-head attention, ``q: [B, Lq, E]``, ``k/v: [B, Lk, E]``.

    ``attn_mask``: optional bool ``[B, Lq, Lk]``, True = do NOT attend
    (torch's bool attn_mask convention, gapt/model.py:194-202).
    ``packed_bias``: optional precomputed ``packed_attn_bias`` for the same
    ``attn_mask`` (hoisted across a layer stack); ignored when the packed
    branch is not taken.
    """
    b, lq, e = q.shape
    lk = k.shape[1]
    head_dim = e // num_heads
    wq, wk, wv = jnp.split(params["in_proj_w"], 3, axis=0)
    bq, bk, bv = jnp.split(params["in_proj_b"], 3, axis=0)

    def proj(x, w, bias, length):
        y = x @ w.T + bias
        return y.reshape(b, length, num_heads, head_dim).transpose(0, 2, 1, 3)

    qh = proj(q, wq, bq, lq)
    kh = proj(k, wk, bk, lk)
    vh = proj(v, wv, bv, lk)

    g = _pack_group(b * num_heads, lq, lk)
    if g > 1:
        # jet-head packing: G (batch x head) problems ride ONE block-diagonal
        # attention of shape [G*lq, G*lk]. Cross-jet blocks are masked to
        # -inf, so one softmax + one AV matmul compute all G blocks exactly
        # (exp(-inf) = 0 contributes exact zeros). Turns B*H MXU-hostile
        # [30, 30] matmuls into B*H/G well-tiled [~128, ~128] ones — the
        # whole reason mfu_30p_gapt was 0.011 (see scripts/gapt_ablation.py).
        bg = b * num_heads // g
        qp = qh.reshape(bg, g * lq, head_dim)
        kp = kh.reshape(bg, g * lk, head_dim)
        vp = vh.reshape(bg, g * lk, head_dim)
        scores = jnp.einsum("bqd,bkd->bqk", qp, kp) / math.sqrt(head_dim)
        if packed_bias is not None:
            scores = scores + packed_bias.astype(scores.dtype)
        elif attn_mask is not None:
            am = jnp.broadcast_to(attn_mask[:, None, :, :], (b, num_heads, lq, lk))
            am = am.reshape(bg, g, lq, lk)
            # diagonal blocks carry the per-jet mask, off-diagonal blocks
            # are unconditionally blocked (the eye selects which)
            packed_mask = jnp.where(
                jnp.eye(g, dtype=bool)[None, :, None, :, None],
                am[:, :, :, None, :],
                True,
            ).reshape(bg, g * lq, g * lk)
            scores = jnp.where(packed_mask, -jnp.inf, scores)
        else:
            row_g = jnp.arange(g * lq) // lq
            col_g = jnp.arange(g * lk) // lk
            packed_mask = (row_g[:, None] != col_g[None, :])[None]  # [1, g*lq, g*lk]
            scores = jnp.where(packed_mask, -jnp.inf, scores)
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", weights, vp)
        out = out.reshape(b, num_heads, lq, head_dim)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(head_dim)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, :, :], -jnp.inf, scores)
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
    return out @ params["out_w"].T + params["out_b"]


def _pack_group(bh: int, lq: int, lk: int) -> int:
    """How many (batch x head) attention problems to pack into one
    block-diagonal matmul: aim for ~128 rows/cols (one MXU tile), require
    an exact divisor of ``bh``. 1 disables packing (N >= 128 clouds)."""
    target = min(128 // max(lq, lk), bh)
    for g in range(target, 1, -1):
        if bh % g == 0:
            return g
    return 1


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


@dataclasses.dataclass(frozen=True)
class MABConfig:
    """Multihead Attention Block (gapt/model.py:93-139)."""

    embed_dim: int
    num_heads: int
    ff: MLPConfig
    layer_norm: bool = False
    dropout_p: float = 0.0

    @staticmethod
    def build(
        embed_dim: int,
        num_heads: int,
        ff_layers: list[int] = (),
        layer_norm: bool = False,
        dropout_p: float = 0.0,
        final_linear: bool = True,
        linear_args: dict | None = None,
    ) -> "MABConfig":
        ff = MLPConfig.build(
            list(ff_layers), input_size=embed_dim, output_size=embed_dim,
            final_linear=final_linear, **(linear_args or {}),
        )
        return MABConfig(embed_dim, num_heads, ff, layer_norm, dropout_p)


def mab_init(rng: jax.Array, cfg: MABConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    params = {"attention": mha_init(k1, cfg.embed_dim, dtype)}
    params["ff"], ff_state = mlp_init(k2, cfg.ff, dtype)
    if cfg.layer_norm:
        params["norm1"] = {"scale": jnp.ones((cfg.embed_dim,), dtype), "bias": jnp.zeros((cfg.embed_dim,), dtype)}
        params["norm2"] = {"scale": jnp.ones((cfg.embed_dim,), dtype), "bias": jnp.zeros((cfg.embed_dim,), dtype)}
    return params, {"ff": ff_state}


def mab_apply(
    cfg: MABConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    y: jax.Array,
    y_mask: jax.Array | None = None,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    update_sn: bool = True,
    packed_bias: jax.Array | None = None,
):
    """``x = x + attn(x, y, y)``; optional LN; dropout; ``x = x + ff(x)``;
    optional LN; dropout (gapt/model.py:124-139)."""
    drop_keys = jax.random.split(rng, 3) if rng is not None else (None, None, None)

    x = x + mha_apply(
        params["attention"], cfg.num_heads, x, y, y, y_mask, packed_bias=packed_bias
    )
    if cfg.layer_norm:
        x = layer_norm(x, params["norm1"]["scale"], params["norm1"]["bias"])
    x = _dropout(x, cfg.dropout_p, train, drop_keys[0])

    ff_out, ff_state = mlp_apply(
        cfg.ff, params["ff"], state["ff"], x, train=train, rng=drop_keys[1], update_sn=update_sn
    )
    x = x + ff_out
    if cfg.layer_norm:
        x = layer_norm(x, params["norm2"]["scale"], params["norm2"]["bias"])
    x = _dropout(x, cfg.dropout_p, train, drop_keys[2])
    return x, {"ff": ff_state}


def _dropout(x, p, train, rng):
    if p > 0 and train:
        if rng is None:
            raise ValueError("dropout in train mode needs an rng")
        # hash_dropout, not bernoulli: threefry mask draws were 33% of the
        # GAPT train step (scripts/gapt_train_ablation.py; see linear.py)
        return hash_dropout(x, p, rng)
    return x


def sab_mask(mask: jax.Array | None, num_targets: int) -> jax.Array | None:
    """JetNet mask ``[B, N, 1]`` (1 = real) -> bool attention mask
    ``[B, num_targets, N]`` (True = ignore), gapt/model.py:148-153, 194-202."""
    if mask is None:
        return None
    ignore = mask[:, :, 0] < 0.5  # [B, N] senders to ignore
    return jnp.broadcast_to(ignore[:, None, :], (mask.shape[0], num_targets, mask.shape[1]))
