#!/usr/bin/env python
"""GAPT generator: component ablation at the optimal batch (B=1024).

The round-4 batch sweep (PERF.md "GAPT ceiling empirics") moved the bench
line to B=1024 (~1.35M jets/s, MFU 0.040). Before attempting the
fused-whole-G Pallas probe (VERDICT r3 item 7), this script prices the
components so the kernel attacks the actual wall:

  full        — the real generator (baseline)
  nosoftmax   — softmax replaced by a scale (keeps all matmuls; prices the
                masked-softmax VPU chain)
  noattn      — attention block outputs V directly (prices QK^T + AV + the
                head transposes, keeps projections/FF)
  noff        — FF residual skipped (prices the 64->64 FF matmul + add)
  nomask      — use_mask=False semantics (prices argsort mask + mask where)
  bf16        — activations+weights bf16 (prices HBM traffic: if rate jumps
                ~2x the chain is bandwidth-bound, if flat it is launch/VPU)

All variants are structural clones of ops/attention.mha_apply with the same
jet-head packing (G=4 at N=30), so the deltas are component prices, not
layout noise. Timing: bench.py differential protocol; one experiment per
invocation; never run concurrently with pytest.

Reference semantics being priced: gapt/model.py:251-274 (GAPT_G forward).
"""

from __future__ import annotations

import functools
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import ITERS, _differential_time
from mpgan_tpu.models.gapt import GAPTConfig, gapt_g_init
from mpgan_tpu.ops.masking import counts_from_labels, mask_from_counts

N, E, H, HD, LAYERS = 30, 64, 4, 16, 4
ALPHA = 0.2


def _mha(params, q, kv, key_ignore, *, softmax=True, attn=True):
    """Structural clone of ops/attention.mha_apply's packed path (G jets per
    block-diagonal attention) with ablation switches."""
    b = q.shape[0]
    wq, wk, wv = jnp.split(params["in_proj_w"], 3, axis=0)
    bq, bk, bv = jnp.split(params["in_proj_b"], 3, axis=0)

    def proj(x, w, bias):
        y = x @ w.T + bias
        return y.reshape(b, N, H, HD).transpose(0, 2, 1, 3)

    qh, kh, vh = proj(q, wq, bq), proj(kv, wk, bk), proj(kv, wv, bv)
    if not attn:
        out = vh
    else:
        g = 128 // N
        bg = b * H // g
        qp = qh.reshape(bg, g * N, HD)
        kp = kh.reshape(bg, g * N, HD)
        vp = vh.reshape(bg, g * N, HD)
        scores = jnp.einsum("bqd,bkd->bqk", qp, kp) / math.sqrt(HD)
        if softmax:
            if key_ignore is not None:
                am = jnp.broadcast_to(key_ignore[:, None, None, :], (b, H, N, N))
                am = am.reshape(bg, g, N, N)
                packed = jnp.where(
                    jnp.eye(g, dtype=bool)[None, :, None, :, None],
                    am[:, :, :, None, :],
                    True,
                ).reshape(bg, g * N, g * N)
            else:
                row_g = jnp.arange(g * N) // N
                packed = (row_g[:, None] != row_g[None, :])[None]
            scores = jnp.where(packed, -jnp.inf, scores)
            weights = jax.nn.softmax(scores, axis=-1)
        else:
            weights = scores * 0.01  # keeps both einsums, drops the VPU chain
        out = jnp.einsum("bqk,bkd->bqd", weights, vp).reshape(b, H, N, HD)
    out = out.transpose(0, 2, 1, 3).reshape(b, N, E)
    return out @ params["out_w"].T + params["out_b"]


def _forward(params, x, labels, *, softmax, attn, ff, mask):
    if mask:
        njp = counts_from_labels(labels, N)
        m = mask_from_counts(x[:, :, 0], njp)
        key_ignore = m[:, :, 0] < 0.5
    else:
        m, key_ignore = None, None
    for s in range(LAYERS):
        sab = params["sabs"][s]["mab"]
        x = x + _mha(sab["attention"], x, x, key_ignore, softmax=softmax, attn=attn)
        if ff:
            lyr = sab["ff"]["layers"][0]
            x = x + jax.nn.leaky_relu(x @ lyr["w"].T + lyr["b"], negative_slope=ALPHA)
    fc = params["final_fc"]["layers"][0]
    x = jnp.tanh(x @ fc["w"].T + fc["b"])
    if m is not None:
        x = jnp.concatenate([x, m - 0.5], axis=2)
    return x


def _time(params, labels, batch, dtype=jnp.float32, **kw):
    p = jax.tree.map(lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)

    @jax.jit
    def run(n_iters, p, key, labels):
        def body(i, acc):
            noise = jax.random.normal(jax.random.fold_in(key, i), (batch, N, E), dtype) * 0.2
            out = _forward(p, noise, labels, **kw)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    best = _differential_time(run, p, jax.random.PRNGKey(1), labels)
    return batch * ITERS / best


def main() -> None:
    batch = 1024
    cfg = GAPTConfig(
        num_particles=N, feat_size=3, is_generator=True,
        sab_layers=LAYERS, num_heads=H, embed_dim=E,
    )
    params, _ = gapt_g_init(jax.random.PRNGKey(0), cfg)
    labels = jnp.asarray(
        (np.random.default_rng(0).integers(1, N + 1, size=batch) / N)[:, None].astype(np.float32)
    )
    base = dict(softmax=True, attn=True, ff=True, mask=True)
    full = _time(params, labels, batch, **base)
    print(f"full (clone):   {full:>12,.0f} jets/s", flush=True)
    for name, kw in [
        ("nosoftmax", {**base, "softmax": False}),
        ("noattn", {**base, "attn": False}),
        ("noff", {**base, "ff": False}),
        ("nomask", {**base, "mask": False}),
    ]:
        r = _time(params, labels, batch, **kw)
        print(f"{name:<15} {r:>12,.0f} jets/s  (delta {1e9 * (1 / full - 1 / r):+.1f} ns/jet)",
              flush=True)
    r = _time(params, labels, batch, jnp.bfloat16, **base)
    print(f"{'bf16':<15} {r:>12,.0f} jets/s  (delta {1e9 * (1 / full - 1 / r):+.1f} ns/jet)",
          flush=True)


if __name__ == "__main__":
    main()
