"""Seeded fuzz for the packed multi-head attention path (ops/attention.py).

The jet-head packing (G jets per block-diagonal attention) and the hoisted
``packed_attn_bias`` are pure performance transformations — this sweep pins
their equivalence to a straightforward per-head reference formulation
across the (B, N, E, H, mask) lattice, the same style as the MP-kernel
config fuzz (tests/test_kernel_fuzz.py). torch's convention (attn_mask
True = do NOT attend, gapt/model.py:194-202) is the contract.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpgan_tpu.ops.attention import _pack_group, mha_apply, mha_init, packed_attn_bias


def _reference_mha(params, num_heads, q, k, v, attn_mask):
    """Per-head loop, no packing — the semantic oracle."""
    b, lq, e = q.shape
    lk = k.shape[1]
    hd = e // num_heads
    wq, wk, wv = np.split(np.asarray(params["in_proj_w"]), 3, axis=0)
    bq, bk, bv = np.split(np.asarray(params["in_proj_b"]), 3, axis=0)
    qp = np.asarray(q, np.float64) @ wq.T.astype(np.float64) + bq
    kp = np.asarray(k, np.float64) @ wk.T.astype(np.float64) + bk
    vp = np.asarray(v, np.float64) @ wv.T.astype(np.float64) + bv
    out = np.zeros((b, lq, e))
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        sc = qp[..., sl] @ kp[..., sl].transpose(0, 2, 1) / math.sqrt(hd)
        if attn_mask is not None:
            sc = np.where(np.asarray(attn_mask), -np.inf, sc)
        sc = sc - sc.max(axis=-1, keepdims=True)
        w = np.exp(sc)
        w = w / w.sum(axis=-1, keepdims=True)
        out[..., sl] = w @ vp[..., sl]
    return out @ np.asarray(params["out_w"]).T.astype(np.float64) + np.asarray(
        params["out_b"]
    )


@pytest.mark.parametrize("seed", range(24))
def test_mha_packed_matches_per_head_reference(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.choice([5, 8, 13, 30, 40, 64, 100, 150]))
    heads = int(rng.choice([1, 2, 4, 8]))
    e = heads * int(rng.choice([4, 8, 16]))
    # batch sizes that both do and do not divide the packing group
    b = int(rng.choice([1, 2, 3, 4, 6, 8, 12, 16]))
    masked = bool(rng.integers(0, 2))

    params = mha_init(jax.random.PRNGKey(seed), e)
    x = jnp.asarray(rng.normal(size=(b, n, e)).astype(np.float32))
    if masked:
        # every query row must keep >= 1 real sender (the GAPT contract:
        # counts_from_labels >= 1), otherwise softmax is NaN in both paths
        counts = rng.integers(1, n + 1, size=b)
        ignore = np.arange(n)[None, :] >= counts[:, None]  # True = don't attend
        attn_mask = jnp.asarray(np.broadcast_to(ignore[:, None, :], (b, n, n)))
    else:
        attn_mask = None

    got = np.asarray(mha_apply(params, heads, x, x, x, attn_mask))
    want = _reference_mha(params, heads, x, x, x, attn_mask)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # the hoisted additive bias must be interchangeable with attn_mask
    if attn_mask is not None and _pack_group(b * heads, n, n) > 1:
        pbias = packed_attn_bias(attn_mask, heads, n, n)
        assert pbias is not None
        got_bias = np.asarray(
            mha_apply(params, heads, x, x, x, attn_mask, packed_bias=pbias)
        )
        np.testing.assert_array_equal(got, got_bias)


def test_packed_bias_none_when_unpacked():
    # N >= 128 disables packing; the helper must agree with _pack_group
    attn_mask = jnp.zeros((2, 150, 150), bool)
    assert _pack_group(2 * 4, 150, 150) == 1
    assert packed_attn_bias(attn_mask, 4, 150, 150) is None
