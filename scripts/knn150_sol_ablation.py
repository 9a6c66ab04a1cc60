#!/usr/bin/env python
"""knn-20 speed-of-light account: price every component of the 150p knn
generation batch (VERDICT r4 item 1).

The knn-20 bench line (47.5k jets/s, MFU 0.153) is the only one without a
component-accounted ceiling. At the bench config (B=512, N=150, k=20,
fe=[96,160,192], pos_diffs=False so no edge-distance column) the padded-MXU
mandatory work per jet is:

  - fe hidden chain:   2 layers x 3,040 rows x 2x(128*256 + 256*256)
                       = 1.195 GFLOP  -> 6.07 us/jet at 197 TF/s
  - one-hot gather:    2 x [3040,150]@[150,97] padded [3040x256x128]
                       = 0.398 GFLOP  -> 2.02 us/jet
  - fn MLP (XLA):      2 x 150 x 2x(256*256+256*256+256*128) padded
                       = 0.098 GFLOP  -> 0.50 us/jet
  - first-layer decomp: ~0.01 GFLOP   -> 0.05 us/jet

  all-MXU-at-100%-duty ceiling: 8.64 us/jet = 115.7k jets/s (B=512: 4.42 ms)

This script measures where the other ~55% of the measured 10.8 ms batch
goes, one differential-timed dispatch per component (bench.py protocol; run
on the TPU, never concurrently with anything else):

  e2e_gen            full knn-20 generation (context; should ~match bench)
  select_full        knn_select_nm production kernel (search + idx emission)
  select_search_only stripped kernel: distance matmul + 20 extraction passes,
                     no idx concat/emission -> extraction price by diff
  select_dist_mm     distance matmul + keying only -> passes priced by diff
  gather_full        knn_edge_aggregate_v3 premajor (production)
  gather_nohidden    same with the hidden chain deleted -> chain by diff
  onehot_iso         isolation kernel: iota-compare onehot build + gather
                     matmul + row-sum write -> skeleton's gather half
  fn_mlp             the XLA fn chain on [B,150,224]
  glue               noise + first-layer decomposition + tanh/mask epilogue
                     is derived: e2e - 2*(select+gather) - 2*fn

Mirrors the kernels at commit HEAD; if knn_pallas.py changes materially,
re-derive the stripped variants.
"""

from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import ITERS, _differential_time
from mpgan_tpu.ops import knn_pallas as kp
from mpgan_tpu.ops.mp_pallas import _interpret, _pad_senders

import os

_SMOKE = bool(os.environ.get("MPGAN_TPU_BENCH_SMOKE"))
if _SMOKE:  # CPU interpret-mode path check only; timings meaningless
    B, N, K, C = 4, 30, 5, 32
else:
    B, N, K, C = 512, 150, 20, 32  # C: generator selects on all 32 node features
H = [96, 160, 192]
NP8 = _pad_senders(N)  # 152


def _difftime_ms(run, *args):
    return _differential_time(run, *args) / ITERS * 1e3


def timed(name, fn, *args):
    @jax.jit
    def run(n_iters, *a):
        def body(i, acc):
            out = fn(a[0] + acc * 0, *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    ms = _difftime_ms(run, *args)
    print(f"{name:20s} {ms:8.3f} ms", flush=True)
    return ms


# --------------------------------------------------------------------------
# stripped select kernels (clones of knn_pallas._select_nm_kernel phases)
# --------------------------------------------------------------------------


def _search_only_kernel(k, n, np8, emit_idx, *refs):
    """Distance matmul + keying (+ optionally the k extraction passes,
    writing only the final min per row so nothing is DCE'd)."""
    x1_ref, x2_ref, out_ref = refs
    x1 = x1_ref[0].astype(jnp.float32)
    x2 = x2_ref[0].astype(jnp.float32)
    sq1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    sq2 = jnp.sum(x2 * x2, axis=-1, keepdims=True)
    a = jnp.concatenate([-2.0 * x1, jnp.ones_like(sq1)], axis=-1)
    bb = jnp.concatenate([x2, sq2], axis=-1)
    d = (
        jax.lax.dot_general(
            a, bb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + sq1
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (np8, n), 1)
    bits = max(8, (n - 1).bit_length())
    keyed = (
        jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0), jnp.int32)
        & jnp.int32(~((1 << bits) - 1))
    ) | cols
    if not emit_idx:  # distance matmul + keying only
        out_ref[0] = jnp.min(keyed, axis=-1, keepdims=True).astype(out_ref.dtype)
        return
    imax = jnp.int32(0x7FFFFFFF)
    acc = jnp.zeros((np8, 1), jnp.int32)
    for s in range(k):
        m = jnp.min(keyed, axis=-1, keepdims=True)
        acc = acc + (m & jnp.int32((1 << bits) - 1))
        keyed = jnp.where(keyed == m, imax, keyed)
    out_ref[0] = acc.astype(out_ref.dtype)


def search_only(x1, x2, emit_idx):
    b_sz, n, c = x1.shape
    np8 = _pad_senders(n)
    x1p = jnp.pad(x1, ((0, 0), (0, np8 - n), (0, 0))) if np8 > n else x1
    kernel = functools.partial(_search_only_kernel, K, n, np8, emit_idx)
    return pl.pallas_call(
        kernel,
        grid=(b_sz,),
        in_specs=[
            pl.BlockSpec((1, np8, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np8, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sz, np8, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x1p, x2)


# --------------------------------------------------------------------------
# onehot-build + gather-matmul isolation (the v3 skeleton's MXU half)
# --------------------------------------------------------------------------


def _onehot_iso_kernel(n, np8, k, *refs):
    idx_ref, u2m_ref, out_ref = refs
    rows = k * np8
    u2m = u2m_ref[0].astype(jnp.float32)
    idx = idx_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    onehot = (cols == idx).astype(jnp.float32)
    g2 = jax.lax.dot_general(
        onehot, u2m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0] = jnp.sum(g2.reshape(k, np8, -1), axis=0).astype(out_ref.dtype)


def onehot_iso(idx_t, u2m):
    b_sz = idx_t.shape[0]
    h1p = u2m.shape[-1]
    kernel = functools.partial(_onehot_iso_kernel, N, NP8, K)
    return pl.pallas_call(
        kernel,
        grid=(b_sz,),
        in_specs=[
            pl.BlockSpec((1, K * NP8, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, h1p), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NP8, h1p), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sz, NP8, h1p), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(idx_t, u2m)


def main():
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32) * 0.3)
    mask = jnp.asarray(
        (np.arange(N)[None, :] < rng.integers(1, N + 1, size=B)[:, None]).astype(
            np.float32
        )[..., None]
    )
    xf = ((1 - 1e4) * mask + 1e4) * xs

    # v3 operands at the bench widths
    h1 = H[0]
    u1 = jnp.asarray(rng.normal(size=(B, N, h1)).astype(np.float32) * 0.3)
    u2m = jnp.concatenate(
        [jnp.asarray(rng.normal(size=(B, N, h1)).astype(np.float32) * 0.3), mask],
        axis=-1,
    )
    sizes = H
    ws = [
        jnp.asarray(rng.normal(size=(sizes[i], sizes[i + 1])).astype(np.float32) * 0.1)
        for i in range(len(H) - 1)
    ]
    bs = [jnp.asarray(rng.normal(size=(s,)).astype(np.float32) * 0.1) for s in sizes[1:]]
    hidden_flat = tuple(p for w, b in zip(ws, bs) for p in (w, b))
    idx_t, _ = kp.knn_select_nm(xs, xf, K, True, False)

    # --- end-to-end context
    if not _SMOKE:
        from bench import bench_generator

        rate, mfu, _ = bench_generator(150, 512, num_knn=20)
        print(
            f"{'e2e_gen':20s} {B * 1e3 / rate:8.3f} ms   "
            f"({rate:,.0f} jets/s, MFU {mfu:.3f})",
            flush=True,
        )

    # --- select components
    timed("select_full", lambda a, b: kp.knn_select_nm(a, b, K, True, False)[0], xs, xf)
    timed("select_search_only", lambda a, b: search_only(a, b, True), xs, xf)
    timed("select_dist_mm", lambda a, b: search_only(a, b, False), xs, xf)

    # --- gather components
    timed(
        "gather_full",
        lambda a, b, i: kp.knn_edge_aggregate_v3(
            a, b, i, None, None, hidden_flat, None, 0.2, True, 0.0, True, True
        ),
        u1, u2m, idx_t,
    )
    timed(
        "gather_nohidden",
        lambda a, b, i: kp.knn_edge_aggregate_v3(
            a, b, i, None, None, (), None, 0.2, True, 0.0, True, True
        ),
        u1, u2m, idx_t,
    )
    timed("onehot_iso", lambda i, u: onehot_iso(i, u), idx_t, u2m)

    # --- fn MLP (XLA node-level chain at the flagship fn widths)
    fn_sizes = [224, 256, 256, 32]
    fws = [
        jnp.asarray(
            rng.normal(size=(fn_sizes[i], fn_sizes[i + 1])).astype(np.float32) * 0.1
        )
        for i in range(3)
    ]
    hcat = jnp.asarray(rng.normal(size=(B, N, 224)).astype(np.float32) * 0.3)

    def fn_chain(h, *fws):
        for i, w in enumerate(fws):
            h = h @ w
            if i < 2:
                h = jnp.maximum(h, 0.2 * h)
        return h

    timed("fn_mlp", fn_chain, hcat, *fws)


if __name__ == "__main__":
    main()
