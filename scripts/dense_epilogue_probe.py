#!/usr/bin/env python
"""Micro-probe: which part of the dense kernel's VPU skeleton is slow?

dense30_ablation.py showed the 30p jets-mode kernel spends 2.19 ms (of
4.92) in the non-matmul skeleton and +4.2 ms when in-kernel dropout is on.
This script times stripped Pallas micro-kernels in the EXACT jets-mode
layout ([JB, N, NS, H] tiles, same grid/BlockSpecs as _fwd_kernel_jets) to
attribute that cost:

  skel_full        — build (u1+u2 bcast, leaky) + mask-mul + sum-reduce
                     (= kernel_l1_nohid from the ablation, sanity anchor)
  skel_nou1        — u2 (outer-dim bcast) only: prices u1's middle-dim
                     (sublane) broadcast by difference
  skel_nou2        — u1 (middle-dim bcast) only
  skel_noreduce    — build only, slice instead of reduce: prices the
                     masked sum over the sublane-strided sender axis
  skel_nomask      — build + unmasked reduce: prices the mask multiply
  hash_cur         — current murmur3-finalizer dropout hash on the
                     [JB*N*NS, 448] element count of one fwd pass
  hash_cheap       — outer-sum row/col keys + 3-op finisher (candidate)
  hash_bits        — one hash per 8 lanes, 8-bit threshold slices via
                     per-lane variable shift (candidate, p quantized 1/256)

Differential single-dispatch timing (bench.py protocol); run on the TPU,
never concurrently with pytest.
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

B, N, NS, H1, HO = 4096, 30, 32, 96, 192
JB = 16


def _difftime(run, *args):
    return _differential_time(run, *args) / ITERS


def timed(name, fn, *args):
    @jax.jit
    def run(n_iters, *a):
        def body(i, acc):
            out = fn(a[0] + acc * 0, *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    ms = _difftime(run, *args) * 1e3
    print(f"{name:16s} {ms:7.3f} ms", flush=True)
    return ms


def _leaky(x, alpha=0.2):
    return jnp.maximum(x, alpha * x)


# --- skeleton variants (jets-mode layout, no hidden chain) -----------------


def _skel_kernel(mode, u1_ref, u2_ref, mask_ref, out_ref):
    u1 = u1_ref[:].astype(jnp.float32)  # [JB, N, H1]
    u2 = u2_ref[:].astype(jnp.float32)  # [JB, NS, H1]
    if mode == "nou1":
        a = _leaky(jnp.broadcast_to(u2[:, None, :, :], (JB, N, NS, H1)))
    elif mode == "nou2":
        a = _leaky(jnp.broadcast_to(u1[:, :, None, :], (JB, N, NS, H1)))
    else:
        a = _leaky(u1[:, :, None, :] + u2[:, None, :, :])
    a = a.reshape(JB * N * NS, H1)
    a = a.reshape(JB, N, NS, H1)
    if mode == "noreduce":
        out_ref[:] = a[:, :, 0, :]
        return
    if mode != "nomask":
        a = a * mask_ref[:][:, None, :, :].astype(jnp.float32)
    out_ref[:] = jnp.sum(a, axis=2)


def skel(mode, u1, u2, mask):
    kernel = functools.partial(_skel_kernel, mode)
    grid = (B // JB,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((JB, N, H1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((JB, NS, H1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((JB, NS, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((JB, N, H1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, H1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(u1, u2, mask)


# --- dropout hash variants --------------------------------------------------
# one forward pass hashes [JB*N*NS, 96+160+192] elements; model that as one
# [ROWS, 448] array per program

ROWS = JB * N * NS // 2  # half-rows block x doubled grid = one pass's count
W = 448


def _hash_cur_kernel(x_ref, seed_ref, out_ref):
    shape = (ROWS, W)
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(
        pl.program_id(0) * ROWS
    )
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    seed = seed_ref[0]
    h = (
        rows * np.uint32(0x9E3779B1)
        + cols * np.uint32(0x85EBCA77)
        + seed.astype(jnp.uint32) * np.uint32(0xC2B2AE3D)
        + np.uint32(0x27D4EB2F)
    )
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    mult = jnp.where(h >= np.uint32(2**31), 2.0, 0.0)
    out_ref[:] = x_ref[:] * mult


def _hash_cheap_kernel(x_ref, seed_ref, out_ref):
    shape = (ROWS, W)
    seed = seed_ref[0].astype(jnp.uint32)
    # row/col key terms are rank-1; only the combine + finisher is per-element
    rkey = (
        jax.lax.broadcasted_iota(jnp.uint32, (ROWS, 1), 0)
        + jnp.uint32(pl.program_id(0) * ROWS)
    ) * np.uint32(0x9E3779B1) + seed * np.uint32(0xC2B2AE3D)
    ckey = jax.lax.broadcasted_iota(jnp.uint32, (1, W), 1) * np.uint32(0x85EBCA77)
    h = rkey + ckey
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 15)
    mult = jnp.where(h >= np.uint32(2**31), 2.0, 0.0)
    out_ref[:] = x_ref[:] * mult


def _hash_bits_kernel(x_ref, seed_ref, out_ref):
    shape = (ROWS, W)
    seed = seed_ref[0].astype(jnp.uint32)
    rkey = (
        jax.lax.broadcasted_iota(jnp.uint32, (ROWS, 1), 0)
        + jnp.uint32(pl.program_id(0) * ROWS)
    ) * np.uint32(0x9E3779B1) + seed * np.uint32(0xC2B2AE3D)
    # one 32-bit hash covers 4 lanes (8-bit threshold slices)
    cg = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) >> np.uint32(2)
    h = rkey + cg * np.uint32(0x85EBCA77)
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 15)
    sh = (jax.lax.broadcasted_iota(jnp.uint32, shape, 1) & np.uint32(3)) << np.uint32(3)
    byte = (h >> sh) & np.uint32(0xFF)
    mult = jnp.where(byte >= np.uint32(128), 2.0, 0.0)
    out_ref[:] = x_ref[:] * mult


def hash_bench(kernel, x, seed):
    # every program maps the SAME [ROWS, W] block (full per-pass hash count
    # without a 7 GB HBM array); program-id offsets keep the hashes distinct
    return pl.pallas_call(
        kernel,
        grid=(2 * B // JB,),
        in_specs=[
            pl.BlockSpec((ROWS, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, seed)


def main():
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.normal(size=(B, N, H1)).astype(np.float32) * 0.3)
    u2 = jnp.asarray(rng.normal(size=(B, NS, H1)).astype(np.float32) * 0.3)
    mask = jnp.asarray(
        (np.arange(NS)[None, :] < rng.integers(1, N + 1, size=B)[:, None]).astype(
            np.float32
        )[..., None]
    )

    for mode in ["full", "nou1", "nou2", "noreduce", "nomask"]:
        timed(f"skel_{mode}", functools.partial(skel, mode), u1, u2, mask)

    xh = jnp.asarray(rng.normal(size=(ROWS, W)).astype(np.float32))
    seed = jnp.asarray([7], jnp.int32)
    timed("hash_cur", functools.partial(hash_bench, _hash_cur_kernel), xh, seed)
    timed("hash_cheap", functools.partial(hash_bench, _hash_cheap_kernel), xh, seed)
    timed("hash_bits", functools.partial(hash_bench, _hash_bits_kernel), xh, seed)


if __name__ == "__main__":
    main()
