"""Fused Pallas kernel for knn message passing: rowwise edge-MLP + masked
k-neighbour aggregation.

The knn variant (``--fully-connected=False --num-knn k``, mpgan/model.py:
319-381) is the reference's own prescription for large clouds
(setup_training.py:826-834): the edge tensor shrinks from N^2 to N*k pairs
(7.5x at N=150, k=20). The neighbour search + gather stays in XLA (argsort
over the dense distance matrix + take_along_axis — cheap and well-supported);
this kernel fuses everything downstream, which is where the HBM traffic
lives: the full edge-MLP chain over ``[B, N*k, fe_in]`` with all
intermediates in VMEM, then the masked sum/mean over each receiver's k
neighbours.

Unlike the dense kernel (mp_pallas.py) there is no receiver/sender
decomposition — pair rows arrive pre-gathered (they include the distance
edge feature and any conditioning columns) — so the first MLP layer is part
of the in-kernel chain. Dropout uses the same stateless global-row hash as
the dense kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mp_pallas import _dleaky, _dropmul, _interpret, _leaky


def _row_offset(tr: int, k: int):
    """Global pair-row offset of this program's block (jet-major,
    receiver-major, neighbour-minor) — blocking-independent, so forward and
    backward replay identical dropout masks."""
    n_rows_per_jet = pl.num_programs(1) * (tr * k)
    return pl.program_id(0) * n_rows_per_jet + pl.program_id(1) * (tr * k)


def _mlp_chain(a, wb, num_layers, alpha, dropout_p, seed, offset):
    for layer in range(num_layers):
        w = wb[2 * layer][:]
        b = wb[2 * layer + 1][:]
        a = _leaky(
            jax.lax.dot_general(
                a.astype(w.dtype), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b.astype(jnp.float32),
            alpha,
        )
        if dropout_p > 0:
            a = a * _dropmul(a.shape, dropout_p, seed, layer, offset)
    return a


def _fwd_kernel(num_layers, alpha, sum_agg, tr, k, dropout_p, *refs):
    base = 0
    if dropout_p > 0:
        seed_ref = refs[0]
        base = 1
    a_ref, mask_ref = refs[base], refs[base + 1]
    wb = refs[base + 2 : base + 2 + 2 * num_layers]
    out_ref = refs[base + 2 + 2 * num_layers]
    seed = seed_ref[0] if dropout_p > 0 else None
    offset = _row_offset(tr, k) if dropout_p > 0 else None

    a = a_ref[0].astype(jnp.float32)  # [TR*k, fe_in]
    a = _mlp_chain(a, wb, num_layers, alpha, dropout_p, seed, offset)
    h_out = a.shape[-1]
    a = a.reshape(tr, k, h_out) * mask_ref[0].astype(jnp.float32)
    agg = jnp.sum(a, axis=1)
    if not sum_agg:
        agg = agg / k
    out_ref[0] = agg.astype(out_ref.dtype)


def _bwd_kernel(num_layers, alpha, sum_agg, tr, k, dropout_p, *refs):
    base = 0
    if dropout_p > 0:
        seed_ref = refs[0]
        base = 1
    refs = refs[base:]
    a_ref, mask_ref = refs[0], refs[1]
    wb = refs[2 : 2 + 2 * num_layers]
    g_ref = refs[2 + 2 * num_layers]
    out_off = 3 + 2 * num_layers
    da0_ref, dmask_ref = refs[out_off], refs[out_off + 1]
    dwb = refs[out_off + 2 :]
    seed = seed_ref[0] if dropout_p > 0 else None
    offset = _row_offset(tr, k) if dropout_p > 0 else None

    is_first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(is_first)
    def _():
        for r in dwb:
            r[:] = jnp.zeros(r.shape, r.dtype)

    a0 = a_ref[0].astype(jnp.float32)
    mask = mask_ref[0].astype(jnp.float32)  # [TR, k, 1]

    # recompute forward stashing pre/post activations
    acts = [a0]
    pre = []
    a = a0
    for layer in range(num_layers):
        w = wb[2 * layer][:]
        b = wb[2 * layer + 1][:]
        z = (
            jax.lax.dot_general(
                a.astype(w.dtype), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b.astype(jnp.float32)
        )
        pre.append(z)
        a = _leaky(z, alpha)
        if dropout_p > 0:
            a = a * _dropmul(a.shape, dropout_p, seed, layer, offset)
        acts.append(a)

    g = g_ref[0].astype(jnp.float32)  # [TR, H_out]
    if not sum_agg:
        g = g / k
    h_out = acts[-1].shape[-1]
    a_last = acts[-1].reshape(tr, k, h_out)
    dmask_ref[0] = jnp.sum(a_last * g[:, None, :], axis=2)[..., None].astype(
        dmask_ref.dtype
    )
    da = (g[:, None, :] * mask).reshape(tr * k, h_out)

    for layer in range(num_layers - 1, -1, -1):
        if dropout_p > 0:
            da = da * _dropmul(da.shape, dropout_p, seed, layer, offset)
        dz = da * _dleaky(pre[layer], alpha)
        w = wb[2 * layer][:].astype(jnp.float32)
        dwb[2 * layer][:] += jax.lax.dot_general(
            acts[layer], dz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dwb[2 * layer].dtype)
        dwb[2 * layer + 1][:] += jnp.sum(dz, axis=0).astype(dwb[2 * layer + 1].dtype)
        da = jax.lax.dot_general(
            dz, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    da0_ref[0] = da.astype(da0_ref.dtype)


def _block_receivers(n: int, k: int) -> int:
    tr = max(1, 2048 // k)
    while n % tr and tr > 1:  # keep blocks even (padding would need masking)
        tr //= 2
    return min(tr, n)


def _specs(b_sz, n, k, tr, fe_in, h_out, weights, dropout_p, seed):
    grid = (b_sz, n // tr)
    in_specs = []
    args = []
    if dropout_p > 0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(seed, jnp.float32).astype(jnp.int32).reshape(1))
    in_specs += [
        pl.BlockSpec((1, tr * k, fe_in), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tr, k, 1), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
    ]
    for w, bias in weights:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.extend([w, bias])
    return grid, in_specs, args


def _knn_fwd_impl(a0, amask, weights, seed, *, alpha, sum_agg, k, dropout_p):
    b_sz, rows, fe_in = a0.shape
    n = rows // k
    tr = _block_receivers(n, k)
    h_out = weights[-1][0].shape[1]
    grid, in_specs, wargs = _specs(b_sz, n, k, tr, fe_in, h_out, weights, dropout_p, seed)
    kernel = functools.partial(_fwd_kernel, len(weights), alpha, sum_agg, tr, k, dropout_p)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tr, h_out), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sz, n, h_out), a0.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*([wargs[0]] if dropout_p > 0 else []), a0, amask.reshape(b_sz, n, k, 1), *(wargs[1:] if dropout_p > 0 else wargs))


def _knn_bwd_impl(a0, amask, weights, g, seed, *, alpha, sum_agg, k, dropout_p):
    b_sz, rows, fe_in = a0.shape
    n = rows // k
    tr = _block_receivers(n, k)
    h_out = weights[-1][0].shape[1]
    grid, in_specs, wargs = _specs(b_sz, n, k, tr, fe_in, h_out, weights, dropout_p, seed)
    in_specs.append(pl.BlockSpec((1, tr, h_out), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM))

    out_shapes = [
        jax.ShapeDtypeStruct((b_sz, rows, fe_in), a0.dtype),  # da0
        jax.ShapeDtypeStruct((b_sz, n, k, 1), a0.dtype),  # dmask
    ]
    out_specs = [
        pl.BlockSpec((1, tr * k, fe_in), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tr, k, 1), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
    ]
    for w, bias in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_shapes.append(jax.ShapeDtypeStruct(bias.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(_bwd_kernel, len(weights), alpha, sum_agg, tr, k, dropout_p)
    pre_args = [wargs[0]] if dropout_p > 0 else []
    w_args = wargs[1:] if dropout_p > 0 else wargs
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*pre_args, a0, amask.reshape(b_sz, n, k, 1), *w_args, g)
    da0, dmask = outs[0], outs[1]
    dweights = [(outs[2 + 2 * i], outs[3 + 2 * i]) for i in range(len(weights))]
    return da0, dmask.reshape(amask.shape), dweights


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def knn_edge_aggregate(a0, amask, weights_flat, seed, alpha, sum_agg, k, dropout_p=0.0):
    """``agg[b, i] = sum_{j in knn(i)} amask[b, i, j] * fe_mlp(a0[b, i*k+j])``
    with ``a0 [B, N*k, fe_in]`` the pre-gathered pair rows and
    ``weights_flat = (w1, b1, w2, b2, ...)`` the full fe stack."""
    weights = [
        (weights_flat[2 * i], weights_flat[2 * i + 1]) for i in range(len(weights_flat) // 2)
    ]
    return _knn_fwd_impl(
        a0, amask, weights, seed, alpha=alpha, sum_agg=sum_agg, k=k, dropout_p=dropout_p
    )


def _fwd(a0, amask, weights_flat, seed, alpha, sum_agg, k, dropout_p):
    out = knn_edge_aggregate(a0, amask, weights_flat, seed, alpha, sum_agg, k, dropout_p)
    return out, (a0, amask, weights_flat, seed)


def _bwd(alpha, sum_agg, k, dropout_p, res, g):
    a0, amask, weights_flat, seed = res
    weights = [
        (weights_flat[2 * i], weights_flat[2 * i + 1]) for i in range(len(weights_flat) // 2)
    ]
    da0, dmask, dweights = _knn_bwd_impl(
        a0, amask, weights, g, seed, alpha=alpha, sum_agg=sum_agg, k=k, dropout_p=dropout_p
    )
    dw_flat = tuple(
        d.astype(p.dtype) for pair, wpair in zip(dweights, weights) for d, p in zip(pair, wpair)
    )
    dseed = None if seed is None else jnp.zeros_like(seed)
    return da0, dmask, dw_flat, dseed


knn_edge_aggregate.defvjp(_fwd, _bwd)
