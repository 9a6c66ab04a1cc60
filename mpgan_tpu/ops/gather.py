"""Particle-axis gathers as one-hot matmuls.

``jnp.take_along_axis`` over the particle axis lowers to XLA's dynamic
gather, which TPUs execute as a serialized scalar-indexed loop — measured
**10.6 ms** for a ``[512, 150x20]`` index gather over ``[512, 150, 3]``
source vs **0.92 ms** for the value-identical one-hot matmul
(scripts/knn150_glue_ablation.py, v5e). Every device-side neighbour gather
in this package (knn edge features, FPND ParticleNet EdgeConv, GraphCNN
NNConv) goes through :func:`one_hot_gather` instead.

Exactness: the one-hot rides the MXU at ``Precision.HIGHEST`` — on TPU the
f32 operands are split into non-overlapping bf16 triples whose partial
products recombine exactly, and each output row sums exactly one nonzero
(``1.0 * src``) with zeros, so the result is **bit-identical** to
``take_along_axis`` for finite f32/bf16 sources. (Default one-pass bf16
precision would truncate the gathered values — do not "optimize" this.)
The only semantic difference: a NaN/Inf *anywhere* in ``src`` poisons the
whole output row block (``0 * inf = nan``), where a gather would only
propagate it when selected; NaN-poisoned runs are caught upstream by the
``--debug-nans`` watchdog, so this path assumes finite sources.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot_gather(src: jax.Array, idx: jax.Array) -> jax.Array:
    """``take_along_axis(src, idx, axis=1)`` over the particle axis.

    Args:
        src: ``[B, N, F]`` source features.
        idx: ``[B, ...]`` int indices into ``src``'s axis 1 (any trailing
            index shape, e.g. ``[B, M]`` or ``[B, N, k]``).

    Returns:
        ``[B, *idx.shape[1:], F]`` gathered rows, bit-identical to
        ``jnp.take_along_axis`` for finite sources (see module docstring).
    """
    n = src.shape[1]
    onehot = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).astype(src.dtype)
    # flatten the index dims into one contraction-friendly axis
    flat = onehot.reshape(onehot.shape[0], -1, n)
    out = jax.lax.dot_general(
        flat,
        src,
        (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(*idx.shape, src.shape[-1])
