"""Spectral normalization as a pure function.

The reference (mpgan/spectral_normalization.py:12-64) re-parameterizes a Linear
weight as ``w_bar / sigma`` where sigma is estimated by a 1-step power iteration
run *on every forward*, mutating the ``u``/``v`` buffers in place. On TPU under
``jit`` there is no in-place mutation: the power-iteration vector ``u`` is
explicit state threaded through the train step — ``(w, u) -> (w_sn, u')``.

Only ``u`` needs to be carried: the reference recomputes ``v`` from the current
``u`` at the start of every iteration (spectral_normalization.py:28), so ``v``
is derived state. We still return it so checkpoints can mirror the reference's
``weight_u``/``weight_v`` buffers for weight import.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _l2normalize(v: jax.Array) -> jax.Array:
    return v / (jnp.linalg.norm(v) + _EPS)


def spectral_normalize(
    w: jax.Array, u: jax.Array, power_iterations: int = 1
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Normalize ``w`` by its (power-iteration-estimated) spectral norm.

    Args:
        w: weight of shape ``[out_dim, in_dim]`` (torch ``nn.Linear`` layout).
        u: left singular vector estimate of shape ``[out_dim]``.
        power_iterations: number of power-iteration steps (reference default 1).

    Returns:
        ``(w / (sigma + eps), u_new, v_new)``.
    """
    height = w.shape[0]
    w2d = w.reshape(height, -1)
    # Power iteration runs on non-differentiated values in the reference
    # (it mutates .data buffers), so block gradients through the iteration.
    w_sg = jax.lax.stop_gradient(w2d)
    v = None
    for _ in range(power_iterations):
        v = _l2normalize(w_sg.T @ u)
        u = _l2normalize(w_sg @ v)
    # sigma is computed on the live weight (spectral_normalization.py:32) so
    # gradients flow through w here, like torch's ``u.dot(w.mv(v))``.
    sigma = u @ (w2d @ v)
    w_sn = w / (sigma + _EPS)
    return w_sn.reshape(w.shape), u, v
