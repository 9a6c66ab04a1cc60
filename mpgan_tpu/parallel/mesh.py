"""Device-mesh data parallelism.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(setup_training.py:1418-1421). The TPU-native replacement is SPMD: one jitted
train step with the batch sharded over a 1-D ``data`` mesh axis and
params/state replicated. XLA's partitioner inserts the gradient ``psum`` over
ICI automatically — there is no NCCL-style collective code to write.

Clouds are tiny (N <= 150), so data parallelism is the only axis that pays for
itself; model/tensor parallelism has no reference counterpart (SURVEY.md C27).
Everything works identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) for testing.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            # silently truncating would hand the user a smaller mesh than
            # --mesh-shape asked for (and flip divisibility gates elsewhere)
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} device(s) are available"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_map_step(
    step_fn: Callable,
    mesh: Mesh,
    *,
    num_batch_args: int = 1,
    axis: str = "data",
    donate_state: bool = True,
) -> Callable:
    """Wrap a ``(state, *batch) -> (state, metrics)`` step with ``shard_map``
    over the data axis: each device runs the full step on its batch shard
    (Pallas kernels included — they execute per-shard, which the XLA SPMD
    partitioner cannot do for a jit-sharded custom call), with gradients
    pmean-ed over ICI inside the step (build it with ``pmean_axis=axis``).
    """
    f = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(),) + (P(axis),) * num_batch_args,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f, donate_argnums=(0,) if donate_state else ())


def jit_step(
    step_fn: Callable,
    mesh: Mesh,
    *,
    num_batch_args: int = 1,
    donate_state: bool = True,
) -> Callable:
    """jit a ``(state, *batch_args) -> (state, aux)`` step for the mesh:
    state replicated (and donated), batch args sharded on axis 0."""
    rep = replicated_spec(mesh)
    shard = shard_batch_spec(mesh)
    in_shardings = (rep,) + tuple([shard] * num_batch_args)
    out_shardings = (rep, rep)
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0,) if donate_state else (),
    )
