"""Checkpoint / resume (SURVEY.md C25).

The reference saves per-epoch ``G/D/G_optim/D_optim`` state dicts under
``outputs/<name>/models/`` and resumes from the newest epoch with both G and
D present (setup_training.py:1138-1152). Here a checkpoint is one msgpack-ish
npz per epoch holding the full ``TrainState`` pytree (params, mutable state,
optimizer states, rng) — a single consistent snapshot instead of four torch
pickles — plus the same epoch-indexed naming and latest-epoch discovery.

Loss/metric histories are persisted as one ``<key>.txt`` per metric
(np.savetxt, mirroring train.py:538-540) so reference-era tooling can read
them, and truncated to the resume epoch like setup_training.losses
(setup_training.py:1576-1579).
"""

from __future__ import annotations

import os
import pathlib
import re
from typing import Any

import jax
import numpy as np

from .train_step import TrainState


def _flatten(tree: Any) -> tuple[list[np.ndarray], Any]:
    leaves, treedef = jax.tree.flatten(tree)
    return [np.asarray(leaf) for leaf in leaves], treedef


def save_train_state(path: str | pathlib.Path, state: TrainState) -> None:
    """Atomic write (tmp + rename): a preemption mid-save must never leave a
    truncated ``state_N.npz`` for latest-epoch discovery / resume to trip
    over (the reference's four separate ``torch.save`` calls have the same
    hazard, setup_training.py:1138-1152; production TPU jobs are routinely
    preempted, so durability is a first-class contract here)."""
    path = pathlib.Path(path)
    leaves, _ = _flatten(state)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)})
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_train_state(path: str | pathlib.Path, template: TrainState) -> TrainState:
    """Restore a checkpoint into the structure of ``template`` (shapes and
    treedef must match — i.e. same model/optimizer config)."""
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    t_leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template {len(t_leaves)} "
            "(model/optimizer config mismatch)"
        )
    restored = [
        np.asarray(leaf, dtype=t.dtype) if hasattr(t, "dtype") else leaf
        for leaf, t in zip(leaves, t_leaves)
    ]
    return jax.tree.unflatten(treedef, restored)


def checkpoint_path(models_dir: str | pathlib.Path, epoch: int) -> pathlib.Path:
    return pathlib.Path(models_dir) / f"state_{epoch}.npz"


def latest_epoch(models_dir: str | pathlib.Path) -> int:
    """Newest epoch with a saved snapshot, 0 if none
    (setup_training.py:1138-1152)."""
    models_dir = pathlib.Path(models_dir)
    if not models_dir.exists():
        return 0
    epochs = [
        int(m.group(1))
        for f in models_dir.iterdir()
        if (m := re.fullmatch(r"state_(\d+)\.npz", f.name))
    ]
    return max(epochs, default=0)


def save_losses(losses: dict[str, list], losses_dir: str | pathlib.Path) -> None:
    losses_dir = pathlib.Path(losses_dir)
    losses_dir.mkdir(parents=True, exist_ok=True)
    for key, vals in losses.items():
        # same atomicity contract as save_train_state: resume re-reads these
        # with np.loadtxt, which chokes on a partially-written last line
        path = losses_dir / f"{key}.txt"
        tmp = path.with_name(path.name + ".tmp")
        np.savetxt(tmp, np.asarray(vals))
        os.replace(tmp, path)


def load_losses(
    losses_dir: str | pathlib.Path,
    keys: list[str],
    eval_keys: list[str],
    multi_value_keys: list[str],
    start_epoch: int,
    save_epochs: int,
) -> dict[str, list]:
    """Reload metric histories, truncated to the resume epoch
    (setup_training.py:1566-1584)."""
    losses_dir = pathlib.Path(losses_dir)
    losses: dict[str, list] = {}
    for key in keys:
        path = losses_dir / f"{key}.txt"
        if not path.exists():
            losses[key] = []
            continue
        arr = np.loadtxt(path)
        if (arr.ndim == 1 and key in multi_value_keys) or (
            arr.ndim == 0 and key not in multi_value_keys
        ):
            arr = np.expand_dims(arr, 0)
        vals = arr.tolist()
        if key in eval_keys:
            losses[key] = vals[: start_epoch // save_epochs + 1]
        else:
            losses[key] = vals[: start_epoch + 1]
    return losses
