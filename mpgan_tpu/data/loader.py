"""Minimal batch loader: shuffled fixed-size numpy batches.

TPU training wants static shapes — the trailing partial batch is dropped in
training (shuffled every epoch, so all samples are seen across epochs) and
kept in evaluation iterators.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class BatchLoader:
    def __init__(
        self,
        *arrays: np.ndarray | None,
        batch_size: int,
        shuffle: bool = False,
        drop_remainder: bool = True,
        seed: int = 0,
    ):
        self.arrays = [a for a in arrays]
        sizes = {len(a) for a in self.arrays if a is not None}
        assert len(sizes) == 1, "all arrays must share the leading dimension"
        self.n = sizes.pop()
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        if self.drop_remainder:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch_indices(self) -> np.ndarray:
        """Draw the next epoch's sample order: a ``[n]`` int32 index array,
        permuted when ``shuffle`` is set. Each call advances the shuffle
        stream — it is THE public source of per-epoch order, shared by
        ``__iter__`` and the device-side epoch scan so both walk the
        identical stream (no reach-in to ``_rng``)."""
        idx = np.arange(self.n, dtype=np.int64)
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def epoch_batch_indices(self) -> np.ndarray:
        """``[num_batches, batch_size]`` index array for one epoch (advances
        the shuffle stream). Requires ``drop_remainder`` — a ragged final
        batch cannot be expressed as a rectangular index array."""
        assert self.drop_remainder, "epoch_batch_indices requires drop_remainder"
        num_batches = len(self)
        idx = self.epoch_indices()[: num_batches * self.batch_size]
        return idx.reshape(num_batches, self.batch_size).astype(np.int32)

    def __iter__(self) -> Iterator[tuple[np.ndarray, ...]]:
        idx = self.epoch_indices()
        for i in range(len(self)):
            sel = idx[i * self.batch_size : (i + 1) * self.batch_size]
            yield tuple(None if a is None else a[sel] for a in self.arrays)
