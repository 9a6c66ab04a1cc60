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

    def __iter__(self) -> Iterator[tuple[np.ndarray, ...]]:
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        for i in range(len(self)):
            sel = idx[i * self.batch_size : (i + 1) * self.batch_size]
            yield tuple(None if a is None else a[sel] for a in self.arrays)
