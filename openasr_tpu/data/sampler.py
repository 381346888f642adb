"""Budget-based batch samplers producing TPU-friendly batch index lists.

Capability parity with the reference's TimeBasedSampler/FrameBasedSampler
(reference: src/dataload/samplers.py:9-67): greedily pack length-sorted
samples until a duration/frame budget is met, forcing the batch size to be
divisible by the data-parallel degree so sharded batches split evenly
(the reference used `ngpu` for DataParallel; here it is the mesh's data
axis size).  Shuffling permutes whole prebuilt batches with a seedable RNG.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


class BudgetBatchSampler:
    """Pack batches until cumulative `key` >= budget, batch size divisible
    by `divisible_by`."""

    def __init__(
        self,
        dataset: Sequence[dict],
        budget: float,
        key: str = "feat_length",
        divisible_by: int = 1,
        shuffle: bool = False,
        seed: int = 0,
    ):
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)
        batches: List[List[int]] = []
        batch: List[int] = []
        acc = 0.0
        for idx in range(len(dataset)):
            batch.append(idx)
            acc += float(dataset[idx][key])
            if acc >= budget and len(batch) % divisible_by == 0:
                batches.append(batch)
                batch = []
                acc = 0.0
        if batch:
            # trim the ragged tail so it stays divisible (reference keeps the
            # final `len//ngpu*ngpu` slice, samplers.py:25-31)
            keep = len(batch) // divisible_by * divisible_by
            if keep:
                batches.append(batch[len(batch) - keep :])
        self.batches = batches

    def __iter__(self) -> Iterator[List[int]]:
        order = np.arange(len(self.batches))
        if self.shuffle:
            self._rng.shuffle(order)
        for i in order:
            yield self.batches[i]

    def __len__(self) -> int:
        return len(self.batches)


class TimeBasedSampler(BudgetBatchSampler):
    """Budget in cumulative duration (online/wave datasets,
    reference: src/dataload/samplers.py:9)."""

    def __init__(self, dataset, duration=200, ngpu=1, shuffle=False, seed=0):
        super().__init__(
            dataset,
            budget=duration,
            key="feat_length",
            divisible_by=max(ngpu, 1),
            shuffle=shuffle,
            seed=seed,
        )


class FrameBasedSampler(BudgetBatchSampler):
    """Budget in cumulative frames (offline/ark datasets,
    reference: src/dataload/samplers.py:44)."""

    def __init__(self, dataset, frames=200, ngpu=1, shuffle=False, seed=0):
        super().__init__(
            dataset,
            budget=frames,
            key="feat_length",
            divisible_by=max(ngpu, 1),
            shuffle=shuffle,
            seed=seed,
        )


class CountBatchSampler:
    """Fixed-count batches (text/LM/token datasets).

    With shuffle, the SAMPLES are re-permuted and re-partitioned into new
    batches every epoch — the reference's torch DataLoader(shuffle=True)
    semantics.  Shuffling only the batch order would freeze batch
    composition at construction: with a topic-sorted text corpus every
    batch stays topically homogeneous forever."""

    def __init__(self, n: int, batch_size: int, shuffle=False, seed=0, drop_last=False):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)

    def _partition(self, idx):
        bs = self.batch_size
        nb = (
            self.n // bs if self.drop_last
            else (self.n + bs - 1) // bs
        )
        return [list(idx[i * bs:(i + 1) * bs]) for i in range(nb)]

    def __iter__(self):
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        for batch in self._partition(idx):
            yield batch

    def __len__(self):
        bs = self.batch_size
        return self.n // bs if self.drop_last else (self.n + bs - 1) // bs
