"""Prefetching data loader: sampler + collate -> background-threaded batches.

Replaces the reference's torch DataLoader with `fetchworker_num` forked
workers (reference: src/train.py:82-85).  Audio decode and ark reads are
IO-bound NumPy work, so a thread pool with a bounded prefetch queue covers
the same ground without process forking; batches come out as NumPy dicts
ready for `jax.device_put` onto the mesh.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, List, Sequence


class DataLoader:
    """`rank`/`world` make the loader multi-host aware: every host builds
    the IDENTICAL batch plan (same manifest, same sampler seed) but
    materializes only its contiguous row-slice of each planned batch —
    host r of w loads rows [r*B/w, (r+1)*B/w).  The sampler's
    `divisible_by` is the GLOBAL data-axis size, so B is always divisible
    by `world`.  Per-host padded shapes may differ by a quantization
    bucket; `parallel.shard_batch` reconciles them before assembling the
    global array (see mesh.py)."""

    def __init__(
        self,
        dataset: Sequence,
        batch_sampler: Iterable[List[int]],
        collate_fn: Callable,
        num_workers: int = 2,
        prefetch: int = 4,
        rank: int = 0,
        world: int = 1,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate_fn = collate_fn
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)
        self.rank = rank
        self.world = max(1, world)

    def _make(self, indices: List[int]):
        if self.world > 1:
            assert len(indices) % self.world == 0, (
                f"batch of {len(indices)} not divisible by world={self.world}"
                " (pass the global data-axis size as the sampler's ngpu)"
            )
            k = len(indices) // self.world
            indices = indices[self.rank * k : (self.rank + 1) * k]
        return self.collate_fn([self.dataset[i] for i in indices])

    def __iter__(self) -> Iterator:
        if self.num_workers == 0:
            for indices in self.batch_sampler:
                yield self._make(indices)
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            it = iter(self.batch_sampler)
            try:
                for _ in range(self.prefetch):
                    pending.append(pool.submit(self._make, next(it)))
            except StopIteration:
                pass
            while pending:
                fut = pending.pop(0)
                try:
                    pending.append(pool.submit(self._make, next(it)))
                except StopIteration:
                    pass
                yield fut.result()

    def __len__(self) -> int:
        return len(self.batch_sampler)  # type: ignore[arg-type]
