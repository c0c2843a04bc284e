"""Minimal host-side DataLoader: shuffling, batching, drop_last, and a
background prefetch thread — replaces torch.utils.data.DataLoader (reference
main_pororo.py:106-121) without a torch dependency.

Items are dicts of numpy arrays (plus optional non-array fields like 'text',
which are collated into lists)."""

from __future__ import annotations

from typing import Any, Iterator, Mapping, Sequence

import numpy as np

from cpcsv_tpu.data.prefetch import device_prefetch


def default_collate(items: Sequence[Mapping[str, Any]]) -> dict:
    batch: dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals  # e.g. raw text strings
    return batch


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        collate_fn=default_collate,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """`batch_size` is the GLOBAL batch. With process_count > 1 (one
        process per TPU host), each process decodes only its contiguous
        1/process_count slice of every global batch — the per-host input
        pipeline of SURVEY §2.8. The shuffle seed must be identical on all
        hosts so the global permutation agrees (it is derived from `seed`
        alone, never from process_index)."""
        if process_count > 1 and batch_size % process_count != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by process_count "
                f"{process_count}"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        self.process_index = process_index
        self.process_count = process_count
        self._seed = seed
        self._rng = np.random.default_rng(seed)

    def set_epoch(self, epoch: int) -> None:
        """Derive the shuffle stream (and the dataset's per-item sampling
        draws) from (seed, epoch) — same role as torch DistributedSampler's
        set_epoch. The trainer calls this each epoch so a resumed run's
        epoch E sees exactly the data order an uninterrupted run would; the
        seed stays identical across hosts (the global permutation must
        agree), only the slice taken from it differs."""
        self._rng = np.random.default_rng([self._seed, epoch])
        draws = getattr(self.dataset, "_draws", None)
        if draws is not None:
            draws.reseed(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last or self.process_count > 1:
            # multi-host: a partial final global batch cannot be split
            # evenly across hosts (empty/truncated local slices) — drop it
            # like drop_last (each host must agree on the batch count)
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            batch = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if self.process_count > 1:
                local = len(batch) // self.process_count
                lo = self.process_index * local
                batch = batch[lo : lo + local]
            yield batch

    def unsliced(self) -> "DataLoader":
        """A view of this loader with per-host slicing disabled (full global
        batches, same shuffle stream). Centralized eval walks use this: in a
        multi-host run the eval protocol runs entirely on process 0
        (evaluation/drivers.py), which must see the FULL test set, not its
        training-time 1/process_count input slice."""
        if self.process_count == 1:
            return self
        import copy

        full = copy.copy(self)
        full.process_index, full.process_count = 0, 1
        full._rng = np.random.default_rng(self._seed)
        return full

    def __iter__(self) -> Iterator[dict]:
        # one shared producer-thread/queue/sentinel implementation: decode +
        # collate run on the background thread, depth batches in flight
        return device_prefetch(
            self._index_batches(),
            lambda idx: self.collate_fn([self.dataset[int(i)] for i in idx]),
            depth=self.prefetch,
        )


class WrapAroundIterator:
    """Endless iterator over a loader (reference sample_real_image_batch,
    trainer.py:143-158: the image loader is drained in lockstep with the
    story loader and restarted when exhausted)."""

    def __init__(self, loader: DataLoader):
        if len(loader) == 0:
            raise ValueError(
                "loader yields no batches: dataset smaller than one batch "
                f"(len(dataset)={len(loader.dataset)}, batch={loader.batch_size})"
            )
        self.loader = loader
        self._it = iter(loader)

    def __next__(self) -> dict:
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self.loader)
            return next(self._it)
