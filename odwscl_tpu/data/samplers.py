"""Samplers: epoch-seeded shuffling, aspect-ratio grouping, iteration-based
infinite batching, multi-host sharding.

Reference: wetectron/data/samplers/ — DistributedSampler (distributed.py:10:
epoch-seeded randperm, pad to divisibility, contiguous per-rank shard),
GroupedBatchSampler (grouped_batch_sampler.py: portrait/landscape grouping)
and IterationBasedBatchSampler (iteration_based_batch_sampler.py:5: recycle
until MAX_ITER, resumable via start_iter).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np


def aspect_ratio_groups(dataset) -> np.ndarray:
    """0 = landscape (w >= h), 1 = portrait — the reference buckets on
    aspect ratio >= 1 (data/build.py _quantize/_compute_aspect_ratios)."""
    flags = np.zeros(len(dataset), np.int64)
    for i in range(len(dataset)):
        info = dataset.get_img_info(i)
        flags[i] = 1 if info["height"] > info["width"] else 0
    return flags


class IterationBatchSampler:
    """Yields lists of dataset indices, batch by batch, forever up to
    num_iterations; shuffling reseeds per epoch; optional aspect-ratio
    grouping keeps each batch in one group; optional multi-host shard."""

    def __init__(self, dataset_len: int, batch_size: int,
                 num_iterations: int, start_iter: int = 0,
                 shuffle: bool = True, groups: Optional[np.ndarray] = None,
                 process_count: int = 1, process_index: int = 0,
                 drop_uneven: bool = False, epoch_batches_fn=None):
        assert batch_size % process_count == 0 or process_count == 1
        self.n = dataset_len
        self.batch_size = batch_size
        self.num_iterations = num_iterations
        self.start_iter = start_iter
        self.shuffle = shuffle
        self.groups = groups
        self.process_count = process_count
        self.process_index = process_index
        # optional override, e.g. class_batch_pairs for SOLVER.CLASS_BATCH
        self.epoch_batches_fn = epoch_batches_fn

    def _epoch_batches(self, epoch: int) -> List[np.ndarray]:
        if self.epoch_batches_fn is not None:
            return [np.asarray(b) for b in self.epoch_batches_fn(epoch)]
        rng = np.random.RandomState(epoch)
        order = rng.permutation(self.n) if self.shuffle else np.arange(self.n)
        # pad to a multiple of total batch (DistributedSampler:42-46)
        total = int(np.ceil(self.n / self.batch_size)) * self.batch_size
        order = np.concatenate([order, order[: total - self.n]])
        if self.groups is not None:
            # stable-partition each epoch order by group, then batch within
            batches = []
            for g in np.unique(self.groups):
                sel = order[self.groups[order] == g]
                for k in range(0, len(sel) - self.batch_size + 1, self.batch_size):
                    batches.append(sel[k:k + self.batch_size])
            rng.shuffle(batches)
            return batches
        return [order[k:k + self.batch_size]
                for k in range(0, total, self.batch_size)]

    def __iter__(self) -> Iterator[np.ndarray]:
        it = 0
        epoch = 0
        while it < self.num_iterations:
            for batch in self._epoch_batches(epoch):
                if it >= self.num_iterations:
                    return
                it += 1
                if it <= self.start_iter:
                    continue  # fast-forward on resume
                if self.process_count > 1:
                    per = len(batch) // self.process_count
                    batch = batch[self.process_index * per:
                                  (self.process_index + 1) * per]
                yield batch
            epoch += 1

    def __len__(self):
        return self.num_iterations - self.start_iter


def class_batch_pairs(dataset, batch_size: int, epoch: int) -> list:
    """The reference's ``class_batch`` grouping
    (samplers/grouped_batch_sampler.py:124-250, off in shipped configs):
    build batches where consecutive image pairs share at least one
    image-level class, so each batch carries contrastive positives."""
    rng = np.random.RandomState(epoch)
    by_class = {}
    labels_per_img = []
    for i in range(len(dataset)):
        _, labels, _ = dataset.get_groundtruth(i)
        cls = set(np.unique(labels).tolist())
        labels_per_img.append(cls)
        for c in cls:
            by_class.setdefault(c, []).append(i)

    order = rng.permutation(len(dataset))
    used = np.zeros(len(dataset), bool)
    batches, cur = [], []
    for i in order:
        if used[i]:
            continue
        used[i] = True
        cur.append(i)
        # find an unused partner sharing a class
        partner = -1
        for c in labels_per_img[i]:
            for j in by_class.get(c, []):
                if not used[j]:
                    partner = j
                    break
            if partner >= 0:
                break
        if partner >= 0:
            used[partner] = True
            cur.append(partner)
        if len(cur) >= batch_size:
            batches.append(np.asarray(cur[:batch_size]))
            cur = cur[batch_size:]
    if cur:
        pad = batch_size - len(cur)
        cur = cur + cur[:pad] if pad <= len(cur) else cur * batch_size
        batches.append(np.asarray(cur[:batch_size]))
    return batches


class InferenceSampler:
    """Sequential batches over the dataset, optionally sharded by process."""

    def __init__(self, dataset_len: int, batch_size: int,
                 process_count: int = 1, process_index: int = 0):
        self.indices = np.arange(dataset_len)[process_index::process_count]
        self.batch_size = batch_size

    def __iter__(self):
        for k in range(0, len(self.indices), self.batch_size):
            yield self.indices[k:k + self.batch_size]

    def __len__(self):
        return int(np.ceil(len(self.indices) / self.batch_size))
