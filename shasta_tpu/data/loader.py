"""Host data loader: parallel sample building + batch prefetch.

Replaces torch DataLoader + DistributedGroupSampler
(det3d/datasets/loader/build_loader.py:24-60, sampler.py). TPU-native
layout: each host builds only its own shard of the global batch
(per-host sharded loading); the arrays are already fixed-shape so a batch
is a plain stack (see shasta_tpu.data.nuscenes.collate).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from .nuscenes import collate


class ConcatDataset:
    """Chain several datasets (det3d/datasets/dataset_wrappers.py
    ConcatDataset): indices run through each dataset in order."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        if idx < 0:
            idx += len(self)
        di = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[di][idx - int(self._offsets[di])]


class RepeatDataset:
    """Repeat a dataset `times` times per epoch (dataset_wrappers.py
    RepeatDataset) — the reference's trick for short schedules."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = int(times)

    def __len__(self):
        return self.times * len(self.dataset)

    def __getitem__(self, idx: int):
        return self.dataset[idx % len(self.dataset)]


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard (DistributedGroupSampler equivalent)
        return idx[self.shard_id :: self.num_shards]

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        nb = len(self)
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                    samples = list(pool.map(self.dataset.__getitem__, sel))
                    out_q.put(collate(samples))
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
        self.epoch += 1
