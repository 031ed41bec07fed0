"""Host-side batch iterator with per-process sharding and device prefetch.

Replaces the reference's ``DataLoader`` + ``DistributedSampler`` (main.py:55-69):
each JAX process reads its ``process_index``-strided slice of the epoch
permutation; batches are fixed-shape dicts (see data.anet.collate_fixed) so
every step hits the same compiled executable.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Iterator, Optional

import jax
import numpy as np

from .anet import collate_fixed

ARRAY_KEYS = (
    "video_tensor", "video_mask", "audio_tensor", "audio_mask",
    "durations", "batch_valid",
    "gt_segments", "gt_mask", "gt_labels", "cap_tokens",
)


def split_batch(batch):
    """(device arrays, host metadata) split of a collated batch."""
    arrays = {k: batch[k] for k in ARRAY_KEYS if k in batch}
    meta = {k: v for k, v in batch.items() if k not in ARRAY_KEYS}
    return arrays, meta


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        pad_idx: int,
        video_rescale_len: int = 300,
        max_gt: int = 10,
        max_caption_len: int = 20,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        pad_batches: bool = True,
        num_prefetch: int = 2,
        audio_rescale_len: int = 0,
        collate_fn=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_idx = pad_idx
        self.video_rescale_len = video_rescale_len
        self.max_gt = max_gt
        self.max_caption_len = max_caption_len
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_batches = pad_batches
        self.num_prefetch = num_prefetch
        self.audio_rescale_len = audio_rescale_len
        self.collate_fn = collate_fn  # None = standard fixed-shape collate
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        # per-process shard (replaces DistributedSampler)
        pi, pc = jax.process_index(), jax.process_count()
        return order[pi::pc]

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _produce(self) -> Iterator[Optional[dict]]:
        idxs = self._indices()
        for start in range(0, len(idxs), self.batch_size):
            chunk = idxs[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            samples = [self.dataset[int(i)] for i in chunk]
            if self.collate_fn is not None:
                batch = self.collate_fn(samples)
            else:
                batch = collate_fixed(
                    samples,
                    self.pad_idx,
                    self.video_rescale_len,
                    self.max_gt,
                    self.max_caption_len,
                    pad_to_batch=self.batch_size if self.pad_batches else 0,
                    audio_rescale_len=self.audio_rescale_len,
                )
            if batch is not None:
                yield batch

    def __iter__(self):
        """Background-thread prefetch: overlaps host decode/tokenize/collate
        with device compute (double buffering)."""
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.num_prefetch)
        sentinel = object()

        def worker():
            try:
                for batch in self._produce():
                    q.put(batch)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
