"""Host-side batch loader: threaded sample fetch + background prefetch.

TPU-native replacement for the reference's
``torch.utils.data.DataLoader(num_workers=16, pin_memory=True,
prefetch_factor=2)`` (``src/Trainer.py:26-27``): a thread pool fetches samples
(NIfTI reads release the GIL in numpy/memmap), a producer thread assembles
fixed-shape numpy batches and keeps a bounded prefetch queue ahead of the
training loop, and the trainer overlaps host->HBM transfer with device
compute (JAX dispatch is async).

Fixed shapes for jit: the trailing partial batch is padded to ``batch_size``
and carries a ``valid`` mask so metrics/losses count exactly the real samples
(the reference sees a smaller final batch instead; same sample semantics, one
compiled shape).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Sequence

import numpy as np

# Fields stacked into numpy arrays; everything else is passed through as a
# python list (subjects are strings, reference Trainer.py:65).
ARRAY_FIELDS = ("volume", "label", "timepoint", "group", "gender", "age",
                "age_group", "coordinates", "pain_group")


class DataLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 num_workers: int = 8, seed: int = 0, drop_last: bool = False,
                 prefetch: int = 2, retries: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Transient-I/O resilience (the reference has none, SURVEY §5.3):
        # a failed/None sample read is retried before being skipped+masked.
        self.retries = retries
        self.epoch = 0

    def _fetch(self, idx):
        for attempt in range(self.retries + 1):
            try:
                sample = self.dataset.sample(idx)
            except Exception as e:
                if attempt == self.retries:
                    raise
                print(f"Retrying sample {idx} after error: {e}")
                continue
            if sample is not None:
                return sample
        return None

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle deterministically per epoch."""
        self.epoch = epoch

    def _index_order(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        return order

    def _collate(self, samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
        n_real = len(samples)
        pad = self.batch_size - n_real
        if pad:
            samples = list(samples) + [samples[-1]] * pad
        batch: Dict[str, Any] = {}
        for key in samples[0]:
            vals = [s[key] for s in samples]
            if key in ARRAY_FIELDS:
                batch[key] = np.stack([np.asarray(v) for v in vals])
            else:
                batch[key] = vals
        batch["valid"] = np.arange(self.batch_size) < n_real
        return batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        order = self._index_order()
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                        samples = list(pool.map(self._fetch, idxs))
                        samples = [s for s in samples if s is not None]
                        if not samples:
                            continue
                        out_q.put(self._collate(samples))
                out_q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                out_q.put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit if we stopped early.
            while producer.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break

