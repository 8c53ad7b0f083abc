"""DataLoader behavior: prefetch, shuffling, error propagation, None-skips."""

import numpy as np
import pytest

from neurovit_tpu.data.loader import DataLoader


class ToyDataset:
    def __init__(self, n, fail_at=None, none_at=None):
        self.n = n
        self.fail_at = fail_at
        self.none_at = none_at

    def __len__(self):
        return self.n

    def sample(self, idx):
        if idx == self.fail_at:
            raise RuntimeError(f"boom at {idx}")
        if idx == self.none_at:
            return None     # reference datasets return None on I/O error
        return {"volume": np.full((4, 4, 4), idx, np.float32),
                "label": idx % 2, "subject": f"s{idx}", "timepoint": 0}


def test_batches_cover_dataset_once():
    loader = DataLoader(ToyDataset(10), 4, shuffle=False, num_workers=2)
    seen = []
    for batch in loader:
        seen += [int(v[0, 0, 0]) for v, ok in
                 zip(batch["volume"], batch["valid"]) if ok]
    assert sorted(seen) == list(range(10))


def test_shuffle_is_deterministic_per_epoch():
    loader = DataLoader(ToyDataset(16), 4, shuffle=True, num_workers=2, seed=7)
    def order():
        return [int(v[0, 0, 0]) for b in loader
                for v, ok in zip(b["volume"], b["valid"]) if ok]
    loader.set_epoch(0)
    e0 = order()
    loader.set_epoch(0)
    assert order() == e0          # same epoch -> same order
    loader.set_epoch(1)
    assert order() != e0          # different epoch -> reshuffled


def test_worker_exception_propagates():
    loader = DataLoader(ToyDataset(8, fail_at=5), 4, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        for _ in loader:
            pass


def test_none_samples_are_skipped_not_fatal():
    """The reference returns None from __getitem__ on I/O errors, which would
    crash torch's default collate (SURVEY §2.1.11); we skip and mask."""
    loader = DataLoader(ToyDataset(8, none_at=2), 4, num_workers=2)
    total = sum(int(b["valid"].sum()) for b in loader)
    assert total == 7


def test_transient_failure_is_retried():
    """A sample that fails once then succeeds is recovered by the retry
    (transient-I/O resilience; the reference has none, SURVEY §5.3)."""
    class Flaky(ToyDataset):
        def __init__(self, n):
            super().__init__(n)
            self.attempts = {}

        def sample(self, idx):
            self.attempts[idx] = self.attempts.get(idx, 0) + 1
            if idx == 3 and self.attempts[idx] == 1:
                raise OSError("transient read error")
            return super().sample(idx)

    ds = Flaky(8)
    loader = DataLoader(ds, 4, num_workers=2, retries=1)
    total = sum(int(b["valid"].sum()) for b in loader)
    assert total == 8
    assert ds.attempts[3] == 2


def test_retries_exhausted_still_propagates():
    loader = DataLoader(ToyDataset(8, fail_at=5), 4, num_workers=2, retries=2)
    with pytest.raises(RuntimeError, match="boom"):
        for _ in loader:
            pass


def test_early_break_does_not_hang():
    loader = DataLoader(ToyDataset(100), 4, num_workers=2, prefetch=2)
    for i, _ in enumerate(loader):
        if i == 2:
            break
    # a second full iteration still works after the early break
    assert sum(int(b["valid"].sum()) for b in loader) == 100


def test_sharded_loader_partitions_index_space():
    """shard=(rank, world): disjoint slices of the same shuffle, equal batch
    counts on every rank (SPMD lockstep), wrap-padded short shards."""
    class _DS:
        def __len__(self):
            return 11

        def sample(self, idx):
            return {"volume": np.full((2, 2, 2), idx, np.float32),
                    "label": idx, "subject": f"s{idx}"}

    loaders = [DataLoader(_DS(), 2, shuffle=True, seed=3, num_workers=1,
                          shard=(r, 2)) for r in range(2)]
    assert len(loaders[0]) == len(loaders[1]) == 3   # ceil(ceil(11/2)=6 / 2)
    seen = []
    for ld in loaders:
        ld.set_epoch(1)
        labels = []
        for batch in ld:
            labels += [int(l) for l, v in zip(batch["label"], batch["valid"])
                       if v]
        seen.append(labels)
    # The 5-sample shard wraps one row for lockstep batch counts, but the
    # wrap row is valid=False: every sample is seen exactly ONCE across
    # ranks (no multi-host metric double-counting).
    assert sorted(len(s) for s in seen) == [5, 6]
    union = set(seen[0]) | set(seen[1])
    assert union == set(range(11))
    assert not set(seen[0]) & set(seen[1])
    assert len(seen[0]) + len(seen[1]) == 11


class NativeToyDataset(ToyDataset):
    """Dataset exposing the native whole-batch interface whose C-level read
    always fails (raises, native_io.read_batch contract)."""

    def __init__(self, n):
        super().__init__(n)
        self.batch_calls = 0

    def sample_meta(self, idx):
        return {"label": idx % 2, "subject": f"s{idx}", "timepoint": 0}

    def read_batch_volumes(self, idxs, n_threads=8):
        self.batch_calls += 1
        raise RuntimeError("native batch read failed for 1 of 8 file(s)")


def test_failed_native_batch_read_latches_per_sample_fallback(capsys):
    """A C-level batch-read failure must (a) fall back to per-sample reads
    for that batch and (b) latch: later batches skip the doomed whole-batch
    read instead of re-paying it (ADVICE r2; the latch resets per epoch)."""
    ds = NativeToyDataset(32)
    loader = DataLoader(ds, batch_size=8, shuffle=False, seed=0)
    batches = list(loader)
    assert len(batches) == 4 and all(b["valid"].all() for b in batches)
    assert ds.batch_calls == 1          # latched after the first failure
    assert "falling back to per-sample" in capsys.readouterr().out
    list(loader)                        # new epoch: one fresh chance
    assert ds.batch_calls == 2
