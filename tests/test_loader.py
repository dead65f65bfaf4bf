"""PrefetchLoader: ordering-independent correctness + error propagation."""

import numpy as np
import pytest

from cotr_tpu.data.loader import PrefetchLoader


class ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((4,), float(i), np.float32)}


def test_prefetch_loader_yields_all_batches():
    loader = PrefetchLoader(ToyDataset(10), batch_size=2, num_workers=3,
                            shuffle=False)
    batches = list(loader)
    assert len(batches) == 5
    seen = sorted(int(b["x"][j, 0]) for b in batches for j in range(2))
    assert seen == list(range(10))
    assert batches[0]["x"].shape == (2, 4)


def test_prefetch_loader_shuffles_per_epoch():
    loader = PrefetchLoader(ToyDataset(10), batch_size=2, shuffle=True, seed=1)
    e1 = [int(b["x"][j, 0]) for b in loader for j in range(2)]
    e2 = [int(b["x"][j, 0]) for b in loader for j in range(2)]
    assert sorted(e1) == sorted(e2) == list(range(10))
    assert e1 != e2  # different epoch -> different order


class CountingDataset(ToyDataset):
    """Counts __getitem__ calls (thread-safe enough for CPython ints)."""

    def __init__(self, n=10):
        super().__init__(n)
        self.calls = 0

    def __getitem__(self, i):
        self.calls += 1
        return super().__getitem__(i)


def test_prefetch_loader_bounds_inflight_work():
    """A stalled consumer must stall the producers: at most
    (num_workers + 2*prefetch + 1) batches of samples may ever have been
    synthesized while the consumer holds one batch (the fix for the
    round-1 unbounded submit-the-whole-epoch prefetcher)."""
    import time

    ds = CountingDataset(n=400)
    bs, workers, prefetch = 2, 2, 2
    loader = PrefetchLoader(ds, batch_size=bs, num_workers=workers,
                            prefetch=prefetch, shuffle=False)
    it = iter(loader)
    next(it)  # consume one batch, then stall
    time.sleep(1.0)  # producers run freely; boundedness must hold them back
    # in flight in pool (workers+prefetch) + queued (prefetch) + consumed (1)
    bound = (workers + 2 * prefetch + 1) * bs
    assert ds.calls <= bound, f"synthesized {ds.calls} samples > bound {bound}"
    it.close()


def test_prefetch_loader_order_deterministic_with_slow_items():
    """Batch order is submission order even when early items are slow."""
    import time

    class SlowFirst(ToyDataset):
        def __getitem__(self, i):
            if i == 0:
                time.sleep(0.2)
            return super().__getitem__(i)

    loader = PrefetchLoader(SlowFirst(8), batch_size=2, num_workers=4,
                            shuffle=False)
    firsts = [int(b["x"][0, 0]) for b in loader]
    assert firsts == [0, 2, 4, 6]


def test_prefetch_loader_process_executor():
    loader = PrefetchLoader(ToyDataset(8), batch_size=2, num_workers=2,
                            shuffle=False, executor="process")
    batches = list(loader)
    seen = sorted(int(b["x"][j, 0]) for b in batches for j in range(2))
    assert seen == list(range(8))


class FailingDataset(ToyDataset):
    def __getitem__(self, i):
        if i == 7:
            raise RuntimeError("synthesis failed")
        return super().__getitem__(i)


def test_prefetch_loader_propagates_errors():
    loader = PrefetchLoader(FailingDataset(10), batch_size=2, shuffle=False)
    with pytest.raises(RuntimeError, match="synthesis failed"):
        list(loader)
