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


class FailingDataset(ToyDataset):
    def __getitem__(self, i):
        if i == 7:
            raise RuntimeError("synthesis failed")
        return super().__getitem__(i)


def test_prefetch_loader_propagates_errors():
    loader = PrefetchLoader(FailingDataset(10), batch_size=2, shuffle=False)
    with pytest.raises(RuntimeError, match="synthesis failed"):
        list(loader)
