"""Prefetching batch loader.

Replaces the reference's torch DataLoader worker pool (train_cotr.py:42-47):
sample synthesis (depth reprojection, occlusion checks, crops — CPU-bound,
see SURVEY.md §3.1) runs in a thread pool overlapped with the device step;
batches come out as ready numpy dicts with static shapes. The heavy inner
loop is the C++ ``synth_corrs`` when built (cotr_tpu/native), so worker
threads spend their time outside the GIL.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


class PrefetchLoader:
    """Iterate fixed-shape batches with background sample synthesis.

    Rebuild the iterator each epoch via __call__/iter; shuffling is
    deterministic in (seed, epoch).
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 prefetch: int = 4, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        self._epoch += 1

        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def build(idx_list):
            samples = [self.dataset[int(i)] for i in idx_list]
            return {k: np.stack([s[k] for s in samples])
                    for k in samples[0]}

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(build, b) for b in batches]
                for fut in futures:
                    if stop.is_set():
                        fut.cancel()
                        continue
                    try:
                        out_q.put(fut.result())
                    except Exception as e:  # surface synthesis errors
                        out_q.put(e)
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    # allow use as the Trainer's loader factory
    __call__ = __iter__
