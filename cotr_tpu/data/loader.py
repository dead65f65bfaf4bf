"""Prefetching batch loader with bounded in-flight work.

Replaces the reference's torch DataLoader worker pool (train_cotr.py:42-47):
sample synthesis (depth reprojection, occlusion checks, crops — CPU-bound,
see SURVEY.md §3.1) runs in a worker pool overlapped with the device step;
batches come out as ready numpy dicts with static shapes.

Memory is bounded end to end: at most ``num_workers + prefetch`` batches are
in flight in the pool (submission is lazy, not the whole epoch up front) and
at most ``prefetch`` completed batches wait in the hand-off queue, so a
stalled consumer stalls the producers instead of buffering the epoch.

Workers default to threads — the heavy inner loop is the C++ ``synth_corrs``
when built (cotr_tpu/native), which releases the GIL — but a process pool is
available (``executor="process"``) for pure-Python datasets where the GIL
serializes synthesis.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

# -- process-pool support -----------------------------------------------------
# A ProcessPoolExecutor cannot close over `self`; the dataset is installed
# once per worker via an initializer (same trick as torch DataLoader workers).
_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _build_batch_in_worker(idx_list):
    samples = [_WORKER_DATASET[int(i)] for i in idx_list]
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class PrefetchLoader:
    """Iterate fixed-shape batches with background sample synthesis.

    Rebuild the iterator each epoch via __call__/iter; shuffling is
    deterministic in (seed, epoch). Batch order is deterministic regardless
    of worker timing (futures are consumed in submission order).

    Parameters
    ----------
    executor: "thread" (default) or "process". Threads win when synthesis
        spends its time in GIL-releasing native code; processes win for
        pure-Python synthesis (the dataset must then be picklable).
    prefetch: max completed batches buffered ahead of the consumer.
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 prefetch: int = 4, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, executor: str = "thread"):
        assert executor in ("thread", "process")
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.executor = executor
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _make_pool(self):
        if self.executor == "process":
            return ProcessPoolExecutor(self.num_workers,
                                       initializer=_init_worker,
                                       initargs=(self.dataset,))
        return ThreadPoolExecutor(self.num_workers)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        self._epoch += 1

        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        stop = threading.Event()

        def build(idx_list):
            samples = [self.dataset[int(i)] for i in idx_list]
            return {k: np.stack([s[k] for s in samples])
                    for k in samples[0]}

        submit_fn = (_build_batch_in_worker
                     if self.executor == "process" else build)

        def put_respecting_stop(item) -> bool:
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            max_inflight = self.num_workers + max(1, self.prefetch)
            pending: deque = deque()
            it = iter(batches)
            with self._make_pool() as pool:
                try:
                    while not stop.is_set():
                        while len(pending) < max_inflight:
                            try:
                                b = next(it)
                            except StopIteration:
                                break
                            pending.append(pool.submit(submit_fn, b))
                        if not pending:
                            break
                        fut = pending.popleft()
                        try:
                            item = fut.result()
                        except Exception as e:  # surface synthesis errors
                            item = e
                        if not put_respecting_stop(item):
                            break
                finally:
                    for f in pending:
                        f.cancel()
            put_respecting_stop(None)

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
