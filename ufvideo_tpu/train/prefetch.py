"""Asynchronous host-side input pipeline.

The reference overlaps video decode with training via DataLoader worker
processes (reference: train.py hot loop, num_workers=2; SURVEY §3.1 process
boundary). The TPU-native equivalent: a thread pool decodes/collates ahead of
the step loop and a device-prefetch stage keeps N batches resident on device
so the host never blocks the TPU (SURVEY §7 hard part 5).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, List, Optional, Sequence


class PrefetchLoader:
    """Background-thread batch producer.

    worker_fn(index) must be thread-safe (our dataset decode path is pure
    numpy/cv2 which releases the GIL during the heavy work).
    """

    def __init__(
        self,
        sample_indices: Sequence[int],
        load_fn: Callable[[int], Any],
        collate_fn: Callable[[List[Any]], Any],
        batch_size: int,
        num_workers: int = 2,
        prefetch_batches: int = 2,
    ):
        self.indices = list(sample_indices)
        self.load_fn = load_fn
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.num_workers = max(num_workers, 1)
        self.out_q: "queue.Queue" = queue.Queue(maxsize=prefetch_batches)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def __len__(self) -> int:
        return len(self.indices) // self.batch_size

    def _produce(self) -> None:
        from concurrent.futures import ThreadPoolExecutor

        try:
            with ThreadPoolExecutor(self.num_workers) as pool:
                batch_idx = [
                    self.indices[i : i + self.batch_size]
                    for i in range(0, len(self.indices), self.batch_size)
                ]
                for idxs in batch_idx:
                    if len(idxs) < self.batch_size or self._stop.is_set():
                        break
                    samples = list(pool.map(self.load_fn, idxs))
                    self.out_q.put(self.collate_fn(samples))
        except BaseException as e:  # surface worker failures to the consumer
            self.out_q.put(e)
            return
        self.out_q.put(None)

    def __iter__(self) -> Iterator[Any]:
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()
        while True:
            item = self.out_q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self) -> None:
        self._stop.set()


def device_prefetch(batches: Iterable, to_device: Callable, depth: int = 2):
    """Keep ``depth`` batches in flight on device ahead of consumption."""
    import collections

    buf = collections.deque()
    it = iter(batches)
    try:
        for _ in range(depth):
            buf.append(to_device(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(to_device(next(it)))
        except StopIteration:
            pass
        yield out
