"""Host-side batch prefetching.

The reference overlaps data loading with compute via torch DataLoader worker
processes (workers=4, train_ds_with_videogptplus.py:89). TPU-native
equivalent: a thread pool decodes/preprocesses upcoming batches while the
device steps, and (optionally) stages them onto the device ahead of time so
the train loop never blocks on host work.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class PrefetchIterator:
    """Wrap a batch iterator with N background-prefetched slots."""

    def __init__(self, it: Iterator, prefetch: int = 2,
                 to_device: Optional[Callable] = None):
        self._it = it
        self._to_device = to_device
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._it:
                if self._to_device is not None:
                    item = self._to_device(item)
                self._q.put(item)
        except BaseException as e:   # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_to_device(batches: Iterator, to_device: Callable,
                       prefetch: int = 2) -> Iterator:
    """Decode + device-stage `prefetch` batches ahead of the consumer."""
    return PrefetchIterator(batches, prefetch=prefetch, to_device=to_device)
