"""Background prefetching over a batch iterator.

Overlaps host-side packing (C++ batcher) and host->device transfer with device
compute: a daemon thread pulls from the underlying loader and device_puts
batches into a bounded queue ahead of the training loop — the standard TPU
input-pipeline pattern (the reference's DataLoader(num_workers) analogue,
train_hiv.py:488-493).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax

__all__ = ["PrefetchIterator", "prefetch"]

_SENTINEL = object()


class PrefetchIterator:
    """Iterate ``source`` with ``depth`` batches prefetched on a daemon thread.

    Single-pass: wrap a fresh iterable per epoch.  Exceptions from the source
    are re-raised at the consuming call site; an exhausted iterator raises
    StopIteration on further next() calls.
    """

    def __init__(self, source: Iterable, depth: int = 2,
                 device: Optional[jax.Device] = None):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._device = device
        self._err: Optional[BaseException] = None
        self._done = False  # sentinel consumed; further next() raises cleanly
        self._thread = threading.Thread(target=self._fill, args=(source,),
                                        daemon=True)
        self._thread.start()

    def _fill(self, source):
        try:
            for item in source:
                if self._device is not None:
                    item = jax.device_put(item, self._device)
                self._q.put(item)
        except BaseException as e:  # noqa: BLE001 - propagate to consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        if self._done:
            # single-pass iterator: re-iteration must not deadlock on the
            # empty queue
            raise StopIteration
        item = self._q.get()
        if item is _SENTINEL:
            self._done = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(source: Iterable, depth: int = 2,
             device: Optional[jax.Device] = None) -> PrefetchIterator:
    """Wrap any batch iterable with background prefetching."""
    return PrefetchIterator(source, depth=depth, device=device)
