"""Background batch prefetcher.

The reference's train loop blocked on host-side batch assembly every step
(feed_dict, SURVEY.md §3.1). Here batch assembly (already native-fast via
arec.native) runs on a worker thread a fixed depth ahead of the device, and
host→device transfer of the next batch overlaps the current step's compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

_END = object()


def prefetch(it: Iterable, depth: int = 2,
             transform: Callable | None = None) -> Iterator:
    """Wrap any batch iterator; `transform` (e.g. jnp.asarray per leaf /
    device_put with a sharding) runs on the worker thread."""
    q: queue.Queue = queue.Queue(maxsize=depth)

    def worker():
        try:
            for item in it:
                if transform is not None:
                    item = transform(item)
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item


def to_device(sharding=None):
    """Standard transform: numpy batch dict → committed device arrays."""
    def tf(batch):
        if sharding is None:
            return {k: jax.device_put(v) for k, v in batch.items()}
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return tf
