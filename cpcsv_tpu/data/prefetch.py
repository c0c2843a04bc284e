"""Device prefetch: overlap host batch preparation + H2D transfer with the
device computation of the previous step (the per-host input-pipeline role
that torch DataLoader workers played in the reference, but for a device
that is potentially across a network tunnel).

`device_prefetch(iterator, put_fn, depth)` keeps `depth` batches in flight:
each batch is `put_fn`-transferred (e.g. shard_batch onto the mesh) on a
background thread while the main thread trains on earlier batches.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


def device_prefetch(
    iterable: Iterable, put_fn: Callable, depth: int = 2
) -> Iterator:
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for item in iterable:
                q.put(put_fn(item))
        except Exception as e:
            q.put(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, Exception):
            raise item
        yield item
