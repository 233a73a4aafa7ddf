"""Background-thread batch prefetching (host→device overlap).

The reference's input pipeline is a synchronous PyG DataLoader; here a small
double-buffered prefetcher overlaps host-side packing (numpy/C++) and
`device_put` with device compute — the TPU-idiomatic input pipeline without
a tf.data dependency.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

_SENTINEL = object()


def prefetch(iterator: Iterable, transfer: Callable | None = None, depth: int = 2) -> Iterator:
    """Yield items from `iterator`, computing (and optionally transferring)
    up to `depth` items ahead on a background thread.

    Args:
      iterator: source of host batches.
      transfer: optional fn applied on the background thread (e.g.
        `lambda b: shard_batch(b, mesh)` to start the H2D copy early).
      depth: queue depth.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []

    def worker():
        try:
            for item in iterator:
                if transfer is not None:
                    item = transfer(item)
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
