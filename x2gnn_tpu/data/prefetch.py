"""Background-thread batch prefetch for the non-cached data path.

Small datasets keep device-resident batches across epochs (Trainer's
batch cache). At QM9 scale (>20k molecules) that cache is off, and each
step would otherwise wait for the host to assemble + pad the next
GraphBatch (numpy concatenation over dozens of molecules) before it can
dispatch. `prefetch` runs the producing iterator in a daemon thread a
bounded number of batches ahead, so host batch assembly overlaps device
compute — the TPU input-pipeline equivalent of the reference's (absent)
DataLoader worker processes (trainer.py:25-27 uses num_workers unset =
main-process loading).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Yield from `it`, produced in a background daemon thread up to
    `depth` items ahead. Exceptions in the producer are re-raised at the
    consuming call site."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as exc:    # re-raise on the consumer side
            q.put((_SENTINEL, exc))
            return
        q.put((_SENTINEL, None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 \
                and item[0] is _SENTINEL:
            if item[1] is not None:
                raise item[1]
            return
        yield item
