"""Background-threaded task reader with a bounded prefetch queue.

Replaces the reference's fork-based multiprocess reader
(fs_mol/data/file_reader_iterable.py:63-311) — producer/consumer over a
bounded queue with shuffle/repeat and robust worker error handling —
with daemon threads, which are the right tool on a TPU host: the
packing work is numpy-heavy (GIL released), forking duplicates the
JAX runtime state, and thread shutdown needs no terminate()/join dance.
"""

from __future__ import annotations

import logging
import queue
import random
import threading
from typing import Callable, Generic, Iterable, Iterator, List, Optional, TypeVar

logger = logging.getLogger(__name__)

T = TypeVar("T")

_SENTINEL = object()


class BackgroundReader(Generic[T]):
    """Iterable running `reader_fn(paths_chunk, idx)` in worker threads.

    Guarantees:
      * bounded memory (queue of `buffer_size` outputs),
      * per-chunk exceptions are logged and skipped, never fatal
        (file_reader_iterable.py:50-57 semantics),
      * `repeat=True` reshuffles the path order each epoch.
    """

    def __init__(
        self,
        paths: List[str],
        reader_fn: Callable[[List[str], int], Optional[Iterable[T]]],
        num_workers: int = 2,
        buffer_size: int = 16,
        repeat: bool = False,
        shuffle: bool = True,
        chunk_size: int = 1,
        seed: int = 0,
    ):
        self._paths = list(paths)
        self._reader_fn = reader_fn
        self._num_workers = max(1, num_workers)
        self._buffer_size = buffer_size
        self._repeat = repeat
        self._shuffle = shuffle
        self._chunk_size = chunk_size
        self._seed = seed

    def __iter__(self) -> Iterator[T]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self._buffer_size)
        task_q: "queue.Queue" = queue.Queue()
        stop = threading.Event()

        def fill_tasks(epoch: int):
            order = list(self._paths)
            if self._shuffle:
                random.Random(self._seed + epoch).shuffle(order)
            idx_base = epoch * max(1, len(order))
            for i in range(0, len(order), self._chunk_size):
                task_q.put((order[i : i + self._chunk_size], idx_base + i))

        def worker():
            while not stop.is_set():
                try:
                    chunk, idx = task_q.get(timeout=0.1)
                except queue.Empty:
                    if not self._repeat and producer_done.is_set():
                        break
                    continue
                try:
                    result = self._reader_fn(chunk, idx)
                    if result is not None:
                        for item in result:
                            if stop.is_set():
                                return
                            out_q.put(item)
                except Exception:  # noqa: BLE001 — skip bad files, keep streaming
                    logger.exception("Reader failed on %s", chunk)
                finally:
                    task_q.task_done()

        def producer():
            epoch = 0
            while not stop.is_set():
                fill_tasks(epoch)
                task_q.join()
                epoch += 1
                if not self._repeat:
                    break
            producer_done.set()
            # Wait for workers to drain, then signal the consumer.
            for w in workers:
                w.join()
            out_q.put(_SENTINEL)

        producer_done = threading.Event()
        workers = [
            threading.Thread(target=worker, daemon=True, name=f"reader-{i}")
            for i in range(self._num_workers)
        ]
        for w in workers:
            w.start()
        prod = threading.Thread(target=producer, daemon=True, name="reader-producer")
        prod.start()

        try:
            while True:
                item = out_q.get()
                if item is _SENTINEL:
                    return
                yield item
        finally:
            stop.set()
            # Drain so blocked workers can exit.
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass
