"""Host-side pipeline iterators (thread/process pumped, shuffling).

TPU-native replacement for the dpu-utils iterators the reference leans on
(reference: ptgnn/baseneuralmodel/abstractneuralmodel.py:8,135,219,345-356).
Tensorization is CPU work that must overlap with device steps, so we keep the
reference's structure: a producer thread/process feeding a bounded queue.
"""
from __future__ import annotations

import multiprocessing as mp
import queue
import random
import threading
from typing import Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")

_SENTINEL = "___end_of_iterator___"


class ThreadedIterator(Iterator[T]):
    """Runs the wrapped iterator in a daemon thread with a bounded queue."""

    def __init__(self, original: Iterable[T], max_queue_size: int = 500, enabled: bool = True):
        self.__enabled = enabled
        if not enabled:
            self.__iter = iter(original)
            return
        self.__queue: queue.Queue = queue.Queue(maxsize=max_queue_size)
        self.__error: Optional[BaseException] = None

        def worker():
            try:
                for element in original:
                    self.__queue.put(element)
            except BaseException as e:  # propagate into consumer
                self.__error = e
            finally:
                self.__queue.put(_SENTINEL)

        self.__thread = threading.Thread(target=worker, daemon=True)
        self.__thread.start()

    def __iter__(self):
        return self

    def __next__(self) -> T:
        if not self.__enabled:
            return next(self.__iter)
        item = self.__queue.get()
        if item is _SENTINEL or (isinstance(item, str) and item == _SENTINEL):
            if self.__error is not None:
                raise self.__error
            raise StopIteration
        return item


class BufferedIterator(Iterator[T]):
    """Runs the wrapped iterable in a separate *process* (fork), queueing
    pickled results. Used for CPU-heavy tensorization so the GIL never blocks
    the training loop."""

    def __init__(self, original: Iterable[T], max_queue_size: int = 500, enabled: bool = True):
        self.__enabled = enabled
        if not enabled:
            self.__iter = iter(original)
            return
        ctx = mp.get_context("fork")
        self.__queue: mp.Queue = ctx.Queue(maxsize=max_queue_size)

        def worker(q, it):
            try:
                for element in it:
                    q.put(element)
            finally:
                q.put(_SENTINEL)

        self.__process = ctx.Process(target=worker, args=(self.__queue, original), daemon=True)
        self.__process.start()

    def __iter__(self):
        return self

    def __next__(self) -> T:
        if not self.__enabled:
            return next(self.__iter)
        item = self.__queue.get()
        if isinstance(item, str) and item == _SENTINEL:
            self.__process.join()
            raise StopIteration
        return item


def shuffled_iterator(inner: Iterable[T], buffer_size: int = 500, rng: Optional[random.Random] = None) -> Iterator[T]:
    """Streaming shuffle with a bounded reservoir (dpu-utils-compatible)."""
    if rng is None:
        rng = random.Random()
    buffer = []
    for element in inner:
        if len(buffer) < buffer_size:
            buffer.append(element)
            continue
        idx = rng.randrange(buffer_size)
        yield buffer[idx]
        buffer[idx] = element
    rng.shuffle(buffer)
    yield from buffer
