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
import traceback
from typing import Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")


class _EndOfStream:
    """Dedicated end-of-stream marker: survives pickling as an instance of
    this class, so detection is by ``isinstance`` — a data element can never
    collide with it (a string sentinel would truncate string datasets)."""


class _WorkerError:
    """Carries a producer-side failure across the thread/process boundary."""

    def __init__(self, message: str):
        self.message = message


class ThreadedIterator(Iterator[T]):
    """Runs the wrapped iterator in a daemon thread with a bounded queue.

    ``close()`` stops the producer: abandoned iterators (a consumer breaking
    early) would otherwise leave the worker blocked on a full queue forever,
    pinning its buffered elements for the process lifetime."""

    def __init__(self, original: Iterable[T], max_queue_size: int = 500, enabled: bool = True):
        self.__enabled = enabled
        if not enabled:
            self.__iter = iter(original)
            return
        self.__queue: queue.Queue = queue.Queue(maxsize=max_queue_size)
        self.__error: Optional[BaseException] = None
        self.__stop = threading.Event()

        def worker():
            try:
                for element in original:
                    # bounded put that notices close(): never block forever
                    while True:
                        if self.__stop.is_set():
                            return
                        try:
                            self.__queue.put(element, timeout=0.2)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # propagate into consumer
                self.__error = e
            finally:
                # The end marker MUST arrive (a full queue would drop a
                # put_nowait and leave the consumer blocked forever); poll so
                # close() can still release an abandoned producer.
                while not self.__stop.is_set():
                    try:
                        self.__queue.put(_EndOfStream(), timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self.__thread = threading.Thread(target=worker, daemon=True)
        self.__thread.start()

    def close(self) -> None:
        """Stop the producer thread and release its queued elements."""
        if not self.__enabled:
            return
        self.__stop.set()
        try:
            while True:
                self.__queue.get_nowait()
        except queue.Empty:
            pass
        # Wake any consumer blocked in get() on this (now closed) stream —
        # e.g. the downstream pipeline thread of a chained iterator.
        try:
            self.__queue.put_nowait(_EndOfStream())
        except queue.Full:  # pragma: no cover
            pass

    def __iter__(self):
        return self

    def __next__(self) -> T:
        if not self.__enabled:
            return next(self.__iter)
        item = self.__queue.get()
        if isinstance(item, _EndOfStream):
            if self.__error is not None:
                raise self.__error
            raise StopIteration
        return item


class BufferedIterator(Iterator[T]):
    """Runs the wrapped iterable in a separate *process* (fork), queueing
    pickled results. Used for CPU-heavy tensorization so the GIL never blocks
    the training loop.

    Producer failures are re-raised in the consumer (the reference's child
    would die silently, truncating the dataset); a child killed without
    running its finally block (OOM kill, segfault) is detected by a
    liveness check instead of hanging the training job."""

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
                q.put(_EndOfStream())
            except BaseException:  # ship the traceback to the consumer
                q.put(_WorkerError(traceback.format_exc()))

        self.__process = ctx.Process(target=worker, args=(self.__queue, original), daemon=True)
        self.__process.start()

    def __iter__(self):
        return self

    def __next__(self) -> T:
        if not self.__enabled:
            return next(self.__iter)
        while True:
            try:
                item = self.__queue.get(timeout=5.0)
                break
            except queue.Empty:
                if not self.__process.is_alive():
                    # one last non-blocking drain: the child may have
                    # flushed between the timeout and the liveness check
                    try:
                        item = self.__queue.get_nowait()
                        break
                    except queue.Empty:
                        raise RuntimeError(
                            "BufferedIterator worker process died without "
                            f"an end-of-stream marker (exitcode="
                            f"{self.__process.exitcode}); it was likely "
                            "OOM-killed or crashed in native code."
                        ) from None
        if isinstance(item, _WorkerError):
            self.__process.join()
            raise RuntimeError(
                "BufferedIterator worker process failed:\n" + item.message
            )
        if isinstance(item, _EndOfStream):
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
