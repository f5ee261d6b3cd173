"""Host pipeline iterators: error propagation, dead-worker detection,
sentinel safety, bounded streaming, and producer cleanup."""
import itertools
import threading
import time

import numpy as np
import pytest

from ptgnn_tpu.core.iterators import BufferedIterator, ThreadedIterator, shuffled_iterator


def test_threaded_iterator_propagates_worker_exception():
    def gen():
        yield 1
        raise ValueError("boom in producer")

    it = ThreadedIterator(gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom in producer"):
        next(it)


def test_threaded_iterator_string_data_is_not_a_sentinel():
    data = ["a", "___end_of_iterator___", "b"]
    assert list(ThreadedIterator(iter(data))) == data


def test_threaded_iterator_close_unblocks_producer():
    produced = []

    def gen():
        for i in itertools.count():
            produced.append(i)
            yield i

    it = ThreadedIterator(gen(), max_queue_size=4)
    assert next(it) == 0
    it.close()
    # the producer must terminate (not stay blocked on a full queue)
    deadline = time.time() + 5.0
    while time.time() < deadline:
        n = len(produced)
        time.sleep(0.3)
        if len(produced) == n:
            break
    assert len(produced) == n  # stopped growing -> thread exited/stopped


def test_buffered_iterator_propagates_worker_exception():
    def gen():
        yield 1
        raise ValueError("boom in child")

    it = BufferedIterator(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom in child"):
        next(it)


def test_buffered_iterator_string_data_is_not_a_sentinel():
    data = ["x", "___end_of_iterator___", "y"]
    assert list(BufferedIterator(iter(data))) == data


def test_buffered_iterator_detects_killed_worker():
    import os
    import signal

    def gen():
        yield 1
        os.kill(os.getpid(), signal.SIGKILL)  # dies WITHOUT the marker
        yield 2  # pragma: no cover

    it = BufferedIterator(gen())
    # SIGKILL may race the queue's feeder thread, so the first element may
    # or may not arrive — either way the consumer must get the diagnostic
    # instead of hanging forever.
    with pytest.raises(RuntimeError, match="died without"):
        first = next(it)
        assert first == 1
        next(it)


def test_tensorize_threadpool_streams_lazily():
    """The thread-pool tensorize path must not materialize the input
    iterator up front — an (effectively) infinite stream still yields."""
    from tests.test_trainer_lifecycle import SimpleRegressionModel, synthetic_data

    model = SimpleRegressionModel()
    model.compute_metadata(iter(synthetic_data(np.random.RandomState(0), 50)), parallelize=False)

    pulled = []

    def infinite():
        rng = np.random.RandomState(1)
        for i in itertools.count():
            pulled.append(i)
            x = rng.randn(16).astype(np.float32)
            yield (x, float(x.sum() > 0))

    stream = model.tensorize_dataset(
        infinite(), parallelize=True, use_multiprocessing=False
    )
    got = list(itertools.islice(stream, 10))
    assert len(got) == 10
    assert len(pulled) < 1000  # bounded in-flight window, not the whole stream


def test_minibatch_iterator_early_break_does_not_hang():
    from tests.test_trainer_lifecycle import SimpleRegressionModel, synthetic_data

    data = synthetic_data(np.random.RandomState(0), 600)
    model = SimpleRegressionModel()
    model.compute_metadata(iter(data), parallelize=False)
    it = model.minibatch_iterator(
        model.tensorize_dataset(iter(data), parallelize=False),
        max_minibatch_size=8,
        parallelize=True,
    )
    for i, _ in enumerate(it):
        if i >= 2:
            break  # abandoning must close the producer threads
    before = threading.active_count()
    time.sleep(1.0)
    assert threading.active_count() <= before


def test_shuffled_iterator_is_a_permutation():
    import random

    data = list(range(1000))
    out = list(shuffled_iterator(iter(data), buffer_size=64, rng=random.Random(0)))
    assert sorted(out) == data
