"""Re-invokable dataset iterables.

Training loops iterate the same dataset once per epoch, so a dataset handle
must be an *iterator factory*, not a one-shot iterator. The reference ships
the same three shapes (ptgnn/baseneuralmodel/utils/data.py): a plain factory
wrapper, a rank-parameterized factory for per-host input sharding, and a
memoizing wrapper that trades RAM for re-read cost. The implementations here
are original; only the class names and call surface match the reference so
task code ports one-to-one.
"""
from __future__ import annotations

import random
from typing import Callable, Iterable, Iterator, List, Optional, TypeVar

T = TypeVar("T")


class LazyDataIterable(Iterable[T]):
    """A dataset handle built from a zero-argument iterator factory.

    Each ``iter()`` call re-invokes the factory, so epochs see a fresh pass
    over the underlying source (file reader, generator, ...).
    """

    def __init__(self, base_iterable_func: Callable[[], Iterator[T]]):
        self._make_iter = base_iterable_func

    def __iter__(self) -> Iterator[T]:
        return self._make_iter()


class ShardedLazyDataIterable(Iterable[T]):
    """A dataset handle whose factory takes ``(rank, world_size)`` keywords.

    Multi-host trainers call :meth:`set_rank` once per worker; from then on
    every epoch's iterator yields only that worker's input shard. Until
    ``set_rank`` runs, the factory receives ``rank=None, world_size=None``
    and may choose to yield everything (single-process use).
    """

    def __init__(self, base_iterable_func: Callable[..., Iterator[T]]):
        self._make_iter = base_iterable_func
        self._placement = (None, None)  # (rank, world_size)

    def set_rank(self, rank: int, world_size: int) -> None:
        self._placement = (rank, world_size)

    def __iter__(self) -> Iterator[T]:
        rank, world_size = self._placement
        return self._make_iter(rank=rank, world_size=world_size)


class MemorizedDataIterable(Iterable[T]):
    """Materializes the source into RAM on the first full pass.

    The first ``iter()`` streams from the factory while recording each
    element; once that pass COMPLETES, later passes serve the recorded list
    (optionally reshuffled per epoch). An abandoned first pass does not mark
    the cache valid, so a partially-consumed epoch cannot poison later ones.
    """

    def __init__(
        self,
        base_iterable_func: Callable[[], Iterator[T]],
        shuffle: bool = False,
        rng: Optional[random.Random] = None,
    ):
        self._make_iter = base_iterable_func
        self._shuffle = shuffle
        self._rng = rng  # None -> module-global random, matching the reference
        self._cache: Optional[List[T]] = None  # None until a pass completes

    def _record_first_pass(self) -> Iterator[T]:
        recorded: List[T] = []
        for element in self._make_iter():
            recorded.append(element)
            yield element
        self._cache = recorded

    def __iter__(self) -> Iterator[T]:
        if self._cache is None:
            return self._record_first_pass()
        if self._shuffle:
            shuffler = self._rng if self._rng is not None else random
            shuffler.shuffle(self._cache)
        return iter(self._cache)

    def __call__(self) -> Iterator[T]:
        # Lets a memorized dataset stand in where a factory is expected.
        return iter(self)


def enforce_not_None(e: Optional[T]) -> T:
    """Narrow ``Optional[T]`` to ``T``, failing loudly on ``None``."""
    if e is None:
        raise ValueError("expected a value, got None")
    return e
