"""Re-invokable dataset iterables (reference: ptgnn/baseneuralmodel/utils/data.py)."""
from __future__ import annotations

import random
from typing import Callable, Iterable, Iterator, List, Optional, TypeVar

T = TypeVar("T")


class LazyDataIterable(Iterable[T]):
    """Wraps an iterator factory so the dataset can be re-iterated each epoch."""

    def __init__(self, base_iterable_func: Callable[[], Iterator[T]]):
        self.__base_iterable_func = base_iterable_func

    def __iter__(self) -> Iterator[T]:
        return self.__base_iterable_func()


class ShardedLazyDataIterable(Iterable[T]):
    """An iterator factory parameterized by (rank, world_size) for per-host
    input sharding (reference: utils/data.py:15-26)."""

    def __init__(self, base_iterable_func: Callable[..., Iterator[T]]):
        self.__base_iterable_func = base_iterable_func
        self.__rank: Optional[int] = None
        self.__world_size: Optional[int] = None

    def set_rank(self, rank: int, world_size: int) -> None:
        self.__rank = rank
        self.__world_size = world_size

    def __iter__(self) -> Iterator[T]:
        return self.__base_iterable_func(rank=self.__rank, world_size=self.__world_size)


class MemorizedDataIterable(Iterable[T]):
    """Caches the underlying iterable in RAM after the first pass, optionally
    reshuffling on later passes (reference: utils/data.py:29-52)."""

    def __init__(
        self,
        base_iterable_func: Callable[[], Iterator[T]],
        shuffle: bool = False,
        rng: "random.Random" = None,
    ):
        self.__base_iterable_func = base_iterable_func
        self.__elements: List[T] = []
        self.__use_cache = False
        self.__shuffle = shuffle
        # None -> the module-global RNG (the reference's utils/data.py:44
        # behavior); pass a seeded random.Random for deterministic reshuffles
        self.__rng = rng

    def __yield_and_store(self, base: Iterator[T]):
        for element in base:
            self.__elements.append(element)
            yield element
        self.__use_cache = True

    def __iter__(self) -> Iterator[T]:
        if self.__use_cache:
            if self.__shuffle:
                (self.__rng or random).shuffle(self.__elements)
            return iter(self.__elements)
        return self.__yield_and_store(self.__base_iterable_func())

    def __call__(self) -> Iterator[T]:
        return iter(self)


def enforce_not_None(e: Optional[T]) -> T:
    if e is None:
        raise Exception("Input is None.")
    return e
