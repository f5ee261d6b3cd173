"""The compositional neural-model lifecycle for TPU-native training.

Mirrors the reference's ``AbstractNeuralModel`` design (reference:
ptgnn/baseneuralmodel/abstractneuralmodel.py:36-359): a picklable host-side
object owning (a) metadata computed from a full pass over the training data
(vocabularies, edge-type registries), (b) per-sample tensorization, (c)
minibatching, and (d) construction of the paired neural module. Differences
forced by XLA, by design:

* ``build_neural_module`` returns a pure functional ``Module`` (init/apply
  over pytrees) instead of a stateful torch module;
* minibatches are **statically shaped**: models with fixed budgets implement
  ``can_add_to_minibatch`` so the batch driver closes a batch *before* it
  would overflow the padded shape (the reference instead grows ragged batches
  and stops after the fact, graphneuralnetwork.py:438 — that would force XLA
  recompiles per shape);
* ``finalize_minibatch`` returns host numpy arrays; the jitted step function
  moves them to device, so there is no torch-style ``device`` plumbing.
"""
from __future__ import annotations

import gzip
import os
import pickle
from abc import ABC, abstractmethod
from concurrent import futures
from pathlib import Path
from typing import (
    Any,
    Dict,
    Generic,
    Iterable,
    Iterator,
    List,
    Mapping,
    Optional,
    Tuple,
    Type,
    TypeVar,
)

import numpy as np

from ptgnn_tpu.core.iterators import BufferedIterator, ThreadedIterator, shuffled_iterator

# end-of-stream marker distinguishable from any data element (incl. None)
_EXHAUSTED = object()

TRawDatapoint = TypeVar("TRawDatapoint")
TTensorizedDatapoint = TypeVar("TTensorizedDatapoint")
TNeuralModule = TypeVar("TNeuralModule")
T = TypeVar("T")

__all__ = ["AbstractNeuralModel"]


class AbstractNeuralModel(ABC, Generic[TRawDatapoint, TTensorizedDatapoint, TNeuralModule]):
    def __init__(self):
        self.__metadata_initialized = False

    # ------------------------------------------------------------------
    # Introspection
    # ------------------------------------------------------------------
    @property
    def model_definition(self) -> Mapping[str, Any]:
        """Hyperparameter description, recursing into child models
        (reference: abstractneuralmodel.py:76-86)."""
        description: Dict[str, Any] = {}
        for attr, value in self.__dict__.items():
            if isinstance(value, AbstractNeuralModel):
                description[attr] = value.model_definition
            elif isinstance(value, (int, float, str, bool)):
                description[attr] = value
        return description

    # ------------------------------------------------------------------
    # Metadata lifecycle
    # ------------------------------------------------------------------
    def initialize_metadata(self) -> None:
        """Set up temporary metadata accumulators (children handled separately)."""

    @abstractmethod
    def update_metadata_from(self, datapoint: TRawDatapoint) -> None:
        """Update metadata from one example; unpack and delegate to children."""
        raise NotImplementedError()

    def finalize_metadata(self) -> None:
        """Freeze metadata; drop temporary accumulators."""

    def __initialize_metadata_recursive(self) -> None:
        self.initialize_metadata()
        for value in self.__dict__.values():
            if isinstance(value, AbstractNeuralModel):
                value.__initialize_metadata_recursive()

    def __finalize_metadata_recursive(self) -> None:
        self.finalize_metadata()
        for value in self.__dict__.values():
            if isinstance(value, AbstractNeuralModel):
                value.__finalize_metadata_recursive()
        self.__metadata_initialized = True

    @property
    def metadata_initialized(self) -> bool:
        return self.__metadata_initialized

    def compute_metadata(
        self, dataset_iterator: Iterator[TRawDatapoint], parallelize: bool = True
    ) -> None:
        """Full metadata pass over the training data (root model only)."""
        assert not self.__metadata_initialized, "Metadata has already been initialized."
        self.__initialize_metadata_recursive()
        for element in ThreadedIterator(dataset_iterator, enabled=parallelize):
            self.update_metadata_from(element)
        self.__finalize_metadata_recursive()

    @abstractmethod
    def build_neural_module(self) -> TNeuralModule:
        """Create the functional neural module from finalized metadata."""
        raise NotImplementedError()

    # ------------------------------------------------------------------
    # Saving / loading (no torch: gzip pickle of (model, numpy params pytree))
    # ------------------------------------------------------------------
    def __getstate__(self):
        """Models pickle whole (checkpoints are (model, params) blobs); any
        attribute ending in ``_jit_cache`` holds compiled functions — which
        cannot pickle — and is dropped (rebuilt lazily after restore).
        Convention used by the decode/encode caches (sequence/, graph2seq/)."""
        return {
            k: v for k, v in self.__dict__.items() if not k.endswith("_jit_cache")
        }

    def save(self, path: Path, params: Any) -> None:
        import jax

        path = Path(path)
        os.makedirs(os.path.dirname(str(path.absolute())), exist_ok=True)
        host_params = jax.tree_util.tree_map(np.asarray, params)
        # Write-then-rename: the trainer overwrites the same checkpoint on
        # every improvement; a crash mid-pickle must not destroy the last
        # good model.
        tmp = path.with_suffix(path.suffix + ".tmp")
        with gzip.open(tmp, "wb") as f:
            pickle.dump((self, host_params), f)
        os.replace(tmp, path)

    @classmethod
    def restore_model(cls: Type[T], path: Path) -> Tuple[T, Any]:
        with gzip.open(Path(path), "rb") as f:
            model, params = pickle.load(f)
        return model, params

    # ------------------------------------------------------------------
    # Tensor conversion
    # ------------------------------------------------------------------
    @abstractmethod
    def tensorize(self, datapoint: TRawDatapoint) -> Optional[TTensorizedDatapoint]:
        """Convert one raw example; return None to discard it."""
        raise NotImplementedError()

    class _TensorizedDataIter(Iterable):
        def __init__(self, model, dataset_iterator, return_input_data):
            self._model = model
            self._dataset_iterator = dataset_iterator
            self._return_input_data = return_input_data

        def __iter__(self):
            yield from (
                (self._model.tensorize(d), d if self._return_input_data else None)
                for d in self._dataset_iterator
            )

    def tensorize_dataset(
        self,
        dataset_iterator: Iterator[TRawDatapoint],
        *,
        parallelize: bool = True,
        use_multiprocessing: bool = True,
        return_input_data: bool = False,
    ) -> Iterator[Tuple[TTensorizedDatapoint, Optional[TRawDatapoint]]]:
        """Stream (tensorized, raw-or-None) pairs, skipping discarded samples.

        Parallel modes mirror the reference (abstractneuralmodel.py:194-238):
        a forked producer process or a thread pool.
        """
        assert self.__metadata_initialized, "Metadata has not been initialized."
        if parallelize and use_multiprocessing:
            base = self._TensorizedDataIter(self, dataset_iterator, return_input_data)
            for sample in BufferedIterator(base, max_queue_size=500):
                if sample[0] is not None:
                    yield sample
        elif parallelize:
            # Bounded in-flight window: Executor.map would submit one future
            # per element EAGERLY, materializing the whole (possibly
            # streamed/infinite) dataset before yielding anything.
            from collections import deque

            window = 64
            with futures.ThreadPoolExecutor() as pool:
                pending: "deque[futures.Future]" = deque()
                for d in dataset_iterator:
                    pending.append(
                        pool.submit(
                            lambda dp: (self.tensorize(dp), dp if return_input_data else None),
                            d,
                        )
                    )
                    if len(pending) >= window:
                        sample = pending.popleft().result()
                        if sample[0] is not None:
                            yield sample
                while pending:
                    sample = pending.popleft().result()
                    if sample[0] is not None:
                        yield sample
        else:
            for datapoint in dataset_iterator:
                tensorized = self.tensorize(datapoint)
                if tensorized is not None:
                    yield (tensorized, datapoint if return_input_data else None)

    # ------------------------------------------------------------------
    # Minibatching
    # ------------------------------------------------------------------
    @abstractmethod
    def initialize_minibatch(self) -> Dict[str, Any]:
        raise NotImplementedError()

    def can_add_to_minibatch(
        self, tensorized_datapoint: TTensorizedDatapoint, partial_minibatch: Dict[str, Any]
    ) -> bool:
        """Static-budget admission check, called BEFORE extend_minibatch_with.

        Models with padded static shapes (e.g. the GNN batcher) override this
        so a batch is finalized before it would overflow its padding budget.
        Must return True on an empty minibatch for any sample that survived
        tensorize(); samples rejected on an empty batch are dropped.
        """
        del tensorized_datapoint, partial_minibatch
        return True

    @abstractmethod
    def extend_minibatch_with(
        self, tensorized_datapoint: TTensorizedDatapoint, partial_minibatch: Dict[str, Any]
    ) -> bool:
        """Add a datapoint; return True if the minibatch can take more."""
        raise NotImplementedError()

    @abstractmethod
    def finalize_minibatch(self, accumulated_minibatch_data: Dict[str, Any]) -> Dict[str, Any]:
        """Produce the (statically shaped) numpy arrays consumed by the
        neural module's apply(**minibatch)."""
        raise NotImplementedError()

    def __iterate_unfinalized_minibatches(
        self,
        tensorized_data: Iterator[Tuple[TTensorizedDatapoint, Optional[TRawDatapoint]]],
        max_minibatch_size: int,
        yield_partial_minibatches: bool = True,
    ) -> Iterator[Tuple[Dict[str, Any], List[Optional[TRawDatapoint]]]]:
        tensorized_data = iter(tensorized_data)
        carried: Optional[Tuple[TTensorizedDatapoint, Optional[TRawDatapoint]]] = None
        exhausted = False
        while not exhausted:
            mb_data = self.initialize_minibatch()
            mb_input_data: List[Optional[TRawDatapoint]] = []
            stopped_by_budget = False
            while len(mb_input_data) < max_minibatch_size:
                if carried is not None:
                    sample, carried = carried, None
                else:
                    # unique sentinel: a stream that legitimately yields None
                    # must raise/propagate, not silently end the epoch
                    sample = next(tensorized_data, _EXHAUSTED)
                    if sample is _EXHAUSTED:
                        exhausted = True
                        break
                tensorized_sample, input_data = sample
                if not self.can_add_to_minibatch(tensorized_sample, mb_data):
                    if len(mb_input_data) == 0:
                        # Does not fit even in an empty batch: drop it.
                        continue
                    carried = sample
                    stopped_by_budget = True
                    break
                continue_extending = self.extend_minibatch_with(tensorized_sample, mb_data)
                mb_input_data.append(input_data)
                if not continue_extending:
                    stopped_by_budget = True
                    break
            if len(mb_input_data) == 0:
                return
            if exhausted and not stopped_by_budget and not yield_partial_minibatches:
                if len(mb_input_data) < max_minibatch_size:
                    return
            yield mb_data, mb_input_data

    def minibatch_iterator(
        self,
        tensorized_data: Iterator[Tuple[TTensorizedDatapoint, Optional[TRawDatapoint]]],
        max_minibatch_size: int,
        yield_partial_minibatches: bool = True,
        shuffle_input: bool = False,
        parallelize: bool = True,
        shuffle_rng=None,
    ) -> Iterator[Tuple[Dict[str, Any], List[Optional[TRawDatapoint]]]]:
        """Yield (minibatch dict, raw inputs) pairs; assembly and finalization
        run pipelined in worker threads (reference: abstractneuralmodel.py:321-357).

        ``shuffle_rng`` (a ``random.Random``) makes the streaming shuffle
        deterministic; None draws a fresh OS-entropy RNG (the reference's
        global-``random`` behavior, abstractneuralmodel.py:345-346)."""
        assert self.__metadata_initialized, "Metadata has not been initialized."
        if shuffle_input:
            tensorized_data = shuffled_iterator(
                tensorized_data, buffer_size=500, rng=shuffle_rng
            )

        unfinalized = ThreadedIterator(
            self.__iterate_unfinalized_minibatches(
                tensorized_data, max_minibatch_size, yield_partial_minibatches
            ),
            enabled=parallelize,
        )
        finalized = ThreadedIterator(
            ((self.finalize_minibatch(d[0]), d[1]) for d in unfinalized),
            enabled=parallelize,
        )
        try:
            yield from finalized
        finally:
            # A consumer breaking early (GeneratorExit) must not strand the
            # two producer threads blocked on full queues holding hundreds
            # of finalized (fully padded) minibatches.
            finalized.close()
            unfinalized.close()
