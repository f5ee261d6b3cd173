"""Dependency shims that let the ACTUAL reference code (/root/reference/ptgnn,
PyTorch) run for parity tests without its native/unavailable dependencies.

Two packages are faked in sys.modules before importing ``ptgnn``:

* ``torch_scatter`` (+ ``torch_scatter.composite``): re-implemented on stock
  ``torch.scatter_reduce``/``index_add`` following the public torch-scatter
  API semantics (out-of-the-box fill value 0 for untouched entries, argmax =
  ``src.size(dim)`` for empty segments, composite log-softmax/logsumexp
  max-recentering with additive eps). This is the reference's only native
  dependency (SURVEY.md §2.6).
* ``dpu_utils``: the small subset the reference imports — iterator helpers,
  a functional ``Vocabulary``, and inert stubs for RichPath/BPE/char pieces.

Every parity test then compares ptgnn_tpu against the reference's OWN
forward math, not a hand-rewritten oracle.
"""
from __future__ import annotations

import random
import sys
import types
from collections import Counter
from typing import Iterable, List, Optional

import torch

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------


def _broadcast(index: torch.Tensor, src: torch.Tensor, dim: int) -> torch.Tensor:
    """Expand a 1-D (or lower-rank) index to src's shape along ``dim``
    (torch-scatter's broadcasting rule)."""
    if dim < 0:
        dim = src.dim() + dim
    if index.dim() == 1:
        for _ in range(dim):
            index = index.unsqueeze(0)
    while index.dim() < src.dim():
        index = index.unsqueeze(-1)
    return index.expand_as(src)


def _out_size(src: torch.Tensor, index: torch.Tensor, dim: int, dim_size):
    if dim < 0:
        dim = src.dim() + dim
    size = list(src.size())
    size[dim] = int(dim_size) if dim_size is not None else (
        int(index.max()) + 1 if index.numel() > 0 else 0
    )
    return size, dim


def scatter_sum(src, index, dim=-1, out=None, dim_size=None):
    index = _broadcast(index, src, dim)
    if out is None:
        size, dim = _out_size(src, index, dim, dim_size)
        out = torch.zeros(size, dtype=src.dtype, device=src.device)
        return out.scatter_add_(dim, index, src)
    return out.scatter_add_(dim if dim >= 0 else src.dim() + dim, index, src)


scatter_add = scatter_sum


def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
    total = scatter_sum(src, index, dim, None, dim_size)
    ones = torch.ones_like(src)
    count = scatter_sum(ones, index, dim, None, total.size(dim if dim >= 0 else src.dim() + dim))
    return total / count.clamp(min=1)


def _scatter_extremum(src, index, dim, out, dim_size, is_max: bool):
    reduce = "amax" if is_max else "amin"
    bindex = _broadcast(index, src, dim)
    provided = out is not None
    if out is None:
        size, dim = _out_size(src, bindex, dim, dim_size)
        out = torch.zeros(size, dtype=src.dtype, device=src.device)
    else:
        dim = dim if dim >= 0 else src.dim() + dim
    touched = torch.zeros(out.shape, dtype=torch.bool, device=src.device)
    touched.scatter_(dim, bindex, torch.ones_like(bindex, dtype=torch.bool))
    values = out.scatter_reduce(dim, bindex, src, reduce, include_self=provided)
    # untouched entries: provided out keeps its own values; otherwise 0 fill
    values = torch.where(touched, values, out if provided else torch.zeros_like(out))
    if provided:
        out.copy_(values)
        values = out
    # argmax/argmin: position along dim in src; src.size(dim) when empty
    gathered = values.gather(dim, bindex)
    pos_shape = [1] * src.dim()
    pos_shape[dim] = src.size(dim)
    pos = torch.arange(src.size(dim), device=src.device).view(pos_shape).expand_as(src)
    sentinel = src.size(dim)
    cand = torch.where(src == gathered, pos, torch.full_like(pos, sentinel))
    arg = torch.full(values.shape, sentinel, dtype=torch.long, device=src.device)
    arg = arg.scatter_reduce(dim, bindex, cand, "amin", include_self=True)
    return values, arg


def scatter_max(src, index, dim=-1, out=None, dim_size=None):
    return _scatter_extremum(src, index, dim, out, dim_size, True)


def scatter_min(src, index, dim=-1, out=None, dim_size=None):
    return _scatter_extremum(src, index, dim, out, dim_size, False)


def scatter(src, index, dim=-1, out=None, dim_size=None, reduce="sum"):
    if reduce in ("sum", "add"):
        return scatter_sum(src, index, dim, out, dim_size)
    if reduce == "mean":
        return scatter_mean(src, index, dim, out, dim_size)
    if reduce == "max":
        return scatter_max(src, index, dim, out, dim_size)[0]
    if reduce == "min":
        return scatter_min(src, index, dim, out, dim_size)[0]
    raise ValueError(reduce)


def scatter_log_softmax(src, index, dim=-1, eps=1e-12, dim_size=None):
    if not torch.is_floating_point(src):
        raise ValueError("log_softmax requires floating point input")
    bindex = _broadcast(index, src, dim)
    max_value_per_index = scatter_max(src, index, dim=dim, dim_size=dim_size)[0]
    d = dim if dim >= 0 else src.dim() + dim
    max_per_src = max_value_per_index.gather(d, bindex)
    recentered = src - max_per_src
    sum_per_index = scatter_sum(recentered.exp(), index, dim, None, dim_size)
    normalizing = (sum_per_index + eps).log().gather(d, bindex)
    return recentered - normalizing


def scatter_logsumexp(src, index, dim=-1, out=None, dim_size=None, eps=1e-12):
    if not torch.is_floating_point(src):
        raise ValueError("logsumexp requires floating point input")
    bindex = _broadcast(index, src, dim)
    size, d = _out_size(src, bindex, dim, dim_size)
    # out-of-place max with -inf base: the in-place provided-`out` path of
    # scatter_max breaks torch autograd (copy_ bumps the tensor version)
    max_value_per_index = torch.full(
        size, float("-inf"), dtype=src.dtype, device=src.device
    ).scatter_reduce(d, bindex, src, "amax", include_self=True)
    max_per_src = max_value_per_index.gather(d, bindex)
    recentered = src - max_per_src
    # all--inf segments: -inf - -inf = nan -> treat as -inf (exp 0)
    recentered = recentered.masked_fill(torch.isnan(recentered), float("-inf"))
    sum_per_index = scatter_sum(recentered.exp(), index, d, out, size[d])
    return (sum_per_index + eps).log() + max_value_per_index


def _make_torch_scatter_module():
    mod = types.ModuleType("torch_scatter")
    comp = types.ModuleType("torch_scatter.composite")
    for fn in (
        scatter, scatter_sum, scatter_mean, scatter_max, scatter_min,
        scatter_log_softmax, scatter_logsumexp,
    ):
        setattr(mod, fn.__name__, fn)
    mod.scatter_add = scatter_sum  # alias (fn.__name__ would collide)
    comp.scatter_log_softmax = scatter_log_softmax
    comp.scatter_logsumexp = scatter_logsumexp
    mod.composite = comp
    return mod, comp


# ---------------------------------------------------------------------------
# dpu_utils subset
# ---------------------------------------------------------------------------


class Vocabulary:
    """Functional subset of dpu_utils.mlutils.Vocabulary: UNK token,
    frequency-ordered id assignment, id_or_unk lookups."""

    UNK = "%UNK%"

    def __init__(self, add_unk: bool = True, add_pad: bool = False):
        self.token_to_id = {}
        self.id_to_token: List[str] = []
        if add_pad:
            self.add_or_get_id("%PAD%")
        if add_unk:
            self.add_or_get_id(self.UNK)

    @staticmethod
    def get_unk() -> str:
        return Vocabulary.UNK

    def add_or_get_id(self, token: str) -> int:
        if token in self.token_to_id:
            return self.token_to_id[token]
        idx = len(self.id_to_token)
        self.token_to_id[token] = idx
        self.id_to_token.append(token)
        return idx

    def is_unk(self, token: str) -> bool:
        return token not in self.token_to_id

    def get_id_or_unk(self, token: str) -> int:
        return self.token_to_id.get(token, self.token_to_id[self.UNK])

    def get_id_or_unk_multiple(
        self, tokens: Iterable[str], pad_to_size: Optional[int] = None, padding_element: int = 0
    ) -> List[int]:
        ids = [self.get_id_or_unk(t) for t in tokens]
        if pad_to_size is not None:
            ids = ids[:pad_to_size] + [padding_element] * (pad_to_size - len(ids))
        return ids

    def get_name_for_id(self, token_id: int) -> str:
        return self.id_to_token[token_id]

    def __len__(self) -> int:
        return len(self.id_to_token)

    @staticmethod
    def create_vocabulary(
        tokens: Counter, max_size: int, count_threshold: int = 5, add_unk: bool = True,
        add_pad: bool = False,
    ) -> "Vocabulary":
        vocab = Vocabulary(add_unk=add_unk, add_pad=add_pad)
        for token, count in tokens.most_common(max_size - len(vocab)):
            if count >= count_threshold:
                vocab.add_or_get_id(token)
        return vocab


class _Unavailable:
    """Inert stand-in: importable, fails loudly on use."""

    def __init__(self, *a, **k):
        raise NotImplementedError(f"{type(self).__name__} shim is not functional")


class BpeVocabulary(_Unavailable):
    pass


class CharTensorizer:
    """Functional subset of dpu_utils.mlutils.CharTensorizer (used by the
    reference's char embedder): fixed-size char-id tensorization."""

    def __init__(self, max_num_chars: int, lower_case_all: bool = False,
                 include_space: bool = False):
        self.__max_num_chars = max_num_chars
        self.__lower_case_all = lower_case_all
        chars = "abcdefghijklmnopqrstuvwxyz0123456789,;.!?:'\"/\\|_@#$%^&*~`+-=<>()[]{}"
        if not lower_case_all:
            chars += "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        if include_space:
            chars += " "
        self.__alphabet = chars
        self.__char_to_idx = {c: i + 2 for i, c in enumerate(chars)}  # 0=pad, 1=unk

    @property
    def max_char_length(self) -> int:
        return self.__max_num_chars

    def num_chars_in_vocabulary(self) -> int:
        return len(self.__alphabet) + 2

    def __get_char_idx(self, c: str) -> int:
        return self.__char_to_idx.get(c, 1)

    def tensorize_str(self, data: str):
        if self.__lower_case_all:
            data = data.lower()
        ids = [self.__get_char_idx(c) for c in data[: self.__max_num_chars]]
        ids += [0] * (self.__max_num_chars - len(ids))
        import numpy as np

        return np.asarray(ids, dtype=np.int64)


class RichPath(_Unavailable):
    @staticmethod
    def create(path, *a, **k):
        raise NotImplementedError("RichPath shim: feed data as python objects")


def run_and_debug(fn, debug: bool = False):
    fn()


def ThreadedIterator(iterable, max_queue_size: int = 100, enabled: bool = True):
    yield from iterable


def BufferedIterator(iterable, max_queue_size: int = 100, enabled: bool = True):
    yield from iterable


def shuffled_iterator(iterable, buffer_size: int = 5000):
    buffer = list(iterable)
    random.shuffle(buffer)
    yield from buffer


def split_identifier_into_parts(identifier: str) -> List[str]:
    """Split camelCase / snake_case identifiers (dpu_utils.codeutils)."""
    import re

    snake = identifier.replace("-", "_").split("_")
    parts: List[str] = []
    for chunk in snake:
        parts.extend(
            m.group(0)
            for m in re.finditer(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+", chunk)
        )
    return [p.lower() for p in parts if p] or [identifier]


def _make_dpu_utils_modules():
    root = types.ModuleType("dpu_utils")
    utils = types.ModuleType("dpu_utils.utils")
    iterators = types.ModuleType("dpu_utils.utils.iterators")
    mlutils = types.ModuleType("dpu_utils.mlutils")
    codeutils = types.ModuleType("dpu_utils.codeutils")

    iterators.ThreadedIterator = ThreadedIterator
    iterators.BufferedIterator = BufferedIterator
    iterators.shuffled_iterator = shuffled_iterator
    utils.iterators = iterators
    utils.RichPath = RichPath
    utils.run_and_debug = run_and_debug
    utils.ThreadedIterator = ThreadedIterator
    mlutils.Vocabulary = Vocabulary
    mlutils.BpeVocabulary = BpeVocabulary
    mlutils.CharTensorizer = CharTensorizer
    codeutils.split_identifier_into_parts = split_identifier_into_parts
    root.utils = utils
    root.mlutils = mlutils
    root.codeutils = codeutils
    return {
        "dpu_utils": root,
        "dpu_utils.utils": utils,
        "dpu_utils.utils.iterators": iterators,
        "dpu_utils.mlutils": mlutils,
        "dpu_utils.codeutils": codeutils,
    }


_installed = False


def install_reference_shims() -> None:
    """Idempotently register the fake packages and put /root/reference on
    sys.path so ``import ptgnn`` resolves to the reference."""
    global _installed
    if _installed:
        return
    ts, comp = _make_torch_scatter_module()
    sys.modules.setdefault("torch_scatter", ts)
    sys.modules.setdefault("torch_scatter.composite", comp)
    for name, mod in _make_dpu_utils_modules().items():
        sys.modules.setdefault(name, mod)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # py3.12 typing enforces Generic arity; the reference (written for
    # py3.6-3.8) under-parameterizes in several places (e.g. ppi.py:66
    # `TensorizedGraphData[np.ndarray]`, graph2class.py's 2-arg
    # `GraphNeuralNetworkModel`). Disable the arity check — parity tests
    # don't rely on typing introspection.
    import typing
    import typing_extensions

    typing_extensions._check_generic = lambda *a, **k: None
    if hasattr(typing, "_check_generic"):
        typing._check_generic = lambda *a, **k: None
    # abstractneuralmodel.py:84 does isinstance(x, (..., NamedTuple)) which
    # py3.12 rejects (typing.NamedTuple is not a type). Rebind the module
    # global to plain tuple — same effect for model_definition's purposes.
    import ptgnn.baseneuralmodel.abstractneuralmodel as _anm

    if getattr(_anm, "NamedTuple", None) is typing.NamedTuple:
        _anm.NamedTuple = tuple
    # torch >= 2.6 defaults weights_only=True; the reference pickles whole
    # model objects (abstractneuralmodel.py:155-163), so restore needs the
    # legacy behavior inside this test process.
    _orig_load = torch.load

    def _load(*args, **kwargs):
        kwargs.setdefault("weights_only", False)
        return _orig_load(*args, **kwargs)

    torch.load = _load
    _installed = True
