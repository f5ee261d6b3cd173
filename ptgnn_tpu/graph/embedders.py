"""Node embedders: float features and string labels (token/subtoken/bpe/char).

Mirrors the reference's embedding models
(embeddings/linearmapembedding.py, embeddings/strelementrepresentationmodel.py)
with statically padded minibatches: every finalize takes ``pad_to`` (the node
budget) and the subtoken width is the static ``max_num_subtokens`` rather than
the per-batch max.
"""
from __future__ import annotations

import logging
from collections import Counter
from typing import Any, Dict, List, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ptgnn_tpu.core.model import AbstractNeuralModel
from ptgnn_tpu.graph.structs import AbstractNodeEmbedder
from ptgnn_tpu.nn import initializers as init
from ptgnn_tpu.nn.layers import Conv1d, Embedding, Linear, dropout, get_activation
from ptgnn_tpu.nn.module import Module, Params
from ptgnn_tpu.utils.text import BpeVocabulary, CharTensorizer, Vocabulary, split_identifier_into_parts

LOGGER = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Float-feature embedder (PPI)
# ---------------------------------------------------------------------------


class LinearFeatureEmbedder(Module):
    """Single bias-free xavier linear + optional activation
    (reference: linearmapembedding.py:13-29)."""

    def __init__(self, input_element_size: int, output_embedding_size: int, activation=None):
        self.linear = Linear(
            input_element_size,
            output_embedding_size,
            use_bias=False,
            weight_init=init.xavier_uniform(),
        )
        self.activation = get_activation(activation) if activation is not None else None

    def init(self, key: jax.Array) -> Params:
        return {"linear": self.linear.init(key)}

    def apply(self, params: Params, features, *, train: bool = False, rng=None):
        out = self.linear.apply(params["linear"], features)
        if self.activation is not None:
            out = self.activation(out)
        return out


class FeatureRepresentationModel(AbstractNeuralModel, AbstractNodeEmbedder):
    """Node embedder for fixed-size float vectors
    (reference: linearmapembedding.py:32-90)."""

    def __init__(self, *, embedding_size: int = 64, activation=None):
        super().__init__()
        self.embedding_size = embedding_size
        self.__activation = activation

    def representation_size(self) -> int:
        return self.embedding_size

    def initialize_metadata(self) -> None:
        self.__num_input_features: Optional[int] = None

    def update_metadata_from(self, datapoint: np.ndarray) -> None:
        if self.__num_input_features is None:
            self.__num_input_features = datapoint.shape[0]
        else:
            assert self.__num_input_features == datapoint.shape[0], (
                "All samples should have the same number of features."
            )

    def build_neural_module(self) -> LinearFeatureEmbedder:
        assert self.__num_input_features is not None
        return LinearFeatureEmbedder(
            input_element_size=self.__num_input_features,
            output_embedding_size=self.embedding_size,
            activation=self.__activation,
        )

    def tensorize(self, datapoint: np.ndarray) -> np.ndarray:
        return datapoint

    def initialize_minibatch(self) -> Dict[str, Any]:
        return {"features": []}

    def extend_minibatch_with(self, tensorized_datapoint, partial_minibatch) -> bool:
        partial_minibatch["features"].append(tensorized_datapoint)
        return True

    def finalize_minibatch(self, accumulated_minibatch_data, pad_to: Optional[int] = None):
        feats = np.asarray(accumulated_minibatch_data["features"], dtype=np.float32)
        if feats.ndim == 1:
            # Empty minibatch (e.g. the distributed trainer's fully masked
            # padding batches): np.asarray([]) is 1-D; the feature width is
            # known from metadata.
            assert len(feats) == 0
            width = self.__num_input_features
            assert width is not None, "metadata not computed"
            feats = feats.reshape(0, width)
        if pad_to is not None:
            padded = np.zeros((pad_to, feats.shape[1]), np.float32)
            padded[: len(feats)] = feats
            feats = padded
        return {"features": feats}


# ---------------------------------------------------------------------------
# String-label embedders
# ---------------------------------------------------------------------------


class TokenUnitEmbedder(Module):
    """Plain embedding + dropout (reference: strelementrepresentationmodel.py:16-30)."""

    def __init__(self, vocabulary_size: int, embedding_size: int, dropout_rate: float):
        self.embeddings = Embedding(
            vocabulary_size, embedding_size, weight_init=init.xavier_uniform()
        )
        self.dropout_rate = dropout_rate

    def init(self, key: jax.Array) -> Params:
        return {"embeddings": self.embeddings.init(key)}

    def apply(self, params: Params, token_idxs, *, train: bool = False, rng=None):
        return dropout(rng, self.embeddings.apply(params["embeddings"], token_idxs),
                       self.dropout_rate, train)


class SubtokenUnitEmbedder(Module):
    """Subtoken embedding with masked mean/sum/max pooling + optional dense
    (reference: strelementrepresentationmodel.py:33-89)."""

    def __init__(
        self,
        vocabulary_size: int,
        embedding_size: int,
        dropout_rate: float,
        subtoken_combination_kind: str,
        use_dense_output: bool = True,
    ):
        assert subtoken_combination_kind in {"mean", "max", "sum"}
        self.combination = subtoken_combination_kind
        self.embeddings = Embedding(vocabulary_size, embedding_size, weight_init=init.uniform())
        self.out_layer = (
            Linear(embedding_size, embedding_size, use_bias=False, weight_init=init.xavier_uniform())
            if use_dense_output
            else None
        )
        self.dropout_rate = dropout_rate

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        params: Params = {"embeddings": self.embeddings.init(k1)}
        if self.out_layer is not None:
            params["out_layer"] = self.out_layer.init(k2)
        return params

    def apply(self, params: Params, token_idxs, lengths, *, train: bool = False, rng=None):
        """token_idxs: [B, max_subtok]; lengths: [B] -> [B, D]."""
        embedded = self.embeddings.apply(params["embeddings"], token_idxs)  # [B, S, D]
        mask = jnp.arange(embedded.shape[1])[None, :] < lengths[:, None]  # [B, S]
        maskf = mask[..., None].astype(embedded.dtype)
        if self.combination == "mean":
            summed = (embedded * maskf).sum(axis=-2)
            out = summed / (lengths[:, None].astype(embedded.dtype) + 1e-10)
        elif self.combination == "sum":
            out = (embedded * maskf).sum(axis=-2)
        else:  # max
            filled = jnp.where(mask[..., None], embedded, jnp.full((), -jnp.inf, embedded.dtype))
            out = filled.max(axis=-2)
            # zero-length rows (padding nodes) would be -inf
            out = jnp.where(lengths[:, None] > 0, out, jnp.zeros((), embedded.dtype))
        if self.out_layer is not None:
            out = self.out_layer.apply(params["out_layer"], out)
        return dropout(rng, out, self.dropout_rate, train)


class CnnConfig(NamedTuple):
    l1_filters: int
    l1_window_size: int
    l2_filters: int
    l2_window_size: int
    lout_window_size: int


class CharUnitEmbedder(Module):
    """3-layer char CNN over one-hot chars, max-pool summary
    (reference: strelementrepresentationmodel.py:100-142)."""

    def __init__(self, num_chars: int, embedding_size: int, config: CnnConfig, dropout_rate: float = 0.0):
        self.num_chars = num_chars
        self.conv1 = Conv1d(num_chars, config.l1_filters, config.l1_window_size)
        self.conv2 = Conv1d(config.l1_filters, config.l2_filters, config.l2_window_size)
        self.conv3 = Conv1d(config.l2_filters, embedding_size, config.lout_window_size, use_bias=False)
        self.dropout_rate = dropout_rate

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        return {"conv1": self.conv1.init(k1), "conv2": self.conv2.init(k2), "conv3": self.conv3.init(k3)}

    def apply(self, params: Params, chars, *, train: bool = False, rng=None):
        """chars: [B, max_num_chars] int -> [B, D]."""
        one_hot = jax.nn.one_hot(chars, self.num_chars, dtype=jnp.float32)  # [B, L, C]
        x = jnp.swapaxes(one_hot, 1, 2)  # [B, C, L]
        x = self.conv1.apply(params["conv1"], x)
        x = self.conv2.apply(params["conv2"], jax.nn.relu(x))
        x = self.conv3.apply(params["conv3"], jax.nn.relu(x))  # [B, D, L']
        summary = x.max(axis=-1)
        return dropout(rng, summary, self.dropout_rate, train)


class StrElementRepresentationModel(AbstractNeuralModel, AbstractNodeEmbedder):
    """String node-label embedder with token/subtoken/bpe/char splitting
    (reference: strelementrepresentationmodel.py:145-335)."""

    def __init__(
        self,
        *,
        token_splitting: str,
        embedding_size: int = 128,
        dropout_rate: float = 0.2,
        vocabulary_size: int = 10000,
        min_freq_threshold: int = 5,
        max_num_subtokens: Optional[int] = 5,
        subtoken_combination: str = "sum",
        cnn_config: CnnConfig = CnnConfig(256, 3, 128, 3, 3),
        max_num_chars: int = 15,
    ):
        super().__init__()
        assert token_splitting in {"token", "subtoken", "bpe", "char"}
        self._splitting_kind = token_splitting
        self.embedding_size = embedding_size
        self.dropout_rate = dropout_rate
        if token_splitting in {"bpe", "subtoken"}:
            self.max_num_subtokens = max_num_subtokens if max_num_subtokens is not None else 5
            self.subtoken_combination = subtoken_combination
        elif token_splitting == "char":
            self.cnn_config = cnn_config
            self.max_num_chars = max_num_chars
        if token_splitting != "char":
            self.max_vocabulary_size = vocabulary_size
            self.min_freq_threshold = min_freq_threshold

    def representation_size(self) -> int:
        return self.embedding_size

    @property
    def splitting_kind(self) -> str:
        return self._splitting_kind

    # ---- metadata ----
    def initialize_metadata(self) -> None:
        self.__tok_counter: Counter = Counter()

    def update_metadata_from(self, datapoint: str) -> None:
        if self.splitting_kind in {"token", "bpe"}:
            self.__tok_counter[datapoint] += 1
        elif self.splitting_kind == "subtoken":
            self.__tok_counter.update(split_identifier_into_parts(datapoint))
        elif self.splitting_kind == "char":
            pass

    def finalize_metadata(self) -> None:
        if self.splitting_kind in {"token", "subtoken"}:
            self.__vocabulary = Vocabulary.create_vocabulary(
                self.__tok_counter,
                max_size=self.max_vocabulary_size,
                count_threshold=self.min_freq_threshold,
            )
        elif self.splitting_kind == "bpe":
            self.__vocabulary = BpeVocabulary(self.max_vocabulary_size)
            self.__vocabulary.create_vocabulary(self.__tok_counter)
        else:  # char
            self.__vocabulary = CharTensorizer(
                max_num_chars=self.max_num_chars, lower_case_all=False, include_space=False
            )
        del self.__tok_counter

    @property
    def vocabulary(self) -> Union[Vocabulary, BpeVocabulary, CharTensorizer]:
        return self.__vocabulary

    def build_neural_module(self) -> Module:
        if self.splitting_kind == "token":
            return TokenUnitEmbedder(len(self.vocabulary), self.embedding_size, self.dropout_rate)
        if self.splitting_kind in {"bpe", "subtoken"}:
            return SubtokenUnitEmbedder(
                len(self.vocabulary),
                self.embedding_size,
                self.dropout_rate,
                self.subtoken_combination,
            )
        return CharUnitEmbedder(
            num_chars=self.vocabulary.num_chars_in_vocabulary(),
            embedding_size=self.embedding_size,
            config=self.cnn_config,
            dropout_rate=self.dropout_rate,
        )

    # ---- tensorization ----
    def tensorize(self, datapoint: str, return_str_rep: bool = False):
        str_repr = datapoint
        if self.splitting_kind == "token":
            token_idxs = self.vocabulary.get_id_or_unk(datapoint)
        elif self.splitting_kind == "subtoken":
            subtoks = split_identifier_into_parts(datapoint)
            if len(subtoks) == 0:
                subtoks = [Vocabulary.get_unk()]
            token_idxs = self.vocabulary.get_id_or_unk_multiple(subtoks)
        elif self.splitting_kind == "bpe":
            if len(datapoint) == 0:
                datapoint = "<empty>"
            token_idxs = self.vocabulary.get_id_or_unk_for_text(datapoint)
            if return_str_rep:
                str_repr = self.vocabulary.tokenize(datapoint)
        else:  # char
            token_idxs = self.vocabulary.tensorize_str(datapoint)
            if return_str_rep:
                str_repr = datapoint[: self.vocabulary.max_char_length]
        if return_str_rep:
            return token_idxs, str_repr
        return token_idxs

    # ---- minibatching ----
    def initialize_minibatch(self) -> Dict[str, Any]:
        return {"token_idxs": []}

    def extend_minibatch_with(self, tensorized_datapoint, partial_minibatch) -> bool:
        partial_minibatch["token_idxs"].append(tensorized_datapoint)
        return True

    def finalize_minibatch(self, accumulated_minibatch_data, pad_to: Optional[int] = None):
        items: List = accumulated_minibatch_data["token_idxs"]
        total = pad_to if pad_to is not None else len(items)
        if self.splitting_kind == "token":
            out = np.zeros(total, np.int32)
            out[: len(items)] = np.asarray(items, np.int32)
            return {"token_idxs": out}
        if self.splitting_kind in {"subtoken", "bpe"}:
            width = self.max_num_subtokens
            subtoken_idxs = np.zeros((total, width), np.int32)
            lengths = np.zeros(total, np.int32)
            for i, subtokens in enumerate(items):
                idxs = subtokens[:width]
                subtoken_idxs[i, : len(idxs)] = idxs
                lengths[i] = len(idxs)
            return {"token_idxs": subtoken_idxs, "lengths": lengths}
        # char
        width = self.max_num_chars
        chars = np.zeros((total, width), np.int32)
        if items:
            chars[: len(items)] = np.stack(items, axis=0)
        return {"chars": chars}
