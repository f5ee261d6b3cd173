"""Variable-sized set -> summary representation reductions.

TPU-native re-design of the reference's reduceops
(ptgnn/neuralmodels/reduceops/varsizedsummary.py:11-178): every reduce is a
masked segment op over a statically shaped, padded element array, so the same
compiled program handles any mix of set sizes. The softmax-weighted variants
build on ``segment_log_softmax`` (eps=0 semantics: empty sets produce zero
summaries, impossible elements are excluded exactly via -inf).

``num_samples`` is a static Python int (the padded sample budget); ``mask``
marks valid elements. The reference's
``NormalizedWeightsVarSizedElementReduce`` contains a latent bug (it scatters
by ``num_samples`` instead of the sample map, varsizedsummary.py:61, unused
by any task); this implementation uses the evidently intended semantics.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ptgnn_tpu.nn import initializers as init
from ptgnn_tpu.nn.layers import Linear
from ptgnn_tpu.nn.module import Module, Params
from ptgnn_tpu.ops.segment import (
    segment_count,
    segment_log_softmax,
    segment_max,
    segment_min,
    segment_reduce,
    segment_sum,
)


class ElementsToSummaryRepresentationInput(NamedTuple):
    """Input to AbstractVarSizedElementReduce layers
    (reference: varsizedsummary.py:11-17), plus an explicit validity mask.

    ``shard_axis``: mesh axis name when the element rows are PARTITIONED
    across shards (node-sharded batches hand each shard its local rows).
    Every in-repo reduce then computes its per-sample summaries with one
    collective per reduction (psum / differentiable pmax) instead of a
    gathered element table — the result is replicated across the axis and
    identical (up to f32 reassociation) to the unsharded computation.
    """

    element_embeddings: Any  # [num_elements, D] float
    element_to_sample_map: Any  # [num_elements] int32 in [0, num_samples)
    num_samples: int  # static padded sample budget
    mask: Optional[Any] = None  # [num_elements] bool; None -> all valid
    shard_axis: Any = None  # mesh axis name or None


class AbstractVarSizedElementReduce(Module):
    """Summary representations from multiple variable-sized sets
    (reference: varsizedsummary.py:20-24)."""

    # Every in-repo reduce honors inputs.shard_axis (distributed summaries);
    # external subclasses that predate the field keep the all_gather path in
    # graph/messagepassing/global_exchange.py.
    supports_sharded_inputs: bool = True

    def apply(self, params: Params, inputs: ElementsToSummaryRepresentationInput) -> jax.Array:
        """Returns [num_samples, D'] summaries."""
        raise NotImplementedError


def _sharded_segment_reduce(
    data: jax.Array,
    sample_map: jax.Array,
    num_samples: int,
    reduction: str,
    mask: Optional[jax.Array],
    axis,
) -> jax.Array:
    """Per-sample reduce over shard-partitioned element rows: local segment
    reduce + one collective. Extremum gradients tie-split per shard then
    across shards (the composition parallel/edge_sharding.py uses)."""
    if axis is None:
        return segment_reduce(data, sample_map, num_samples, reduction, mask=mask)
    if reduction in ("sum", "add"):
        return jax.lax.psum(
            segment_sum(data, sample_map, num_samples, mask), axis
        )
    if reduction == "mean":
        total = jax.lax.psum(
            segment_sum(data, sample_map, num_samples, mask), axis
        )
        cnt = jax.lax.psum(
            segment_count(sample_map, num_samples, mask, dtype=jnp.float32), axis
        )
        cnt = jnp.maximum(cnt, 1.0)
        return total / cnt.reshape(cnt.shape + (1,) * (total.ndim - cnt.ndim)).astype(
            total.dtype
        )
    assert reduction in ("max", "min"), reduction
    from ptgnn_tpu.parallel.edge_sharding import _allreduce_extremum

    local_fn = segment_max if reduction == "max" else segment_min
    # neutral fill locally (empty_fill=None) so shards with no elements of a
    # sample never win the cross-shard extremum; empties fill 0 globally
    # (the single-device empty_fill=0 torch-scatter semantics).
    local = local_fn(data, sample_map, num_samples, mask, empty_fill=None)
    out = _allreduce_extremum(
        local.astype(jnp.float32), axis, reduction == "max"
    )
    cnt = jax.lax.psum(segment_count(sample_map, num_samples, mask), axis)
    cnt = cnt.reshape(cnt.shape + (1,) * (out.ndim - cnt.ndim))
    return jnp.where(cnt > 0, out, jnp.zeros((), out.dtype)).astype(data.dtype)


def _sharded_segment_log_softmax(
    scores: jax.Array,
    sample_map: jax.Array,
    num_samples: int,
    mask: Optional[jax.Array],
    axis,
) -> jax.Array:
    """segment_log_softmax over shard-partitioned rows: global shift via
    pmax (stop-gradient, like the local shift), global denominator via
    psum; element terms stay local. Mirrors ops/segment.py's guards."""
    if axis is None:
        return segment_log_softmax(scores, sample_map, num_samples, mask)
    from ptgnn_tpu.parallel.edge_sharding import _allreduce_extremum

    data = scores.astype(jnp.float32) if scores.dtype == jnp.bfloat16 else scores
    local_max = segment_max(data, sample_map, num_samples, mask, empty_fill=None)
    # raw lax.pmax has no differentiation rule; the custom-VJP collective
    # traces cleanly and the shift is stop-gradient anyway.
    shift = _allreduce_extremum(
        jax.lax.stop_gradient(local_max).astype(jnp.float32), axis, True
    ).astype(data.dtype)
    shift = jnp.where(jnp.isfinite(shift), shift, jnp.zeros((), data.dtype))
    shift = jax.lax.stop_gradient(shift)
    shifted = data - jnp.take(
        shift, sample_map, axis=0, mode="fill", fill_value=0.0
    )
    expd = jnp.where(jnp.isnan(shifted), jnp.zeros((), data.dtype), jnp.exp(shifted))
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (expd.ndim - mask.ndim))
        expd = jnp.where(m, expd, jnp.zeros((), data.dtype))
    denom = jax.lax.psum(
        segment_sum(expd, sample_map, num_samples), axis
    )
    nonempty = denom > 0
    log_denom = jnp.where(
        nonempty,
        jnp.log(jnp.where(nonempty, denom, jnp.ones((), denom.dtype))),
        jnp.full((), -jnp.inf, denom.dtype),
    )
    lse = log_denom + shift
    lse_safe = jnp.where(jnp.isfinite(lse), lse, jnp.zeros((), lse.dtype))
    out = data - jnp.take(lse_safe, sample_map, axis=0, mode="fill", fill_value=0.0)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (out.ndim - mask.ndim))
        out = jnp.where(m, out, jnp.full((), -jnp.inf, out.dtype))
    return out.astype(scores.dtype)


class SimpleVarSizedElementReduce(AbstractVarSizedElementReduce):
    """sum/mean/max/min per set (reference: varsizedsummary.py:28-41)."""

    def __init__(self, summarization_type: str):
        assert summarization_type in {"sum", "mean", "max", "min"}
        self.summarization_type = summarization_type

    def init(self, key: jax.Array) -> Params:
        del key
        return {}

    def apply(self, params: Params, inputs: ElementsToSummaryRepresentationInput) -> jax.Array:
        del params
        return _sharded_segment_reduce(
            inputs.element_embeddings,
            inputs.element_to_sample_map,
            inputs.num_samples,
            self.summarization_type,
            inputs.mask,
            inputs.shard_axis,
        )


def _attention_weighted_sum(
    scores: jax.Array,
    values: jax.Array,
    sample_map: jax.Array,
    num_samples: int,
    mask: Optional[jax.Array],
    shard_axis=None,
) -> jax.Array:
    """softmax(scores) within each set, then weighted sum of values.

    scores may be [E] or [E, H] (multi-head); values [E, ...] broadcastable.
    Empty sets yield zero rows (exp(-inf) == 0 under eps=0 semantics).
    """
    logp = _sharded_segment_log_softmax(
        scores, sample_map, num_samples, mask, shard_axis
    )
    probs = jnp.exp(logp)  # -inf -> 0 for masked / impossible elements
    weighted = values * probs.reshape(probs.shape + (1,) * (values.ndim - probs.ndim))
    return _sharded_segment_reduce(
        weighted, sample_map, num_samples, "sum", mask, shard_axis
    )


class NormalizedWeightsVarSizedElementReduce(AbstractVarSizedElementReduce):
    """Softmax-attention weighted sum (reference: varsizedsummary.py:44-64,
    with the scatter-index bug fixed as intended)."""

    def __init__(self, input_representation_size: int, output_representation_size: int):
        self.attention_layer = Linear(
            input_representation_size, 1, use_bias=False, weight_init=init.xavier_uniform()
        )
        self.output_layer = Linear(
            input_representation_size,
            output_representation_size,
            use_bias=False,
            weight_init=init.xavier_uniform(),
        )

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        return {"attention": self.attention_layer.init(k1), "output": self.output_layer.init(k2)}

    def apply(self, params: Params, inputs: ElementsToSummaryRepresentationInput) -> jax.Array:
        scores = self.attention_layer.apply(params["attention"], inputs.element_embeddings)
        values = self.output_layer.apply(params["output"], inputs.element_embeddings)
        return _attention_weighted_sum(
            scores[..., 0], values, inputs.element_to_sample_map,
            inputs.num_samples, inputs.mask, inputs.shard_axis,
        )


class WeightedSumVarSizedElementReduce(AbstractVarSizedElementReduce):
    """Sigmoid-gated sum (reference: varsizedsummary.py:67-81)."""

    def __init__(self, representation_size: int):
        self.weights_layer = Linear(
            representation_size, 1, use_bias=False, weight_init=init.xavier_uniform()
        )

    def init(self, key: jax.Array) -> Params:
        return {"weights": self.weights_layer.init(key)}

    def apply(self, params: Params, inputs: ElementsToSummaryRepresentationInput) -> jax.Array:
        gates = jax.nn.sigmoid(
            self.weights_layer.apply(params["weights"], inputs.element_embeddings)
        )
        return _sharded_segment_reduce(
            inputs.element_embeddings * gates,
            inputs.element_to_sample_map,
            inputs.num_samples,
            "sum",
            inputs.mask,
            inputs.shard_axis,
        )


class SelfAttentionVarSizedElementReduce(AbstractVarSizedElementReduce):
    """Single-head attention with a learned per-set query produced by another
    reduce (reference: varsizedsummary.py:84-113)."""

    def __init__(
        self,
        input_representation_size: int,
        hidden_size: int,
        output_representation_size: int,
        query_representation_summarizer: AbstractVarSizedElementReduce,
    ):
        self.query_layer = query_representation_summarizer
        self.key_layer = Linear(
            input_representation_size, hidden_size, use_bias=False,
            weight_init=init.xavier_uniform(),
        )
        self.output_layer = Linear(
            input_representation_size, output_representation_size, use_bias=False,
            weight_init=init.xavier_uniform(),
        )

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "query": self.query_layer.init(k1),
            "key": self.key_layer.init(k2),
            "output": self.output_layer.init(k3),
        }

    def apply(self, params: Params, inputs: ElementsToSummaryRepresentationInput) -> jax.Array:
        queries = self.query_layer.apply(params["query"], inputs)  # [S, H]
        # Padding elements carry out-of-range sample ids; fill with 0 (their
        # scores are masked out) — jnp.take's default OOB fill is NaN.
        queries_all = jnp.take(
            queries, inputs.element_to_sample_map, axis=0, mode="fill", fill_value=0.0
        )  # [E, H]
        keys = self.key_layer.apply(params["key"], inputs.element_embeddings)  # [E, H]
        scores = jnp.sum(queries_all * keys, axis=-1)  # [E]
        values = self.output_layer.apply(params["output"], inputs.element_embeddings)
        return _attention_weighted_sum(
            scores, values, inputs.element_to_sample_map,
            inputs.num_samples, inputs.mask, inputs.shard_axis,
        )


class MultiheadSelfAttentionVarSizedElementReduce(AbstractVarSizedElementReduce):
    """Multi-head attention reduce with optional value projection
    (reference: varsizedsummary.py:116-178)."""

    def __init__(
        self,
        input_representation_size: int,
        hidden_size: int,
        output_representation_size: int,
        num_heads: int,
        query_representation_summarizer: AbstractVarSizedElementReduce,
        use_value_layer: bool = False,
    ):
        assert hidden_size % num_heads == 0, "Hidden size must be divisible by the number of heads."
        self.num_heads = num_heads
        self.use_value_layer = use_value_layer
        self.query_layer = query_representation_summarizer
        self.key_layer = Linear(
            input_representation_size, hidden_size, use_bias=False,
            weight_init=init.xavier_uniform(),
        )
        if use_value_layer:
            self.value_layer = Linear(
                input_representation_size, hidden_size, use_bias=False,
                weight_init=init.xavier_uniform(),
            )
            self.output_layer = Linear(
                hidden_size, output_representation_size, use_bias=False,
                weight_init=init.xavier_uniform(),
            )
        else:
            self.output_layer = Linear(
                input_representation_size * num_heads,
                output_representation_size,
                use_bias=False,
                weight_init=init.xavier_uniform(),
            )

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params: Params = {
            "query": self.query_layer.init(k1),
            "key": self.key_layer.init(k2),
            "output": self.output_layer.init(k3),
        }
        if self.use_value_layer:
            params["value"] = self.value_layer.init(k4)
        return params

    def apply(self, params: Params, inputs: ElementsToSummaryRepresentationInput) -> jax.Array:
        h = self.num_heads
        queries = self.query_layer.apply(params["query"], inputs)  # [S, H]
        q_el = jnp.take(
            queries, inputs.element_to_sample_map, axis=0, mode="fill", fill_value=0.0
        )  # [E, H]
        q_el = q_el.reshape(q_el.shape[0], h, -1)  # [E, h, H/h]
        keys = self.key_layer.apply(params["key"], inputs.element_embeddings)
        keys = keys.reshape(keys.shape[0], h, -1)  # [E, h, H/h]
        scores = jnp.sum(q_el * keys, axis=-1) / math.sqrt(keys.shape[-1])  # [E, h]

        logp = _sharded_segment_log_softmax(
            scores, inputs.element_to_sample_map, inputs.num_samples,
            inputs.mask, inputs.shard_axis,
        )
        probs = jnp.exp(logp)  # [E, h]

        if self.use_value_layer:
            values = self.value_layer.apply(params["value"], inputs.element_embeddings)
            values = values.reshape(values.shape[0], h, -1)  # [E, h, H/h]
            outputs = probs[..., None] * values
        else:
            outputs = probs[..., None] * inputs.element_embeddings[:, None, :]  # [E, h, D]
        outputs = outputs.reshape(outputs.shape[0], -1)  # [E, h * D']
        per_sample = _sharded_segment_reduce(
            outputs, inputs.element_to_sample_map, inputs.num_samples,
            "sum", inputs.mask, inputs.shard_axis,
        )
        return self.output_layer.apply(params["output"], per_sample)
