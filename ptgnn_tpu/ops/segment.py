"""Segment (scatter) reductions with torch-scatter-compatible semantics.

These are the TPU-native replacement for the reference's only native
dependency, the torch-scatter CUDA kernels (reference:
ptgnn/neuralmodels/gnn/messagepassing/abstractmessagepassing.py:38-50,
ptgnn/neuralmodels/reduceops/varsizedsummary.py:7,
ptgnn/neuralmodels/sequence/grucopydecoder.py:9-10). Semantics matched:

* every reduction returns 0 for segments that receive no elements
  (torch-scatter initializes outputs with zeros / masked-fills untouched
  entries), EXCEPT ``segment_logsumexp`` which returns -inf for empty
  segments (eps=0 semantics, relied upon by the copy-decoder loss);
* ``segment_mean`` divides by max(count, 1);
* low-precision inputs (bf16/f16) are accumulated in float32 and cast back,
  mirroring the reference's AMP-safety cast.

All ops take a ``num_segments`` static int (XLA needs static shapes) and an
optional boolean ``mask`` marking valid elements: padding edges/nodes in our
statically shaped batches are simply masked out here, which is how ragged
graphs become XLA-friendly. Out-of-range segment ids (>= num_segments) are
dropped, so padding can alternatively point at segment id ``num_segments``.

XLA's gather/scatter lowers these well on TPU already; the Pallas
sorted-segment kernels in ``ptgnn_tpu.ops.pallas`` are the performance path
for the hot message-aggregation case and are verified against these.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_LOW_PRECISION = (jnp.bfloat16, jnp.float16)


def _expand_mask(mask: jax.Array, data: jax.Array) -> jax.Array:
    """Broadcast a [E] bool mask against [E, ...] data."""
    extra = data.ndim - mask.ndim
    if extra > 0:
        mask = mask.reshape(mask.shape + (1,) * extra)
    return mask


def _promote(data: jax.Array):
    if data.dtype in _LOW_PRECISION:
        return data.astype(jnp.float32), data.dtype
    return data, None


def _use_matmul_segment_sum(data: jax.Array, num_segments: int) -> bool:
    """Few-segment sums of large arrays route through a one-hot matmul on
    TPU: XLA's scatter-add runs at ~125 GB/s on the v5e for the decoder's
    [M, T, H] copy-attention sums while the MXU streams the same reduction
    at dense bandwidth (round-5 graph2seq profile: 5.8 ms/step of
    scatter-add at 32 calls). The one-hot contraction runs at HIGHEST
    precision, so f32 products are exact and only accumulation order
    differs from the scatter. Large segment counts (node aggregation) keep
    the scatter/Pallas routes. Override: PTGNN_TPU_SEGSUM_MATMUL=0/1."""
    import os

    override = os.environ.get("PTGNN_TPU_SEGSUM_MATMUL")
    if override is not None:
        return override not in ("0", "false", "")
    if jax.default_backend() != "tpu":
        return False
    rows = data.shape[0]
    # rows >= 4096: relaxing to 256 (to catch small per-tile dW sums) was
    # A/B'd neutral on every task — keep the gate where the wins are
    # demonstrated.
    return num_segments <= 128 and rows >= 4096 and data.size >= 32768


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    data, orig = _promote(data)
    if jnp.issubdtype(data.dtype, jnp.floating) and _use_matmul_segment_sum(
        data, num_segments
    ):
        onehot = segment_ids[None, :] == jnp.arange(
            num_segments, dtype=segment_ids.dtype
        )[:, None]  # [S, R]; out-of-range ids (padding) match no row
        if mask is not None:
            onehot = jnp.logical_and(onehot, mask[None, :])
        flat = data.reshape(data.shape[0], -1)
        out = jax.lax.dot_general(
            onehot.astype(data.dtype),
            flat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=data.dtype,
        ).reshape((num_segments,) + data.shape[1:])
    else:
        if mask is not None:
            data = jnp.where(
                _expand_mask(mask, data), data, jnp.zeros((), data.dtype)
            )
        out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    return out.astype(orig) if orig is not None else out


def segment_count(
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    dtype=jnp.int32,
) -> jax.Array:
    # Counts ride the routed segment_sum (f32 is exact for any padded row
    # count) so few-segment counting also takes the one-hot matmul on TPU.
    ones = jnp.ones(segment_ids.shape, jnp.float32)
    if mask is not None:
        ones = jnp.where(mask, ones, jnp.zeros((), jnp.float32))
    return segment_sum(ones, segment_ids, num_segments).astype(dtype)


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    data, orig = _promote(data)
    total = segment_sum(data, segment_ids, num_segments, mask)
    count = segment_count(segment_ids, num_segments, mask, dtype=data.dtype)
    count = jnp.maximum(count, jnp.ones((), data.dtype))
    out = total / count.reshape(count.shape + (1,) * (total.ndim - count.ndim))
    return out.astype(orig) if orig is not None else out


def _segment_extremum(data, segment_ids, num_segments, mask, kind: str, empty_fill):
    work = data.astype(jnp.float32) if data.dtype in _LOW_PRECISION else data
    if jnp.issubdtype(work.dtype, jnp.integer):
        info = jnp.iinfo(work.dtype)
        neutral = info.min if kind == "max" else info.max
    else:
        neutral = -jnp.inf if kind == "max" else jnp.inf
    # segment_max/min's VJP splits the cotangent among tied maxima; a segment
    # referenced only through clamped out-of-range padding ids has tie count
    # 0 -> 0/0 NaN in the backward pass. Route out-of-range ids to segment 0
    # with the neutral element instead (forward-identical: neutral never wins
    # against a real element, and all-padding segments hit ``empty_fill``).
    in_range = segment_ids < num_segments
    if mask is not None:
        eff_mask = jnp.logical_and(mask, in_range)
    else:
        eff_mask = in_range
    segment_ids = jnp.where(in_range, segment_ids, 0)
    work = jnp.where(_expand_mask(eff_mask, work), work, jnp.full((), neutral, work.dtype))
    mask = eff_mask  # for the empty-segment count below
    if kind == "max":
        out = jax.ops.segment_max(work, segment_ids, num_segments=num_segments)
    else:
        out = jax.ops.segment_min(work, segment_ids, num_segments=num_segments)
    if empty_fill is not None:
        count = segment_count(segment_ids, num_segments, mask)
        fill = jnp.full((), empty_fill, out.dtype)
        cnt = count.reshape(count.shape + (1,) * (out.ndim - count.ndim))
        out = jnp.where(cnt > 0, out, fill)
    return out.astype(data.dtype)


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    empty_fill: Optional[float] = 0.0,
) -> jax.Array:
    """Per-segment max; empty segments get ``empty_fill`` (torch-scatter: 0)."""
    return _segment_extremum(data, segment_ids, num_segments, mask, "max", empty_fill)


def segment_min(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    empty_fill: Optional[float] = 0.0,
) -> jax.Array:
    return _segment_extremum(data, segment_ids, num_segments, mask, "min", empty_fill)


def segment_reduce(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    reduction: str,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Generic entry point mirroring torch_scatter.scatter(reduce=...)."""
    if reduction == "sum" or reduction == "add":
        return segment_sum(data, segment_ids, num_segments, mask)
    if reduction == "mean":
        return segment_mean(data, segment_ids, num_segments, mask)
    if reduction == "max":
        return segment_max(data, segment_ids, num_segments, mask)
    if reduction == "min":
        return segment_min(data, segment_ids, num_segments, mask)
    raise ValueError(f"Unknown reduction '{reduction}'")


def segment_logsumexp(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Numerically stable per-segment logsumexp; empty segments -> -inf.

    Matches torch_scatter.composite.scatter_logsumexp with eps=0, which the
    reference copy decoder relies on to exclude impossible copy actions
    (reference: ptgnn/neuralmodels/sequence/grucopydecoder.py:122-124,190-196).
    Inputs equal to -inf (impossible actions) are handled exactly.
    """
    data, orig = _promote(data)
    # Finite shift: empty/all -inf segments get shift 0.
    shift = _segment_extremum(data, segment_ids, num_segments, mask, "max", 0.0)
    shift = jnp.where(jnp.isfinite(shift), shift, jnp.zeros((), data.dtype))
    shift = jax.lax.stop_gradient(shift)
    shifted = data - shift[segment_ids]
    # exp(-inf - 0) = 0 handles -inf scores; guard NaN from (-inf) - (-inf).
    expd = jnp.where(jnp.isnan(shifted), jnp.zeros((), data.dtype), jnp.exp(shifted))
    if mask is not None:
        expd = jnp.where(_expand_mask(mask, expd), expd, jnp.zeros((), data.dtype))
    # routed: few-segment denominators (decoder copy marginalization) take
    # the one-hot matmul instead of scatter-add on TPU
    denom = segment_sum(expd, segment_ids, num_segments)
    # Empty / all -inf segments: forward must be -inf, but log(0)'s backward
    # is inf * 0 = NaN; the double-where keeps gradients zero on that path.
    nonempty = denom > 0
    log_denom = jnp.where(
        nonempty,
        jnp.log(jnp.where(nonempty, denom, jnp.ones((), denom.dtype))),
        jnp.full((), -jnp.inf, denom.dtype),
    )
    out = log_denom + shift
    return out.astype(orig) if orig is not None else out


def segment_log_softmax(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-segment log-softmax (torch_scatter scatter_log_softmax, eps=0).

    Masked-out entries return -inf.
    """
    data, orig = _promote(data)
    lse = segment_logsumexp(data, segment_ids, num_segments, mask)
    # Elements whose gathered lse is -inf (fully masked / out-of-range padding
    # segments) are themselves masked; use a finite stand-in so no ±inf
    # intermediate leaks NaNs into the backward pass.
    lse_safe = jnp.where(jnp.isfinite(lse), lse, jnp.zeros((), lse.dtype))
    out = data - jnp.take(lse_safe, segment_ids, axis=0, mode="fill", fill_value=0.0)
    if mask is not None:
        out = jnp.where(
            _expand_mask(mask, out), out, jnp.full((), -jnp.inf, out.dtype)
        )
    return out.astype(orig) if orig is not None else out


def segment_softmax(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    out = jnp.exp(segment_log_softmax(data, segment_ids, num_segments, mask))
    if mask is not None:
        out = jnp.where(_expand_mask(mask, out), out, jnp.zeros((), out.dtype))
    return out


def segment_argmax(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Index (into ``data``) of the per-segment max; empty segments -> len(data).

    Matches torch_scatter.scatter_max's argmax output enough for the
    reference's accuracy metrics (ties resolve to the first occurrence).
    1D data only.
    """
    assert data.ndim == 1
    n = data.shape[0]
    maxes = segment_max(data, segment_ids, num_segments, mask, empty_fill=None)
    is_max = data == maxes[segment_ids]
    if mask is not None:
        is_max = jnp.logical_and(is_max, mask)
    idxs = jnp.where(is_max, jnp.arange(n, dtype=jnp.int32), jnp.full((), n, jnp.int32))
    return segment_min(idxs, segment_ids, num_segments, mask=None, empty_fill=n)
