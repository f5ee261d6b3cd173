"""Fused typed-message computation + aggregation with a scatter-free VJP.

The hot loop of every message-passing layer is

    gather source (and target) node states per edge
    -> per-edge-type linear message
    -> masked segment reduce to receivers.

Forward-mode, each piece is fast on TPU (small-table gathers, tile-batched
MXU matmuls, the sorted-segment Pallas kernel). The problem is the BACKWARD:
the VJP of the per-edge gathers is a scatter-add keyed by *senders*, which
XLA serializes (~8 ms per [400k, 64] on v5e) — it dominated the training
step twice per layer.

This op removes both scatters using the **materialized transpose edges**:
the batcher stores, for every edge (u -> v, t), its reverse (v -> u, t+T)
(self edges are their own transpose). The sender-keyed gradient

    d x[u] = sum over edges e with src(e) = u of d msg_input_src[e]

is re-derived by walking the SAME edge layout and treating each edge
e' = (v -> u, t') as the transpose carrier of e = (u -> v, tau(t')): every
quantity of e (its message, its routing weights, its dropout mask) is
recomputable from per-node arrays gathered through e''s own endpoints, so
the sum becomes a *receiver*-keyed aggregation — the fast kernel again.
The target-keyed gradient is directly a receiver-keyed aggregation.

Net effect: forward and backward are built exclusively from fast gathers,
tile matmuls, and the Pallas kernel; no [E, D] scatter or permutation ever
runs. The dropped-out per-edge input is saved as the one [E, Din] residual
(v5e profile: storing it is 5-6x cheaper than the two node-table gathers +
dropout hash/select that recomputing it costs); messages are never
materialized for the backward — they are reproduced bitwise by one tile
matmul where the extremum tie indicators need them. All node-table lookups
keyed on the same index vector ride one widened gather of a concatenated
table, because an [E, D] gather costs the same as [E, 2D] at D=64 (row
count dominates; lanes pad to 128).

Constraints (callers fall back to the plain path otherwise):
* single linear message function (bias-free; the reference's GGNN, EGC, and
  default MLP-MP configs);
* every edge's transpose present (``introduce_backwards_edges=True``);
* the edge mask is the batch's static mask (no runtime edge dropout).

Message-input dropout is keyed on the DIRECTED (src, dst, type) identity:
iid per directed edge (matching the reference's per-position iid semantics
up to duplicate parallel edges, which share masks), and reconstructible in
the transpose orientation from the carrier's own endpoints.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ptgnn_tpu.ops.pallas.segment_kernels import (
    adjacency_broadcast_to_edges,
    adjacency_segment_reduce,
    plan_from_adjacency,
    planned_segment_extremum_with_argmax,
)
from ptgnn_tpu.ops.typed_linear import typed_tile_matmul

_BIG = 3.0e38


def _hash_u32(x: jax.Array) -> jax.Array:
    """xorshift-multiply avalanche hash (uint32)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _directed_edge_key(src, dst, edge_type) -> jax.Array:
    """[E] uint32 key of a DIRECTED typed edge (u -> v, t).

    The dropout mask is keyed on this identity, making it iid per directed
    edge (the reference's per-position iid semantics up to duplicate
    (u, v, t) edges, which share masks). Crucially the key is computable in
    BOTH orientations: when slot e\' = (v -> u, t\') acts as the transpose
    carrier of pair e = (u -> v, tau(t\')), e\'s own endpoints give
    (e\'.receiver, e\'.sender, tau(t\')) == e\'s key — so the scatter-free
    backward reconstructs exactly the mask the pair used in forward."""
    u = src.astype(jnp.uint32)
    v = dst.astype(jnp.uint32)
    t = edge_type.astype(jnp.uint32)
    return _hash_u32(
        _hash_u32(u * jnp.uint32(2654435761))
        ^ _hash_u32(v * jnp.uint32(2246822519))
        ^ _hash_u32(t * jnp.uint32(3266489917))
    )


def _keyed_dropout_mask(
    seed: jax.Array, edge_key: jax.Array, num_cols: int, rate: float,
    col_offset: int = 0,
) -> jax.Array:
    """[E, num_cols] keep mask from the directed edge key.

    ``col_offset`` shifts the column ids so a slice of the forward's mask can
    be regenerated without computing the discarded columns (the backward only
    consumes one half of each ``d_inp``)."""
    col = col_offset + jnp.arange(num_cols, dtype=jnp.uint32)[None, :]
    h = _hash_u32((edge_key[:, None] ^ seed) + col * jnp.uint32(0x9E3779B9))
    threshold = jnp.uint32(int(rate * 0xFFFFFFFF))
    return h >= threshold


def _forward_parts(
    x, weight_stack, adj, *, use_target_state: bool, drop_mask, tile_types,
    tgt_rows=None,
):
    """Gather inputs, apply dropout, compute messages. ``tgt_rows``: the
    per-edge target-state rows when the caller pre-fetched them through the
    block-local broadcast kernel (padding rows then read 0 instead of the
    clamped row — both are masked downstream)."""
    senders, receivers = adj
    n = x.shape[0]
    # Clamp: padding receivers are out of range (and appear as "senders" in
    # the transpose orientation); the rows are masked downstream.
    src = jnp.take(x, jnp.minimum(senders, n - 1), axis=0)
    if use_target_state:
        if tgt_rows is None:
            tgt_rows = jnp.take(x, jnp.minimum(receivers, n - 1), axis=0)
        inp = jnp.concatenate([src, tgt_rows], axis=-1)
    else:
        inp = src
    if drop_mask is not None:
        keep = drop_mask[2]
        inp = jnp.where(
            _keyed_dropout_mask(drop_mask[0], drop_mask[1], inp.shape[1], 1.0 - keep),
            inp / jnp.asarray(keep, inp.dtype),
            jnp.zeros((), inp.dtype),
        )
    tile = senders.shape[0] // tile_types.shape[0]
    msgs = typed_tile_matmul(inp, weight_stack, tile_types, tile)
    return inp, msgs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_typed_message_aggregation(
    node_states,  # [N, D]
    weight_stack,  # [T_total, Din, M]
    adj_and_rng,  # (AdjacencyStruct, seed uint32 array or None)
    num_nodes: int,
    reduction: str,
    use_target_state: bool,
    dropout_keep: float,  # 1.0 = no dropout
):
    out, _, _ = _fused_fwd_impl(
        node_states, weight_stack, adj_and_rng, num_nodes, reduction,
        use_target_state, dropout_keep,
    )
    return out


def mask_cols(mask, like):
    return mask[:, None] if like.ndim == 2 else mask.reshape(
        mask.shape + (1,) * (like.ndim - 1)
    )


def _fused_fwd_impl(
    node_states, weight_stack, adj_and_rng, num_nodes, reduction,
    use_target_state, dropout_keep,
):
    adj, seed = adj_and_rng
    drop = None
    if dropout_keep < 1.0:
        key_fwd = _directed_edge_key(adj.senders, adj.receivers, adj.edge_types)
        drop = (seed, key_fwd, dropout_keep)
    tgt_rows = None
    if use_target_state and node_states.dtype in (jnp.float32, jnp.bfloat16):
        # receiver-keyed -> block-local: broadcast kernel, not XLA gather
        tgt_rows = adjacency_broadcast_to_edges(node_states, adj)
    inp, msgs = _forward_parts(
        node_states, weight_stack, (adj.senders, adj.receivers),
        use_target_state=use_target_state, drop_mask=drop, tile_types=adj.tile_types,
        tgt_rows=tgt_rows,
    )
    # Argmax routing needs fwd/bwd PAIR ids to resolve each winner's
    # transpose slot; edge_feature_slot carries them (the batcher numbers
    # slots even for featureless batches). Without them (legacy batches,
    # or featureless graphs mixed into a feature-tracking batch, whose -1
    # slots would all "match" each other) fall back to tie-splitting.
    if (
        reduction in ("max", "min")
        and _use_argmax_routing()
        and adj.edge_feature_slot is not None
    ):
        is_max = reduction == "max"
        neutral = -_BIG if is_max else _BIG
        work = jnp.where(mask_cols(adj.mask, msgs), msgs,
                         jnp.asarray(neutral, msgs.dtype))
        vals, args = planned_segment_extremum_with_argmax(
            work.astype(jnp.float32), adj.receivers, plan_from_adjacency(adj),
            num_nodes, is_max,
        )
        return vals.astype(msgs.dtype), args, inp
    # Fusion requires the static batch mask (can_fuse), so plan.counts are
    # exact — mean skips its runtime counting pass.
    out = adjacency_segment_reduce(
        msgs, adj, num_nodes, reduction, mask=adj.mask, counts_exact=True
    )
    return out, None, inp


def _use_argmax_routing() -> bool:
    # Measured 3x SLOWER end to end on v5e: the dual dynamically indexed
    # outputs + per-feature index tracking defeat the kernel's pipelining.
    # Kept behind a flag; the value-based tie-split backward is the default.
    import os

    return bool(os.environ.get("PTGNN_TPU_ARGMAX_ROUTING"))


def _fused_fwd(
    node_states, weight_stack, adj_and_rng, num_nodes, reduction,
    use_target_state, dropout_keep,
):
    out, args, inp = _fused_fwd_impl(
        node_states, weight_stack, adj_and_rng, num_nodes, reduction,
        use_target_state, dropout_keep,
    )
    # inp (the dropped-out per-edge message input) is saved as a residual:
    # recomputing it in the backward costs two [E, D] node-table gathers plus
    # the dropout hash/select per layer, which profiling showed is 5-6x the
    # HBM cost of storing the [E, Din] low-precision array.
    return out, (node_states, weight_stack, adj_and_rng, out, args, inp)


def _fused_bwd(num_nodes, reduction, use_target_state, dropout_keep, res, g):
    node_states, weight_stack, (adj, seed), out, args, inp = res
    n, d = node_states.shape
    # Backward runs in the forward's compute dtype: under bf16 AMP the
    # cotangent kernels take the single-pass bf16 matmul path (the f32 path
    # needs 6 HIGHEST passes and 2x the HBM traffic); tie indicators are
    # 0/1 (bf16-exact) and accumulation stays f32 inside the kernels.
    compute_dtype = (
        jnp.bfloat16 if node_states.dtype == jnp.bfloat16 else jnp.float32
    )
    g = g.astype(compute_dtype)
    is_extremum = reduction in ("max", "min")
    value_tie = is_extremum and args is None

    drop = None
    drop_tr = None
    if dropout_keep < 1.0:
        key_fwd = _directed_edge_key(adj.senders, adj.receivers, adj.edge_types)
        tau = jnp.repeat(adj.tile_types_transposed, adj.edge_tile)
        # this slot's PAIR identity, reconstructed from its own endpoints
        key_tr = _directed_edge_key(adj.receivers, adj.senders, tau)
        drop = (seed, key_fwd, dropout_keep)
        drop_tr = (seed, key_tr, dropout_keep)

    counts_flat = None
    if reduction == "mean":
        counts_flat = adj.agg_counts.reshape(-1)[:num_nodes].astype(jnp.float32)

    e_pad = adj.senders.shape[0]
    tile = adj.edge_tile

    ties = None
    _indicator_p = None
    if value_tie:
        # value-based tie-splitting: one indicator pass over the primary
        # orientation (shared by both routing directions). The messages are
        # reproduced bitwise from the SAVED forward input by one tile
        # matmul — no gathers, no dropout recompute.
        _msgs_p = typed_tile_matmul(inp, weight_stack, adj.tile_types, tile)
        # Receiver-keyed lookups are block-local in the unified layout, so
        # they run through the broadcast kernel (dense-bandwidth block
        # reads) in out's NATIVE dtype (bf16 under AMP: one exact MXU pass;
        # the f32 compare after the cast sees identical values). Zero
        # padding rows stand in for the old fill=+-BIG — the adj.mask
        # conjunction below zeroes the same slots.
        if out.dtype in (jnp.float32, jnp.bfloat16):
            _out_e = adjacency_broadcast_to_edges(out, adj).astype(jnp.float32)
        else:  # x64 parity tests: Mosaic has no f64
            _out_e = jnp.take(
                out.astype(jnp.float32), jnp.minimum(adj.receivers, n - 1), axis=0
            )
        _indicator_p = jnp.logical_and(
            _msgs_p.astype(jnp.float32) == _out_e, adj.mask[:, None]
        ).astype(compute_dtype)
        ties = adjacency_segment_reduce(
            _indicator_p, adj, num_nodes, "sum", mask=adj.mask
        )

    # ---- batched node-table gathers -------------------------------------
    # v5e profile: a [E, D] node-table gather costs the same as [E, 2D] at
    # D=64 (row count dominates; lanes pad to 128), so every per-edge lookup
    # keyed on the same index vector rides ONE widened gather of a
    # concatenated node table. Clamped indices replace per-use fill values:
    # every consumer is masked by adj.mask downstream (value-tie indicators
    # carry the conjunction explicitly; sum/mean cotangents are zeroed at
    # the route_* return).
    # The table dtype must not downcast node_states (the transpose message
    # recompute must be bitwise the forward's computation — under x64 parity
    # tests that is f64); g/ties round-trip exactly through any wider dtype.
    tab_dtype = jnp.result_type(compute_dtype, node_states.dtype)
    m = g.shape[1]  # message width; node_states width d may differ
    recv_parts = [g.astype(tab_dtype)]
    send_parts = [g.astype(tab_dtype)]
    # mean: the per-node in-degree column rides the same widened gathers
    # (an [E]-row gather costs the same at 1 extra lane as at 0); the
    # divisor round-trips tab_dtype exactly like the old per-use take did
    # (it was cast to g_e.dtype before dividing). Falls back to the takes
    # only if the counts vector doesn't align with the node tables.
    counts_widened = reduction == "mean" and counts_flat.shape[0] == n
    if counts_widened:
        recv_parts.append(counts_flat[:, None].astype(tab_dtype))
        send_parts.append(counts_flat[:, None].astype(tab_dtype))
    if value_tie:
        # x by receivers: transpose-msg src input; x by senders: its tgt
        recv_parts += [ties.astype(tab_dtype), node_states.astype(tab_dtype)]
        send_parts += [ties.astype(tab_dtype), out.astype(tab_dtype)]
        if use_target_state:
            send_parts.append(node_states.astype(tab_dtype))
    recv_tab = recv_parts[0] if len(recv_parts) == 1 else jnp.concatenate(recv_parts, axis=1)
    send_tab = send_parts[0] if len(send_parts) == 1 else jnp.concatenate(send_parts, axis=1)
    # Receiver-keyed rows are block-local in the unified layout: the
    # broadcast kernel streams them at dense bandwidth (padding slots read
    # 0, masked downstream exactly like the clamped rows). Sender-keyed rows
    # are random-access — XLA's gather stays. f64 (x64 parity tests) keeps
    # the gather path: Mosaic has no f64 and the clamp semantics are
    # mask-equivalent.
    recv_zeroed = tab_dtype in (jnp.float32, jnp.bfloat16)
    if recv_zeroed:
        recv_rows = adjacency_broadcast_to_edges(recv_tab, adj)
    else:
        recv_rows = jnp.take(recv_tab, jnp.minimum(adj.receivers, n - 1), axis=0)
    send_rows = jnp.take(send_tab, jnp.minimum(adj.senders, n - 1), axis=0)
    g_e_recv = recv_rows[:, :m].astype(compute_dtype)
    g_e_send = send_rows[:, :m].astype(compute_dtype)
    if value_tie:
        ties_recv = recv_rows[:, m:2 * m].astype(ties.dtype)
        x_recv = recv_rows[:, 2 * m:2 * m + d].astype(node_states.dtype)
        ties_send = send_rows[:, m:2 * m].astype(ties.dtype)
        out_send = send_rows[:, 2 * m:3 * m].astype(jnp.float32)
        x_send = (
            send_rows[:, 3 * m:3 * m + d].astype(node_states.dtype)
            if use_target_state else None
        )

    def route_primary():
        """Per-edge message cotangent, primary orientation, gathers only."""
        g_e = g_e_recv
        if reduction in ("sum", "add"):
            d_msgs = g_e
        elif reduction == "mean":
            if counts_widened:
                # zero-padded broadcast rows give cnt=0 -> max(,1)=1, the
                # same divisor the old fill_value=1.0 take produced
                cnt = recv_rows[:, m:m + 1].astype(jnp.float32)
                d_msgs = g_e / jnp.maximum(cnt, 1.0).astype(g_e.dtype)
            else:
                cnt1 = jnp.take(counts_flat, adj.receivers, mode="fill", fill_value=1.0)
                d_msgs = g_e / jnp.maximum(cnt1, 1.0)[:, None].astype(g_e.dtype)
        elif args is not None:
            # single-winner argmax routing (torch-scatter semantics)
            arg_e = jnp.take(args, adj.receivers, axis=0, mode="fill", fill_value=-2)
            slots = jnp.arange(e_pad, dtype=jnp.int32)[:, None]
            d_msgs = (slots == arg_e).astype(g_e.dtype) * g_e
        else:
            # value-based tie-splitting (jax segment_max semantics)
            d_msgs = _indicator_p * g_e / jnp.maximum(ties_recv, 1.0)
        if recv_zeroed and args is None:
            # the broadcast kernel already zeroed padding rows of g_e (and
            # the tie indicator carries the mask conjunction), so the
            # [E, M] masking select is a no-op — skip its HBM round trip
            return d_msgs
        return jnp.where(adj.mask[:, None], d_msgs, jnp.zeros((), d_msgs.dtype))

    def route_transpose():
        """Cotangent of each slot's PAIR edge, from per-node arrays gathered
        through this slot's own endpoints."""
        g_e = g_e_send
        if reduction in ("sum", "add"):
            d_msgs = g_e
        elif reduction == "mean":
            if counts_widened:
                # clamped-row counts (padding slots) are masked at return
                cnt = send_rows[:, m:m + 1].astype(jnp.float32)
                d_msgs = g_e / jnp.maximum(cnt, 1.0).astype(g_e.dtype)
            else:
                cnt1 = jnp.take(counts_flat, adj.senders, mode="fill", fill_value=1.0)
                d_msgs = g_e / jnp.maximum(cnt1, 1.0)[:, None].astype(g_e.dtype)
        elif args is not None:
            # the pair edge e = (u -> v, tau) wins at v=senders iff the
            # winning slot's (pair id, type) matches this slot's
            # (pair id, transposed type)
            pair = adj.edge_feature_slot  # doubles as the fwd/bwd pair id
            pair_of_arg = jnp.take(pair, args, mode="fill", fill_value=-7)  # [N, D]
            type_of_arg = jnp.take(adj.edge_types, args, mode="fill", fill_value=-7)
            poa_e = jnp.take(pair_of_arg, adj.senders, axis=0, mode="fill", fill_value=-8)
            toa_e = jnp.take(type_of_arg, adj.senders, axis=0, mode="fill", fill_value=-8)
            tau = jnp.repeat(adj.tile_types_transposed, tile)
            indicator = jnp.logical_and(
                pair[:, None] == poa_e, tau[:, None] == toa_e
            ).astype(g_e.dtype)
            d_msgs = indicator * g_e
        else:
            # value-based: recompute the pair's message in transpose
            # orientation (inputs come from the batched gathers above) and
            # compare against the aggregated extremum at v
            inp_tr = jnp.concatenate([x_recv, x_send], axis=-1) if use_target_state else x_recv
            if drop_tr is not None:
                keep = drop_tr[2]
                inp_tr = jnp.where(
                    _keyed_dropout_mask(drop_tr[0], drop_tr[1], inp_tr.shape[1], 1.0 - keep),
                    inp_tr / jnp.asarray(keep, inp_tr.dtype),
                    jnp.zeros((), inp_tr.dtype),
                )
            msgs_tr = typed_tile_matmul(
                inp_tr, weight_stack, adj.tile_types_transposed, tile
            )
            indicator = jnp.logical_and(
                msgs_tr.astype(jnp.float32) == out_send, adj.mask[:, None]
            ).astype(g_e.dtype)
            d_msgs = indicator * g_e / jnp.maximum(ties_send, 1.0)
        return jnp.where(adj.mask[:, None], d_msgs, jnp.zeros((), d_msgs.dtype))

    d_msgs = route_primary()

    # dW from the saved forward input; messages are never rematerialized.
    # Two routes, chosen by HBM traffic (v5e PPI profile, 256-dim: the
    # per-tile route writes+reads a [n_tiles, Din, M] intermediate — 1 GB at
    # those shapes — and its segment_sum was 5.4 ms/step of scatter-add):
    #  * per-tile: [n_tiles, tile, Din]^T @ [n_tiles, tile, M] batched dot,
    #    then segment_sum by tile type — best when types are many and
    #    Din*M is small (the flagship's 64-dim configs);
    #  * per-type masked dots: dW[t] = inp^T @ (d_msgs * [type==t]) as T
    #    full-E contractions — no big intermediate, reads the operands T
    #    times; best when T is small and Din*M large (PPI: T=2, 512x256).
    # Padding slots carry d_msgs == 0 in both routes, so they contribute
    # nothing. f64 (x64 parity) keeps the per-tile route — its reduction
    # order is the one the parity suites pinned.
    n_tiles = adj.tile_types.shape[0]
    din = inp.shape[1]
    m = d_msgs.shape[1]
    num_types = weight_stack.shape[0]
    itemsize = jnp.dtype(compute_dtype).itemsize
    per_tile_traffic = 2 * n_tiles * din * m * 4
    masked_traffic = num_types * e_pad * (din + m) * itemsize
    if (
        masked_traffic < per_tile_traffic
        and compute_dtype in (jnp.bfloat16, jnp.float32)
    ):
        inp_c = inp.astype(compute_dtype)
        tt_e = jnp.repeat(adj.tile_types, tile)  # [E]
        d_w = jnp.stack(
            [
                jax.lax.dot_general(
                    inp_c,
                    d_msgs * (tt_e == t).astype(d_msgs.dtype)[:, None],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for t in range(num_types)
            ]
        ).astype(weight_stack.dtype)
    else:
        inp_t = inp.astype(compute_dtype).reshape(n_tiles, tile, din)
        dm_t = d_msgs.reshape(n_tiles, tile, m)
        per_tile_dw = jax.lax.dot_general(
            inp_t, dm_t, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [n_tiles, Din, M]
        d_w = jax.ops.segment_sum(
            per_tile_dw, adj.tile_types, num_segments=num_types
        ).astype(weight_stack.dtype)

    # d msg_input: each orientation consumes only ONE half of its [E, Din]
    # input-cotangent (the primary's target part; the transpose's source
    # part), so the unused columns are never computed — the matmul contracts
    # against the sliced weight columns (same per-element contraction over M,
    # so the kept values are unchanged) and the dropout mask regenerates only
    # the matching forward columns via ``col_offset``. Halves the [E, Din]
    # write + mask work of both backward matmuls.
    w_t = jnp.swapaxes(weight_stack, 1, 2)  # [T, M, Din]

    def apply_dropout_bwd(x, dm, col_offset=0):
        if dm is None:
            return x
        keep = dropout_keep
        return jnp.where(
            _keyed_dropout_mask(dm[0], dm[1], x.shape[1], 1.0 - keep, col_offset),
            x / jnp.asarray(keep, x.dtype),
            jnp.zeros((), x.dtype),
        )

    target_cotangent = None
    if use_target_state:
        target_cotangent = apply_dropout_bwd(
            typed_tile_matmul(d_msgs, w_t[:, :, d:], adj.tile_types, tile),
            drop, col_offset=d,
        )

    # ---- transpose orientation: sender part, no recompute of messages ----
    # The cotangent flows into the PAIR edge's (dropped-out) input, so its
    # mask is the pair's — the transpose-orientation key.
    d_msgs_tr = route_transpose()
    d_inp_tr_src = apply_dropout_bwd(
        typed_tile_matmul(d_msgs_tr, w_t[:, :, :d], adj.tile_types_transposed, tile),
        drop_tr,
    )

    # One kernel call aggregates both the target-side and (transpose-derived)
    # sender-side cotangents: concat along features, split after.
    if target_cotangent is not None:
        combined = jnp.concatenate([target_cotangent, d_inp_tr_src], axis=1)
        agg = adjacency_segment_reduce(combined, adj, num_nodes, "sum", mask=adj.mask)
        d_x = agg[:, :d] + agg[:, d:]
    else:
        d_x = adjacency_segment_reduce(
            d_inp_tr_src, adj, num_nodes, "sum", mask=adj.mask
        )

    return d_x.astype(node_states.dtype), d_w, None


fused_typed_message_aggregation.defvjp(_fused_fwd, _fused_bwd)


def can_fuse(adj, edge_mask_is_static: bool) -> bool:
    """Whether the scatter-free fused path is applicable for this batch."""
    return (
        adj.has_aggregation_plan
        and adj.tile_types_transposed is not None
        and edge_mask_is_static
    )
