"""Gradient parity vs the reference for the build's riskiest backward paths:

* the FUSED message+aggregation custom VJP (ops/fused_mp.py, transpose-edge
  recomputation) under both extremum routing modes (tie-splitting and
  PTGNN_TPU_ARGMAX_ROUTING), run through interpret-mode Pallas;
* the edge-partitioned differentiable pmax (_allreduce_extremum,
  parallel/edge_sharding.py) composed into a full sharded aggregation;
* the copy-decoder training loss backward (sequence/grucopydecoder.py).

Reference side: torch autograd through the torch_scatter shim — the exact
semantics of abstractmessagepassing.py:38-50 / grucopydecoder.py. Inputs are
random (tie-free almost surely): for ties the implementations legitimately
diverge (torch's scatter max routes the gradient to one winner; our VJP
splits it — the symmetric subgradient), which tests/test_pallas_segment.py
covers against a JAX oracle.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.reference_parity.shims import install_reference_shims

install_reference_shims()

from ptgnn.neuralmodels.gnn.messagepassing import (  # noqa: E402
    GatedMessagePassingLayer as RefGated,
)

from ptgnn_tpu.graph.messagepassing import GatedMessagePassingLayer  # noqa: E402

from tests.test_mp_parity import build_batch  # noqa: E402
from tests.test_mp_layers_extended import make_ctx  # noqa: E402
from tests.reference_parity.test_grad_parity_vs_reference import (  # noqa: E402
    j,
    ref_backward,
    sd,
)


@pytest.fixture()
def pallas_interpret(monkeypatch):
    """Force the Pallas aggregation path with interpret-mode kernels."""
    monkeypatch.setenv("PTGNN_TPU_FORCE_PALLAS_AGG", "1")
    if jax.default_backend() != "tpu":
        import jax.experimental.pallas as pl

        from ptgnn_tpu.ops.pallas import segment_kernels as sk

        real_call = pl.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            kwargs.pop("cost_estimate", None)
            return real_call(*args, **kwargs)

        monkeypatch.setattr(sk.pl, "pallas_call", patched)
    yield


def build_batch_unique_edges(seed=0, num_fwd_types=2):
    """Like tests.test_mp_parity.build_batch but with UNIQUE (src, dst) pairs
    per edge type: duplicate edges produce exactly tied extremum candidates,
    where argmax routing (one winner) and torch's scatter_reduce backward
    (even split) legitimately diverge."""
    from ptgnn_tpu.graph.batching import GraphBatcher
    from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData

    rng = np.random.RandomState(seed)
    pad = BatchPadding(max_nodes=16, max_edge_slots=96, max_graphs=4, edge_tile=8)
    b = GraphBatcher(num_fwd_types, pad, True, True)
    mb = b.initialize()
    sizes = [5, 4]
    for n in sizes:
        adj = []
        for _ in range(num_fwd_types):
            pairs = rng.permutation(n * n)[: rng.randint(3, 7)]
            adj.append(((pairs // n).astype(np.int32), (pairs % n).astype(np.int32)))
        b.extend(
            TensorizedGraphData(
                num_nodes=n, node_tensorized_data=[0] * n, adjacency_lists=adj,
                edge_features=None, reference_nodes={},
            ),
            mb,
        )
    batch = b.finalize(mb, node_data={}, reference_names=[])
    states = rng.randn(sum(sizes), 12).astype(np.float32)
    return pad, batch, states, sum(sizes), b.num_edge_types


def gated_mapping(T):
    def mapping(w):
        return {
            "message_weights": jnp.stack(
                [j(w[f"edge_message_transformation_layers.{t}.weight"]).T for t in range(T)]
            ),
            "state_update": {
                "weight_ih": j(w["state_update.weight_ih"]),
                "weight_hh": j(w["state_update.weight_hh"]),
                "bias_ih": j(w["state_update.bias_ih"]),
                "bias_hh": j(w["state_update.bias_hh"]),
            },
        }

    return mapping


@pytest.mark.parametrize("aggregation", ["sum", "mean", "max", "min"])
@pytest.mark.parametrize("argmax_routing", [False, True])
def test_fused_mp_grads_vs_reference(aggregation, argmax_routing,
                                     pallas_interpret, monkeypatch):
    """The scatter-free fused path's custom VJP vs torch autograd through
    torch-scatter. f32 (the kernels' dtype), so f32-level tolerances."""
    if argmax_routing:
        monkeypatch.setenv("PTGNN_TPU_ARGMAX_ROUTING", "1")
    torch.manual_seed(0)
    D, T = 12, 5
    ref = RefGated(state_dimension=D, message_dimension=D, num_edge_types=T,
                   message_aggregation_function=aggregation)
    ours = GatedMessagePassingLayer(state_dimension=D, message_dimension=D,
                                    num_edge_types=T,
                                    message_aggregation_function=aggregation)

    pad, batch, states, num_nodes, num_types = build_batch_unique_edges(seed=51)
    states64 = states.astype(np.float64)
    rng = np.random.RandomState(7)
    cot = rng.randn(num_nodes, D)
    ref_loss, ref_dstates, ref_grads = ref_backward(
        ref, states64, batch, num_nodes, num_types, cot
    )
    mapping = gated_mapping(T)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), mapping(sd(ref))
    )
    expected = mapping(ref_grads)

    ctx = make_ctx(batch)
    cot_j = jnp.asarray(cot, jnp.float32)
    sp = np.zeros((pad.max_nodes, D), np.float32)
    sp[:num_nodes] = states

    from ptgnn_tpu.ops.fused_mp import can_fuse

    assert can_fuse(batch.adjacency, True), "batch must support the fused path"

    def loss_fn(p, s):
        out = ours.apply(p, s, ctx)
        return (out[:num_nodes] * cot_j).sum()

    our_loss, (g_params, g_states) = jax.value_and_grad(
        loss_fn, argnums=(0, 1)
    )(params, jnp.asarray(sp))

    np.testing.assert_allclose(float(our_loss), ref_loss, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g_states)[:num_nodes], ref_dstates, rtol=2e-3, atol=2e-4
    )
    for ours_g, ref_g in zip(
        jax.tree_util.tree_leaves(g_params), jax.tree_util.tree_leaves(expected)
    ):
        np.testing.assert_allclose(
            np.asarray(ours_g), np.asarray(ref_g), rtol=2e-3, atol=2e-4
        )


@pytest.mark.parametrize("reduction", ["max", "min"])
def test_sharded_extremum_grads_vs_reference(reduction):
    """d loss / d messages through the edge-partitioned extremum (local
    masked reduce + differentiable pmax/pmin over the mesh axis) must match
    torch autograd through the torch-scatter extremum on the same edges."""
    from jax.sharding import Mesh, PartitionSpec as P

    import torch_scatter

    from ptgnn_tpu.parallel.dp import _shard_map
    from ptgnn_tpu.parallel.edge_sharding import shard_adjacency, sharded_aggregate

    N_SHARDS = 4
    pad, batch, states, num_nodes, num_types = build_batch(seed=52)
    adj = jax.tree_util.tree_map(jnp.asarray, batch.adjacency)
    rng = np.random.RandomState(3)
    E = int(adj.senders.shape[0])
    msgs = rng.randn(E, 6).astype(np.float64)
    cot = rng.randn(pad.max_nodes, 6)

    # torch side: masked extremum with torch-scatter fill-0 semantics
    tmsgs = torch.tensor(msgs, requires_grad=True)
    mask_np = np.asarray(adj.mask)
    recv = torch.tensor(np.asarray(adj.receivers)[mask_np].astype(np.int64))
    fn = torch_scatter.scatter_max if reduction == "max" else torch_scatter.scatter_min
    vals, _ = fn(tmsgs[torch.tensor(mask_np)], recv, dim=0, dim_size=pad.max_nodes)
    (vals * torch.tensor(cot)).sum().backward()
    ref_dmsgs = tmsgs.grad.numpy()

    sharded = shard_adjacency(adj, N_SHARDS)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("edge",))
    adj_specs = jax.tree_util.tree_map(lambda x: P("edge"), sharded)
    adj_specs = adj_specs._replace(agg_counts=P())

    def per_shard(a, m):
        la = jax.tree_util.tree_map(lambda x: x[0], a)._replace(
            agg_counts=a.agg_counts
        )
        return sharded_aggregate(m[0], la, pad.max_nodes, reduction, "edge")

    f = _shard_map(per_shard, mesh=mesh, in_specs=(adj_specs, P("edge")), out_specs=P())

    def loss_fn(m):
        out = f(sharded, m.reshape(N_SHARDS, -1, 6))
        return (out * jnp.asarray(cot)).sum()

    g = jax.grad(loss_fn)(jnp.asarray(msgs))
    np.testing.assert_allclose(np.asarray(g), ref_dmsgs, rtol=1e-6, atol=1e-9)


def test_copy_decoder_loss_grads_vs_reference():
    """Backward through the dense copy-matrix loss vs the reference's sparse
    flat-index formulation: gradients of every decoder parameter and of the
    input memories must agree."""
    from ptgnn.neuralmodels.sequence.grucopydecoder import (
        GruCopyingDecoder as RefDecoder,
    )

    from tests.test_copydecoder import build_case

    model, data, inputs = build_case()
    module = model.build_neural_module()
    V, E, H, D = module.vocabulary_size, 10, 8, 7

    torch.manual_seed(0)
    ref = RefDecoder(
        vocabulary_size=V, embedding_size=E, hidden_size=H,
        memories_hidden_dim=D, unk_id=module.unk_id, dropout_rate=0.0,
    ).double()
    ref.eval()

    rng = np.random.RandomState(1)
    counts = [len(i) for i in inputs]
    M_real = sum(counts)
    memories = rng.randn(M_real, D)
    init_states = rng.randn(len(data), H)
    origin = np.concatenate([[b] * c for b, c in enumerate(counts)]).astype(np.int64)

    tensorized = [model.tensorize(d) for d in data]
    S = model.max_seq_len
    tgt_ids = np.zeros((len(data), S), np.int64)
    lengths = np.zeros(len(data), np.int64)
    for i, t in enumerate(tensorized):
        tgt_ids[i, : len(t.token_ids)] = t.token_ids
        lengths[i] = t.length

    mem_offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    copy_idxs, copy_sample_idxs = [], []
    for b, t in enumerate(tensorized):
        for step, local_idxs in enumerate(t.copyable_elements):
            for li in local_idxs:
                copy_idxs.append((mem_offsets[b] + li) * (S - 1) + step)
                copy_sample_idxs.append(b * (S - 1) + step)

    tmem = torch.tensor(memories, requires_grad=True)
    tinit = torch.tensor(init_states, requires_grad=True)
    ref_loss_t = ref(
        input_memories=tmem,
        input_memories_origin_idx=torch.tensor(origin),
        initial_states=tinit,
        target_token_ids=torch.tensor(tgt_ids),
        copyable_elements_idxs=torch.tensor(copy_idxs, dtype=torch.long),
        copyable_elements_sample_idxs=torch.tensor(copy_sample_idxs, dtype=torch.long),
        target_lengths=torch.tensor(lengths),
    )
    ref_loss_t.backward()
    ref_loss = float(ref_loss_t.detach())
    ref_grads = {k: p.grad for k, p in ref.named_parameters()}
    import re as _re

    ref_grads = {_re.sub(r"_[A-Za-z]+__", "", k): v for k, v in ref_grads.items()}

    # ours, fp64 on padded arrays
    jax.config.update("jax_enable_x64", True)
    try:
        w = sd(ref)
        mb = model.initialize_minibatch()
        for t in tensorized:
            model.extend_minibatch_with(t, mb)
        B_pad, M_pad = 5, 16
        fin = model.finalize_minibatch(mb, max_targets=B_pad, memories_budget=M_pad)

        mem_pad = np.zeros((M_pad, D))
        mem_pad[:M_real] = memories
        origin_pad = np.full(M_pad, B_pad, np.int32)
        origin_pad[:M_real] = origin
        mem_mask = np.arange(M_pad) < M_real
        init_pad = np.zeros((B_pad, H))
        init_pad[: len(data)] = init_states

        def mapping(w):
            return {
                "embedding": {"weight": j(w["embedding_layer.weight"])},
                "gru": {
                    "weight_ih": j(w["output_gru.weight_ih_l0"]),
                    "weight_hh": j(w["output_gru.weight_hh_l0"]),
                    "bias_ih": j(w["output_gru.bias_ih_l0"]),
                    "bias_hh": j(w["output_gru.bias_hh_l0"]),
                },
                "mem_to_std": {"weight": j(w["memories_to_standard_attention.weight"])},
                "mem_to_copy": {"weight": j(w["memories_to_copy_attention.weight"])},
                "hidden_to_vocab": j(w["hidden_to_vocab"]),
                "vocab_bias": j(w["vocab_bias"]),
            }

        ref_grad_map = {
            "embedding_layer.weight": ref_grads["embedding_layer.weight"],
            "output_gru.weight_ih_l0": ref_grads["output_gru.weight_ih_l0"],
            "output_gru.weight_hh_l0": ref_grads["output_gru.weight_hh_l0"],
            "output_gru.bias_ih_l0": ref_grads["output_gru.bias_ih_l0"],
            "output_gru.bias_hh_l0": ref_grads["output_gru.bias_hh_l0"],
            "memories_to_standard_attention.weight": ref_grads[
                "memories_to_standard_attention.weight"
            ],
            "memories_to_copy_attention.weight": ref_grads[
                "memories_to_copy_attention.weight"
            ],
            "hidden_to_vocab": ref_grads["hidden_to_vocab"],
            "vocab_bias": ref_grads["vocab_bias"],
        }
        expected = mapping(ref_grad_map)
        params = mapping(w)

        def loss_fn(p, mem, init):
            loss, _ = module.apply(
                p,
                input_memories=mem,
                input_memories_origin_idx=jnp.asarray(origin_pad),
                memory_mask=jnp.asarray(mem_mask),
                initial_states=init,
                target_token_ids=jnp.asarray(fin["target_token_ids"]),
                target_lengths=jnp.asarray(fin["target_lengths"]),
                copy_matrix=jnp.asarray(fin["copy_matrix"]),
            )
            return loss

        our_loss, (gp, gmem, ginit) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2)
        )(params, jnp.asarray(mem_pad), jnp.asarray(init_pad))

        # loss agreement is f32-bounded: internal fp32 accumulation casts
        np.testing.assert_allclose(float(our_loss), ref_loss, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gmem)[:M_real], tmem.grad.numpy(), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(ginit)[: len(data)], tinit.grad.numpy(), rtol=1e-6, atol=1e-8
        )
        for ours_g, ref_g in zip(
            jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(expected)
        ):
            np.testing.assert_allclose(
                np.asarray(ours_g), np.asarray(ref_g), rtol=1e-6, atol=1e-7
            )
    finally:
        jax.config.update("jax_enable_x64", False)
