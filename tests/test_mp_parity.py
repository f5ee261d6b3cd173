"""Per-layer activation parity of message-passing layers vs torch
mini-implementations of the reference math (fixed imported weights).

The torch side reproduces the reference layers exactly (per-edge-type loops,
scatter via index_add / manual max), including backwards and self edges the
reference materializes in GraphNeuralNetwork.forward
(graphneuralnetwork.py:172-186). Our side runs the fused type-blocked layout.
"""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from ptgnn_tpu.graph.batching import GraphBatcher
from ptgnn_tpu.graph.messagepassing import GraphContext
from ptgnn_tpu.graph.messagepassing.gated import GatedMessagePassingLayer
from ptgnn_tpu.graph.messagepassing.mlp_mp import MlpMessagePassingLayer
from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData


def j(t):
    return jnp.asarray(t.detach().numpy())


def build_batch(num_fwd_types=2, backwards=True, self_edges=True, seed=0):
    rng = np.random.RandomState(seed)
    pad = BatchPadding(max_nodes=16, max_edge_slots=96, max_graphs=4, edge_tile=8)
    b = GraphBatcher(num_fwd_types, pad, backwards, self_edges)
    mb = b.initialize()
    sizes = [5, 4]
    for n in sizes:
        adj = []
        for _ in range(num_fwd_types):
            e = rng.randint(2, 6)
            adj.append((rng.randint(0, n, e), rng.randint(0, n, e)))
        b.extend(
            TensorizedGraphData(
                num_nodes=n,
                node_tensorized_data=[0] * n,
                adjacency_lists=[(np.asarray(s, np.int32), np.asarray(d, np.int32)) for s, d in adj],
                edge_features=None,
                reference_nodes={},
            ),
            mb,
        )
    batch = b.finalize(mb, node_data={}, reference_names=[])
    num_nodes = int(batch.num_nodes)
    states = rng.randn(num_nodes, 12).astype(np.float32)
    return pad, batch, states, num_nodes, b.num_edge_types


def torch_adjacency_lists(batch, num_nodes, num_edge_types):
    """Recover per-type (src, dst) int64 tensors from the fused batch, in the
    reference's order (fwd types, then bwd, then self)."""
    adj = batch.adjacency
    lists = []
    for t in range(num_edge_types):
        sel = (adj.edge_types == t) & adj.mask
        lists.append(
            (
                torch.tensor(adj.senders[sel], dtype=torch.int64),
                torch.tensor(adj.receivers[sel], dtype=torch.int64),
            )
        )
    return lists


def scatter_sum_torch(messages, targets, num_nodes):
    out = torch.zeros(num_nodes, messages.shape[1])
    return out.index_add_(0, targets, messages)


def scatter_max_torch(messages, targets, num_nodes):
    # torch-scatter semantics: untouched entries 0
    out = torch.full((num_nodes, messages.shape[1]), -float("inf"))
    out = out.index_reduce_(0, targets, messages, "amax", include_self=False)
    return torch.where(torch.isinf(out), torch.zeros_like(out), out)


def test_gated_mp_layer_parity():
    pad, batch, states, num_nodes, num_types = build_batch()
    D, M = 12, 12

    torch.manual_seed(0)
    msg_layers = [torch.nn.Linear(D, M, bias=False) for _ in range(num_types)]
    cell = torch.nn.GRUCell(M, D)

    # --- reference math in torch ---
    tstates = torch.tensor(states)
    adj_lists = torch_adjacency_lists(batch, num_nodes, num_types)
    msgs, tgts = [], []
    for (src, dst), lin in zip(adj_lists, msg_layers):
        msgs.append(lin(tstates[src]))
        tgts.append(dst)
    agg = scatter_sum_torch(torch.cat(msgs), torch.cat(tgts), num_nodes)
    expected = cell(agg, tstates).detach().numpy()

    # --- ours on the fused layout with identical weights ---
    ours = GatedMessagePassingLayer(
        state_dimension=D, message_dimension=M, num_edge_types=num_types,
        message_aggregation_function="sum",
    )
    params = {
        "message_weights": jnp.stack([j(l.weight).T for l in msg_layers]),
        "state_update": {
            "weight_ih": j(cell.weight_ih), "weight_hh": j(cell.weight_hh),
            "bias_ih": j(cell.bias_ih), "bias_hh": j(cell.bias_hh),
        },
    }
    padded_states = np.zeros((pad.max_nodes, D), np.float32)
    padded_states[:num_nodes] = states
    ctx = GraphContext(
        adjacency=batch.adjacency, edge_features=None, node_graph=batch.node_graph,
        node_mask=batch.node_mask, graph_mask=batch.graph_mask, references={},
    )
    out = np.asarray(ours.apply(params, jnp.asarray(padded_states), ctx))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("aggregation", ["sum", "max", "mean"])
def test_mlp_mp_layer_parity(aggregation):
    pad, batch, states, num_nodes, num_types = build_batch(seed=3)
    D, M, OUT = 12, 10, 8

    torch.manual_seed(1)
    # reference: per-type MLP on concat(src, tgt) with hidden_layers=0 => one linear
    mlps = [torch.nn.Linear(2 * D, M, bias=False) for _ in range(num_types)]
    lnorm = torch.nn.LayerNorm(M)
    with torch.no_grad():
        lnorm.weight.uniform_(0.5, 1.5)
        lnorm.bias.uniform_(-0.2, 0.2)
    dense = torch.nn.Linear(M, OUT)

    tstates = torch.tensor(states)
    adj_lists = torch_adjacency_lists(batch, num_nodes, num_types)
    msgs, tgts = [], []
    for (src, dst), lin in zip(adj_lists, mlps):
        msgs.append(lin(torch.cat([tstates[src], tstates[dst]], dim=-1)))
        tgts.append(dst)
    flat_msgs, flat_tgts = torch.cat(msgs), torch.cat(tgts)
    if aggregation == "sum":
        agg = scatter_sum_torch(flat_msgs, flat_tgts, num_nodes)
    elif aggregation == "max":
        agg = scatter_max_torch(flat_msgs, flat_tgts, num_nodes)
    else:
        s = scatter_sum_torch(flat_msgs, flat_tgts, num_nodes)
        cnt = scatter_sum_torch(torch.ones(len(flat_tgts), 1), flat_tgts, num_nodes).clamp(min=1)
        agg = s / cnt
    expected = torch.tanh(dense(lnorm(torch.nn.functional.gelu(agg)))).detach().numpy()

    ours = MlpMessagePassingLayer(
        input_state_dimension=D, output_state_dimension=OUT, message_dimension=M,
        num_edge_types=num_types, message_aggregation_function=aggregation,
    )
    params = {
        "message_mlp": {"weights_0": jnp.stack([j(l.weight).T for l in mlps])},
        "layer_norm": {"weight": j(lnorm.weight), "bias": j(lnorm.bias)},
        "dense": {"weight": j(dense.weight), "bias": j(dense.bias)},
    }
    padded_states = np.zeros((pad.max_nodes, D), np.float32)
    padded_states[:num_nodes] = states
    ctx = GraphContext(
        adjacency=batch.adjacency, edge_features=None, node_graph=batch.node_graph,
        node_mask=batch.node_mask, graph_mask=batch.graph_mask, references={},
    )
    out = np.asarray(ours.apply(params, jnp.asarray(padded_states), ctx))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)
