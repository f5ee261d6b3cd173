"""Per-layer activation parity vs the ACTUAL reference code.

Unlike tests/test_mp_parity.py (hand-rewritten torch oracles), these tests
import /root/reference/ptgnn itself (through the torch_scatter/dpu_utils
shims), let each reference layer initialize its own weights, copy those
weights into our params, and assert allclose on identical graphs. This is
BASELINE.json's "per-layer activations allclose vs reference" row.

Reference files: gatedmessagepassing.py, mlpmessagepassing.py,
egcmessagepassing.py, graphnorm.py, pna_aggregation.py,
selfattmessagepassing.py, globalgraphexchange.py, residuallayers.py.
"""
import re

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from tests.reference_parity.shims import install_reference_shims

install_reference_shims()

from ptgnn.neuralmodels.gnn.messagepassing import (  # noqa: E402
    GatedMessagePassingLayer as RefGated,
    MlpMessagePassingLayer as RefMlp,
)
from ptgnn.neuralmodels.gnn.messagepassing.egcmessagepassing import (  # noqa: E402
    EGCMessagePassingLayer as RefEgc,
)
from ptgnn.neuralmodels.gnn.messagepassing.graphnorm import GraphNorm as RefGraphNorm  # noqa: E402
from ptgnn.neuralmodels.gnn.messagepassing.pna_aggregation import (  # noqa: E402
    PnaMessageAggregation as RefPna,
)
from ptgnn.neuralmodels.gnn.messagepassing.selfattmessagepassing import (  # noqa: E402
    MultiHeadSelfAttentionMessagePassing as RefSelfAtt,
)
from ptgnn.neuralmodels.gnn.messagepassing.globalgraphexchange import (  # noqa: E402
    GruGlobalStateUpdate as RefGlobalUpdate,
)
from ptgnn.neuralmodels.gnn.messagepassing.residuallayers import (  # noqa: E402
    ConcatResidualLayer as RefConcatRes,
    LinearResidualLayer as RefLinearRes,
    MeanResidualLayer as RefMeanRes,
)
from ptgnn.neuralmodels.reduceops.varsizedsummary import (  # noqa: E402
    SimpleVarSizedElementReduce as RefSimpleReduce,
)

from ptgnn_tpu.graph.messagepassing import (
    EGCMessagePassingLayer,
    GatedMessagePassingLayer,
    GraphNorm,
    GruGlobalStateUpdate,
    MlpMessagePassingLayer,
    MultiHeadSelfAttentionMessagePassing,
    PnaMessageAggregation,
)
from ptgnn_tpu.graph.messagepassing.residual import (
    ConcatResidualLayer,
    LinearResidualLayer,
    MeanResidualLayer,
)
from ptgnn_tpu.reduceops import SimpleVarSizedElementReduce

from tests.test_mp_parity import build_batch, torch_adjacency_lists
from tests.test_mp_layers_extended import make_ctx, pad_states


def sd(ref_layer):
    """state_dict with the name-mangled private prefixes stripped."""
    return {
        re.sub(r"_[A-Za-z]+__", "", k): v for k, v in ref_layer.state_dict().items()
    }


def j(t):
    return jnp.asarray(t.detach().numpy())


def ref_forward(ref_layer, states, batch, num_nodes, num_types):
    """Run the reference layer on the recovered per-type adjacency lists."""
    tstates = torch.tensor(states)
    adj_lists = torch_adjacency_lists(batch, num_nodes, num_types)
    feats = [torch.zeros(len(src), 0) for src, _ in adj_lists]
    gid = torch.tensor(np.asarray(batch.node_graph)[:num_nodes].astype(np.int64))
    ref_layer.eval()
    with torch.no_grad():
        out = ref_layer(tstates, adj_lists, gid, {}, {}, feats)
    return out.numpy()


@pytest.mark.parametrize("aggregation", ["sum", "max", "mean", "min"])
def test_gated_vs_reference(aggregation):
    pad, batch, states, num_nodes, num_types = build_batch(seed=21)
    D = states.shape[1]
    torch.manual_seed(0)
    ref = RefGated(
        state_dimension=D, message_dimension=D, num_edge_types=num_types,
        message_aggregation_function=aggregation,
    )
    expected = ref_forward(ref, states, batch, num_nodes, num_types)

    w = sd(ref)
    ours = GatedMessagePassingLayer(
        state_dimension=D, message_dimension=D, num_edge_types=num_types,
        message_aggregation_function=aggregation,
    )
    params = {
        "message_weights": jnp.stack(
            [j(w[f"edge_message_transformation_layers.{t}.weight"]).T for t in range(num_types)]
        ),
        "state_update": {
            "weight_ih": j(w["state_update.weight_ih"]),
            "weight_hh": j(w["state_update.weight_hh"]),
            "bias_ih": j(w["state_update.bias_ih"]),
            "bias_hh": j(w["state_update.bias_hh"]),
        },
    }
    out = np.asarray(ours.apply(params, pad_states(states, pad.max_nodes), make_ctx(batch)))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("aggregation", ["sum", "max"])
@pytest.mark.parametrize("use_target", [True, False])
def test_mlp_mp_vs_reference(aggregation, use_target):
    pad, batch, states, num_nodes, num_types = build_batch(seed=22)
    D, M, OUT = states.shape[1], 10, 8
    torch.manual_seed(1)
    ref = RefMlp(
        input_state_dimension=D, output_state_dimension=OUT, message_dimension=M,
        num_edge_types=num_types, message_aggregation_function=aggregation,
        use_target_state_as_message_input=use_target,
    )
    expected = ref_forward(ref, states, batch, num_nodes, num_types)

    w = sd(ref)
    ours = MlpMessagePassingLayer(
        input_state_dimension=D, output_state_dimension=OUT, message_dimension=M,
        num_edge_types=num_types, message_aggregation_function=aggregation,
        use_target_state_as_message_input=use_target,
    )
    params = {
        "message_mlp": {
            "weights_0": jnp.stack(
                [
                    j(w[f"edge_message_transformation_layers.{t}.mlp_modules.1.weight"]).T
                    for t in range(num_types)
                ]
            )
        },
        # state_update Sequential: [0]=LayerNorm, [1]=Dense
        "layer_norm": {"weight": j(w["state_update.0.weight"]), "bias": j(w["state_update.0.bias"])},
        "dense": {"weight": j(w["state_update.1.weight"]), "bias": j(w["state_update.1.bias"])},
    }
    out = np.asarray(ours.apply(params, pad_states(states, pad.max_nodes), make_ctx(batch)))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)


def test_egc_vs_reference():
    pad, batch, states, num_nodes, num_types = build_batch(seed=23)
    D, OUT, BASES, HEADS = states.shape[1], 8, 3, 4
    torch.manual_seed(2)
    ref = RefEgc(
        input_state_dimension=D, output_state_dimension=OUT, num_edge_types=num_types,
        message_aggregation_function="sum", num_bases=BASES, num_heads=HEADS,
    )
    expected = ref_forward(ref, states, batch, num_nodes, num_types)

    w = sd(ref)
    ours = EGCMessagePassingLayer(
        input_state_dimension=D, output_state_dimension=OUT, num_edge_types=num_types,
        message_aggregation_function="sum", num_bases=BASES, num_heads=HEADS,
    )
    params = {
        "bases": jnp.stack([j(w[f"bases.{t}.weight"]).T for t in range(num_types)]),
        "weight_coeffs": {"weight": j(w["weight_coeffs.weight"]), "bias": j(w["weight_coeffs.bias"])},
    }
    out = np.asarray(ours.apply(params, pad_states(states, pad.max_nodes), make_ctx(batch)))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)


def test_graphnorm_vs_reference():
    pad, batch, states, num_nodes, num_types = build_batch(seed=24)
    D = states.shape[1]
    torch.manual_seed(3)
    ref = RefGraphNorm(D)
    with torch.no_grad():  # non-trivial affine params
        for p in ref.parameters():
            p.uniform_(-1.0, 1.5)
    expected = ref_forward(ref, states, batch, num_nodes, num_types)

    w = sd(ref)
    ours = GraphNorm(D)
    params = {
        "gamma": j(w["gamma"]).reshape(1, D),
        "alpha": j(w["alpha"]).reshape(1, D),
        "bias": j(w["bias"]).reshape(1, D),
    }
    out = np.asarray(ours.apply(params, pad_states(states, pad.max_nodes), make_ctx(batch)))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)


def test_pna_vs_reference():
    pad, batch, states, num_nodes, num_types = build_batch(seed=25)
    D, M = states.shape[1], 6
    torch.manual_seed(4)
    ref = RefMlp(
        input_state_dimension=D, output_state_dimension=M, message_dimension=M,
        num_edge_types=num_types, message_aggregation_function=RefPna(),
        message_activation=None, use_layer_norm=False, use_dense_layer=False,
    )
    expected = ref_forward(ref, states, batch, num_nodes, num_types)

    w = sd(ref)
    ours = MlpMessagePassingLayer(
        input_state_dimension=D, output_state_dimension=M, message_dimension=M,
        num_edge_types=num_types, message_aggregation_function=PnaMessageAggregation(),
        message_activation=None, use_layer_norm=False, use_dense_layer=False,
        dense_activation=None,
    )
    params = {
        "message_mlp": {
            "weights_0": jnp.stack(
                [
                    j(w[f"edge_message_transformation_layers.{t}.mlp_modules.1.weight"]).T
                    for t in range(num_types)
                ]
            )
        },
        "aggregation": {},
    }
    out = np.asarray(ours.apply(params, pad_states(states, pad.max_nodes), make_ctx(batch)))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)


def test_selfatt_vs_reference():
    pad, batch, states, num_nodes, num_types = build_batch(seed=26)
    D = states.shape[1]
    HEADS, KD, VD, INTER = 3, 4, 5, 20
    torch.manual_seed(5)
    ref = RefSelfAtt(
        input_state_dimension=D, key_query_dimension=KD, value_dimension=VD,
        output_dimension=D, num_heads=HEADS, intermediate_dimension=INTER,
    )
    expected = ref_forward(ref, states, batch, num_nodes, num_types)

    w = sd(ref)
    ours = MultiHeadSelfAttentionMessagePassing(
        input_state_dimension=D, key_query_dimension=KD, value_dimension=VD,
        output_dimension=D, intermediate_dimension=INTER, num_heads=HEADS,
    )
    params = {
        "head_transforms": {"weight": j(w["selfatt_head_transforms.weight"])},
        "summarization": {"weight": j(w["summarization_layer.weight"])},
        "intermediate": {"weight": j(w["intermediate_layer.weight"]), "bias": j(w["intermediate_layer.bias"])},
        "output": {"weight": j(w["output_layer.weight"]), "bias": j(w["output_layer.bias"])},
        "layer_norm1": {"weight": j(w["layer_norm1.weight"]), "bias": j(w["layer_norm1.bias"])},
        "layer_norm2": {"weight": j(w["layer_norm2.weight"]), "bias": j(w["layer_norm2.bias"])},
    }
    out = np.asarray(ours.apply(params, pad_states(states, pad.max_nodes), make_ctx(batch)))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)


def test_global_exchange_vs_reference():
    pad, batch, states, num_nodes, num_types = build_batch(seed=27)
    D = states.shape[1]
    torch.manual_seed(6)
    ref = RefGlobalUpdate(
        global_graph_representation_module=RefSimpleReduce("mean"),
        input_state_size=D, summarized_state_size=D, dropout_rate=0.0,
    )
    expected = ref_forward(ref, states, batch, num_nodes, num_types)

    w = sd(ref)
    ours = GruGlobalStateUpdate(
        global_graph_representation_module=SimpleVarSizedElementReduce("mean"),
        input_state_size=D, summarized_state_size=D,
    )
    params = {
        "summary": {},
        "update": {
            "weight_ih": j(w["gru_cell.weight_ih"]),
            "weight_hh": j(w["gru_cell.weight_hh"]),
            "bias_ih": j(w["gru_cell.bias_ih"]),
            "bias_hh": j(w["gru_cell.bias_hh"]),
        },
    }
    out = np.asarray(ours.apply(params, pad_states(states, pad.max_nodes), make_ctx(batch)))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kind", ["mean", "concat", "linear"])
def test_residual_layers_vs_reference(kind):
    pad, batch, states, num_nodes, num_types = build_batch(seed=28)
    D = states.shape[1]
    torch.manual_seed(7)
    if kind == "mean":
        ref = RefMeanRes(D)
        ours = MeanResidualLayer(D)
    elif kind == "concat":
        ref = RefConcatRes(D)
        ours = ConcatResidualLayer(D)
    else:
        ref = RefLinearRes(D, D, D)
        ours = LinearResidualLayer(D, D, D)

    ref_dummy = ref.pass_through_dummy_layer()
    rng = np.random.RandomState(31)
    later_states = rng.randn(num_nodes, D).astype(np.float32)

    tstates = torch.tensor(states)
    tlater = torch.tensor(later_states)
    adj_lists = torch_adjacency_lists(batch, num_nodes, num_types)
    feats = [torch.zeros(len(src), 0) for src, _ in adj_lists]
    gid = torch.tensor(np.asarray(batch.node_graph)[:num_nodes].astype(np.int64))
    ref.eval(), ref_dummy.eval()
    with torch.no_grad():
        mid = ref_dummy(tstates, adj_lists, gid, {}, {}, feats)
        assert torch.equal(mid, tstates)  # pass-through stashes, returns input
        expected = ref(tlater, adj_lists, gid, {}, {}, feats).numpy()

    if kind == "linear":
        w = sd(ref)
        params = {"linear": {"weight": j(w["linear_combination.weight"])}}
    else:
        params = {}
    combined = ours.combine(
        params, jnp.asarray(states), jnp.asarray(later_states), train=False, rng=None
    )
    np.testing.assert_allclose(np.asarray(combined), expected, rtol=1e-4, atol=1e-5)


def build_straddling_batch(att_block=8, seed=31):
    """Graphs of sizes [5, 4, 6]: with contiguous placement, graphs 2 and 3
    straddle the 8-node attention-block boundary; the batcher's att_order
    must bin-pack each into a single block."""
    from ptgnn_tpu.graph.batching import GraphBatcher
    from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData

    rng = np.random.RandomState(seed)
    pad = BatchPadding(
        max_nodes=24, max_edge_slots=144, max_graphs=4, edge_tile=8,
        att_block=att_block,
    )
    b = GraphBatcher(2, pad, True, True)
    mb = b.initialize()
    sizes = [5, 4, 6]
    for n in sizes:
        adj = []
        for _ in range(2):
            e = rng.randint(2, 6)
            adj.append(
                (rng.randint(0, n, e).astype(np.int32), rng.randint(0, n, e).astype(np.int32))
            )
        b.extend(
            TensorizedGraphData(
                num_nodes=n, node_tensorized_data=[0] * n, adjacency_lists=adj,
                edge_features=None, reference_nodes={},
            ),
            mb,
        )
    batch = b.finalize(mb, node_data={}, reference_names=[])
    states = rng.randn(int(batch.num_nodes), 12).astype(np.float32)
    return pad, batch, states, int(batch.num_nodes), b.num_edge_types, sizes


def test_att_order_packs_each_graph_into_one_block():
    pad, batch, states, num_nodes, _, sizes = build_straddling_batch()
    order = np.asarray(batch.att_order)
    block = order.shape[1]
    flat = order.reshape(-1)
    real = flat[flat < num_nodes]
    # permutation of all real nodes
    assert sorted(real.tolist()) == list(range(num_nodes))
    # each graph's nodes inside exactly one block
    gid_of = np.asarray(batch.node_graph)
    offset = 0
    for g, n in enumerate(sizes):
        rows = {
            i // block for i, slot in enumerate(flat) if slot < num_nodes
            and offset <= slot < offset + n
        }
        assert len(rows) == 1, f"graph {g} spans blocks {rows}"
        offset += n


def test_att_order_big_graphs_start_block_aligned():
    """A graph larger than att_block must start at a block boundary so its
    chunks are full block-wide windows (reference chunks each graph from its
    own start, selfattmessagepassing.py:59-75) — its leading nodes must not
    share a truncated block with a previous graph."""
    from ptgnn_tpu.graph.batching import GraphBatcher
    from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData

    pad = BatchPadding(
        max_nodes=64, max_edge_slots=2048, max_graphs=4, edge_tile=32,
        agg_rows=32, att_block=8,
    )
    b = GraphBatcher(1, pad, introduce_backwards_edges=False, add_self_edges=False)
    mb = b.initialize()
    sizes = (5, 19, 3)  # small, BIG (>2 blocks), small
    offset_nodes = []
    for n in sizes:
        src = np.arange(n - 1, dtype=np.int32)
        g = TensorizedGraphData(
            num_nodes=n, node_tensorized_data=[0] * n,
            adjacency_lists=[(src, src + 1)], edge_features=None,
            reference_nodes={},
        )
        assert b.can_add(g, mb)
        b.extend(g, mb)
    batch = b.finalize(mb, node_data={}, reference_names=[])
    order = np.asarray(batch.att_order)
    block = order.shape[1]
    flat = order.reshape(-1)
    total = sum(sizes)
    real = flat[flat < total]
    assert sorted(real.tolist()) == list(range(total))
    # the big graph (nodes 5..23) starts at a block boundary
    big_first_slot = int(np.where(flat == sizes[0])[0][0])
    assert big_first_slot % block == 0, (big_first_slot, block)
    # and its chunks are consecutive full blocks (except the last)
    for k in range(sizes[1] // block):
        blk = flat[big_first_slot + k * block : big_first_slot + (k + 1) * block]
        assert all(sizes[0] <= s < sizes[0] + sizes[1] for s in blk), blk


def test_selfatt_straddling_graphs_vs_reference():
    """Exactness for graphs that would straddle a contiguous block boundary:
    the reference never splits a graph smaller than its chunk
    (selfattmessagepassing.py:59-75); with att_order neither do we."""
    pad, batch, states, num_nodes, num_types, _ = build_straddling_batch()
    D = states.shape[1]
    HEADS, KD, VD, INTER = 2, 4, 4, 16
    torch.manual_seed(8)
    ref = RefSelfAtt(
        input_state_dimension=D, key_query_dimension=KD, value_dimension=VD,
        output_dimension=D, num_heads=HEADS, intermediate_dimension=INTER,
    )
    expected = ref_forward(ref, states, batch, num_nodes, num_types)

    w = sd(ref)
    ours = MultiHeadSelfAttentionMessagePassing(
        input_state_dimension=D, key_query_dimension=KD, value_dimension=VD,
        output_dimension=D, intermediate_dimension=INTER, num_heads=HEADS,
        max_num_nodes=8,  # == pad.att_block; forces multi-block layout
    )
    params = {
        "head_transforms": {"weight": j(w["selfatt_head_transforms.weight"])},
        "summarization": {"weight": j(w["summarization_layer.weight"])},
        "intermediate": {"weight": j(w["intermediate_layer.weight"]), "bias": j(w["intermediate_layer.bias"])},
        "output": {"weight": j(w["output_layer.weight"]), "bias": j(w["output_layer.bias"])},
        "layer_norm1": {"weight": j(w["layer_norm1.weight"]), "bias": j(w["layer_norm1.bias"])},
        "layer_norm2": {"weight": j(w["layer_norm2.weight"]), "bias": j(w["layer_norm2.bias"])},
    }
    ctx = make_ctx(batch)._replace(att_order=jnp.asarray(batch.att_order))
    out = np.asarray(ours.apply(params, pad_states(states, pad.max_nodes), ctx))
    np.testing.assert_allclose(out[:num_nodes], expected, rtol=1e-4, atol=1e-5)

    # Width mismatch: a layer configured with a different window than the
    # batcher's att_block must still honor the batch's packing (exact for
    # graphs <= att_block) instead of silently reverting to the straddling
    # approximation.
    mismatched = MultiHeadSelfAttentionMessagePassing(
        input_state_dimension=D, key_query_dimension=KD, value_dimension=VD,
        output_dimension=D, intermediate_dimension=INTER, num_heads=HEADS,
        max_num_nodes=16,  # != pad.att_block (8)
    )
    out2 = np.asarray(
        mismatched.apply(params, pad_states(states, pad.max_nodes), ctx)
    )
    np.testing.assert_allclose(out2[:num_nodes], expected, rtol=1e-4, atol=1e-5)
