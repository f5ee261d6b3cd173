"""Edge-feature plumbing: embedded per-edge features reach the MP layers in
the unified layout; backward edges share the forward edge's features; self
edges get zeros (reference: graphneuralnetwork.py:162-186)."""
import numpy as np
import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.embedders import FeatureRepresentationModel
from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel
from ptgnn_tpu.graph.messagepassing import GatedMessagePassingLayer
from ptgnn_tpu.graph.structs import BatchPadding, GraphData


def build_model():
    pad = BatchPadding(max_nodes=64, max_edge_slots=2048, max_graphs=4,
                       edge_tile=32, agg_rows=32)
    return GraphNeuralNetworkModel(
        node_representation_model=FeatureRepresentationModel(embedding_size=8),
        edge_representation_model=FeatureRepresentationModel(embedding_size=4),
        message_passing_layer_creator=lambda n: [
            GatedMessagePassingLayer(
                state_dimension=8, message_dimension=8, num_edge_types=n,
                message_aggregation_function="sum", edge_feature_dimension=4,
            )
        ],
        padding=pad,
        introduce_backwards_edges=True,
        add_self_edges=True,
    )


def make_graph(rng, n=10, e=6):
    edges = [(int(a), int(b)) for a, b in zip(rng.randint(0, n, e), rng.randint(0, n, e))]
    return GraphData(
        node_information=[rng.randn(3).astype(np.float32) for _ in range(n)],
        edges={"E": edges},
        reference_nodes={},
        edge_features={"E": [rng.randn(2).astype(np.float32) for _ in range(e)]},
    )


def test_edge_features_flow_and_pairing():
    rng = np.random.RandomState(0)
    graphs = [make_graph(rng) for _ in range(3)]
    model = build_model()
    model.compute_metadata(iter(graphs), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))

    mbs = [mb for mb, _ in model.minibatch_iterator(
        model.tensorize_dataset(iter(graphs), parallelize=False),
        max_minibatch_size=3, parallelize=False)]
    batch = mbs[0]["batch"]

    # feature-slot pairing invariants
    adj = batch.adjacency
    slot = np.asarray(adj.edge_feature_slot)
    types = np.asarray(adj.edge_types)
    mask = np.asarray(adj.mask)
    assert (slot[mask & (types == 0)] >= 0).all()   # fwd edges have features
    assert (slot[mask & (types == 1)] >= 0).all()   # bwd edges share them
    assert (slot[mask & (types == 2)] == -1).all()  # self edges: none
    assert (slot[~mask] == -1).all()
    # every fwd feature index appears exactly once among fwd and once among bwd
    fwd_slots = sorted(slot[mask & (types == 0)])
    bwd_slots = sorted(slot[mask & (types == 1)])
    assert fwd_slots == bwd_slots

    # forward runs and uses the features (zeroing them changes the output)
    out1, _ = module.apply(params, batch)
    zeroed = batch._replace(
        edge_feature_data=jax.tree_util.tree_map(
            lambda x: np.zeros_like(x), batch.edge_feature_data
        )
    )
    out2, _ = module.apply(params, zeroed)
    diff = np.abs(
        np.asarray(out1.output_node_representations)
        - np.asarray(out2.output_node_representations)
    ).max()
    assert diff > 1e-6

    # gradients flow into the edge embedder
    def loss(p):
        out, _ = module.apply(p, batch)
        return jnp.sum(out.output_node_representations ** 2)

    grads = jax.grad(loss)(params)
    g_edge = jax.tree_util.tree_leaves(grads["edge_embedder"])
    assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in g_edge)


def test_featureless_graph_does_not_shift_later_graphs_slots():
    """A graph with edge_features=None mixed into a feature-tracking batch
    must get -1 slots WITHOUT advancing the feature cursor — otherwise every
    later graph's edges silently gather another graph's feature rows."""
    rng = np.random.RandomState(3)
    g1 = make_graph(rng, n=8, e=5)
    g2 = make_graph(rng, n=6, e=4)
    g2.edge_features = None  # no features for this one
    g3 = make_graph(rng, n=7, e=6)
    graphs = [g1, g2, g3]
    model = build_model()
    model.compute_metadata(iter(graphs), parallelize=False)
    mbs = [mb for mb, _ in model.minibatch_iterator(
        model.tensorize_dataset(iter(graphs), parallelize=False),
        max_minibatch_size=3, parallelize=False)]
    batch = mbs[0]["batch"]
    adj = batch.adjacency
    slot = np.asarray(adj.edge_feature_slot)
    types = np.asarray(adj.edge_types)
    mask = np.asarray(adj.mask)
    senders = np.asarray(adj.senders)

    # g2 occupies node ids [8, 14): its edges carry NO feature slot
    g2_fwd = mask & (types == 0) & (senders >= 8) & (senders < 14)
    assert g2_fwd.sum() == 4
    assert (slot[g2_fwd] == -1).all()

    # g1 + g3 edges cover feature rows 0..10 exactly once (5 + 6 features)
    featured_fwd = mask & (types == 0) & (slot >= 0)
    assert sorted(slot[featured_fwd]) == list(range(5 + 6))
    # g3's edges (nodes >= 14) map to rows 5..10 — ITS rows, not g2-shifted
    g3_fwd = mask & (types == 0) & (senders >= 14)
    assert sorted(slot[g3_fwd]) == list(range(5, 11))

    # and the embedder minibatch holds exactly 11 real feature rows
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    out, _ = module.apply(params, batch)  # runs without OOB gathers
    assert np.isfinite(np.asarray(out.output_node_representations)).all()
