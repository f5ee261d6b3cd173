"""North-star at-scale assertions (VERDICT r4 item 1).

The reference DROPS any graph over 80k nodes / 100k edges
(ptgnn/neuralmodels/gnn/graphneuralnetwork.py:328-330,362-365). The
node-sharding mode exists so such graphs train instead, with per-shard
memory ~ N/S + S*b. These tests pin that claim at a scale where a single
device would actually hurt:

* a ~250k-node / ~1.5M-edge AST-topology batch (3x the reference's node
  cap, 15x its edge cap) shards with a per-shard payload under 1/(S/2)
  of the unsharded batch;
* the compiled sharded train step contains NO full [N, D] node-table
  buffer in any float dtype — the O(N*D) readout holes of rounds 3-4
  stay closed (program structure is scale-free, so the compile check
  runs at a CI-friendly padding).

The full multi-epoch trainer run at this scale lives in
tools/at_scale_demo.py with its committed transcript in
docs/evidence/at_scale_demo.txt.
"""
import re

import jax
import numpy as np
import optax

from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.train import create_graph2class_gnn_model
from ptgnn_tpu.parallel.node_sharding import NodeParallel, suggest_budgets
from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

S = 8


def _batches(model, graphs):
    model.compute_metadata(iter(graphs), parallelize=False)
    tens = model.tensorize_dataset(iter(graphs), parallelize=False)
    return [
        mb
        for mb, _ in model.minibatch_iterator(
            tens, max_minibatch_size=1, parallelize=False
        )
    ]


def _payload_bytes(tree):
    return sum(
        l.nbytes for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "nbytes")
    )


def _per_shard_payload_bytes(tree, num_shards):
    total = 0
    for l in jax.tree_util.tree_leaves(tree):
        if not hasattr(l, "nbytes"):
            continue
        if getattr(l, "ndim", 0) >= 1 and l.shape[0] == num_shards:
            total += l.nbytes // num_shards
        else:
            total += l.nbytes
    return total


def test_per_shard_payload_at_reference_dropping_scale():
    """(the 'graph the reference drops' payload assertion) A 2**18-padded
    batch holding one ~250k-node graph shards to < 1/(S/2) of the
    unsharded payload per shard."""
    max_nodes = 262_144
    padding = BatchPadding(
        max_nodes=max_nodes, max_edge_slots=max_nodes * 14, max_graphs=4,
        edge_tile=128,
        reference_budgets=(("supernodes", 16384), ("token-sequence", 131072)),
    )
    model = create_graph2class_gnn_model(hidden_state_size=64, padding=padding)
    model.gnn_model.max_nodes_per_graph = max_nodes
    model.gnn_model.max_graph_edges = 4_000_000
    graphs = list(
        synthetic_typilus_graphs(
            1, seed=42, mean_nodes=250_000, max_nodes=262_000,
            edges_per_node=2.5, topology="ast",
        )
    )
    (mb,) = _batches(model, graphs)
    batch = mb["batch"]
    # Past BOTH reference drop caps.
    assert int(batch.num_nodes) > 200_000
    assert int(batch.num_edges) > 1_000_000

    from ptgnn_tpu.parallel.node_sharding import shard_batch_by_nodes

    budgets = suggest_budgets([mb], S)
    smb, stats = shard_batch_by_nodes(mb, S, **budgets)

    unsh = _payload_bytes(mb)
    persh = _per_shard_payload_bytes(smb, S)
    assert persh < unsh / (S / 2), (
        f"per-shard payload {persh / 1e6:.1f} MB is not < 1/(S/2) of the "
        f"unsharded {unsh / 1e6:.1f} MB"
    )
    # The memory model: rows_per + S*b extended rows, and the boundary is a
    # sliver of the graph after the locality renumbering.
    assert stats["rows_per_shard"] == max_nodes // S
    assert stats["boundary_nodes_total"] < 0.05 * int(batch.num_nodes)


def test_sharded_step_hlo_has_no_full_node_table():
    """The compiled node-sharded train step materializes NO [N_pad, feat]
    float buffer: heads read through the O(refs*D) accessors and the stack
    works on [rows_per + S*b] buffers. Runs at a CI-friendly padding — the
    program (and this property) is scale-free."""
    max_nodes = 8192
    padding = BatchPadding(
        max_nodes=max_nodes, max_edge_slots=max_nodes * 12, max_graphs=8,
        edge_tile=64,
        reference_budgets=(("supernodes", 512), ("token-sequence", 4096)),
    )
    model = create_graph2class_gnn_model(hidden_state_size=64, padding=padding)
    graphs = list(
        synthetic_typilus_graphs(
            4, seed=7, mean_nodes=1800, max_nodes=2000, topology="ast"
        )
    )
    (mb, *_) = _batches(model, graphs)
    module = model.build_neural_module()
    budgets = suggest_budgets([mb], S)
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:S]).reshape(1, S), ("data", "node"))
    npar = NodeParallel(module, optax.adam(1e-3), mesh, axis="node", **budgets)
    smb = npar.shard_batch(mb)
    params = npar.device_put_params(module.init(jax.random.PRNGKey(0)))
    opt_state = npar.init_opt_state(params)
    step = npar.build_train_step(smb)
    hlo = step.lower(
        params, opt_state, smb, jax.random.PRNGKey(1)
    ).compile().as_text()
    module.gnn.node_partition_axis = None

    full_tables = sorted(
        set(re.findall(rf"\b(?:f32|bf16|f16|f64)\[{max_nodes},\d+\]", hlo))
    )
    assert not full_tables, (
        f"O(N*D) buffers leaked into the sharded step: {full_tables}"
    )
