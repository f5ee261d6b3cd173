"""Occupancy autotuner: sweeps BatchPadding candidates and ranks by
measured train-step throughput (utils/autotune.py)."""
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.harness import build_graph2class
from ptgnn_tpu.utils.autotune import (
    TuneResult,
    default_candidates,
    measure_padding,
    sweep_paddings,
)


def _build(padding):
    _, module, params, mbs = build_graph2class(
        padding=padding,
        num_metadata_graphs=12,
        mean_nodes=30,
        max_graph_nodes=60,
        hidden_state_size=16,
        num_minibatches=1,
        minibatch_size=8,
    )
    return module, params, mbs


def test_sweep_ranks_feasible_candidates():
    small = BatchPadding(
        max_nodes=256, max_edge_slots=256 * 12, max_graphs=8, edge_tile=64,
        reference_budgets=(("supernodes", 64), ("token-sequence", 256)),
    )
    import dataclasses

    smaller = dataclasses.replace(
        small, max_nodes=192, max_edge_slots=192 * 12 // 64 * 64
    )
    results = sweep_paddings(_build, [small, smaller], steps=3)
    assert len(results) == 2
    ok = [r for r in results if not r.error]
    assert ok, [r.error for r in results]
    best = results[0]
    assert best.error is None
    assert best.edges_per_sec > 0 and best.real_edges > 0
    # sorted best-first
    assert results[0].edges_per_sec >= results[1].edges_per_sec


def test_infeasible_candidate_is_reported_not_raised():
    # An edge budget far too small for the synthetic graphs: build must fail
    # (no minibatch admits a graph) and the sweep reports it instead of
    # aborting.
    tiny = BatchPadding(
        max_nodes=16, max_edge_slots=64, max_graphs=2, edge_tile=64,
        reference_budgets=(("supernodes", 8), ("token-sequence", 16)),
    )
    r = measure_padding(_build, tiny, steps=1)
    assert isinstance(r, TuneResult)
    assert r.error is not None
    assert r.edges_per_sec == 0.0


def test_default_candidates_grid():
    cands = default_candidates(
        max_nodes_options=(1024, 2048), slots_per_node_options=(5.0, 6.0)
    )
    assert len(cands) == 4
    for c in cands:
        assert c.max_edge_slots % c.edge_tile == 0
        assert c.max_edge_slots >= 5 * c.max_nodes - c.edge_tile


def test_autotune_task_model_retunes_and_keeps_metadata():
    """--autotune path: metadata computed once, candidates measured on real
    minibatches, returned clone carries the winning padding + metadata."""
    import jax

    from ptgnn_tpu.graph.structs import BatchPadding
    from ptgnn_tpu.implementations.typilus.train import (
        create_graph2class_gnn_model,
        typilus_reference_budgets,
    )
    from ptgnn_tpu.utils.autotune import autotune_task_model, clone_with_padding
    from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

    graphs = list(synthetic_typilus_graphs(8, seed=0, mean_nodes=25, max_nodes=50))
    for g in graphs:  # learnable multi-class labels (a 1-class vocab has loss 0)
        for sn in g["supernodes"].values():
            sn["annotation"] = ["int", "str", "bool"][sum(map(ord, sn["name"])) % 3]
    model = create_graph2class_gnn_model(
        hidden_state_size=16,
        padding=BatchPadding(
            max_nodes=256, max_edge_slots=2560, max_graphs=8, edge_tile=32,
            agg_rows=32, agg_sum_tile=0,
            reference_budgets=typilus_reference_budgets(256),
        ),
    )
    cands = [
        BatchPadding(max_nodes=128, max_edge_slots=1280, max_graphs=4,
                     edge_tile=32, agg_rows=32, agg_sum_tile=0,
                     reference_budgets=typilus_reference_budgets(128)),
        BatchPadding(max_nodes=256, max_edge_slots=2560, max_graphs=8,
                     edge_tile=32, agg_rows=32, agg_sum_tile=0,
                     reference_budgets=typilus_reference_budgets(256)),
    ]
    tuned, results = autotune_task_model(
        model, graphs, minibatch_size=8, candidates=cands, steps=2,
        amp=False, parallelize=False,
    )
    assert tuned.metadata_initialized
    assert tuned.gnn_model.padding in [c for c in cands]
    assert results[0].error is None and results[0].edges_per_sec > 0
    # the tuned clone trains: one step through a real minibatch
    module = tuned.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    mb = next(iter(tuned.minibatch_iterator(
        tuned.tensorize_dataset(iter(graphs), parallelize=False),
        max_minibatch_size=8, parallelize=False,
    )))[0]
    loss, _ = module.apply(params, **mb, train=False)
    assert float(loss) > 0

    # clone_with_padding rebudgets without touching the original
    other = clone_with_padding(model, cands[0])
    assert other.gnn_model.padding.max_nodes == 128
    assert model.gnn_model.padding.max_nodes == 256


def test_autotune_marks_unfittable_candidate_infeasible():
    """A candidate too small for ANY sampled graph must become an error'd
    TuneResult, not crash the sweep (the batcher silently drops graphs that
    cannot fit an empty batch, so build() yields zero minibatches)."""
    from ptgnn_tpu.graph.structs import BatchPadding
    from ptgnn_tpu.implementations.typilus.train import (
        create_graph2class_gnn_model,
        typilus_reference_budgets,
    )
    from ptgnn_tpu.utils.autotune import autotune_task_model
    from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

    graphs = list(
        synthetic_typilus_graphs(6, seed=0, mean_nodes=60, max_nodes=100)
    )
    for g in graphs:
        for sn in g["supernodes"].values():
            sn["annotation"] = ["int", "str"][sum(map(ord, sn["name"])) % 2]
    tiny = BatchPadding(  # smaller than every ~60-node graph
        max_nodes=32, max_edge_slots=320, max_graphs=2, edge_tile=32,
        agg_rows=32, agg_sum_tile=0,
        reference_budgets=typilus_reference_budgets(32),
    )
    ok = BatchPadding(
        max_nodes=256, max_edge_slots=2560, max_graphs=8, edge_tile=32,
        agg_rows=32, agg_sum_tile=0,
        reference_budgets=typilus_reference_budgets(256),
    )
    model = create_graph2class_gnn_model(hidden_state_size=16, padding=ok)
    tuned, results = autotune_task_model(
        model, graphs, minibatch_size=8, candidates=[tiny, ok], steps=2,
        amp=False, parallelize=False,
    )
    by_padding = {r.padding.max_nodes: r for r in results}
    assert by_padding[32].error is not None
    assert by_padding[256].error is None
    assert tuned.gnn_model.padding.max_nodes == 256
