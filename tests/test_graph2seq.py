"""End-to-end Graph2Seq: train on copy-heavy synthetic data, check the loss
drops, greedy-decode and evaluate with the reference's metrics."""
import tempfile
from pathlib import Path

import optax
import pytest

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.graph2seq.graph2seq import Graph2Seq
from ptgnn_tpu.implementations.graph2seq.test import evaluate
from ptgnn_tpu.implementations.graph2seq.train import create_graph2seq_model
from ptgnn_tpu.utils.strsim import jaro_winkler
from ptgnn_tpu.utils.synthetic import synthetic_graph2seq_samples


def tiny_padding():
    return BatchPadding(
        max_nodes=512,
        max_edge_slots=512 * 8,
        max_graphs=16,
        edge_tile=64,
        reference_budgets=(("backbone_nodes", 256),),
    )


def make_data(n, seed):
    return LazyDataIterable(
        lambda: synthetic_graph2seq_samples(n, seed=seed, mean_nodes=30, max_nodes=60)
    )


@pytest.fixture(scope="module")
def trained():
    # embedding_size=32 derives the decoder at hidden 32 / embedding 64 (the
    # factory keeps the reference ratio). 96 training samples give the brief
    # run real margin over the 0.2 quality bar: measured jaro 0.48-0.50
    # across trainer seeds 0-2 (vs 0.19-0.39 seed spread at 48 samples).
    model = create_graph2seq_model(
        embedding_size=32, padding=tiny_padding(), max_seq_len=6,
    )
    tmp = tempfile.mkdtemp()
    trainer = ModelTrainer(
        model,
        Path(tmp) / "g2s.pkl.gz",
        max_num_epochs=6,
        minibatch_size=8,
        optimizer_creator=lambda: optax.adam(2e-3),
        clip_gradient_norm=1.0,
    )
    trainer.train(
        make_data(96, seed=1),
        make_data(12, seed=2),
        validate_on_start=True,
        parallelize=False,
        use_multiprocessing=False,
        store_tensorized_data_in_memory=True,
        patience=10,
    )
    return model, trainer


def test_loss_decreases_and_eval_runs(trained):
    model, trainer = trained
    data = list(synthetic_graph2seq_samples(8, seed=3, mean_nodes=30, max_nodes=60))
    metrics = evaluate(model, trainer.params, trainer.neural_module, data, verbose=False)
    assert set(metrics) == {"accuracy", "f1", "precision", "recall", "jaro_winkler"}
    for v in metrics.values():
        assert 0.0 <= v <= 1.0
    # Copy-heavy synthetic data: a briefly trained model should produce some
    # token overlap with ground truth.
    assert metrics["jaro_winkler"] > 0.2, metrics


def test_save_restore_roundtrip(trained):
    model, trainer = trained
    data = list(synthetic_graph2seq_samples(4, seed=5, mean_nodes=30, max_nodes=60))
    m1 = evaluate(model, trainer.params, trainer.neural_module, data, verbose=False)
    restored_model, restored_params = Graph2Seq.restore_model(
        trainer._checkpoint_location
    )
    net = restored_model.build_neural_module()
    m2 = evaluate(restored_model, restored_params, net, data, verbose=False)
    assert round(m1["jaro_winkler"], 3) == round(m2["jaro_winkler"], 3)


def test_jaro_winkler_basics():
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("", "abc") == 0.0
    assert 0.0 < jaro_winkler("martha", "marhta") < 1.0
    # Winkler prefix boost: common prefix scores higher
    assert jaro_winkler("prefixed", "prefixxx") > jaro_winkler("xxprefed", "yyprefxx")


def test_decode_aligns_dropped_samples_as_none():
    """A sample dropped by size caps must surface as None at ITS position in
    the decode results instead of aborting after all the work is done."""
    from ptgnn_tpu.implementations.graph2seq.train import create_graph2seq_model
    from ptgnn_tpu.utils.synthetic import synthetic_graph2seq_samples

    import jax

    data = list(synthetic_graph2seq_samples(6, seed=1, mean_nodes=25, max_nodes=50))
    model = create_graph2seq_model()
    model.compute_metadata(iter(data), parallelize=False)
    net = model.build_neural_module()
    params = net.init(jax.random.PRNGKey(0))
    # shrink the cap so exactly the largest of the first 3 samples is
    # dropped at tensorize time
    sizes = [len(d["node_labels"]) for d in data[:3]]
    big = max(range(3), key=lambda i: sizes[i])
    model._Graph2Seq__gnn_model.max_nodes_per_graph = sizes[big] - 1
    res = model.greedy_decode(data[:3], params, net)
    assert len(res) == 3
    assert res[big] is None
    kept = [r for r in res if r is not None]
    assert kept and all(isinstance(r, tuple) for r in kept)


def test_decode_aligns_equal_duplicates_by_position():
    """Regression: datasets with EQUAL duplicate samples where one copy is
    dropped by size caps must not shift later results — alignment is by
    stream position (carried index), not object identity/equality."""
    import copy

    import jax

    data = list(synthetic_graph2seq_samples(5, seed=7, mean_nodes=25, max_nodes=50))
    # data[0] and data[3] become equal duplicates; make data[3] oversized by
    # comparing against a cap that only data with the most nodes exceeds.
    sizes = [len(d["node_labels"]) for d in data]
    big_idx = max(range(len(data)), key=lambda i: sizes[i])
    dup = copy.deepcopy(data[big_idx])
    # place the duplicate BEFORE the original so the old equality scan would
    # bind the survivor's result to the dropped copy's position
    data = data[:big_idx] + [dup] + data[big_idx:]

    model = create_graph2seq_model()
    model.compute_metadata(iter(data), parallelize=False)
    net = model.build_neural_module()
    params = net.init(jax.random.PRNGKey(0))
    res_full = model.greedy_decode(data, params, net)
    assert all(r is not None for r in res_full)
    # Now drop exactly ONE of the two equal duplicates: cap admits graphs up
    # to the duplicate's size minus one — both copies are oversized, so drop
    # both; instead cap per-batch so only stream order distinguishes them.
    # Simpler: drop the FIRST copy by marking it oversized via a one-off cap
    # during tensorize of a modified dataset where the first copy gained a
    # node.
    grown = copy.deepcopy(dup)
    grown["node_labels"] = list(grown["node_labels"]) + ["pad_node"]
    data2 = data[:big_idx] + [grown] + data[big_idx + 1 :]
    model._Graph2Seq__gnn_model.max_nodes_per_graph = len(dup["node_labels"])
    res = model.greedy_decode(data2, params, net)
    assert len(res) == len(data2)
    assert res[big_idx] is None, "the oversized copy must be None at ITS slot"
    # the surviving original keeps its own (correct) result
    surviving_pos = big_idx + 1
    assert res[surviving_pos] is not None
    assert res[surviving_pos][0] == res_full[surviving_pos][0]
