"""Task-level head-to-head: train the ACTUAL reference Graph2Class/Typilus
model (torch, through the shims) and ours on IDENTICAL synthetic
Typilus-schema graphs; require accuracy in the same band. This is
BASELINE.json's "Graph2Class accuracy parity with reference" row, measured
against the reference's own model (ptgnn/implementations/typilus/
graph2class.py) and its UNK-counts-as-wrong accuracy.
"""
import tempfile
from pathlib import Path

import pytest
import torch

from tests.reference_parity.shims import install_reference_shims

install_reference_shims()

from ptgnn.baseneuralmodel import ModelTrainer as RefTrainer  # noqa: E402
from ptgnn.baseneuralmodel.utils.data import LazyDataIterable as RefLazyIterable  # noqa: E402
from ptgnn.implementations.typilus.graph2class import Graph2Class as RefGraph2Class  # noqa: E402
from ptgnn.neuralmodels.embeddings.strelementrepresentationmodel import (  # noqa: E402
    StrElementRepresentationModel as RefStrModel,
)
from ptgnn.neuralmodels.gnn.graphneuralnetwork import (  # noqa: E402
    GraphNeuralNetworkModel as RefGnnModel,
)
from ptgnn.neuralmodels.gnn.messagepassing.mlpmessagepassing import (  # noqa: E402
    MlpMessagePassingLayer as RefMlpMp,
)
from ptgnn.neuralmodels.gnn.messagepassing.residuallayers import (  # noqa: E402
    ConcatResidualLayer as RefConcatRes,
)

import optax  # noqa: E402

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.implementations.typilus.harness import small_padding
from ptgnn_tpu.implementations.typilus.train import create_graph2class_gnn_model
from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

HIDDEN = 32
EPOCHS = 40


_TYPES = ["int", "str", "bool", "float", "List[int]", "Dict[str, int]"]


def _relabel(graphs):
    """Make annotations a deterministic function of the supernode's name, so
    accuracy is learnable (name -> type) and the head-to-head compares model
    capacity instead of class-prior guessing on random labels."""
    out = []
    for g in graphs:
        for sn in g["supernodes"].values():
            sn["annotation"] = _TYPES[sum(map(ord, sn["name"])) % len(_TYPES)]
        out.append(g)
    return out


def make_data():
    # AST topology with dense supervision (VERDICT r4 item 7): on the old
    # random-expander graphs both sides plateaued AT the 0.436 class prior
    # (name->type signal does not generalize through 12 layers of expander
    # context), so the test had no discriminating power. With localized
    # AST neighborhoods + 0.25 supernode fraction + 64 training graphs the
    # signal survives and BOTH stacks generalize near-perfectly (round-5
    # calibration, 5 seeds: reference 0.995 +/- 0.007, ours 0.999 +/-
    # 0.002) — VarMisuse-style parity at a meaningful operating point.
    gen = lambda n, seed: synthetic_typilus_graphs(
        n, seed=seed, mean_nodes=50, max_nodes=120,
        topology="ast", supernode_fraction=0.25,
    )
    train = _relabel(list(gen(64, 0)))
    # 64 validation graphs * ~12 annotated supernodes -> the parity band is
    # far above the per-sample accuracy quantum (~0.0013).
    valid = _relabel(list(gen(64, 1)))
    return train, valid


def _ref_mlp(num_edges, input_dim, message_dim):
    return RefMlpMp(
        input_state_dimension=input_dim, message_dimension=message_dim,
        output_state_dimension=HIDDEN, num_edge_types=num_edges,
        message_aggregation_function="max", dropout_rate=0.1,
    )


def create_mlp_mp_layers(num_edges: int):
    """Exact clone of the reference benchmark factory shape
    (typilus/train.py:67-99) at a smaller hidden size."""
    mk = lambda: _ref_mlp(num_edges, HIDDEN, HIDDEN)
    mk_after = lambda: _ref_mlp(num_edges, 2 * HIDDEN, 2 * HIDDEN)
    r1, r2 = RefConcatRes(HIDDEN), RefConcatRes(HIDDEN)
    return [
        r1.pass_through_dummy_layer(), mk(), mk(), mk(), r1, mk_after(),
        r2.pass_through_dummy_layer(), mk(), mk(), mk(), r2, mk_after(),
    ]


def train_reference(train, valid, seed: int = 0):
    import random

    # The reference shuffles training data through the global `random` module
    # (abstractneuralmodel.py:345-346 via dpu-utils); seed it so the run does
    # not depend on whatever tests executed earlier in the process. Our side
    # derives data order from ModelTrainer(seed=...) and needs no globals.
    # torch's multi-threaded CPU scatter reductions are additionally
    # NONDETERMINISTIC across runs (accumulation order); one thread makes the
    # reference side reproducible (measured: identical accs across runs).
    random.seed(1_000_003 * seed + 17)
    torch.manual_seed(seed)
    torch.set_num_threads(1)
    model = RefGraph2Class(
        gnn_model=RefGnnModel(
            node_representation_model=RefStrModel(
                embedding_size=HIDDEN, token_splitting="subtoken",
                subtoken_combination="mean", vocabulary_size=10000,
                min_freq_threshold=2, dropout_rate=0.1,
            ),
            message_passing_layer_creator=create_mlp_mp_layers,
            max_nodes_per_graph=100000,
            max_graph_edges=500000,
            introduce_backwards_edges=True,
            add_self_edges=True,
            stop_extending_minibatch_after_num_nodes=120000,
            edge_dropout_rate=0.0,
        ),
        max_num_classes=100,
    )
    with tempfile.TemporaryDirectory() as td:
        trainer = RefTrainer(
            model, Path(td) / "ref.pkl.gz", max_num_epochs=EPOCHS, minibatch_size=8,
            optimizer_creator=lambda p: torch.optim.Adam(p, lr=2e-3),
            # select the best checkpoint on the task metric (both sides):
            # selection on validation loss is a coin flip on 32 training
            # graphs — the loss argmin lands on epochs whose accuracy is
            # several points off the run's best, drowning the parity signal.
            target_validation_metric="Accuracy",
            target_validation_metric_higher_is_better=True,
        )
        trainer.train(
            RefLazyIterable(lambda: iter(train)),
            RefLazyIterable(lambda: iter(valid)),
            show_progress_bar=False,
            parallelize=False,
            validate_on_start=False,
            patience=EPOCHS,
            device="cpu",
        )
        acc = model.report_accuracy(iter(valid), trainer.neural_module, "cpu")
        train_acc = model.report_accuracy(iter(train), trainer.neural_module, "cpu")
    return float(acc), float(train_acc)


def train_ours(train, valid, seed: int = 0):
    model = create_graph2class_gnn_model(
        hidden_state_size=HIDDEN, padding=small_padding(max_nodes=512, max_graphs=8),
        min_freq_threshold=2,
    )
    with tempfile.TemporaryDirectory() as td:
        trainer = ModelTrainer(
            model, Path(td) / "ours.pkl.gz", max_num_epochs=EPOCHS, minibatch_size=8,
            optimizer_creator=lambda: optax.adam(2e-3),
            seed=seed,
            target_validation_metric="Accuracy",
            target_validation_metric_higher_is_better=True,
        )
        trainer.train(
            LazyDataIterable(lambda: iter(train)),
            LazyDataIterable(lambda: iter(valid)),
            parallelize=False,
            validate_on_start=False,
            patience=EPOCHS,
        )
        acc = model.report_accuracy(iter(valid), trainer.params, trainer.neural_module)
        train_acc = model.report_accuracy(iter(train), trainer.params, trainer.neural_module)
    return float(acc), float(train_acc)


SEEDS = (0, 1, 2, 3, 4)


@pytest.mark.slow
def test_graph2class_accuracy_parity_with_reference():
    """Multi-seed parity at an operating point with real discriminating
    power (VERDICT r4 item 7): both stacks must GENERALIZE (>0.7 mean,
    measured ~0.995 both sides — far above the 0.436 class prior the old
    expander config plateaued at), and agree within a calibrated band.
    Round-5 calibration at this config (5 seeds/side): reference
    0.9947 +/- 0.007, ours 0.9990 +/- 0.002 -> SE of a 5-seed mean
    difference ~0.0033; the 0.02 band is ~6 SE — tight enough to catch a
    real capacity gap, slack enough not to flap on seed luck. The
    reference side is pinned to one torch thread — multi-threaded CPU
    scatter reductions made its per-seed results differ across identical
    runs. Fine-grained parity is carried by the exact-math suites
    (per-layer activation and gradient parity vs the reference, fp64) —
    this test's job is end-to-end trainability through both full stacks.

    The train-accuracy side statistic is recorded in the failure message
    only: the checkpoint is selected on VALIDATION accuracy, so its train
    fit is not a stable statistic to assert on.
    """
    import numpy as np

    train, valid = make_data()
    ref_runs = [train_reference(train, valid, seed=s) for s in SEEDS]
    our_runs = [train_ours(train, valid, seed=s) for s in SEEDS]
    ref_accs = [a for a, _ in ref_runs]
    our_accs = [a for a, _ in our_runs]
    ref_mean = float(np.mean(ref_accs))
    our_mean = float(np.mean(our_accs))
    # Both sides must truly generalize, not prior-match (the name->type
    # function is learnable; ~0.995 expected, 0.7 allows for drift).
    assert ref_mean > 0.7, f"reference failed to generalize (accs={ref_accs})"
    assert our_mean > 0.7, f"ours failed to generalize (accs={our_accs})"
    assert our_mean >= ref_mean - 0.02, (
        f"ours {our_accs} (mean {our_mean:.4f}) vs "
        f"reference {ref_accs} (mean {ref_mean:.4f}); "
        f"train-fit context: ours {[t for _, t in our_runs]} vs "
        f"reference {[t for _, t in ref_runs]}"
    )
