"""Task-level head-to-head: train the ACTUAL reference VarMisuse model
(torch, through the shims) and ours on IDENTICAL synthetic VarMisuse samples;
require candidate-selection accuracy in the same band. Completes the
head-to-head coverage of the reference's task zoo (PPI micro-F1 and
Graph2Class accuracy have their own); reference model under test:
ptgnn/implementations/varmisuse/{varmisuse,candidateannotatedembeddings}.py.
"""
import tempfile
from pathlib import Path

import numpy as np
import pytest
import torch

from tests.reference_parity.shims import install_reference_shims

install_reference_shims()

from ptgnn.baseneuralmodel import ModelTrainer as RefTrainer  # noqa: E402
from ptgnn.baseneuralmodel.utils.data import LazyDataIterable as RefLazyIterable  # noqa: E402
from ptgnn.implementations.varmisuse.candidateannotatedembeddings import (  # noqa: E402
    CandidateNodeAnnotationModel as RefCandidateModel,
)
from ptgnn.implementations.varmisuse.varmisuse import VarMisuseModel as RefVarMisuse  # noqa: E402
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
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.varmisuse.train import create_var_misuse_gnn_model
from ptgnn_tpu.utils.synthetic import synthetic_varmisuse_samples

HIDDEN = 32
# 20 epochs: at 10-16 epochs either side's training occasionally sticks at a
# half-learned plateau (~0.5-0.7 accuracy) depending on init seed; at 20 both
# sides reach ~1.0 on every measured seed (best-checkpoint selection on the
# Accuracy metric is monotone in epochs, so more epochs cannot hurt).
EPOCHS = 20
SEEDS = (0, 1, 2, 3, 4)


def make_data():
    train = list(synthetic_varmisuse_samples(48, seed=0, mean_tokens=30))
    # the 0.02 parity band needs accuracy resolution finer than the band:
    # 96 samples -> ~0.0104 per sample
    valid = list(synthetic_varmisuse_samples(96, seed=1, mean_tokens=30))
    return train, valid


def _ref_mlp(num_edges, input_dim, message_dim):
    return RefMlpMp(
        input_state_dimension=input_dim, message_dimension=message_dim,
        output_state_dimension=HIDDEN, num_edge_types=num_edges,
        message_aggregation_function="max", dropout_rate=0.1,
    )


def create_ref_layers(num_edges: int):
    """The reference benchmark factory shape (varmisuse/train.py:41-75) at a
    smaller hidden size."""
    mk = lambda: _ref_mlp(num_edges, HIDDEN, HIDDEN)
    mk_after = lambda: _ref_mlp(num_edges, 2 * HIDDEN, 2 * HIDDEN)
    r1, r2 = RefConcatRes(HIDDEN), RefConcatRes(HIDDEN)
    return [
        r1.pass_through_dummy_layer(), mk(), mk(), mk(), r1, mk_after(),
        r2.pass_through_dummy_layer(), mk(), mk(), mk(), r2, mk_after(),
    ]


def train_reference(train, valid, seed: int = 0) -> float:
    import random

    random.seed(1_000_003 * seed + 17)  # the reference's global-random shuffle
    torch.manual_seed(seed)
    # torch's multi-threaded CPU scatter reductions are nondeterministic
    # across runs (accumulation order); one thread makes the reference side
    # reproducible (measured: identical accs across runs).
    torch.set_num_threads(1)
    model = RefVarMisuse(
        gnn_model=RefGnnModel(
            node_representation_model=RefCandidateModel(
                embedding_size=HIDDEN, token_splitting="char"
            ),
            message_passing_layer_creator=create_ref_layers,
            max_nodes_per_graph=50000,
            max_graph_edges=500000,
            introduce_backwards_edges=True,
            add_self_edges=True,
            stop_extending_minibatch_after_num_nodes=80000,
        )
    )
    with tempfile.TemporaryDirectory() as td:
        trainer = RefTrainer(
            model, Path(td) / "ref.pkl.gz", max_num_epochs=EPOCHS, minibatch_size=8,
            optimizer_creator=lambda p: torch.optim.Adam(p, lr=1e-3),
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
    return float(acc)


def train_ours(train, valid, seed: int = 0) -> float:
    padding = BatchPadding(
        max_nodes=1024,
        max_edge_slots=1024 * 10,
        max_graphs=8,
        edge_tile=64,
        reference_budgets=(("candidate_nodes", 64), ("slot_node_idx", 8)),
    )
    model = create_var_misuse_gnn_model(hidden_state_size=HIDDEN, padding=padding)
    with tempfile.TemporaryDirectory() as td:
        trainer = ModelTrainer(
            model, Path(td) / "ours.pkl.gz", max_num_epochs=EPOCHS, minibatch_size=8,
            optimizer_creator=lambda: optax.adam(1e-3),
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
    return float(acc)


@pytest.mark.slow
def test_varmisuse_accuracy_parity_with_reference():
    """Multi-seed band: mean candidate-selection accuracy over 5 init seeds
    within 0.02 of the reference's mean. Both sides select best checkpoints
    on the Accuracy metric (selection-by-loss is noise at this data size).
    Round-4 calibration: at EPOCHS=20 with the deterministic single-thread
    torch side, every measured seed on both sides trains to ~1.0, so the
    0.02 band carries real margin (at 10-16 epochs individual seeds stuck
    at half-learned plateaus and the band flapped on seed luck)."""
    train, valid = make_data()
    ref_accs = [train_reference(train, valid, seed=s) for s in SEEDS]
    our_accs = [train_ours(train, valid, seed=s) for s in SEEDS]
    ref_mean = float(np.mean(ref_accs))
    our_mean = float(np.mean(our_accs))
    # chance is 1/num_candidates = 0.25; the slot shares its label and a
    # 2-hop path with the correct candidate, so both sides must beat chance
    assert ref_mean > 0.3, f"reference failed to learn (accs={ref_accs})"
    assert min(our_accs) > 0.3, f"ours failed to learn (accs={our_accs})"
    assert our_mean >= ref_mean - 0.02, (
        f"ours {our_accs} (mean {our_mean:.4f}) vs "
        f"reference {ref_accs} (mean {ref_mean:.4f})"
    )
