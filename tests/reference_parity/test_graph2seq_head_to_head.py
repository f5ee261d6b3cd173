"""Task-level head-to-head: train the ACTUAL reference Graph2Seq model
(torch, through the shims) and ours on IDENTICAL synthetic CodeGraph2Seq
samples, greedy-decode the validation set on both sides, and require the
set-F1 (the reference eval's primary metric, graph2seq/test.py:38-65) in
the same band. Completes head-to-head coverage of the reference's task zoo
(PPI, Graph2Class, VarMisuse have theirs)."""
import tempfile
from pathlib import Path

import numpy as np
import pytest
import torch

from tests.reference_parity.shims import install_reference_shims

install_reference_shims()

from ptgnn.baseneuralmodel import ModelTrainer as RefTrainer  # noqa: E402
from ptgnn.baseneuralmodel.utils.data import LazyDataIterable as RefLazyIterable  # noqa: E402
from ptgnn.implementations.graph2seq.graph2seq import Graph2Seq as RefGraph2Seq  # noqa: E402
from ptgnn.neuralmodels.embeddings.strelementrepresentationmodel import (  # noqa: E402
    StrElementRepresentationModel as RefStrModel,
)
from ptgnn.neuralmodels.gnn.graphneuralnetwork import (  # noqa: E402
    GraphNeuralNetworkModel as RefGnnModel,
)
from ptgnn.neuralmodels.gnn.messagepassing.gatedmessagepassing import (  # noqa: E402
    GatedMessagePassingLayer as RefGatedMp,
)
from ptgnn.neuralmodels.gnn.messagepassing.residuallayers import (  # noqa: E402
    MeanResidualLayer as RefMeanRes,
)
from ptgnn.neuralmodels.sequence.grucopydecoder import (  # noqa: E402
    GruCopyingDecoderModel as RefDecoderModel,
)

import optax  # noqa: E402

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.graph2seq.train import create_graph2seq_model
from ptgnn_tpu.utils.synthetic import synthetic_graph2seq_samples

HIDDEN = 32
EPOCHS = 8
SEEDS = (0, 1, 2)


def make_data():
    train = list(synthetic_graph2seq_samples(48, seed=0, mean_nodes=40, max_nodes=80))
    valid = list(synthetic_graph2seq_samples(64, seed=1, mean_nodes=40, max_nodes=80))
    return train, valid


def set_f1(pred_tokens, target_tokens) -> float:
    """The reference's set-F1 (graph2seq/test.py:48-58)."""
    pred = set(pred_tokens)
    pred.discard("%UNK%")
    target = set(target_tokens)
    precision = len(pred & target) / len(pred) if pred else 0.0
    recall = len(pred & target) / len(target)
    if precision + recall == 0:
        return 0.0
    return 2 * recall * precision / (precision + recall)


def create_ref_mp_layers(num_edges: int):
    """The reference factory shape (graph2seq/train.py:67-93): 7 shared-weight
    GGNN layers in a mean-residual block + 1 fresh, at a smaller hidden."""
    ggnn_mp = RefGatedMp(
        state_dimension=HIDDEN, message_dimension=HIDDEN,
        num_edge_types=num_edges, message_aggregation_function="sum",
        dropout_rate=0.1,
    )
    r1 = RefMeanRes(HIDDEN)
    return (
        [r1.pass_through_dummy_layer()] + [ggnn_mp] * 7 + [
            r1,
            RefGatedMp(
                state_dimension=HIDDEN, message_dimension=HIDDEN,
                num_edge_types=num_edges, message_aggregation_function="sum",
                dropout_rate=0.1,
            ),
        ]
    )


def train_reference(train, valid, seed: int = 0) -> float:
    import random

    random.seed(1_000_003 * seed + 17)  # the reference's global-random shuffle
    torch.manual_seed(seed)
    model = RefGraph2Seq(
        gnn_model=RefGnnModel(
            node_representation_model=RefStrModel(
                token_splitting="token", embedding_size=HIDDEN,
            ),
            message_passing_layer_creator=create_ref_mp_layers,
        ),
        decoder=RefDecoderModel(
            hidden_size=HIDDEN, embedding_size=2 * HIDDEN,
            memories_hidden_dim=HIDDEN, max_seq_len=8,
            vocabulary_count_threshold=2,
        ),
    )
    with tempfile.TemporaryDirectory() as td:
        trainer = RefTrainer(
            model, Path(td) / "ref.pkl.gz", max_num_epochs=EPOCHS, minibatch_size=8,
            optimizer_creator=lambda p: torch.optim.Adam(p, lr=1e-3),
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
        responses = model.greedy_decode(valid, trainer.neural_module, device="cpu")
    f1s = [
        set_f1(tokens, sample["method_name"])
        for (tokens, _), sample in zip(responses, valid)
    ]
    return float(np.mean(f1s))


def train_ours(train, valid, seed: int = 0) -> float:
    padding = BatchPadding(
        max_nodes=512, max_edge_slots=512 * 8, max_graphs=16, edge_tile=64,
        reference_budgets=(("backbone_nodes", 256),),
    )
    model = create_graph2seq_model(
        embedding_size=HIDDEN, padding=padding, max_seq_len=8,
    )
    with tempfile.TemporaryDirectory() as td:
        trainer = ModelTrainer(
            model, Path(td) / "ours.pkl.gz", max_num_epochs=EPOCHS, minibatch_size=8,
            optimizer_creator=lambda: optax.adam(1e-3),
            seed=seed,
        )
        trainer.train(
            LazyDataIterable(lambda: iter(train)),
            LazyDataIterable(lambda: iter(valid)),
            parallelize=False,
            validate_on_start=False,
            patience=EPOCHS,
        )
        responses = model.greedy_decode(valid, trainer.params, trainer.neural_module)
    f1s = [
        set_f1(resp[0], sample["method_name"])
        for resp, sample in zip(responses, valid)
        if resp is not None
    ]
    assert len(f1s) == len(valid), "no sample should be dropped at this padding"
    return float(np.mean(f1s))


@pytest.mark.slow
def test_graph2seq_f1_parity_with_reference():
    """Multi-seed band: mean greedy-decode set-F1 over 3 init seeds within
    0.03 of the reference's mean. Both task models expose only a loss metric
    (reference graph2seq.py:48-53), so best-checkpoint selection stays on
    validation loss for both sides; per-sample F1 is continuous, so 64
    validation samples give ample resolution for the band."""
    train, valid = make_data()
    ref_f1s = [train_reference(train, valid, seed=s) for s in SEEDS]
    our_f1s = [train_ours(train, valid, seed=s) for s in SEEDS]
    ref_mean = float(np.mean(ref_f1s))
    our_mean = float(np.mean(our_f1s))
    # The synthetic name is structurally determined (root -> RETURNS_TO ->
    # name nodes, utils/synthetic.py), so a working GNN+copy stack separates
    # cleanly from a broken one. Calibration on this config: untrained
    # params score ~0.24 (spraying backbone tokens), trained reference
    # 0.725-0.741, trained ours 0.710-0.745 across seeds 0-2.
    assert ref_mean > 0.5, f"reference failed to learn (f1s={ref_f1s})"
    assert min(our_f1s) > 0.5, f"ours failed to learn (f1s={our_f1s})"
    assert our_mean >= ref_mean - 0.03, (
        f"ours {our_f1s} (mean {our_mean:.4f}) vs "
        f"reference {ref_f1s} (mean {ref_mean:.4f})"
    )
