#!/usr/bin/env python
"""Train Graph2Seq on jsonl(.gz) CodeGraph2Seq data
(reference CLI: ptgnn/implementations/graph2seq/train.py).

Usage:
    python -m ptgnn_tpu.implementations.graph2seq.train TRAIN_DATA VALID_DATA \
        MODEL_FILENAME [options]
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Optional

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.graph.embedders import StrElementRepresentationModel
from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel
from ptgnn_tpu.graph.messagepassing import GatedMessagePassingLayer, MeanResidualLayer
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.graph2seq.graph2seq import Graph2Seq
from ptgnn_tpu.sequence.grucopydecoder import GruCopyingDecoderModel
from ptgnn_tpu.utils.amlutils import configure_logging
from ptgnn_tpu.utils.io import configure_remote_io, data_path, iter_jsonl


def g2s_padding(max_nodes: int = 16384, max_graphs: int = 64) -> BatchPadding:
    return BatchPadding(
        max_nodes=max_nodes,
        max_edge_slots=max_nodes * 8,
        max_graphs=max_graphs,
        edge_tile=128,
        reference_budgets=(("backbone_nodes", max_nodes),),
    )


def create_graph2seq_model(
    embedding_size: int = 128,
    dropout_rate: float = 0.1,
    padding: Optional[BatchPadding] = None,
    max_seq_len: int = 8,
    token_vocabulary_size: int = 10000,
    decoder_hidden_size: Optional[int] = None,
    decoder_embedding_size: Optional[int] = None,
) -> Graph2Seq:
    """The reference architecture (graph2seq/train.py:54-107): token-vocab
    node embedder, 7 shared-weight GGNN layers + 1 fresh in a mean-residual
    block, GRU copy decoder.

    Decoder dims default to the reference factory's ratio (hidden =
    embedding_size, embedding = 2x), so the stock config is exactly the
    reference's 128/256 and non-default widths scale coherently instead of
    crashing against a hardcoded 128/256 decoder."""
    padding = padding if padding is not None else g2s_padding()
    if decoder_hidden_size is None:
        decoder_hidden_size = embedding_size
    if decoder_embedding_size is None:
        decoder_embedding_size = 2 * embedding_size

    def create_mp_layers(num_edges: int):
        ggnn_mp = GatedMessagePassingLayer(
            state_dimension=embedding_size,
            message_dimension=embedding_size,
            num_edge_types=num_edges,
            message_aggregation_function="sum",
            dropout_rate=dropout_rate,
        )
        r1 = MeanResidualLayer(embedding_size)
        return (
            [r1.pass_through_dummy_layer()]
            + [ggnn_mp] * 7
            + [
                r1,
                GatedMessagePassingLayer(
                    state_dimension=embedding_size,
                    message_dimension=embedding_size,
                    num_edge_types=num_edges,
                    message_aggregation_function="sum",
                    dropout_rate=dropout_rate,
                ),
            ]
        )

    return Graph2Seq(
        gnn_model=GraphNeuralNetworkModel(
            node_representation_model=StrElementRepresentationModel(
                token_splitting="token",
                embedding_size=embedding_size,
                vocabulary_size=token_vocabulary_size,
            ),
            message_passing_layer_creator=create_mp_layers,
            padding=padding,
        ),
        decoder=GruCopyingDecoderModel(
            hidden_size=decoder_hidden_size,
            embedding_size=decoder_embedding_size,
            memories_hidden_dim=embedding_size,
            max_seq_len=max_seq_len,
        ),
    )


def load_jsonl(path: Path):
    yield from iter_jsonl(path)


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("train_data_path", type=data_path)
    parser.add_argument("valid_data_path", type=data_path)
    parser.add_argument("model_filename", type=Path)
    parser.add_argument("--max-num-epochs", type=int, default=100)
    parser.add_argument("--minibatch-size", type=int, default=50)
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--gradient-accumulation", type=int, default=1,
                        help="apply the mean gradient of every k minibatches in one optimizer step")
    parser.add_argument("--restore-path", type=Path, default=None)
    parser.add_argument("--autotune", action="store_true",
                        help="measure candidate batch paddings on this "
                             "dataset before training and pick the fastest")
    parser.add_argument("--sequential-run", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--max-nodes", type=int, default=16384)
    parser.add_argument("--azure-info", type=Path, default=None,
                        help="JSON file of fsspec storage options for "
                             "remote (e.g. az://) dataset paths")
    return parser


def run(args: argparse.Namespace) -> ModelTrainer:
    configure_logging()
    if getattr(args, "azure_info", None) is not None:
        configure_remote_io(args.azure_info)
    training_data = LazyDataIterable(lambda: load_jsonl(args.train_data_path))
    validation_data = LazyDataIterable(lambda: load_jsonl(args.valid_data_path))

    model_path = args.model_filename
    assert model_path.name.endswith(".pkl.gz"), "MODEL_FILENAME must have a `.pkl.gz` suffix."

    initialize_metadata = True
    if args.restore_path is not None:
        initialize_metadata = False
        model, params = Graph2Seq.restore_model(args.restore_path)
    else:
        model = create_graph2seq_model(padding=g2s_padding(args.max_nodes))
        params = None
        if args.autotune:
            from ptgnn_tpu.utils.autotune import autotune_task_model, default_candidates

            model, _ = autotune_task_model(
                model,
                training_data,
                minibatch_size=args.minibatch_size,
                candidates=default_candidates(
                    max_nodes_options=(8192, 16384),
                    slots_per_node_options=(6.0, 8.0),
                    reference_budgets_fn=lambda mn: (("backbone_nodes", mn),),
                ),
                amp=args.amp,
                parallelize=not args.sequential_run,
            )

    trainer = ModelTrainer(
        model,
        model_path,
        max_num_epochs=args.max_num_epochs,
        minibatch_size=args.minibatch_size,
        enable_amp=args.amp,
        gradient_accumulation_steps=args.gradient_accumulation,
    )
    if params is not None:
        trainer.neural_module = model.build_neural_module()
        trainer.params = params

    trainer.train(
        training_data,
        validation_data,
        initialize_metadata=initialize_metadata,
        parallelize=not args.sequential_run,
        show_progress_bar=not args.quiet,
    )
    return trainer


def main() -> None:
    """Console entry point (pyproject.toml [project.scripts])."""
    logging.basicConfig(level=logging.INFO)
    run(build_arg_parser().parse_args())


if __name__ == "__main__":
    main()
