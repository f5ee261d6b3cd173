#!/usr/bin/env python
"""Train PPI multi-label node classification
(reference CLI: ptgnn/implementations/ppi/train.py).

Usage:
    python -m ptgnn_tpu.implementations.ppi.train DATA_PATH MODEL_FILENAME [options]
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Optional

import optax

from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.graph.embedders import FeatureRepresentationModel
from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel
from ptgnn_tpu.graph.messagepassing import MeanResidualLayer, MlpMessagePassingLayer
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.ppi.dataloader import PPIDatasetLoader
from ptgnn_tpu.implementations.ppi.ppi import PPIMulticlassClassification
from ptgnn_tpu.utils.amlutils import configure_logging
from ptgnn_tpu.utils.io import configure_remote_io, data_path


def ppi_padding(max_nodes: int = 4096) -> BatchPadding:
    """PPI graphs average ~2.4k nodes / ~34k edges; the reference stops
    batches at 3000 nodes (ppi/train.py:69), so one padded batch holds 1-2
    graphs. PPI is dense: ~28 edges/node posting fwd+bwd+self."""
    return BatchPadding(
        max_nodes=max_nodes,
        max_edge_slots=max_nodes * 30,
        max_graphs=8,
        edge_tile=128,
    )


def create_ppi_gnn_model(
    hidden_state_size: int = 256, padding: Optional[BatchPadding] = None
) -> PPIMulticlassClassification:
    """The reference model factory (ppi/train.py:35-72): 5 sum-aggregation
    MLP-MP layers in two mean-residual blocks, Tanh feature embedder."""
    padding = padding if padding is not None else ppi_padding()

    def create_mp_layers(num_edges: int):
        mlp_mp_constructor = lambda: MlpMessagePassingLayer(
            input_state_dimension=hidden_state_size,
            message_dimension=hidden_state_size,
            output_state_dimension=hidden_state_size,
            num_edge_types=num_edges,
            message_aggregation_function="sum",
            dropout_rate=0.2,
        )
        r1 = MeanResidualLayer(hidden_state_size)
        r2 = MeanResidualLayer(hidden_state_size)
        return [
            r1.pass_through_dummy_layer(),
            mlp_mp_constructor(),
            mlp_mp_constructor(),
            mlp_mp_constructor(),
            r1,
            r2.pass_through_dummy_layer(),
            mlp_mp_constructor(),
            mlp_mp_constructor(),
            r2,
        ]

    return PPIMulticlassClassification(
        gnn_model=GraphNeuralNetworkModel(
            node_representation_model=FeatureRepresentationModel(
                embedding_size=hidden_state_size, activation="tanh"
            ),
            message_passing_layer_creator=create_mp_layers,
            padding=padding,
            max_nodes_per_graph=6000,
            max_graph_edges=300000,
            introduce_backwards_edges=True,
            add_self_edges=True,
            stop_extending_minibatch_after_num_nodes=3000,
        ),
    )


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_path", type=data_path)
    parser.add_argument("model_filename", type=Path)
    parser.add_argument("--max-num-epochs", type=int, default=100)
    parser.add_argument("--minibatch-size", type=int, default=50)
    parser.add_argument("--restore-path", type=Path, default=None)
    parser.add_argument("--autotune", action="store_true",
                        help="measure candidate batch paddings on this "
                             "dataset before training and pick the fastest")
    parser.add_argument("--amp", action="store_true", help="bf16 mixed precision")
    parser.add_argument("--sequential-run", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--max-nodes", type=int, default=4096)
    parser.add_argument("--gradient-accumulation", type=int, default=1,
                        help="apply the mean gradient of every k minibatches in one optimizer step")
    parser.add_argument("--azure-info", type=Path, default=None,
                        help="JSON file of fsspec storage options for "
                             "remote (e.g. az://) dataset paths")
    return parser


def run(args: argparse.Namespace) -> None:
    configure_logging()
    if getattr(args, "azure_info", None) is not None:
        configure_remote_io(args.azure_info)
    training_data = PPIDatasetLoader.load_data(args.data_path, "train")
    validation_data = PPIDatasetLoader.load_data(args.data_path, "valid")

    model_path = args.model_filename
    assert model_path.name.endswith(".pkl.gz"), "MODEL_FILENAME must have a `.pkl.gz` suffix."

    initialize_metadata = True
    if args.restore_path is not None:
        initialize_metadata = False
        model, params = PPIMulticlassClassification.restore_model(args.restore_path)
    else:
        model = create_ppi_gnn_model(padding=ppi_padding(args.max_nodes))
        params = None
        if args.autotune:
            from ptgnn_tpu.utils.autotune import autotune_task_model, default_candidates

            model, _ = autotune_task_model(
                model,
                training_data,
                minibatch_size=args.minibatch_size,
                # PPI is dense (~28 materialized edges/node): its candidate
                # grid needs fatter slot budgets than the code-graph tasks
                candidates=default_candidates(
                    max_nodes_options=(2048, 4096, 8192),
                    slots_per_node_options=(24.0, 30.0, 36.0),
                ),
                amp=args.amp,
                parallelize=not args.sequential_run,
            )

    trainer = ModelTrainer(
        model,
        model_path,
        max_num_epochs=args.max_num_epochs,
        minibatch_size=args.minibatch_size,
        gradient_accumulation_steps=args.gradient_accumulation,
        optimizer_creator=lambda: optax.adam(1e-3),
        enable_amp=args.amp,
        clip_gradient_norm=1.0,
        target_validation_metric="f1_score",
        target_validation_metric_higher_is_better=True,
    )
    if params is not None:
        trainer.neural_module = model.build_neural_module()
        trainer.params = params

    trainer.train(
        training_data,
        validation_data,
        initialize_metadata=initialize_metadata,
        parallelize=not args.sequential_run,
        patience=20,
        store_tensorized_data_in_memory=True,
        show_progress_bar=not args.quiet,
    )

    test_data = PPIDatasetLoader.load_data(args.data_path, "test")
    metrics = model.report_metrics(test_data, trainer.params, trainer.neural_module)
    print(f"Test metrics: {metrics}")


def main() -> None:
    """Console entry point (pyproject.toml [project.scripts])."""
    logging.basicConfig(level=logging.INFO)
    run(build_arg_parser().parse_args())


if __name__ == "__main__":
    main()
