#!/usr/bin/env python
"""Train Graph2Class (Typilus) on a folder of .jsonl.gz Typilus graphs.

TPU-native equivalent of the reference CLI
(ptgnn/implementations/typilus/train.py): same model architecture (12-layer
MLP-MP net with two concat-residual blocks, subtoken node embedder, max
aggregation) and training hyperparameters (Adam lr 2.5e-4, clip 1.0,
Accuracy-driven early stopping), argparse instead of docopt.

Usage:
    python -m ptgnn_tpu.implementations.typilus.train TRAIN_DATA_PATH \
        VALID_DATA_PATH TEST_DATA_PATH MODEL_FILENAME [options]
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Optional

import optax

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.graph.embedders import StrElementRepresentationModel
from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel
from ptgnn_tpu.graph.messagepassing import (
    ConcatResidualLayer,
    GatedMessagePassingLayer,
    MlpMessagePassingLayer,
)
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.graph2class import Graph2Class
from ptgnn_tpu.utils.amlutils import configure_logging, log_run
from ptgnn_tpu.utils.io import configure_remote_io, data_path, load_from_folder


def default_padding(
    max_nodes: int = 8192,
    max_graphs: Optional[int] = None,
    edge_slots_per_node: float = 6.0,
) -> BatchPadding:
    """Static batch budgets: the TUNED headline configuration from the v5e
    occupancy sweep (BASELINE.md) — 8k-node batches at 6 edge slots/node beat
    the reference-shaped 120k-node batches ~2x per edge, because on TPU the
    irregular-op cost follows PADDED slots, not real edges. Graphs larger
    than ``max_nodes`` are dropped (the reference drops above its own
    max_nodes_per_graph, typilus/train.py:112-116); raise ``--max-nodes``
    for datasets with bigger graphs, or pass ``--autotune`` to re-measure on
    your own data."""
    return BatchPadding(
        max_nodes=max_nodes,
        max_edge_slots=int(max_nodes * edge_slots_per_node) // 128 * 128,
        max_graphs=max_graphs if max_graphs is not None else max(8, max_nodes // 1024),
        edge_tile=128,
        reference_budgets=typilus_reference_budgets(max_nodes),
    )


def typilus_reference_budgets(max_nodes: int) -> tuple:
    return (
        ("supernodes", max(512, max_nodes // 16)),
        ("token-sequence", max_nodes),
    )


def create_graph2class_gnn_model(
    hidden_state_size: int = 64,
    dropout_rate: float = 0.1,
    padding: Optional[BatchPadding] = None,
    architecture: str = "mlp",
    min_freq_threshold: int = 5,
) -> Graph2Class:
    """The reference's model factory (typilus/train.py:38-120): 'mlp' is the
    benchmark config; 'ggnn' is the shared-weight GGNN alternative."""
    padding = padding if padding is not None else default_padding()

    def create_ggnn_mp_layers(num_edges: int):
        ggnn_mp = GatedMessagePassingLayer(
            state_dimension=hidden_state_size,
            message_dimension=hidden_state_size,
            num_edge_types=num_edges,
            message_aggregation_function="max",
            dropout_rate=dropout_rate,
        )
        r1 = ConcatResidualLayer(hidden_state_size)
        return (
            [r1.pass_through_dummy_layer()]
            + [ggnn_mp] * 7  # shared weights: same layer object reused
            + [
                r1,
                GatedMessagePassingLayer(
                    state_dimension=2 * hidden_state_size,
                    message_dimension=hidden_state_size,
                    num_edge_types=num_edges,
                    message_aggregation_function="max",
                    dropout_rate=dropout_rate,
                ),
            ]
        )

    def create_mlp_mp_layers(num_edges: int):
        mlp_mp_constructor = lambda: MlpMessagePassingLayer(
            input_state_dimension=hidden_state_size,
            message_dimension=hidden_state_size,
            output_state_dimension=hidden_state_size,
            num_edge_types=num_edges,
            message_aggregation_function="max",
            dropout_rate=dropout_rate,
        )
        mlp_mp_after_res_constructor = lambda: MlpMessagePassingLayer(
            input_state_dimension=2 * hidden_state_size,
            message_dimension=2 * hidden_state_size,
            output_state_dimension=hidden_state_size,
            num_edge_types=num_edges,
            message_aggregation_function="max",
            dropout_rate=dropout_rate,
        )
        r1 = ConcatResidualLayer(hidden_state_size)
        r2 = ConcatResidualLayer(hidden_state_size)
        return [
            r1.pass_through_dummy_layer(),
            mlp_mp_constructor(),
            mlp_mp_constructor(),
            mlp_mp_constructor(),
            r1,
            mlp_mp_after_res_constructor(),
            r2.pass_through_dummy_layer(),
            mlp_mp_constructor(),
            mlp_mp_constructor(),
            mlp_mp_constructor(),
            r2,
            mlp_mp_after_res_constructor(),
        ]

    creators = {"mlp": create_mlp_mp_layers, "ggnn": create_ggnn_mp_layers}
    return Graph2Class(
        gnn_model=GraphNeuralNetworkModel(
            node_representation_model=StrElementRepresentationModel(
                embedding_size=hidden_state_size,
                token_splitting="subtoken",
                subtoken_combination="mean",
                vocabulary_size=10000,
                min_freq_threshold=min_freq_threshold,
                dropout_rate=dropout_rate,
            ),
            message_passing_layer_creator=creators[architecture],
            padding=padding,
            max_nodes_per_graph=100000,
            max_graph_edges=500000,
            introduce_backwards_edges=True,
            add_self_edges=True,
            stop_extending_minibatch_after_num_nodes=min(120000, padding.max_nodes),
            edge_dropout_rate=0.0,
        ),
        max_num_classes=100,
    )


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("train_data_path", type=data_path)
    parser.add_argument("valid_data_path", type=data_path)
    parser.add_argument("test_data_path", type=data_path)
    parser.add_argument("model_filename", type=Path)
    parser.add_argument("--max-num-epochs", type=int, default=100)
    parser.add_argument("--minibatch-size", type=int, default=300)
    parser.add_argument("--amp", action="store_true", help="bf16 mixed precision")
    parser.add_argument("--gradient-accumulation", type=int, default=1,
                        help="apply the mean gradient of every k minibatches in one optimizer step")
    parser.add_argument("--restore-path", type=Path, default=None)
    parser.add_argument("--restore-optimizer", action="store_true")
    parser.add_argument("--sequential-run", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--aml", action="store_true")
    parser.add_argument("--max-nodes", type=int, default=8192,
                        help="static per-batch node budget (graphs larger "
                             "than this are dropped)")
    parser.add_argument("--architecture", choices=["mlp", "ggnn"], default="mlp")
    parser.add_argument("--autotune", action="store_true",
                        help="measure candidate batch paddings on this "
                             "dataset before training and pick the fastest")
    parser.add_argument("--azure-info", type=Path, default=None,
                        help="JSON file of fsspec storage options for "
                             "remote (e.g. az://) dataset paths")
    return parser


def run(args: argparse.Namespace) -> None:
    from ptgnn_tpu.utils.amlutils import get_run_context

    aml_ctx = get_run_context() if args.aml else None
    configure_logging(aml_ctx)
    if getattr(args, "azure_info", None) is not None:
        configure_remote_io(args.azure_info)

    training_data = LazyDataIterable(
        lambda: load_from_folder(args.train_data_path, shuffle=True)
    )
    validation_data = LazyDataIterable(
        lambda: load_from_folder(args.valid_data_path, shuffle=False)
    )

    model_path = args.model_filename
    assert model_path.name.endswith(".pkl.gz"), "MODEL_FILENAME must have a `.pkl.gz` suffix."

    initialize_metadata = True
    if args.restore_path is not None:
        initialize_metadata = False
        model, params = Graph2Class.restore_model(args.restore_path)
    else:
        params = None
        model = create_graph2class_gnn_model(
            padding=default_padding(max_nodes=args.max_nodes),
            architecture=args.architecture,
        )
        if args.autotune:
            from ptgnn_tpu.utils.autotune import autotune_task_model

            model, _ = autotune_task_model(
                model,
                training_data,
                minibatch_size=args.minibatch_size,
                reference_budgets_fn=typilus_reference_budgets,
                amp=args.amp,
                parallelize=not args.sequential_run,
            )
            # the retuned clone carries its metadata; the trainer detects
            # that and skips the second scan

    trainer = ModelTrainer(
        model,
        model_path,
        max_num_epochs=args.max_num_epochs,
        minibatch_size=args.minibatch_size,
        optimizer_creator=lambda: optax.adam(0.00025),
        clip_gradient_norm=1.0,
        target_validation_metric="Accuracy",
        target_validation_metric_higher_is_better=True,
        enable_amp=args.amp,
        gradient_accumulation_steps=args.gradient_accumulation,
    )
    if params is not None:
        if args.restore_optimizer:
            # restore_parameters re-loads the checkpoint (module + params +
            # optimizer state) itself — setting them first would unpickle
            # the whole multi-hundred-MB blob twice for nothing.
            trainer.restore_parameters(args.restore_path, restore_optimizer=True)
        else:
            trainer.neural_module = model.build_neural_module()
            trainer.params = params

    trainer.register_train_epoch_end_hook(
        lambda model, nn, epoch, metrics: log_run(aml_ctx, "train", model, epoch, metrics)
    )
    trainer.register_validation_epoch_end_hook(
        lambda model, nn, epoch, metrics: log_run(aml_ctx, "valid", model, epoch, metrics)
    )

    trainer.train(
        training_data,
        validation_data,
        initialize_metadata=initialize_metadata,
        parallelize=not args.sequential_run,
        patience=10,
        store_tensorized_data_in_memory=True,
        show_progress_bar=not args.quiet,
    )

    test_data = LazyDataIterable(lambda: load_from_folder(args.test_data_path, shuffle=False))
    acc = model.report_accuracy(iter(test_data), trainer.params, trainer.neural_module)
    print(f"Test accuracy: {acc:%}")


def main() -> None:
    """Console entry point (pyproject.toml [project.scripts])."""
    logging.basicConfig(level=logging.INFO)
    run(build_arg_parser().parse_args())


if __name__ == "__main__":
    main()
