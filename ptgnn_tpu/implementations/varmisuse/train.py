#!/usr/bin/env python
"""Train VarMisuse (reference CLI: ptgnn/implementations/varmisuse/train.py).

Usage:
    python -m ptgnn_tpu.implementations.varmisuse.train TRAIN_DATA VALID_DATA \
        TEST_DATA MODEL_FILENAME [options]
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Optional

import optax

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel
from ptgnn_tpu.graph.messagepassing import (
    ConcatResidualLayer,
    GatedMessagePassingLayer,
    GruGlobalStateUpdate,
    MeanResidualLayer,
    MlpMessagePassingLayer,
)
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.varmisuse.candidateannotatedembeddings import (
    CandidateNodeAnnotationModel,
)
from ptgnn_tpu.implementations.varmisuse.varmisuse import VarMisuseModel
from ptgnn_tpu.reduceops import WeightedSumVarSizedElementReduce
from ptgnn_tpu.utils.amlutils import configure_logging
from ptgnn_tpu.utils.io import configure_remote_io, data_path, load_from_folder


def vm_padding(max_nodes: int = 8192, max_graphs: int = 64) -> BatchPadding:
    """Tuned default: like Graph2Class, VarMisuse throughput follows padded
    occupancy (BASELINE.md); 8k-node batches at 8 slots/node replace the
    reference-shaped 64k x 14 budgets. Raise --max-nodes for datasets with
    larger graphs, or pass --autotune."""
    return BatchPadding(
        max_nodes=max_nodes,
        max_edge_slots=max_nodes * 8,
        max_graphs=max_graphs,
        edge_tile=128,
        reference_budgets=vm_reference_budgets(max_nodes, max_graphs),
    )


def vm_reference_budgets(max_nodes: int, max_graphs: int = 64) -> tuple:
    return (
        ("candidate_nodes", max(512, max_graphs * 16)),
        ("slot_node_idx", max_graphs),
    )


def create_var_misuse_gnn_model(
    hidden_state_size: int = 64,
    padding: Optional[BatchPadding] = None,
    architecture: str = "mlp",
) -> VarMisuseModel:
    """The reference factory (varmisuse/train.py:41-122): char-CNN node
    embedder ⊕ candidate bit; 'mlp' = 12-layer max-aggregation MLP-MP with
    two concat-residual blocks; 'ggnn' = GGNN + GRU global updates."""
    padding = padding if padding is not None else vm_padding()

    def create_mlp_mp_layers(num_edges: int):
        mlp_mp_constructor = lambda: MlpMessagePassingLayer(
            input_state_dimension=hidden_state_size,
            message_dimension=hidden_state_size,
            output_state_dimension=hidden_state_size,
            num_edge_types=num_edges,
            message_aggregation_function="max",
            dropout_rate=0.1,
        )
        mlp_mp_after_res_constructor = lambda: MlpMessagePassingLayer(
            input_state_dimension=2 * hidden_state_size,
            message_dimension=2 * hidden_state_size,
            output_state_dimension=hidden_state_size,
            num_edge_types=num_edges,
            message_aggregation_function="max",
            dropout_rate=0.1,
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

    def create_ggnn_mp_layers(num_edges: int):
        ggnn_mp = GatedMessagePassingLayer(
            state_dimension=hidden_state_size,
            message_dimension=hidden_state_size,
            num_edge_types=num_edges,
            message_aggregation_function="sum",
            dropout_rate=0.01,
        )
        r1 = MeanResidualLayer(hidden_state_size)
        r2 = MeanResidualLayer(hidden_state_size)
        global_update = lambda: GruGlobalStateUpdate(
            global_graph_representation_module=WeightedSumVarSizedElementReduce(
                hidden_state_size
            ),
            input_state_size=hidden_state_size,
            summarized_state_size=hidden_state_size,
            dropout_rate=0.1,
        )
        return [
            r1.pass_through_dummy_layer(),
            r2.pass_through_dummy_layer(),
            ggnn_mp,
            ggnn_mp,
            ggnn_mp,
            global_update(),
            ggnn_mp,
            r1,
            ggnn_mp,
            ggnn_mp,
            ggnn_mp,
            global_update(),
            ggnn_mp,
            r2,
        ]

    creators = {"mlp": create_mlp_mp_layers, "ggnn": create_ggnn_mp_layers}
    return VarMisuseModel(
        gnn_model=GraphNeuralNetworkModel(
            node_representation_model=CandidateNodeAnnotationModel(
                embedding_size=hidden_state_size, token_splitting="char"
            ),
            message_passing_layer_creator=creators[architecture],
            padding=padding,
            max_nodes_per_graph=50000,
            max_graph_edges=500000,
            introduce_backwards_edges=True,
            add_self_edges=True,
            stop_extending_minibatch_after_num_nodes=min(80000, padding.max_nodes),
        ),
    )


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("train_data_path", type=data_path)
    parser.add_argument("valid_data_path", type=data_path)
    parser.add_argument("test_data_path", type=data_path)
    parser.add_argument("model_filename", type=Path)
    parser.add_argument("--max-num-epochs", type=int, default=100)
    parser.add_argument("--minibatch-size", type=int, default=300)
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--gradient-accumulation", type=int, default=1,
                        help="apply the mean gradient of every k minibatches in one optimizer step")
    parser.add_argument("--restore-path", type=Path, default=None)
    parser.add_argument("--sequential-run", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--max-nodes", type=int, default=8192)
    parser.add_argument("--architecture", choices=["mlp", "ggnn"], default="mlp")
    parser.add_argument("--autotune", action="store_true",
                        help="measure candidate batch paddings on this "
                             "dataset before training and pick the fastest")
    parser.add_argument("--azure-info", type=Path, default=None,
                        help="JSON file of fsspec storage options for "
                             "remote (e.g. az://) dataset paths")
    return parser


def run(args: argparse.Namespace) -> None:
    configure_logging()
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
        model, params = VarMisuseModel.restore_model(args.restore_path)
    else:
        model = create_var_misuse_gnn_model(
            padding=vm_padding(args.max_nodes), architecture=args.architecture
        )
        params = None
        if args.autotune:
            from ptgnn_tpu.utils.autotune import autotune_task_model

            model, _ = autotune_task_model(
                model,
                training_data,
                minibatch_size=args.minibatch_size,
                reference_budgets_fn=vm_reference_budgets,
                amp=args.amp,
                parallelize=not args.sequential_run,
            )

    trainer = ModelTrainer(
        model,
        model_path,
        max_num_epochs=args.max_num_epochs,
        minibatch_size=args.minibatch_size,
        optimizer_creator=lambda: optax.adam(1e-4),
        clip_gradient_norm=0.5,
        target_validation_metric="Accuracy",
        target_validation_metric_higher_is_better=True,
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
        patience=10,
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
