#!/usr/bin/env python
"""Distributed (data-parallel) Graph2Class training over all local devices
(reference CLI: ptgnn/implementations/typilus/traindistributed.py).

One process drives every device on this host (SPMD over a ``data`` mesh).
For multi-host slices, run the same command on every host with
``--coordinator`` / ``--num-processes`` / ``--process-id``.

Usage:
    python -m ptgnn_tpu.implementations.typilus.traindistributed TRAIN_DATA \
        VALID_DATA TEST_DATA MODEL_FILENAME [options]
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path

import optax

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.implementations.typilus.graph2class import Graph2Class
from ptgnn_tpu.implementations.typilus.train import (
    create_graph2class_gnn_model,
    default_padding,
)
from ptgnn_tpu.parallel.distributed_trainer import (
    DistributedModelTrainer,
    default_data_mesh,
    initialize_multi_host,
)
from ptgnn_tpu.utils.amlutils import configure_logging, log_run
from ptgnn_tpu.utils.io import configure_remote_io, data_path, load_from_folder


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("train_data_path", type=data_path)
    parser.add_argument("valid_data_path", type=data_path)
    parser.add_argument("test_data_path", type=data_path)
    parser.add_argument("model_filename", type=Path)
    parser.add_argument("--max-num-epochs", type=int, default=100)
    parser.add_argument("--minibatch-size", type=int, default=300)
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--restore-path", type=Path, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--max-nodes", type=int, default=131072)
    parser.add_argument("--world-size", type=int, default=None,
                        help="number of local devices to use (default: all)")
    parser.add_argument("--no-zero1", action="store_true",
                        help="disable optimizer-state sharding")
    parser.add_argument("--node-shards", type=int, default=None,
                        help="partition each batch's NODES over this many "
                             "devices (graphs larger than one chip become "
                             "trainable); remaining devices form the data "
                             "axis of a (data, node) mesh")
    parser.add_argument("--node-budget-headroom", type=float, default=1.5,
                        help="safety factor applied to the node-sharding "
                             "budgets probed from the first batches")
    # multi-host rendezvous (jax.distributed)
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--azure-info", type=Path, default=None,
                        help="JSON file of fsspec storage options for "
                             "remote (e.g. az://) dataset paths")
    return parser


def run(args: argparse.Namespace) -> None:
    if args.coordinator is not None:
        initialize_multi_host(args.coordinator, args.num_processes, args.process_id)
    configure_logging(rank=args.process_id)
    if getattr(args, "azure_info", None) is not None:
        configure_remote_io(args.azure_info)

    import jax

    if jax.process_count() > 1:
        # Multi-host: the mesh must span EVERY participating host's devices;
        # slicing the global device list would hand all devices to host 0.
        assert args.world_size is None, (
            "--world-size selects LOCAL devices and is single-host only; "
            "under --coordinator the mesh spans all hosts' devices"
        )
        num_devices = None
    else:
        num_devices = args.world_size
    if args.node_shards is not None:
        from ptgnn_tpu.parallel.node_sharded_trainer import node_data_mesh

        mesh = node_data_mesh(args.node_shards, num_devices)
        logging.info(
            "Hybrid mesh: %s data x %s node shards (%s).",
            mesh.shape["data"], mesh.shape["node"], jax.devices(),
        )
    else:
        mesh = default_data_mesh(num_devices)
        logging.info(
            "Data mesh over %s devices (%s).", mesh.shape["data"], jax.devices()
        )

    # Per-host file interleaving (reference: traindistributed.py:37-47).
    rank = args.process_id or 0
    world = args.num_processes or 1
    training_data = LazyDataIterable(
        lambda: load_from_folder(
            args.train_data_path, shuffle=True, rank=rank, world_size=world
        )
    )
    # Validation is rank-sharded too (each host evaluates 1/world of it;
    # the eval step's weighted psum makes the metrics global).
    validation_data = LazyDataIterable(
        lambda: load_from_folder(
            args.valid_data_path, shuffle=False, rank=rank, world_size=world
        )
    )

    model_path = args.model_filename
    assert model_path.name.endswith(".pkl.gz"), "MODEL_FILENAME must have a `.pkl.gz` suffix."

    initialize_metadata = True
    if args.restore_path is not None:
        initialize_metadata = False
        model, params = Graph2Class.restore_model(args.restore_path)
    else:
        model = create_graph2class_gnn_model(
            padding=default_padding(max_nodes=args.max_nodes)
        )
        params = None
    # Metadata must cover the FULL dataset (the reference computes it once
    # with rank 0 seeing everything, distributedtrainer.py:235-237) — NOT
    # this host's file shard; the trainer broadcasts the result to every
    # host before training.
    metadata_data = LazyDataIterable(
        lambda: load_from_folder(args.train_data_path, shuffle=False)
    )

    trainer_kwargs = dict(
        mesh=mesh,
        zero1=not args.no_zero1,
        max_num_epochs=args.max_num_epochs,
        minibatch_size=args.minibatch_size,
        optimizer_creator=lambda: optax.adam(0.00025),
        clip_gradient_norm=1.0,
        target_validation_metric="Accuracy",
        target_validation_metric_higher_is_better=True,
        enable_amp=args.amp,
    )
    if args.node_shards is not None:
        from ptgnn_tpu.parallel.node_sharded_trainer import NodeShardedModelTrainer

        trainer = NodeShardedModelTrainer(
            model, model_path,
            node_shards=args.node_shards,
            budget_headroom=args.node_budget_headroom,
            **trainer_kwargs,
        )
    else:
        trainer = DistributedModelTrainer(model, model_path, **trainer_kwargs)
    if params is not None:
        trainer.neural_module = model.build_neural_module()
        trainer.params = params
    elif initialize_metadata:
        trainer.load_metadata_and_create_network(metadata_data)
        initialize_metadata = False

    from ptgnn_tpu.utils.amlutils import get_run_context

    aml_ctx = get_run_context()
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
