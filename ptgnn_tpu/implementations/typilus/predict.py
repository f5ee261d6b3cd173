#!/usr/bin/env python
"""Streaming type prediction with a trained Graph2Class model
(reference: ptgnn/implementations/typilus/predict.py).

Usage:
    python -m ptgnn_tpu.implementations.typilus.predict MODEL_FILENAME DATA_PATH
"""
from __future__ import annotations

import argparse
from pathlib import Path

from ptgnn_tpu.implementations.typilus.graph2class import Graph2Class
from ptgnn_tpu.utils.io import configure_remote_io, data_path, load_from_folder


def run(args: argparse.Namespace) -> None:
    if getattr(args, "azure_info", None) is not None:
        configure_remote_io(args.azure_info)
    data = load_from_folder(args.data_path, shuffle=False)
    model, params = Graph2Class.restore_model(args.model_filename)
    network = model.build_neural_module()

    for graph, suggestions in model.predict(data, params, network):
        for supernode_idx, (target_type, prob) in suggestions.items():
            supernode_info = graph["supernodes"][str(supernode_idx)]
            print(
                f'`{supernode_info["name"]}` Original: `{supernode_info.get("annotation")}` '
                f"Predicted: `{target_type}` ({prob:.2%})"
            )


def main() -> None:
    """Console entry point (pyproject.toml [project.scripts])."""
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_filename", type=Path)
    parser.add_argument("data_path", type=data_path)
    parser.add_argument("--azure-info", type=Path, default=None,
                        help="JSON file of fsspec storage options for "
                             "remote (e.g. az://) dataset paths")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
