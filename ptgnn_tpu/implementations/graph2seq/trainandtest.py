#!/usr/bin/env python
"""Train then evaluate Graph2Seq in one run
(reference CLI: ptgnn/implementations/graph2seq/trainandtest.py).

Usage:
    python -m ptgnn_tpu.implementations.graph2seq.trainandtest TRAIN_DATA \
        VALID_DATA TEST_DATA MODEL_FILENAME [options]
"""
from __future__ import annotations

import argparse
import logging

from ptgnn_tpu.implementations.graph2seq import test as test_cli
from ptgnn_tpu.implementations.graph2seq import train as train_cli
from ptgnn_tpu.utils.io import data_path


def run(args: argparse.Namespace) -> None:
    trainer = train_cli.run(args)
    data = list(train_cli.load_jsonl(args.test_data_path))
    metrics = test_cli.evaluate(
        trainer.model, trainer.params, trainer.neural_module, data, verbose=not args.quiet
    )
    print(f"Test metrics: {metrics}")


def main() -> None:
    """Console entry point (pyproject.toml [project.scripts])."""
    parser = train_cli.build_arg_parser()
    parser.add_argument("test_data_path", type=data_path)
    logging.basicConfig(level=logging.INFO)
    run(parser.parse_args())


if __name__ == "__main__":
    main()
