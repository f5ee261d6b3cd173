#!/usr/bin/env python
"""Evaluate a trained Graph2Seq model: greedy decode and report exact-match
accuracy, set-level P/R/F1, and Jaro-Winkler similarity
(reference CLI: ptgnn/implementations/graph2seq/test.py).

Usage:
    python -m ptgnn_tpu.implementations.graph2seq.test MODEL_FILENAME TEST_DATA
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Dict, List

import numpy as np

from ptgnn_tpu.implementations.graph2seq.graph2seq import Graph2Seq
from ptgnn_tpu.implementations.graph2seq.train import load_jsonl
from ptgnn_tpu.utils.io import configure_remote_io, data_path
from ptgnn_tpu.utils.strsim import jaro_winkler


def evaluate(model: Graph2Seq, params, network, data: List[dict], verbose: bool = True,
             beam_size: int = 1) -> Dict:
    """(reference: graph2seq/test.py:38-65; --beam-size > 1 scores the top
    beam instead of the greedy sequence — beyond the reference)."""
    if beam_size > 1:
        all_responses = [
            beams[0] for beams in model.beam_decode(data, params, network, beam_size=beam_size)
        ]
    else:
        all_responses = model.greedy_decode(data, params, network)
    correct_elements, jw_sim, num_elements = 0, 0.0, 0
    sum_f1, sum_precision, sum_recall = 0.0, 0.0, 0.0
    for response, actual_data in zip(all_responses, data):
        if response is None:  # dropped by size caps (decode warns)
            continue
        res_tokens, res_logprob = response
        num_elements += 1
        if verbose:
            print(
                f'{actual_data["method_name"]} -> {res_tokens} ({np.exp(res_logprob):.2f})'
            )
        jw_sim += jaro_winkler("".join(actual_data["method_name"]), "".join(res_tokens))
        if actual_data["method_name"] == res_tokens:
            correct_elements += 1
        res_token_set = set(res_tokens)
        res_token_set.discard("%UNK%")
        ground_tokens = set(actual_data["method_name"])
        precision = (
            len(res_token_set & ground_tokens) / len(res_token_set) if res_token_set else 0
        )
        recall = len(res_token_set & ground_tokens) / len(ground_tokens)
        if precision + recall > 0:
            sum_f1 += 2 * recall * precision / (precision + recall)
            sum_precision += precision
            sum_recall += recall

    return {
        "accuracy": correct_elements / num_elements,
        "f1": sum_f1 / num_elements,
        "precision": sum_precision / num_elements,
        "recall": sum_recall / num_elements,
        "jaro_winkler": jw_sim / num_elements,
    }


def run(args: argparse.Namespace) -> None:
    if getattr(args, "azure_info", None) is not None:
        configure_remote_io(args.azure_info)
    data = list(load_jsonl(args.test_data_path))
    model, params = Graph2Seq.restore_model(args.model_filename)
    network = model.build_neural_module()
    metrics = evaluate(model, params, network, data, beam_size=args.beam_size)
    print(f"Acc {metrics['accuracy']:%}")
    print(f"F1 {metrics['f1']}")
    print(f"Pr {metrics['precision']}  Re {metrics['recall']}")
    print(f"JW Sim {metrics['jaro_winkler']}")


def main() -> None:
    """Console entry point (pyproject.toml [project.scripts])."""
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_filename", type=Path)
    parser.add_argument("test_data_path", type=data_path)
    parser.add_argument("--beam-size", type=int, default=1,
                        help="beam search width; 1 = greedy")
    parser.add_argument("--azure-info", type=Path, default=None,
                        help="JSON file of fsspec storage options for "
                             "remote (e.g. az://) dataset paths")
    logging.basicConfig(level=logging.INFO)
    run(parser.parse_args())


if __name__ == "__main__":
    main()
