"""PPI (GraphSAGE-format) dataset loading
(reference: ptgnn/implementations/ppi/dataloader.py:6-90).

Reads ``{fold}_graph.json`` (node-link JSON), ``{fold}_feats.npy``,
``{fold}_labels.npy``, ``{fold}_graph_id.npy`` and splits the disjoint union
into per-graph samples with node ids rebased to 0, one forward edge type.
"""
from __future__ import annotations

import json
from typing import Dict, List

import numpy as np

from ptgnn_tpu.utils.io import is_remote_path, join_path, open_binary


class PPIGraphSample:
    """A single PPI graph."""

    def __init__(
        self,
        adjacency_lists: List[np.ndarray],
        node_features: np.ndarray,
        node_labels: np.ndarray,
    ):
        self._adjacency_lists = adjacency_lists
        self._node_features = node_features
        self._node_labels = node_labels

    @property
    def node_labels(self) -> np.ndarray:
        """[V, C] bool labels."""
        return self._node_labels

    @property
    def adjacency_lists(self) -> List[np.ndarray]:
        """Per-edge-type [E, 2] int arrays."""
        return self._adjacency_lists

    @property
    def node_features(self) -> np.ndarray:
        """[V, F] float features."""
        return self._node_features


class PPIDatasetLoader:
    @classmethod
    def load_data(cls, data_dir, data_fold: str) -> List[PPIGraphSample]:
        if not is_remote_path(data_dir):
            data_dir = str(data_dir)
        print(f" Loading PPI {data_fold} data from {data_dir}.")

        with open_binary(join_path(data_dir, f"{data_fold}_graph.json")) as f:
            graph_json_data = json.load(f)
        with open_binary(join_path(data_dir, f"{data_fold}_feats.npy")) as f:
            node_to_features = np.load(f)
        with open_binary(join_path(data_dir, f"{data_fold}_labels.npy")) as f:
            node_to_labels = np.load(f)
        with open_binary(join_path(data_dir, f"{data_fold}_graph_id.npy")) as f:
            node_to_graph_id = np.load(f)

        # Group nodes by graph id (contiguous ranges in the GraphSAGE dump),
        # then rebase edges so each graph starts at node 0.
        graph_id_to_node_offset: Dict[int, int] = {}
        graph_id_to_edges: Dict[int, List] = {}
        order: List[int] = []
        for node_id in range(node_to_features.shape[0]):
            graph_id = int(node_to_graph_id[node_id])
            if graph_id not in graph_id_to_node_offset:
                graph_id_to_node_offset[graph_id] = node_id
                graph_id_to_edges[graph_id] = []
                order.append(graph_id)

        for edge_info in graph_json_data["links"]:
            src_node, tgt_node = edge_info["source"], edge_info["target"]
            graph_id = int(node_to_graph_id[src_node])
            offset = graph_id_to_node_offset[graph_id]
            graph_id_to_edges[graph_id].append((src_node - offset, tgt_node - offset))

        final_graphs: List[PPIGraphSample] = []
        for i, graph_id in enumerate(order):
            start = graph_id_to_node_offset[graph_id]
            end = (
                graph_id_to_node_offset[order[i + 1]]
                if i + 1 < len(order)
                else node_to_features.shape[0]
            )
            final_graphs.append(
                PPIGraphSample(
                    adjacency_lists=[np.asarray(graph_id_to_edges[graph_id], np.int32)],
                    node_features=np.asarray(node_to_features[start:end], np.float32),
                    node_labels=np.asarray(node_to_labels[start:end], bool),
                )
            )
        return final_graphs
