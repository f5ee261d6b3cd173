"""The message-passing GNN engine and its host-side model.

Mirrors the reference split (graphneuralnetwork.py:28-209 module,
:218-495 model) with the TPU-first changes documented in graph/structs.py:
the module is a pure function over a statically shaped GraphBatch; backwards
and self edges are materialized by the batcher; residual layers compose
functionally through an explicit stash; edge dropout is one bernoulli mask
over the fused edge array.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptgnn_tpu.core.data import enforce_not_None
from ptgnn_tpu.core.model import AbstractNeuralModel
from ptgnn_tpu.graph.batching import GraphBatcher
from ptgnn_tpu.graph.messagepassing.base import AbstractMessagePassingLayer, GraphContext
from ptgnn_tpu.graph.messagepassing.residual import AbstractResidualLayer, _ResidualOriginLayer
from ptgnn_tpu.graph.structs import (
    BatchPadding,
    GnnOutput,
    GraphBatch,
    GraphData,
    TensorizedGraphData,
)
from ptgnn_tpu.nn.module import Module, Params, fold

LOGGER = logging.getLogger(__name__)


class GraphNeuralNetwork(Module):
    """A generic message-passing GNN with discrete edge types (functional)."""

    def __init__(
        self,
        message_passing_layers: List[AbstractMessagePassingLayer],
        node_embedder: Module,
        edge_dropout_rate: float = 0.0,
        edge_feature_embedder: Optional[Module] = None,
    ):
        assert 0 <= edge_dropout_rate < 1
        self.message_passing_layers = message_passing_layers
        # Weight sharing by object identity: the reference's shared GGNN
        # configs reuse one layer object at several positions
        # (e.g. graph2seq/train.py:54-66); those positions must share one
        # parameter subtree (gradients then sum across uses).
        self._unique_layers = []
        self._layer_param_index = []
        seen = {}
        for layer in message_passing_layers:
            key = id(layer)
            if key not in seen:
                seen[key] = len(self._unique_layers)
                self._unique_layers.append(layer)
            self._layer_param_index.append(seen[key])
        self.node_embedder = node_embedder
        self.edge_dropout_rate = edge_dropout_rate
        self.edge_feature_embedder = edge_feature_embedder
        # Set by parallel.EdgeParallel: mesh axis the edge array is
        # partitioned over (static module config, not traced state).
        self.edge_partition_axis = None
        # Set by parallel.NodeParallel: mesh axis the node rows (and their
        # incoming edges) are partitioned over.
        self.node_partition_axis = None

    @property
    def input_node_state_dim(self) -> int:
        return self.message_passing_layers[0].input_state_dimension

    @property
    def output_node_state_dim(self) -> int:
        return self.message_passing_layers[-1].output_state_dimension

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self._unique_layers) + 2)
        params: Params = {
            "node_embedder": self.node_embedder.init(keys[0]),
            "mp_layers": [
                layer.init(k) for layer, k in zip(self._unique_layers, keys[2:])
            ],
        }
        if self.edge_feature_embedder is not None:
            params["edge_embedder"] = self.edge_feature_embedder.init(keys[1])
        return params

    def gnn(
        self,
        params: Params,
        node_representations: jax.Array,
        ctx: GraphContext,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        return_all_states: bool = False,
    ) -> jax.Array:
        """Run the MP layer stack (reference: graphneuralnetwork.py:83-134)."""
        if self.edge_dropout_rate > 0 and train:
            keep = jax.random.bernoulli(
                fold(rng, 7919), 1.0 - self.edge_dropout_rate, ctx.adjacency.mask.shape
            )
            adj = ctx.adjacency._replace(mask=jnp.logical_and(ctx.adjacency.mask, keep))
            ctx = ctx._replace(adjacency=adj, edge_mask_is_static=False)

        all_states = [node_representations]
        stash: Dict[int, jax.Array] = {}
        for i, layer in enumerate(self.message_passing_layers):
            layer_params = params["mp_layers"][self._layer_param_index[i]]
            layer_rng = fold(rng, i)
            if isinstance(layer, _ResidualOriginLayer):
                stash[id(layer.target_layer)] = node_representations
            elif isinstance(layer, AbstractResidualLayer):
                original = stash.pop(id(layer))
                node_representations = layer.combine(
                    layer_params, original, node_representations, train=train, rng=layer_rng
                )
            else:
                node_representations = layer.apply(
                    layer_params, node_representations, ctx, train=train, rng=layer_rng
                )
            all_states.append(node_representations)
        if return_all_states:
            node_representations = jnp.concatenate(all_states, axis=-1)
        return node_representations

    def _gnn_node_sharded(
        self,
        params: Params,
        node_representations: jax.Array,
        ctx: GraphContext,
        ns_static,
        axis: str,
        *,
        train: bool,
        rng: Optional[jax.Array],
        return_all_states: bool,
        edge_feature_table: Optional[jax.Array] = None,
    ) -> jax.Array:
        """The MP stack under receiver-aligned node sharding
        (parallel/node_sharding.py): per layer, exchange only the boundary
        sender features each shard reads (one all_to_all over ``axis``),
        then run the layer over the [local rows ++ recv] buffer. Aggregation
        is complete locally because every edge targeting a local row lives on
        this shard."""
        from ptgnn_tpu.parallel.node_sharding import (
            NodeShardCtx,
            exchange_boundary,
            merged_adjacency,
        )

        rows_per = node_representations.shape[0]
        adj_int = ctx.adjacency
        adj_bnd = ns_static.adjacency_bnd
        if self.edge_dropout_rate > 0 and train:
            # iid across shards: fold the shard index into the dropout key
            drop_rng = fold(rng, 7919)
            drop_rng = jax.random.fold_in(drop_rng, jax.lax.axis_index(axis))
            keep_i = jax.random.bernoulli(
                fold(drop_rng, 0), 1.0 - self.edge_dropout_rate, adj_int.mask.shape
            )
            keep_b = jax.random.bernoulli(
                fold(drop_rng, 1), 1.0 - self.edge_dropout_rate, adj_bnd.mask.shape
            )
            adj_int = adj_int._replace(mask=jnp.logical_and(adj_int.mask, keep_i))
            adj_bnd = adj_bnd._replace(mask=jnp.logical_and(adj_bnd.mask, keep_b))
            ctx = ctx._replace(edge_mask_is_static=False)
        merged = merged_adjacency(adj_int, adj_bnd, rows_per)
        edge_features = None
        if edge_feature_table is not None:
            slot = merged.edge_feature_slot
            gathered = jnp.take(edge_feature_table, jnp.maximum(slot, 0), axis=0)
            edge_features = jnp.where(
                slot[:, None] >= 0, gathered, jnp.zeros((), gathered.dtype)
            )
        ctx = ctx._replace(adjacency=merged, edge_features=edge_features)

        H = node_representations
        all_states = [H]
        stash: Dict[int, jax.Array] = {}
        for i, layer in enumerate(self.message_passing_layers):
            layer_params = params["mp_layers"][self._layer_param_index[i]]
            layer_rng = fold(rng, i)
            if isinstance(layer, _ResidualOriginLayer):
                stash[id(layer.target_layer)] = H
            elif isinstance(layer, AbstractResidualLayer):
                original = stash.pop(id(layer))
                H = layer.combine(
                    layer_params, original, H, train=train, rng=layer_rng
                )
            else:
                if getattr(layer, "supports_node_sharding", True) is False:
                    raise NotImplementedError(
                        f"{type(layer).__name__} does not support node-sharded "
                        "batches (its receptive field crosses shard rows); use "
                        "EdgeParallel or run it unsharded"
                    )
                if getattr(layer, "needs_boundary_exchange", True):
                    recv = exchange_boundary(H, ns_static.send_idx, axis)
                else:
                    # layer never reads sender features (GraphNorm, global
                    # exchange): skip the all_to_all, keep the buffer shape
                    recv = jnp.zeros(
                        (ns_static.send_idx.size, H.shape[-1]), H.dtype
                    )
                h_ext = jnp.concatenate([H, recv], axis=0)
                ctx_i = ctx._replace(
                    node_sharding=NodeShardCtx(
                        axis=axis,
                        rows_per=rows_per,
                        adj_int=adj_int,
                        adj_bnd=adj_bnd,
                        h_local=H,
                        recv=recv,
                        node_graph_global=ns_static.node_graph_global,
                        node_mask_global=ns_static.node_mask_global,
                        att_order_global=getattr(
                            ns_static, "att_order_global", None
                        ),
                    )
                )
                H = layer.apply(
                    layer_params, h_ext, ctx_i, train=train, rng=layer_rng
                )[:rows_per]
            all_states.append(H)
        if return_all_states:
            H = jnp.concatenate(all_states, axis=-1)
        return H

    def apply(
        self,
        params: Params,
        batch: GraphBatch,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        return_all_states: bool = False,
    ) -> Tuple[GnnOutput, Dict[str, Any]]:
        """Returns (GnnOutput, metric accumulators)."""
        if batch.node_sharding is not None:
            return self._apply_node_sharded(
                params, batch, train=train, rng=rng,
                return_all_states=return_all_states,
            )
        initial = self.node_embedder.apply(
            params["node_embedder"], **batch.node_data, train=train, rng=fold(rng, 104729)
        )  # [N_pad, D]

        edge_features = None
        if self.edge_feature_embedder is not None and batch.edge_feature_data is not None:
            embedded = self.edge_feature_embedder.apply(
                params["edge_embedder"], **batch.edge_feature_data,
                train=train, rng=fold(rng, 104730),
            )  # [F_budget, F]
            slot = batch.adjacency.edge_feature_slot
            gathered = jnp.take(
                embedded, jnp.maximum(slot, 0), axis=0
            )  # clamp; featureless slots zeroed below
            edge_features = jnp.where(
                slot[:, None] >= 0, gathered, jnp.zeros((), gathered.dtype)
            )

        ctx = GraphContext(
            adjacency=batch.adjacency,
            edge_features=edge_features,
            node_graph=batch.node_graph,
            node_mask=batch.node_mask,
            graph_mask=batch.graph_mask,
            references=batch.references,
            edge_axis=getattr(self, "edge_partition_axis", None),
            att_order=batch.att_order,
        )
        output = self.gnn(
            params, initial, ctx, train=train, rng=rng, return_all_states=return_all_states
        )
        metrics = {
            "num_graphs": batch.num_graphs,
            "num_nodes": batch.num_nodes,
            "num_edges": batch.num_edges,
        }
        gnn_out = GnnOutput(
            input_node_representations=initial,
            output_node_representations=output,
            node_to_graph_idx=batch.node_graph,
            node_mask=batch.node_mask,
            node_idx_references={n: r.node_ids for n, r in batch.references.items()},
            node_graph_idx_reference={n: r.graph_ids for n, r in batch.references.items()},
            reference_masks={n: r.mask for n, r in batch.references.items()},
            num_graphs=batch.num_graphs,
            graph_mask=batch.graph_mask,
        )
        return gnn_out, metrics

    def _apply_node_sharded(
        self,
        params: Params,
        batch: GraphBatch,
        *,
        train: bool,
        rng: Optional[jax.Array],
        return_all_states: bool,
    ) -> Tuple[GnnOutput, Dict[str, Any]]:
        """apply() for a receiver-aligned node-sharded batch. Runs inside a
        shard_map over ``self.node_partition_axis``: the embedder and MP
        stack see only this shard's rows; the readout all_gathers the final
        (small, [N, D]) representations so task heads run unchanged on global
        node ids. Per-layer exchanged volume stays O(boundary * D)."""
        axis = self.node_partition_axis
        assert axis is not None, (
            "node-sharded batch reached a GNN without node_partition_axis set "
            "(wrap the step with parallel.NodeParallel)"
        )
        ns = batch.node_sharding
        initial = self.node_embedder.apply(
            params["node_embedder"], **batch.node_data, train=train,
            rng=fold(rng, 104729),
        )  # [rows_per, D]
        edge_feature_table = None
        if self.edge_feature_embedder is not None and batch.edge_feature_data is not None:
            # The embedded feature table is small ([F_budget, F]) and the
            # per-shard layouts carry GLOBAL feature-slot indices, so the
            # table is computed replicated on every shard and gathered per
            # merged edge slot inside the stack.
            edge_feature_table = self.edge_feature_embedder.apply(
                params["edge_embedder"], **batch.edge_feature_data,
                train=train, rng=fold(rng, 104730),
            )
        ctx = GraphContext(
            adjacency=batch.adjacency,  # interior; replaced by merged inside
            edge_features=None,
            node_graph=batch.node_graph,  # [rows_ext] local
            node_mask=batch.node_mask,  # [rows_ext] local
            graph_mask=batch.graph_mask,
            references=batch.references,
            att_order=None,
        )
        output = self._gnn_node_sharded(
            params, initial, ctx, ns, axis, train=train, rng=rng,
            return_all_states=return_all_states,
            edge_feature_table=edge_feature_table,
        )  # [rows_per, D_out]
        # Readout: hand heads the LOCAL row tables plus the shard axis.
        # Heads assemble only the rows they consume through the GnnOutput
        # accessors (reference_rows/node_rows, O(refs*D)); nothing on the
        # sharded path materializes an O(N*D) buffer unless a head
        # explicitly calls node_table() for a genuinely whole-set readout.
        metrics = {
            "num_graphs": batch.num_graphs,
            "num_nodes": batch.num_nodes,
            "num_edges": batch.num_edges,
        }
        gnn_out = GnnOutput(
            input_node_representations=initial,
            output_node_representations=output,
            shard_axis=axis,
            node_to_graph_idx=ns.node_graph_global,
            node_mask=ns.node_mask_global,
            node_idx_references={n: r.node_ids for n, r in batch.references.items()},
            node_graph_idx_reference={n: r.graph_ids for n, r in batch.references.items()},
            reference_masks={n: r.mask for n, r in batch.references.items()},
            num_graphs=batch.num_graphs,
            graph_mask=batch.graph_mask,
        )
        return gnn_out, metrics


class GraphNeuralNetworkModel(AbstractNeuralModel):
    """Tensorization + static batching for graphs (reference:
    graphneuralnetwork.py:218-495)."""

    def __init__(
        self,
        *,
        node_representation_model: AbstractNeuralModel,
        message_passing_layer_creator: Callable[[int], List[AbstractMessagePassingLayer]],
        padding: BatchPadding,
        max_nodes_per_graph: int = 80000,
        max_graph_edges: int = 100000,
        introduce_backwards_edges: bool = True,
        stop_extending_minibatch_after_num_nodes: Optional[int] = None,
        add_self_edges: bool = False,
        edge_dropout_rate: float = 0.0,
        edge_representation_model: Optional[AbstractNeuralModel] = None,
    ):
        super().__init__()
        self.__message_passing_layers_creator = message_passing_layer_creator
        self.__node_embedding_model = node_representation_model
        self.__edge_embedding_model = edge_representation_model
        self.padding = padding
        self.max_nodes_per_graph = min(max_nodes_per_graph, padding.max_nodes)
        self.max_graph_edges = max_graph_edges
        self.introduce_backwards_edges = introduce_backwards_edges
        self.stop_extending_minibatch_after_num_nodes = (
            stop_extending_minibatch_after_num_nodes
            if stop_extending_minibatch_after_num_nodes is not None
            else padding.max_nodes
        )
        self.add_self_edges = add_self_edges
        self.edge_dropout_rate = edge_dropout_rate

    @property
    def node_embedding_model(self) -> AbstractNeuralModel:
        return self.__node_embedding_model

    # ---- metadata (reference: graphneuralnetwork.py:261-290) ----
    def initialize_metadata(self) -> None:
        self.__edge_types_mdata: Set[str] = set()
        self.__reference_names_mdata: Set[str] = set()

    def update_metadata_from(self, datapoint: GraphData) -> None:
        for node in datapoint.node_information:
            self.__node_embedding_model.update_metadata_from(node)
        for edge_type in datapoint.edges:
            self.__edge_types_mdata.add(edge_type)
        for name in datapoint.reference_nodes:
            self.__reference_names_mdata.add(name)
        if datapoint.edge_features is not None and self.__edge_embedding_model is not None:
            for edge_features in datapoint.edge_features.values():
                for edge_feature in edge_features:
                    self.__edge_embedding_model.update_metadata_from(edge_feature)

    def finalize_metadata(self) -> None:
        LOGGER.info("Found %s edge types in data.", len(self.__edge_types_mdata))
        # Sorted for run-to-run determinism (the reference uses set order).
        self.__edge_idx_to_type = tuple(sorted(self.__edge_types_mdata))
        self.__edge_types = {e: i for i, e in enumerate(self.__edge_idx_to_type)}
        self.__reference_names = tuple(sorted(self.__reference_names_mdata))
        del self.__edge_types_mdata
        del self.__reference_names_mdata

    @property
    def _num_edge_types(self) -> int:
        # One definition of the materialized type count: the batcher's
        # (backwards doubling + self-edge type). A desync would build MP
        # layers with the wrong weight-stack size.
        from ptgnn_tpu.graph.batching import materialized_edge_type_count

        return materialized_edge_type_count(
            len(self.__edge_types),
            introduce_backwards_edges=self.introduce_backwards_edges,
            add_self_edges=self.add_self_edges,
        )

    @property
    def edge_type_names(self) -> Tuple[str, ...]:
        return self.__edge_idx_to_type

    @property
    def reference_names(self) -> Tuple[str, ...]:
        return self.__reference_names

    def edge_idx_by_name(self, name: str) -> int:
        return self.__edge_types[name]

    def set_reference_names(self, names) -> None:
        """Extend the static reference-name set (for references only present
        at tensorize time, not in metadata)."""
        self.__reference_names = tuple(sorted(set(self.__reference_names) | set(names)))

    @property
    def edge_embedding_model(self):
        return self.__edge_embedding_model

    def build_neural_module(self) -> GraphNeuralNetwork:
        # The creator is usually an unpicklable closure (cf. the factory fns
        # in implementations/*/train.py); build once, cache the picklable
        # layer objects so a restored model can rebuild its module (the
        # reference instead pickles the torch module whole,
        # abstractneuralmodel.py:155-163).
        if getattr(self, "_built_mp_layers", None) is None:
            self._built_mp_layers = self.__message_passing_layers_creator(self._num_edge_types)
            del self.__message_passing_layers_creator
            # The reference asserts per-type list lengths at layer apply
            # (egcmessagepassing.py:63); here typed routing uses jnp.take,
            # whose clamping would silently project mismatched types with
            # the wrong weights — so the type count is checked ONCE at
            # build for every layer that declares one.
            for layer in self._built_mp_layers:
                declared = getattr(layer, "num_edge_types", None)
                assert declared is None or declared == self._num_edge_types, (
                    f"layer {type(layer).__name__} was built for {declared} "
                    f"edge types but the batch materializes "
                    f"{self._num_edge_types} (forward"
                    f"{' + backward' if self.introduce_backwards_edges else ''}"
                    f"{' + self' if self.add_self_edges else ''})"
                )
        gnn = GraphNeuralNetwork(
            self._built_mp_layers,
            node_embedder=self.__node_embedding_model.build_neural_module(),
            edge_dropout_rate=self.edge_dropout_rate,
            edge_feature_embedder=(
                self.__edge_embedding_model.build_neural_module()
                if self.__edge_embedding_model is not None
                else None
            ),
        )
        return gnn

    def _make_batcher(self) -> GraphBatcher:
        return GraphBatcher(
            num_fwd_edge_types=len(self.__edge_types),
            padding=self.padding,
            introduce_backwards_edges=self.introduce_backwards_edges,
            add_self_edges=self.add_self_edges,
            track_edge_features=self.__edge_embedding_model is not None,
        )

    # ---- tensorization (reference: graphneuralnetwork.py:314-367) ----
    def __iterate_edge_types(self, data: GraphData):
        for edge_type in self.__edge_idx_to_type:
            adjacency_list = data.edges.get(edge_type)
            if adjacency_list is not None and len(adjacency_list) > 0:
                adj = np.array(adjacency_list, dtype=np.int32)
                yield adj[:, 0], adj[:, 1]
            else:
                yield np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int32)

    def tensorize(self, datapoint: GraphData) -> Optional[TensorizedGraphData]:
        if len(datapoint.node_information) > self.max_nodes_per_graph:
            LOGGER.warning("Dropping graph with %s nodes.", len(datapoint.node_information))
            return None

        edge_features_flat = None
        if self.__edge_embedding_model is not None and datapoint.edge_features is not None:
            # Flattened in canonical edge-type order, matching the batcher's
            # per-graph feature numbering (graph/batching.py).
            edge_features_flat = []
            for edge_type in self.__edge_idx_to_type:
                feats = datapoint.edge_features.get(edge_type, [])
                type_edges = len(datapoint.edges.get(edge_type, []) or [])
                assert len(feats) == type_edges, (
                    f"edge type '{edge_type}' has {type_edges} edges but "
                    f"{len(feats)} edge features — a feature-tracking model "
                    "needs exactly one feature per edge (or edge_features="
                    "None for the whole graph)"
                )
                for feat in feats:
                    edge_features_flat.append(
                        enforce_not_None(self.__edge_embedding_model.tensorize(feat))
                    )

        tensorized = TensorizedGraphData(
            adjacency_lists=list(self.__iterate_edge_types(datapoint)),
            node_tensorized_data=[
                enforce_not_None(self.__node_embedding_model.tensorize(ni))
                for ni in datapoint.node_information
            ],
            edge_features=edge_features_flat,
            reference_nodes={
                n: np.array(refs, dtype=np.int32) for n, refs in datapoint.reference_nodes.items()
            },
            num_nodes=len(datapoint.node_information),
        )
        num_edges = tensorized.num_edges
        if num_edges > self.max_graph_edges:
            LOGGER.warning("Dropping graph with %s edges.", num_edges)
            return None
        # Must also fit an empty static batch on its own.
        batcher = self._make_batcher()
        if not batcher.can_add(tensorized, batcher.initialize()):
            LOGGER.warning(
                "Dropping graph (%s nodes / %s edges) exceeding static batch budgets.",
                tensorized.num_nodes,
                num_edges,
            )
            return None
        return tensorized

    # ---- minibatching ----
    def initialize_minibatch(self) -> Dict[str, Any]:
        mb = {
            "batcher": self._make_batcher(),
            "batcher_mb": None,  # created lazily below to keep dict picklable
            "node_data_mb": self.__node_embedding_model.initialize_minibatch(),
        }
        if self.__edge_embedding_model is not None:
            mb["edge_data_mb"] = self.__edge_embedding_model.initialize_minibatch()
        return mb

    def _batcher_mb(self, partial_minibatch: Dict[str, Any]) -> Dict[str, Any]:
        if partial_minibatch["batcher_mb"] is None:
            partial_minibatch["batcher_mb"] = partial_minibatch["batcher"].initialize()
        return partial_minibatch["batcher_mb"]

    def can_add_to_minibatch(self, tensorized: TensorizedGraphData, partial_minibatch) -> bool:
        return partial_minibatch["batcher"].can_add(
            tensorized, self._batcher_mb(partial_minibatch)
        )

    def extend_minibatch_with(self, tensorized: TensorizedGraphData, partial_minibatch) -> bool:
        continue_extending = True
        for node_info in tensorized.node_tensorized_data:
            continue_extending &= self.__node_embedding_model.extend_minibatch_with(
                node_info, partial_minibatch["node_data_mb"]
            )
        if self.__edge_embedding_model is not None and tensorized.edge_features is not None:
            for feat in tensorized.edge_features:
                self.__edge_embedding_model.extend_minibatch_with(
                    feat, partial_minibatch["edge_data_mb"]
                )
        mb = self._batcher_mb(partial_minibatch)
        partial_minibatch["batcher"].extend(tensorized, mb)
        continue_extending &= (
            mb["num_nodes_in_mb"] < self.stop_extending_minibatch_after_num_nodes
        )
        return continue_extending

    def finalize_minibatch(self, accumulated_minibatch_data: Dict[str, Any]) -> Dict[str, Any]:
        node_data = self.__node_embedding_model.finalize_minibatch(
            accumulated_minibatch_data["node_data_mb"], pad_to=self.padding.max_nodes
        )
        batch = accumulated_minibatch_data["batcher"].finalize(
            self._batcher_mb(accumulated_minibatch_data),
            node_data=node_data,
            reference_names=self.__reference_names,
        )
        if self.__edge_embedding_model is not None:
            edge_data = self.__edge_embedding_model.finalize_minibatch(
                accumulated_minibatch_data["edge_data_mb"],
                pad_to=self.padding.max_edge_slots,
            )
            batch = batch._replace(edge_feature_data=edge_data)
        return {"batch": batch}
