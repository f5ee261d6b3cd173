"""FULL Graph2Class step gradient parity vs the actual reference.

One fp64 forward+backward of the complete task pipeline — token embedder ->
MLP-MP(max) GNN stack -> supernode classifier -> cross-entropy — with the
reference's weights injected through explicit vocabulary/edge-type/class
permutations (both sides build their own vocabularies from the same data;
token and class index spaces are aligned by string, edge-type stacks by type
name). Loss, embedding-row gradients, every MP-layer gradient, and the
classifier gradients must agree.
"""
import re

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.reference_parity.shims import install_reference_shims

install_reference_shims()

from ptgnn.implementations.typilus.graph2class import Graph2Class as RefG2C  # noqa: E402
from ptgnn.neuralmodels.embeddings.strelementrepresentationmodel import (  # noqa: E402
    StrElementRepresentationModel as RefStr,
)
from ptgnn.neuralmodels.gnn.graphneuralnetwork import (  # noqa: E402
    GraphNeuralNetworkModel as RefGnnModel,
)
from ptgnn.neuralmodels.gnn.messagepassing.mlpmessagepassing import (  # noqa: E402
    MlpMessagePassingLayer as RefMlpMp,
)

from ptgnn_tpu.graph.embedders import StrElementRepresentationModel  # noqa: E402
from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel  # noqa: E402
from ptgnn_tpu.graph.messagepassing import MlpMessagePassingLayer  # noqa: E402
from ptgnn_tpu.graph.structs import BatchPadding  # noqa: E402
from ptgnn_tpu.implementations.typilus.graph2class import Graph2Class  # noqa: E402
from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs  # noqa: E402

H = 16
N_LAYERS = 2


def _strip(k):
    return re.sub(r"_[A-Za-z0-9]+__", "", k)


def _relabel(graphs):
    types = ["int", "str", "bool", "float"]
    for g in graphs:
        for sn in g["supernodes"].values():
            sn["annotation"] = types[sum(map(ord, sn["name"])) % len(types)]
    return graphs


@pytest.fixture()
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_graph2class_full_step_grad_parity(x64):
    graphs = _relabel(list(synthetic_typilus_graphs(5, seed=3, mean_nodes=18, max_nodes=30)))

    # ---- reference model ----
    torch.manual_seed(0)
    ref = RefG2C(
        gnn_model=RefGnnModel(
            node_representation_model=RefStr(
                embedding_size=H, token_splitting="token", vocabulary_size=500,
                min_freq_threshold=1, dropout_rate=0.0,
            ),
            message_passing_layer_creator=lambda t: [
                RefMlpMp(
                    input_state_dimension=H, message_dimension=H,
                    output_state_dimension=H, num_edge_types=t,
                    message_aggregation_function="max", dropout_rate=0.0,
                )
                for _ in range(N_LAYERS)
            ],
            max_nodes_per_graph=10000, max_graph_edges=10000,
            introduce_backwards_edges=True, add_self_edges=True,
            stop_extending_minibatch_after_num_nodes=10000, edge_dropout_rate=0.0,
        ),
        max_num_classes=20,
    )
    ref.compute_metadata(iter(graphs))
    ref_net = ref.build_neural_module().double()
    ref_net.eval()

    # ---- our model, same data ----
    padding = BatchPadding(
        max_nodes=256, max_edge_slots=256 * 10, max_graphs=8, edge_tile=32,
        agg_rows=32, agg_sum_tile=0,
        reference_budgets=(("supernodes", 64), ("token-sequence", 256)),
    )
    ours = Graph2Class(
        gnn_model=GraphNeuralNetworkModel(
            node_representation_model=StrElementRepresentationModel(
                token_splitting="token", embedding_size=H, dropout_rate=0.0,
                vocabulary_size=500, min_freq_threshold=1,
            ),
            message_passing_layer_creator=lambda t: [
                MlpMessagePassingLayer(
                    input_state_dimension=H, output_state_dimension=H,
                    message_dimension=H, num_edge_types=t,
                    message_aggregation_function="max", dropout_rate=0.0,
                )
                for _ in range(N_LAYERS)
            ],
            padding=padding,
            introduce_backwards_edges=True,
            add_self_edges=True,
        ),
        max_num_classes=20,
    )
    ours.compute_metadata(iter(graphs))
    module = ours.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), params)

    # ---- alignment permutations ----
    ref_gm = ref.__dict__["_Graph2Class__gnn_model"]
    ref_emb_model = ref_gm.__dict__["_GraphNeuralNetworkModel__node_embedding_model"]
    ref_vocab = ref_emb_model.__dict__["_StrElementRepresentationModel__vocabulary"]
    ref_types = ref_gm.__dict__["_GraphNeuralNetworkModel__edge_types"]
    ref_class_vocab = ref.__dict__["_Graph2Class__target_vocab"]

    our_emb_model = ours.gnn_model.node_embedding_model
    our_vocab = our_emb_model.__dict__["_StrElementRepresentationModel__vocabulary"]
    our_class_vocab = ours.target_vocab

    T = len(ours.gnn_model.edge_type_names)
    # edge-type permutation by name, extended to backward (T+t) and self (2T)
    type_perm = np.zeros(2 * T + 1, np.int64)
    for our_t, name in enumerate(ours.gnn_model.edge_type_names):
        assert name in ref_types, name
        type_perm[our_t] = ref_types[name]
        type_perm[T + our_t] = T + ref_types[name]
    type_perm[2 * T] = 2 * T

    w = {_strip(k): v for k, v in ref_net.state_dict().items()}

    def j64(t):
        return jnp.asarray(t.detach().numpy())

    def align_rows(our_names, ref_lookup, ref_matrix, our_matrix):
        """our_matrix[i] = ref_matrix[ref_id(our_names[i])]; returns the
        (aligned copy, list of comparable row indices)."""
        out = np.array(our_matrix, np.float64)
        rows = []
        for i, tok in enumerate(our_names):
            rid = ref_lookup(tok)
            if rid is None:
                continue
            out[i] = ref_matrix[rid].detach().numpy()
            rows.append((i, rid))
        return jnp.asarray(out), rows

    def vocab_names(v):
        # both vocab implementations expose id -> token
        if hasattr(v, "id_to_token"):
            return list(v.id_to_token)
        return [v.get_name_for_id(i) for i in range(len(v))]

    def lookup_in(v):
        def f(tok):
            try:
                i = v.get_id_or_unk(tok)
            except Exception:
                return None
            # only map tokens that are NOT the unk fallback (or map unk once)
            return i
        return f

    emb_key = "gnn.node_embedder.embeddings.weight"
    our_tokens = vocab_names(our_vocab)
    emb_aligned, emb_rows = align_rows(
        our_tokens, lookup_in(ref_vocab), w[emb_key],
        np.asarray(params["gnn"]["node_embedder"]["embeddings"]["weight"]),
    )
    params["gnn"]["node_embedder"]["embeddings"]["weight"] = emb_aligned

    # MP layers: per-type weight stacks permuted by type name
    for i in range(N_LAYERS):
        stack = jnp.stack(
            [
                j64(w[f"gnn.message_passing_layers.{i}."
                      f"edge_message_transformation_layers.{int(rt)}."
                      "mlp_modules.1.weight"]).T
                for rt in type_perm
            ]
        )
        params["gnn"]["mp_layers"][i] = {
            "message_mlp": {"weights_0": stack},
            "layer_norm": {
                "weight": j64(w[f"gnn.message_passing_layers.{i}.state_update.0.weight"]),
                "bias": j64(w[f"gnn.message_passing_layers.{i}.state_update.0.bias"]),
            },
            "dense": {
                "weight": j64(w[f"gnn.message_passing_layers.{i}.state_update.1.weight"]),
                "bias": j64(w[f"gnn.message_passing_layers.{i}.state_update.1.bias"]),
            },
        }

    our_classes = vocab_names(our_class_vocab)
    head_w, class_rows = align_rows(
        our_classes, lookup_in(ref_class_vocab), w["node_to_class.weight"],
        np.asarray(params["node_to_class"]["weight"]),
    )
    head_b, _ = align_rows(
        our_classes, lookup_in(ref_class_vocab),
        w["node_to_class.bias"].reshape(-1, 1),
        np.asarray(params["node_to_class"]["bias"]).reshape(-1, 1),
    )
    params["node_to_class"]["weight"] = head_w
    params["node_to_class"]["bias"] = head_b.reshape(-1)

    # every real class/token must have aligned (same data, threshold 1)
    assert len(class_rows) >= len(our_classes) - 2  # specials may differ
    assert len(emb_rows) >= len(our_tokens) - 2

    # ---- one identical minibatch on both sides ----
    ref_mbs = list(
        ref.minibatch_iterator(
            ref.tensorize_dataset(iter(graphs), parallelize=False),
            device="cpu", max_minibatch_size=len(graphs), parallelize=False,
        )
    )
    assert len(ref_mbs) == 1
    ref_mb, _ = ref_mbs[0]
    ref_loss_t = ref_net(**ref_mb)
    ref_loss_t.backward()
    ref_grads = {
        _strip(k): p.grad for k, p in ref_net.named_parameters()
    }

    our_mbs = list(
        ours.minibatch_iterator(
            ours.tensorize_dataset(iter(graphs), parallelize=False),
            max_minibatch_size=len(graphs), parallelize=False,
        )
    )
    assert len(our_mbs) == 1
    mb, _ = our_mbs[0]
    # identical supernode populations
    assert int(np.sum(np.asarray(mb["batch"].references["supernodes"].mask))) == int(
        ref_mb["target_classes"].shape[0]
    )

    def loss_fn(p):
        loss, _ = jax.tree_util.tree_map(jnp.asarray, module.apply(
            p, **mb, train=False
        ))
        return loss

    our_loss, g = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(our_loss), float(ref_loss_t.detach()), rtol=5e-6)

    tol = dict(rtol=5e-6, atol=5e-7)
    # embedding rows
    ge = np.asarray(g["gnn"]["node_embedder"]["embeddings"]["weight"])
    ref_ge = ref_grads[emb_key].numpy()
    for our_i, ref_i in emb_rows:
        np.testing.assert_allclose(ge[our_i], ref_ge[ref_i], **tol)
    # MP layers
    for i in range(N_LAYERS):
        gl = g["gnn"]["mp_layers"][i]
        for our_t, rt in enumerate(type_perm):
            np.testing.assert_allclose(
                np.asarray(gl["message_mlp"]["weights_0"][our_t]),
                ref_grads[
                    f"gnn.message_passing_layers.{i}."
                    f"edge_message_transformation_layers.{int(rt)}."
                    "mlp_modules.1.weight"
                ].numpy().T,
                **tol,
            )
        for ours_key, ref_key in [
            ("layer_norm", f"gnn.message_passing_layers.{i}.state_update.0"),
            ("dense", f"gnn.message_passing_layers.{i}.state_update.1"),
        ]:
            for field in ("weight", "bias"):
                np.testing.assert_allclose(
                    np.asarray(gl[ours_key][field]),
                    ref_grads[f"{ref_key}.{field}"].numpy(),
                    **tol,
                )
    # classifier rows
    gw = np.asarray(g["node_to_class"]["weight"])
    gb = np.asarray(g["node_to_class"]["bias"])
    ref_gw = ref_grads["node_to_class.weight"].numpy()
    ref_gb = ref_grads["node_to_class.bias"].numpy()
    for our_c, ref_c in class_rows:
        np.testing.assert_allclose(gw[our_c], ref_gw[ref_c], **tol)
        np.testing.assert_allclose(gb[our_c], ref_gb[ref_c], **tol)
