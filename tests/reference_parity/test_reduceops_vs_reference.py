"""Var-sized set reduction parity vs the ACTUAL reference classes
(/root/reference/ptgnn/neuralmodels/reduceops/varsizedsummary.py:20-178).
"""
import numpy as np
import pytest
import torch

from tests.reference_parity.shims import install_reference_shims

install_reference_shims()

from ptgnn.neuralmodels.reduceops.varsizedsummary import (  # noqa: E402
    ElementsToSummaryRepresentationInput as RefInput,
    MultiheadSelfAttentionVarSizedElementReduce as RefMHSA,
    NormalizedWeightsVarSizedElementReduce as RefNormWeights,
    SelfAttentionVarSizedElementReduce as RefSelfAtt,
    SimpleVarSizedElementReduce as RefSimple,
    WeightedSumVarSizedElementReduce as RefWeightedSum,
)

from ptgnn_tpu.nn.layers import Linear as JLinear
from ptgnn_tpu.reduceops import (
    MultiheadSelfAttentionVarSizedElementReduce,
    SelfAttentionVarSizedElementReduce,
    SimpleVarSizedElementReduce,
    WeightedSumVarSizedElementReduce,
)

from tests.reference_parity.test_mp_vs_reference import j, sd  # noqa: E402
from tests.test_mp_layers_extended import make_set_input  # noqa: E402


def ref_input(emb, smap, S):
    return RefInput(
        element_embeddings=torch.tensor(emb),
        element_to_sample_map=torch.tensor(smap.astype(np.int64)),
        num_samples=S,
    )


@pytest.mark.parametrize("kind", ["sum", "mean", "max", "min"])
def test_simple_reduce_vs_reference(kind):
    emb, smap, S, inputs = make_set_input(seed=41)
    ref = RefSimple(kind)
    with torch.no_grad():
        expected = ref(ref_input(emb, smap, S)).numpy()
    out = np.asarray(SimpleVarSizedElementReduce(kind).apply({}, inputs))
    np.testing.assert_allclose(out[:S], expected, rtol=1e-5, atol=1e-6)


def test_weighted_sum_vs_reference():
    emb, smap, S, inputs = make_set_input(seed=42)
    D = emb.shape[1]
    torch.manual_seed(0)
    ref = RefWeightedSum(D)
    with torch.no_grad():
        expected = ref(ref_input(emb, smap, S)).numpy()
    w = sd(ref)
    out = np.asarray(
        WeightedSumVarSizedElementReduce(D).apply(
            {"weights": {"weight": j(w["weights_layer.weight"])}}, inputs
        )
    )
    np.testing.assert_allclose(out[:S], expected, rtol=1e-5, atol=1e-6)


def test_selfattention_reduce_vs_reference():
    # D == H so a plain mean reduce is a valid query summarizer on both sides
    emb, smap, S, inputs = make_set_input(seed=43, D=8)
    D = emb.shape[1]
    OUT = 7
    torch.manual_seed(1)
    ref = RefSelfAtt(
        input_representation_size=D, hidden_size=D, output_representation_size=OUT,
        query_representation_summarizer=RefSimple("mean"),
    )
    with torch.no_grad():
        expected = ref(ref_input(emb, smap, S)).numpy()
    w = sd(ref)
    ours = SelfAttentionVarSizedElementReduce(
        D, D, OUT, SimpleVarSizedElementReduce("mean")
    )
    params = {
        "query": {},
        "key": {"weight": j(w["key_layer.weight"])},
        "output": {"weight": j(w["output_layer.weight"])},
    }
    out = np.asarray(ours.apply(params, inputs))
    np.testing.assert_allclose(out[:S], expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("use_value_layer", [False, True])
def test_multihead_selfattention_reduce_vs_reference(use_value_layer):
    emb, smap, S, inputs = make_set_input(seed=44, D=8)
    D = emb.shape[1]
    H, HEADS, OUT = 6, 2, 5
    torch.manual_seed(2)
    ref = RefMHSA(
        input_representation_size=D, hidden_size=H, output_representation_size=OUT,
        num_heads=HEADS, query_representation_summarizer=RefSimple("mean"),
        use_value_layer=use_value_layer,
    )
    w = sd(ref)
    # The reference requires the query summarizer to output hidden_size H
    # (queries reshape to [S, HEADS, H/HEADS]); a plain mean outputs D, so
    # both sides use mean + linear as the summarizer.
    qlin_t = torch.nn.Linear(D, H, bias=False)

    class RefMeanLinear(RefSimple):
        def __init__(self):
            super().__init__("mean")

        def forward(self, inputs):
            return qlin_t(super().forward(inputs))

    ref2 = RefMHSA(
        input_representation_size=D, hidden_size=H, output_representation_size=OUT,
        num_heads=HEADS, query_representation_summarizer=RefMeanLinear(),
        use_value_layer=use_value_layer,
    )
    ref2.load_state_dict(
        {k: v for k, v in ref.state_dict().items() if k in ref2.state_dict()}, strict=False
    )
    with torch.no_grad():
        expected = ref2(ref_input(emb, smap, S)).numpy()

    class MeanThenLinear(SimpleVarSizedElementReduce):
        def __init__(self, lin):
            super().__init__("mean")
            self.lin = lin

        def init(self, key):
            return {}

        def apply(self, params, inputs):
            return self.lin.apply(params["lin"], super().apply({}, inputs))

    ours = MultiheadSelfAttentionVarSizedElementReduce(
        D, H, OUT, HEADS, MeanThenLinear(JLinear(D, H, use_bias=False)),
        use_value_layer=use_value_layer,
    )
    params = {
        "query": {"lin": {"weight": j(qlin_t.weight)}},
        "key": {"weight": j(w["key_layer.weight"])},
        "output": {"weight": j(w["output_layer.weight"])},
    }
    if use_value_layer:
        params["value"] = {"weight": j(w["value_layer.weight"])}
    out = np.asarray(ours.apply(params, inputs))
    np.testing.assert_allclose(out[:S], expected, rtol=1e-4, atol=1e-5)


def test_normalized_weights_reference_is_buggy():
    """Documents the reference's latent bug (varsizedsummary.py:61 passes
    ``index=inputs.num_samples`` — an int — to scatter_sum). The class is
    unused by all four reference tasks; our fixed variant is tested in
    tests/test_reduceops.py-style suites."""
    emb, smap, S, _ = make_set_input(seed=45)
    torch.manual_seed(3)
    ref = RefNormWeights(emb.shape[1], 5)
    with pytest.raises(Exception):
        with torch.no_grad():
            ref(ref_input(emb, smap, S))
