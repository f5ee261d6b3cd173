"""String embedder lifecycle for all four splitting modes
(token/subtoken/bpe/char), plus the profiling utilities."""
import numpy as np
import jax
import pytest

from ptgnn_tpu.graph.embedders import StrElementRepresentationModel
from ptgnn_tpu.utils.profiling import Throughput, mp_layer_roofline

WORDS = [
    "getValue", "set_item", "maxCount", "numNodes", "fileName", "toString",
    "parseInt", "loadData", "saveFile", "runLoop", "batchSize", "learnRate",
] * 5


@pytest.mark.parametrize("splitting", ["token", "subtoken", "bpe", "char"])
def test_str_embedder_lifecycle(splitting):
    model = StrElementRepresentationModel(
        token_splitting=splitting, embedding_size=16, vocabulary_size=64,
        min_freq_threshold=1, dropout_rate=0.0,
    )
    model.compute_metadata(iter(WORDS), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))

    mb = model.initialize_minibatch()
    for w in WORDS[:10]:
        model.extend_minibatch_with(model.tensorize(w), mb)
    data = model.finalize_minibatch(mb, pad_to=16)
    out = module.apply(params, **data)
    assert out.shape == (16, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    # identical strings embed identically; distinct mostly differ
    out_np = np.asarray(out)
    i1 = WORDS[:10].index("getValue")
    assert not np.allclose(out_np[0], out_np[1]) or WORDS[0] == WORDS[1]


def test_bpe_tokenization_roundtrip_properties():
    model = StrElementRepresentationModel(
        token_splitting="bpe", embedding_size=8, vocabulary_size=64,
        min_freq_threshold=1,
    )
    model.compute_metadata(iter(WORDS), parallelize=False)
    ids = model.tensorize("getValue")
    assert len(ids) > 0
    # unseen strings still tensorize (UNK/byte fallbacks)
    ids2 = model.tensorize("zzzzqqqq")
    assert len(ids2) > 0


def test_roofline_and_throughput():
    r = mp_layer_roofline(edge_slots=262144, state_dim=64, message_dim=64,
                          num_nodes=32768)
    assert r.flops > 0 and r.hbm_bytes > 0
    bounds = r.time_bounds_ms()
    assert bounds["compute_ms"] > 0 and bounds["memory_ms"] > 0

    t = Throughput()
    t.update(num_edges=100, num_graphs=2)
    t.update(num_edges=50)
    rates = t.rates()
    assert rates["num_edges_per_sec"] > 0
    assert t.totals["num_edges"] == 150


def test_feature_embedder_empty_minibatch_with_padding():
    """An empty minibatch (the distributed trainer's fully masked padding
    batches) must finalize using the metadata feature width instead of
    crashing on np.asarray([])'s missing second axis."""
    import numpy as np

    from ptgnn_tpu.graph.embedders import FeatureRepresentationModel

    m = FeatureRepresentationModel(embedding_size=8)
    m.compute_metadata(iter([np.ones(5, np.float32)]), parallelize=False)
    out = m.finalize_minibatch(m.initialize_minibatch(), pad_to=4)
    assert out["features"].shape == (4, 5)
    assert (out["features"] == 0).all()
