"""Segment-op semantics tests vs numpy references (torch-scatter behavior)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptgnn_tpu.ops import (
    segment_argmax,
    segment_log_softmax,
    segment_logsumexp,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)


def _np_segments(ids, n):
    return [np.where(ids == s)[0] for s in range(n)]


@pytest.fixture
def case():
    rng = np.random.RandomState(0)
    e, n, d = 57, 11, 5
    data = rng.randn(e, d).astype(np.float32)
    ids = rng.randint(0, n, size=e).astype(np.int32)
    # Guarantee at least one empty segment.
    ids[ids == 7] = 3
    mask = rng.rand(e) > 0.3
    return data, ids, n, mask


def test_segment_sum(case):
    data, ids, n, mask = case
    out = np.asarray(segment_sum(jnp.array(data), jnp.array(ids), n))
    for s, members in enumerate(_np_segments(ids, n)):
        np.testing.assert_allclose(out[s], data[members].sum(0), rtol=1e-5, atol=1e-5)


def test_segment_sum_masked(case):
    data, ids, n, mask = case
    out = np.asarray(segment_sum(jnp.array(data), jnp.array(ids), n, mask=jnp.array(mask)))
    for s, members in enumerate(_np_segments(ids, n)):
        kept = [m for m in members if mask[m]]
        np.testing.assert_allclose(out[s], data[kept].sum(0) if kept else 0.0, rtol=1e-5, atol=1e-5)


def test_out_of_range_ids_dropped():
    data = jnp.ones((4, 2))
    ids = jnp.array([0, 1, 2, 2], jnp.int32)  # 2 == num_segments -> dropped
    out = np.asarray(segment_sum(data, ids, 2))
    np.testing.assert_allclose(out, [[1, 1], [1, 1]])


def test_segment_mean_empty_is_zero(case):
    data, ids, n, _ = case
    out = np.asarray(segment_mean(jnp.array(data), jnp.array(ids), n))
    for s, members in enumerate(_np_segments(ids, n)):
        expected = data[members].mean(0) if len(members) else np.zeros(data.shape[1])
        np.testing.assert_allclose(out[s], expected, rtol=1e-5, atol=1e-5)


def test_segment_max_min_torch_scatter_fill(case):
    data, ids, n, _ = case
    mx = np.asarray(segment_max(jnp.array(data), jnp.array(ids), n))
    mn = np.asarray(segment_min(jnp.array(data), jnp.array(ids), n))
    for s, members in enumerate(_np_segments(ids, n)):
        if len(members):
            np.testing.assert_allclose(mx[s], data[members].max(0), rtol=1e-6)
            np.testing.assert_allclose(mn[s], data[members].min(0), rtol=1e-6)
        else:
            # torch-scatter fills untouched outputs with 0
            np.testing.assert_allclose(mx[s], 0.0)
            np.testing.assert_allclose(mn[s], 0.0)


def test_segment_logsumexp_empty_is_neg_inf(case):
    data, ids, n, _ = case
    scores = data[:, 0]
    out = np.asarray(segment_logsumexp(jnp.array(scores), jnp.array(ids), n))
    for s, members in enumerate(_np_segments(ids, n)):
        if len(members):
            m = scores[members].max()
            expected = np.log(np.exp(scores[members] - m).sum()) + m
            np.testing.assert_allclose(out[s], expected, rtol=1e-5, atol=1e-5)
        else:
            assert out[s] == -np.inf


def test_segment_logsumexp_with_neg_inf_inputs():
    scores = jnp.array([-np.inf, -np.inf, 1.0, 2.0], jnp.float32)
    ids = jnp.array([0, 1, 1, 1], jnp.int32)
    out = np.asarray(segment_logsumexp(scores, ids, 2))
    assert out[0] == -np.inf  # all-(-inf) segment
    m = 2.0
    np.testing.assert_allclose(out[1], np.log(np.exp(1 - m) + np.exp(2 - m)) + m, rtol=1e-6)


def test_segment_log_softmax_normalizes(case):
    data, ids, n, _ = case
    scores = data[:, 0]
    out = np.asarray(segment_log_softmax(jnp.array(scores), jnp.array(ids), n))
    for s, members in enumerate(_np_segments(ids, n)):
        if len(members):
            np.testing.assert_allclose(np.exp(out[members]).sum(), 1.0, rtol=1e-5)


def test_segment_softmax_multidim(case):
    data, ids, n, _ = case
    out = np.asarray(segment_softmax(jnp.array(data), jnp.array(ids), n))
    for s, members in enumerate(_np_segments(ids, n)):
        if len(members):
            np.testing.assert_allclose(out[members].sum(0), np.ones(data.shape[1]), rtol=1e-5)


def test_segment_argmax(case):
    data, ids, n, _ = case
    scores = data[:, 0]
    out = np.asarray(segment_argmax(jnp.array(scores), jnp.array(ids), n))
    for s, members in enumerate(_np_segments(ids, n)):
        if len(members):
            assert out[s] == members[np.argmax(scores[members])]
        else:
            assert out[s] == len(scores)


def test_bf16_accumulates_in_fp32():
    # Many small values whose bf16 running sum would lose precision badly.
    e = 4096
    data = jnp.full((e, 1), 1.0 + 1e-3, jnp.bfloat16)
    ids = jnp.zeros((e,), jnp.int32)
    out = segment_sum(data, ids, 1)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(float(out[0, 0]), e * (1.0 + 1e-3), rtol=1e-2)


def test_grad_through_segment_sum():
    data = jnp.ones((6, 3))
    ids = jnp.array([0, 0, 1, 1, 2, 2], jnp.int32)

    def f(x):
        return segment_sum(x, ids, 3).sum()

    g = jax.grad(f)(data)
    np.testing.assert_allclose(np.asarray(g), np.ones((6, 3)))


def test_segment_sum_matmul_route_matches_scatter(monkeypatch):
    """The few-segment one-hot matmul route (TPU decoder copy-attention
    sums) must match the scatter route, values and grads, incl. masking and
    out-of-range padding ids."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ptgnn_tpu.ops.segment import segment_sum

    rng = np.random.RandomState(0)
    rows, segs = 512, 16
    data = jnp.asarray(rng.randn(rows, 3, 5).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, segs + 2, rows).astype(np.int32))  # some out of range
    mask = jnp.asarray(rng.rand(rows) > 0.3)

    def run(force):
        monkeypatch.setenv("PTGNN_TPU_SEGSUM_MATMUL", force)
        f = lambda d: jnp.sum(segment_sum(d, ids, segs, mask=mask) ** 2)
        return jax.value_and_grad(f)(data)

    v1, g1 = run("1")
    v0, g0 = run("0")
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5, atol=1e-6)
