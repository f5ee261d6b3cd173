"""Activation parity of core NN primitives vs torch on imported golden weights.

The parity strategy from SURVEY.md section 7: inject identical weights
exported from torch modules rather than matching RNG streams.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ptgnn_tpu import nn as pnn


def j(a):
    return jnp.asarray(np.asarray(a.detach() if isinstance(a, torch.Tensor) else a))


def test_linear_matches_torch():
    torch.manual_seed(0)
    tl = torch.nn.Linear(13, 7)
    x = torch.randn(5, 13)
    ours = pnn.Linear(13, 7)
    params = {"weight": j(tl.weight), "bias": j(tl.bias)}
    out = ours.apply(params, j(x))
    np.testing.assert_allclose(np.asarray(out), tl(x).detach().numpy(), rtol=1e-5, atol=1e-5)


def test_layernorm_matches_torch():
    torch.manual_seed(1)
    tln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tln.weight.uniform_(0.5, 1.5)
        tln.bias.uniform_(-0.5, 0.5)
    x = torch.randn(4, 16)
    ours = pnn.LayerNorm(16)
    params = {"weight": j(tln.weight), "bias": j(tln.bias)}
    np.testing.assert_allclose(
        np.asarray(ours.apply(params, j(x))), tln(x).detach().numpy(), rtol=1e-5, atol=1e-5
    )


def test_embedding_matches_torch():
    torch.manual_seed(2)
    te = torch.nn.Embedding(20, 8)
    ids = torch.randint(0, 20, (6,))
    ours = pnn.Embedding(20, 8)
    out = ours.apply({"weight": j(te.weight)}, j(ids))
    np.testing.assert_allclose(np.asarray(out), te(ids).detach().numpy(), rtol=1e-6)


def test_grucell_matches_torch():
    torch.manual_seed(3)
    tc = torch.nn.GRUCell(10, 6)
    x = torch.randn(4, 10)
    h = torch.randn(4, 6)
    ours = pnn.GRUCell(10, 6)
    params = {
        "weight_ih": j(tc.weight_ih),
        "weight_hh": j(tc.weight_hh),
        "bias_ih": j(tc.bias_ih),
        "bias_hh": j(tc.bias_hh),
    }
    out = ours.apply(params, j(x), j(h))
    np.testing.assert_allclose(np.asarray(out), tc(x, h).detach().numpy(), rtol=1e-5, atol=1e-5)


def test_gru_matches_torch():
    torch.manual_seed(4)
    tg = torch.nn.GRU(input_size=9, hidden_size=5, num_layers=1, batch_first=True)
    x = torch.randn(3, 7, 9)
    h0 = torch.randn(1, 3, 5)
    tout, thn = tg(x, h0)
    ours = pnn.GRU(9, 5)
    params = {
        "weight_ih": j(tg.weight_ih_l0),
        "weight_hh": j(tg.weight_hh_l0),
        "bias_ih": j(tg.bias_ih_l0),
        "bias_hh": j(tg.bias_hh_l0),
    }
    out, hn = ours.apply(params, j(x), j(h0[0]))
    np.testing.assert_allclose(np.asarray(out), tout.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn), thn[0].detach().numpy(), rtol=1e-4, atol=1e-5)


def test_conv1d_matches_torch():
    torch.manual_seed(5)
    tc = torch.nn.Conv1d(in_channels=4, out_channels=6, kernel_size=3)
    x = torch.randn(2, 4, 15)
    ours = pnn.Conv1d(4, 6, 3)
    params = {"weight": j(tc.weight), "bias": j(tc.bias)}
    out = ours.apply(params, j(x))
    np.testing.assert_allclose(np.asarray(out), tc(x).detach().numpy(), rtol=1e-4, atol=1e-5)


def test_mlp_matches_reference_structure():
    """MLP mirrors reference ptgnn/neuralmodels/mlp.py: dropout-linear-act
    stacking with no final activation; parity on imported weights."""
    torch.manual_seed(6)
    lin1 = torch.nn.Linear(12, 8, bias=False)
    lin2 = torch.nn.Linear(8, 8, bias=False)
    x = torch.randn(5, 12)
    expected = lin2(torch.relu(lin1(x)))
    ours = pnn.MLP(input_dimension=12, output_dimension=8, hidden_layers=1)
    params = {"layer_0": {"weight": j(lin1.weight)}, "layer_1": {"weight": j(lin2.weight)}}
    out = ours.apply(params, j(x))
    np.testing.assert_allclose(np.asarray(out), expected.detach().numpy(), rtol=1e-5, atol=1e-5)


def test_mlp_degenerate_hidden_widened():
    m = pnn.MLP(input_dimension=4, output_dimension=1, hidden_layers=2)
    # reference widens hidden size 1 -> 32 (ptgnn/neuralmodels/mlp.py:34-41)
    assert m.layers[0].out_features == 32
    assert m.layers[1].out_features == 32
    assert m.layers[2].out_features == 1


def test_dropout_train_and_eval():
    x = jnp.ones((1000,))
    key = jax.random.PRNGKey(0)
    out = pnn.dropout(key, x, 0.5, train=True)
    assert np.isclose(np.asarray(out).mean(), 1.0, atol=0.15)
    assert (np.asarray(out) == 0).any()
    out_eval = pnn.dropout(None, x, 0.5, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))


def test_orthogonal_init_is_orthogonal():
    from ptgnn_tpu.nn import initializers as init

    w = init.orthogonal()(jax.random.PRNGKey(0), (18, 6))
    np.testing.assert_allclose(np.asarray(w.T @ w), np.eye(6), atol=1e-5)


@pytest.mark.parametrize("shape", [(10, 20), (32, 8)])
def test_xavier_uniform_bounds(shape):
    from ptgnn_tpu.nn import initializers as init

    w = np.asarray(init.xavier_uniform()(jax.random.PRNGKey(1), shape))
    bound = np.sqrt(6.0 / sum(shape))
    assert np.abs(w).max() <= bound + 1e-6
    assert np.abs(w).max() >= bound * 0.8
