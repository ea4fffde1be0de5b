"""LSTM parity vs torch.nn.LSTM (cuDNN gate order, bidirectional stacking)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mmego_tpu.nn import lstm as jlstm


def _torch_to_params(m: torch.nn.LSTM):
    """Convert a torch LSTM's parameters into our pytree layout."""
    layers = []
    for layer in range(m.num_layers):
        entry = {}
        for direction, key in ((0, "fwd"), (1, "bwd"))[: 2 if m.bidirectional else 1]:
            sfx = "_reverse" if direction else ""
            wi = getattr(m, f"weight_ih_l{layer}{sfx}").detach().numpy()
            wh = getattr(m, f"weight_hh_l{layer}{sfx}").detach().numpy()
            bi = getattr(m, f"bias_ih_l{layer}{sfx}").detach().numpy()
            bh = getattr(m, f"bias_hh_l{layer}{sfx}").detach().numpy()
            entry[key] = {
                "wi": jnp.asarray(wi.T),
                "wh": jnp.asarray(wh.T),
                "b": jnp.asarray(bi + bh),
            }
        layers.append(entry)
    return layers


@pytest.mark.parametrize(
    "in_f,hidden,layers,bidir",
    [(15, 32, 2, True), (64, 64, 3, True), (24, 16, 1, False)],
)
def test_lstm_matches_torch(in_f, hidden, layers, bidir):
    torch.manual_seed(0)
    m = torch.nn.LSTM(in_f, hidden, layers, bidirectional=bidir, batch_first=True)
    params = _torch_to_params(m)
    rng = np.random.RandomState(0)
    x = rng.randn(4, 20, in_f).astype(np.float32)
    with torch.no_grad():
        want, (h_t, c_t) = m(torch.from_numpy(x))
    got, (h_j, c_j) = jlstm.lstm_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_init_shapes():
    params = jlstm.lstm_init(jax.random.PRNGKey(0), 15, 512, 2, True)
    assert len(params) == 2
    assert params[0]["fwd"]["wi"].shape == (15, 2048)
    assert params[1]["fwd"]["wi"].shape == (1024, 2048)
    assert params[1]["bwd"]["wh"].shape == (512, 2048)
    x = jnp.zeros((2, 5, 15))
    y, _ = jlstm.lstm_apply(params, x)
    assert y.shape == (2, 5, 1024)


def test_lstm_batch_invariance():
    """Per-row outputs must not depend on which batch they rode in.

    Regression guard for a TPU-backend corruption where ``jnp.flip`` on
    multi-GB tensors silently altered the reversed direction's values at
    large batch; the fix runs the backward direction via
    ``lax.scan(reverse=True)`` with no flips anywhere in the LSTM."""
    params = jlstm.lstm_init(jax.random.PRNGKey(3), 32, 32, 2, True)
    rng = np.random.RandomState(4)
    x = rng.randn(64, 20, 32).astype(np.float32)
    full, _ = jlstm.lstm_apply(params, jnp.asarray(x))
    part, _ = jlstm.lstm_apply(params, jnp.asarray(x[:16]))
    np.testing.assert_array_equal(np.asarray(full)[:16], np.asarray(part))


def test_lstm_dropout_only_in_train():
    params = jlstm.lstm_init(jax.random.PRNGKey(1), 8, 8, 2, True)
    x = jnp.ones((2, 4, 8))
    y_eval, _ = jlstm.lstm_apply(params, x, dropout=0.5, train=False)
    y_eval2, _ = jlstm.lstm_apply(params, x, dropout=0.5, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
    y_train, _ = jlstm.lstm_apply(
        params, x, dropout=0.5, rng=jax.random.PRNGKey(2), train=True)
    assert not np.allclose(np.asarray(y_train), np.asarray(y_eval))
