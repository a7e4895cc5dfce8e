"""LSTM op tests: shapes, masking invariants, numeric gradient check.

The numeric check is the rebuild's analogue of the reference test-deriv.cc
(finite-difference vs analytic backward; SURVEY.md §3.5/§4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clstm_tpu.ops.lstm import lstm_init, lstm_apply
from clstm_tpu.ops.seq import flip_within_length, length_mask


def ref_lstm_numpy(params, x):
    """Straight-line numpy LSTM oracle (single row, no padding), written to
    mirror the reference per-timestep recurrence (clstm_compute.cc
    statemem/nonlingate; unverified ≈L)."""
    Wx, Wh, b = (np.asarray(params[k], np.float64) for k in ("Wx", "Wh", "b"))
    T, D = x.shape
    H = Wh.shape[0]
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    h = np.zeros(H)
    c = np.zeros(H)
    out = np.zeros((T, H))
    for t in range(T):
        z = x[t] @ Wx + h @ Wh + b
        gi, gf, go, ci = z[:H], z[H:2*H], z[2*H:3*H], z[3*H:]
        gi, gf, go, ci = sig(gi), sig(gf), sig(go), np.tanh(ci)
        c = gf * c + gi * ci
        h = np.tanh(c) * go
        out[t] = h
    return out


def test_lstm_matches_numpy_oracle():
    key = jax.random.PRNGKey(0)
    D, H, T = 5, 7, 11
    params = lstm_init(key, D, H, scale=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, D))
    y = lstm_apply(params, x)
    ref = ref_lstm_numpy(params, np.asarray(x[0], np.float64))
    np.testing.assert_allclose(np.asarray(y[0]), ref, rtol=1e-4, atol=1e-5)


def test_lstm_padding_invariance():
    """Outputs on valid frames must not depend on padding length/content;
    padded frames must be exactly zero."""
    key = jax.random.PRNGKey(2)
    D, H = 4, 6
    params = lstm_init(key, D, H, scale=0.3)
    x_short = jax.random.normal(jax.random.PRNGKey(3), (2, 5, D))
    pad = 100.0 * jnp.ones((2, 4, D))  # garbage padding
    x_long = jnp.concatenate([x_short, pad], axis=1)
    lengths = jnp.array([5, 3])

    y_long = lstm_apply(params, x_long, lengths)
    y_short = lstm_apply(params, x_short, lengths)

    for b, L in enumerate([5, 3]):
        np.testing.assert_allclose(np.asarray(y_long[b, :L]),
                                   np.asarray(y_short[b, :L]), rtol=1e-5, atol=1e-6)
        assert np.all(np.asarray(y_long[b, L:]) == 0.0)


def test_lstm_grad_finite_difference():
    """test-deriv analogue: jax.grad vs central finite differences."""
    D, H, T = 3, 4, 6
    params = lstm_init(jax.random.PRNGKey(4), D, H, scale=0.4)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, T, D))
    tgt = jax.random.normal(jax.random.PRNGKey(6), (1, T, H))

    def loss(p):
        return jnp.sum((lstm_apply(p, x) - tgt) ** 2)

    g = jax.grad(loss)(params)
    eps = 1e-3
    rng = np.random.RandomState(0)
    for name in ("Wx", "Wh", "b"):
        arr = np.asarray(params[name])
        flat_idx = rng.choice(arr.size, size=min(10, arr.size), replace=False)
        for fi in flat_idx:
            idx = np.unravel_index(fi, arr.shape)
            delta = np.zeros_like(arr)
            delta[idx] = eps
            pp = dict(params)
            pp[name] = params[name] + delta
            pm = dict(params)
            pm[name] = params[name] - delta
            num = (loss(pp) - loss(pm)) / (2 * eps)
            ana = np.asarray(g[name])[idx]
            assert abs(num - ana) < 1e-2 * max(1.0, abs(num)), (name, idx, num, ana)


def test_flip_within_length_involutive():
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 8, 2))
    lengths = jnp.array([8, 5, 1])
    y = flip_within_length(flip_within_length(x, lengths), lengths)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    # And the flip actually reverses the valid prefix.
    f = flip_within_length(x, lengths)
    np.testing.assert_allclose(np.asarray(f[1, :5]), np.asarray(x[1, :5][::-1]))
    np.testing.assert_allclose(np.asarray(f[1, 5:]), np.asarray(x[1, 5:]))


def test_length_mask():
    m = length_mask(jnp.array([2, 0, 4]), 4)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 1]])
