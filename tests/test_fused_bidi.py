"""Fused one-scan bidi execution plan: must be numerically equivalent to
the literal Parallel(NPLSTM, Reversed(NPLSTM)) combinator semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from clstm_tpu.models.prefab import make_net_init
from clstm_tpu.models.spec import apply_net, _is_bidi_pair
from clstm_tpu.ops.lstm import bidi_lstm_apply, lstm_apply, lstm_init
from clstm_tpu.ops.seq import flip_within_length


def test_bidi_kernel_matches_composition():
    D, H, B, T = 5, 7, 3, 11
    pf = lstm_init(jax.random.PRNGKey(0), D, H, scale=0.3)
    pr = lstm_init(jax.random.PRNGKey(1), D, H, scale=0.3)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, D))
    lengths = jnp.array([11, 6, 1])

    fused = bidi_lstm_apply(pf, pr, x, lengths)
    yf = lstm_apply(pf, x, lengths)
    yr = flip_within_length(
        lstm_apply(pr, flip_within_length(x, lengths), lengths), lengths)
    ref = jnp.concatenate([yf, yr], axis=-1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_apply_net_fused_vs_unfused():
    spec, params = make_net_init(
        "bidi", {"ninput": 6, "nhidden": 5, "noutput": 4, "initial": 0.2},
        jax.random.PRNGKey(3))
    assert _is_bidi_pair(spec.sub[0])
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 6))
    lengths = jnp.array([9, 4])
    y1 = apply_net(spec, params, x, lengths, fuse_bidi=True)
    y2 = apply_net(spec, params, x, lengths, fuse_bidi=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-5, atol=2e-6)
    # gradients too
    def loss(p, fuse):
        return jnp.sum(apply_net(spec, p, x, lengths, fuse_bidi=fuse) ** 2)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    g2 = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bidi2_uses_fused_blocks():
    spec, params = make_net_init(
        "bidi2", {"ninput": 4, "nhidden": 3, "noutput": 4}, jax.random.PRNGKey(5))
    for sub in spec.sub[:2]:
        assert _is_bidi_pair(sub)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 7, 4))
    lengths = jnp.array([7, 3])
    y1 = apply_net(spec, params, x, lengths, fuse_bidi=True)
    y2 = apply_net(spec, params, x, lengths, fuse_bidi=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-5, atol=2e-6)
