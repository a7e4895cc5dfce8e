"""Layer registry / combinator tests + per-kind gradient checks
(the reference test-deriv.cc, SURVEY.md §3.5, rebuilt for the spec tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clstm_tpu.models.spec import (
    NetSpec, init_net, apply_net, layer, make_layer, network_info, walk_weights)
from clstm_tpu.models.prefab import make_net, make_net_init


def _rand_batch(key, B=2, T=6, D=4):
    return jax.random.normal(key, (B, T, D))


@pytest.mark.parametrize("kind,nonlin_ok", [
    ("LinearLayer", True), ("SigmoidLayer", True), ("TanhLayer", True),
    ("ReluLayer", True), ("SoftmaxLayer", True),
])
def test_full_layer_shapes(kind, nonlin_ok):
    spec = layer(kind, 4, 3)
    params = init_net(spec, jax.random.PRNGKey(0))
    x = _rand_batch(jax.random.PRNGKey(1))
    y = apply_net(spec, params, x)
    assert y.shape == (2, 6, 3)
    if kind == "SoftmaxLayer":
        np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, rtol=1e-5)
        z = apply_net(spec, params, x, logits=True)
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(z, -1)), np.asarray(y), rtol=1e-5)


def test_parallel_concat():
    spec = layer("Parallel", 4, 5, {}, [
        layer("LinearLayer", 4, 2), layer("TanhLayer", 4, 3)])
    params = init_net(spec, jax.random.PRNGKey(0))
    x = _rand_batch(jax.random.PRNGKey(1))
    y = apply_net(spec, params, x)
    assert y.shape == (2, 6, 5)
    y0 = apply_net(spec.sub[0], params["sub"][0], x)
    y1 = apply_net(spec.sub[1], params["sub"][1], x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.concatenate([y0, y1], -1)),
                               rtol=1e-6)


def test_reversed_of_linear_is_identity_op():
    """Reversing around a per-timestep (stateless-in-time) layer is a no-op."""
    inner = layer("TanhLayer", 4, 3)
    spec = layer("Reversed", 4, 3, {}, [inner])
    params = init_net(spec, jax.random.PRNGKey(0))
    x = _rand_batch(jax.random.PRNGKey(1), B=3, T=7)
    lengths = jnp.array([7, 4, 1])
    y_rev = apply_net(spec, params, x, lengths)
    y_dir = apply_net(inner, params["sub"][0], x, lengths)
    # Valid regions match; padded region of reversed output equals direct too
    # (flip leaves padding in place).
    np.testing.assert_allclose(np.asarray(y_rev), np.asarray(y_dir), rtol=1e-5, atol=1e-6)


def test_reversed_lstm_differs_and_respects_padding():
    spec = layer("Reversed", 4, 5, {}, [
        layer("NPLSTM", 4, 5, {"nhidden": 5, "initial": 0.3})])
    params = init_net(spec, jax.random.PRNGKey(0))
    x = _rand_batch(jax.random.PRNGKey(1), B=2, T=9)
    lengths = jnp.array([9, 4])
    y = apply_net(spec, params, x, lengths)
    # padded region zero
    assert np.all(np.asarray(y[1, 4:]) == 0.0)
    # row 1 result equals running the un-padded reversed computation
    y_short = apply_net(spec, params, x[1:2, :4], jnp.array([4]))
    # f32 accumulation order differs between the T=9 and T=4 graphs.
    np.testing.assert_allclose(np.asarray(y[1, :4]), np.asarray(y_short[0]),
                               rtol=1e-3, atol=1e-4)


def test_botched_aborts():
    spec = make_layer("Botched")
    params = init_net(spec, jax.random.PRNGKey(0))
    with pytest.raises(NotImplementedError):
        apply_net(spec, params, _rand_batch(jax.random.PRNGKey(1)))


@pytest.mark.parametrize("kind,args", [
    ("lstm1", {"ninput": 4, "nhidden": 6, "noutput": 5}),
    ("revlstm1", {"ninput": 4, "nhidden": 6, "noutput": 5}),
    ("bidi", {"ninput": 4, "nhidden": 6, "noutput": 5}),
    ("bidi2", {"ninput": 4, "nhidden": 6, "noutput": 5, "nhidden2": 3}),
])
def test_prefabs_forward(kind, args):
    spec, params = make_net_init(kind, args, jax.random.PRNGKey(0))
    x = _rand_batch(jax.random.PRNGKey(1), B=2, T=8, D=4)
    lengths = jnp.array([8, 3])
    y = apply_net(spec, params, x, lengths)
    assert y.shape == (2, 8, 5)
    np.testing.assert_allclose(np.asarray(jnp.sum(y[0], -1)), 1.0, rtol=1e-4)
    info = network_info(spec, params)
    assert kind != "bidi" or "Parallel" in info and "Reversed" in info


@pytest.mark.parametrize("kind", ["SigmoidLayer", "TanhLayer", "SoftmaxLayer"])
def test_layer_grad_finite_difference(kind):
    """Per-kind test-deriv: analytic grad vs central differences."""
    spec = layer(kind, 3, 4, {"initial": 0.5})
    params = init_net(spec, jax.random.PRNGKey(2))
    x = _rand_batch(jax.random.PRNGKey(3), B=1, T=4, D=3)
    tgt = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4))

    def loss(p):
        return jnp.sum((apply_net(spec, p, x) - tgt) ** 2)

    g = jax.grad(loss)(params)
    eps = 1e-3
    W = np.asarray(params["weights"]["W"])
    for idx in [(0, 0), (2, 3), (1, 2)]:
        d = np.zeros_like(W)
        d[idx] = eps
        pp = {"weights": {**params["weights"], "W": params["weights"]["W"] + d},
              "sub": []}
        pm = {"weights": {**params["weights"], "W": params["weights"]["W"] - d},
              "sub": []}
        num = (loss(pp) - loss(pm)) / (2 * eps)
        ana = np.asarray(g["weights"]["W"])[idx]
        assert abs(num - ana) < 5e-3 * max(1.0, abs(num)), (kind, idx, num, ana)


def test_bidi_grad_finite_difference():
    """Whole-prefab gradient check through Parallel/Reversed/scan."""
    spec, params = make_net_init("bidi", {"ninput": 3, "nhidden": 4, "noutput": 3,
                                          "initial": 0.3}, jax.random.PRNGKey(5))
    x = _rand_batch(jax.random.PRNGKey(6), B=1, T=5, D=3)
    lengths = jnp.array([5])

    def loss(p):
        y = apply_net(spec, p, x, lengths)
        return -jnp.sum(jnp.log(y[:, :, 1] + 1e-6))

    g = jax.grad(loss)(params)
    leaves_g = jax.tree.leaves(g)
    leaves_p = jax.tree_util.tree_leaves_with_path(params)
    eps = 1e-3
    checked = 0
    for (path, arr), garr in zip(leaves_p, leaves_g):
        arr_np = np.asarray(arr)
        if arr_np.size == 0:
            continue
        idx = np.unravel_index(arr_np.size // 2, arr_np.shape)
        d = np.zeros_like(arr_np)
        d[idx] = eps

        def setval(v):
            flat, tree = jax.tree.flatten(params)
            i = next(j for j, l in enumerate(flat) if l is arr)
            flat = list(flat)
            flat[i] = v
            return jax.tree.unflatten(tree, flat)

        num = (loss(setval(arr + d)) - loss(setval(arr - d))) / (2 * eps)
        ana = np.asarray(garr)[idx]
        assert abs(num - ana) < 2e-2 * max(1.0, abs(num)), (path, num, ana)
        checked += 1
    assert checked >= 5


def test_walk_weights():
    spec, params = make_net_init("bidi", {"ninput": 3, "nhidden": 4, "noutput": 3},
                                 jax.random.PRNGKey(0))
    names = [(p, n) for p, n, _ in walk_weights(spec, params)]
    kinds = {n for _, n in names}
    assert kinds == {"Wx", "Wh", "b", "W"}
    assert len(names) == 2 * 3 + 2  # two LSTMs x 3 arrays + softmax W,b
