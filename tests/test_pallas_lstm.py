"""Pallas fused-bidi LSTM vs the scan implementation (interpret mode),
forward AND custom-VJP backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clstm_tpu.ops.lstm import bidi_lstm_apply, lstm_init
from clstm_tpu.ops.pallas_lstm import bidi_lstm_pallas


def _setup(B=4, T=16, D=5, H=7, seed=0):
    pf = lstm_init(jax.random.PRNGKey(seed), D, H, scale=0.3)
    pr = lstm_init(jax.random.PRNGKey(seed + 1), D, H, scale=0.3)
    x = jax.random.normal(jax.random.PRNGKey(seed + 2), (B, T, D))
    lengths = jnp.array([T, T - 3, T // 2, 1])[:B]
    return pf, pr, x, lengths


def test_forward_matches_scan():
    pf, pr, x, lengths = _setup()
    want = bidi_lstm_apply(pf, pr, x, lengths)
    got = bidi_lstm_pallas(pf, pr, x, lengths, 8, True, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_backward_matches_scan():
    pf, pr, x, lengths = _setup()
    tgt = jax.random.normal(jax.random.PRNGKey(9), (4, 16, 14))

    def loss_scan(pf_, pr_, x_):
        return jnp.sum((bidi_lstm_apply(pf_, pr_, x_, lengths) - tgt) ** 2)

    def loss_pl(pf_, pr_, x_):
        return jnp.sum((bidi_lstm_pallas(pf_, pr_, x_, lengths, 8, True, False) - tgt) ** 2)

    g1 = jax.grad(loss_scan, argnums=(0, 1, 2))(pf, pr, x)
    g2 = jax.grad(loss_pl, argnums=(0, 1, 2))(pf, pr, x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-4)


def test_no_lengths():
    pf, pr, x, _ = _setup()
    want = bidi_lstm_apply(pf, pr, x, None)
    got = bidi_lstm_pallas(pf, pr, x, None, 4, True, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_bf16_streaming_close():
    """bf16 xz streaming (the production default) stays within ~1e-2."""
    pf, pr, x, lengths = _setup()
    want = bidi_lstm_apply(pf, pr, x, lengths)
    got = bidi_lstm_pallas(pf, pr, x, lengths, 8, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=5e-3)


def test_large_hidden_hp256():
    """nhidden > 128 exercises the hp=256 padded layout (config 4 sizes)."""
    B, T, D, H = 2, 8, 5, 136
    pf = lstm_init(jax.random.PRNGKey(20), D, H, scale=0.2)
    pr = lstm_init(jax.random.PRNGKey(21), D, H, scale=0.2)
    x = jax.random.normal(jax.random.PRNGKey(22), (B, T, D))
    lengths = jnp.array([8, 3])
    want = bidi_lstm_apply(pf, pr, x, lengths)
    got = bidi_lstm_pallas(pf, pr, x, lengths, 4, True, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    g1 = jax.grad(lambda a: jnp.sum(bidi_lstm_apply(a, pr, x, lengths) ** 2))(pf)
    g2 = jax.grad(lambda a: jnp.sum(
        bidi_lstm_pallas(a, pr, x, lengths, 4, True, False) ** 2))(pf)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=5e-4, atol=1e-4)


def test_hoisted_projection_large_D():
    """dc > hp triggers the hoisted-projection path (one big XLA matmul
    feeding compact xz streams; config-4 layer 2 is D=400/H=200). Forward
    and full VJP must match the scan oracle in strict-f32 mode."""
    B, T, D, H = 2, 8, 160, 7          # hp=128, dc=161 > 128 -> hoisted
    pf = lstm_init(jax.random.PRNGKey(30), D, H, scale=0.2)
    pr = lstm_init(jax.random.PRNGKey(31), D, H, scale=0.2)
    x = jax.random.normal(jax.random.PRNGKey(32), (B, T, D))
    lengths = jnp.array([8, 5])
    want = bidi_lstm_apply(pf, pr, x, lengths)
    got = bidi_lstm_pallas(pf, pr, x, lengths, 4, True, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    def loss_scan(pf_, pr_, x_):
        return jnp.sum(bidi_lstm_apply(pf_, pr_, x_, lengths) ** 2)

    def loss_pl(pf_, pr_, x_):
        return jnp.sum(bidi_lstm_pallas(pf_, pr_, x_, lengths, 4, True,
                                        False) ** 2)

    g1 = jax.grad(loss_scan, argnums=(0, 1, 2))(pf, pr, x)
    g2 = jax.grad(loss_pl, argnums=(0, 1, 2))(pf, pr, x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-4)


def test_bf16_gradient_close():
    """Production mode (xz_bf16) runs the bwd VJP chain in bf16 —
    gradient-only noise must stay within ~2% relative of the f32 oracle."""
    pf, pr, x, lengths = _setup()

    def loss(fn):
        return lambda pf_, pr_: jnp.sum(
            fn(pf_, pr_, x, lengths) ** 2)

    g_ref = jax.grad(loss(lambda a, b, x_, l: bidi_lstm_apply(a, b, x_, l)),
                     argnums=(0, 1))(pf, pr)
    g_blf = jax.grad(
        loss(lambda a, b, x_, l: bidi_lstm_pallas(a, b, x_, l, 8, True,
                                                  True)),
        argnums=(0, 1))(pf, pr)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_blf)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, rtol=0, atol=0.03 * scale)


def test_fits_pallas_models_the_real_kernel_config():
    """fits_pallas must test the SAME configuration _pick_tiles will run:
    real input dim, hoisted-projection decision (dc > hp), production
    nb=2 byte model (round-2 advisor: hardcoded dc=64 gated a different
    kernel than the one that ran)."""
    from clstm_tpu.ops import pallas_lstm as pk

    # bidi2 L2 shape: H=200 (hp=256), D=2H=400 -> dc=401 > hp -> hoisted.
    B, T, H, D = 256, 1024, 200, 400
    assert pk.fits_pallas(B, T, H=H, D=D)
    hp = pk._hp_for(H)
    dc = D + 1
    assert dc > hp  # the kernel hoists here; the gate must model that
    trow = lambda b: pk._bwd_trow_bytes(b, dc, hp, 2, hoisted=True)
    bt, tc = pk._pick_tiles(B, T, trow, 8)
    assert trow(bt) * tc <= pk._vmem_budget()
    assert (pk._fixed_bytes(dc, hp, bt, 2, hoisted=True)
            <= pk._vmem_limit() - pk._vmem_budget())

    # A pathological input dim blows the fixed (weight) VMEM footprint and
    # must be rejected -> graceful scan fallback (old dc=64 gate said yes).
    assert not pk.fits_pallas(256, 1024, H=100, D=20000)
    # Standard config-3 shape still passes.
    assert pk.fits_pallas(256, 1024, H=100, D=48)


def test_need_dx_false_same_weight_grads_zero_dx():
    """need_dx=False (input-layer mode) must leave the WEIGHT gradients
    bit-identical to the full backward and return exact-zero x-cotangents
    (they have no consumer in the train step)."""
    pf, pr, x, lengths = _setup()
    tgt = jax.random.normal(jax.random.PRNGKey(9), (4, 16, 14))

    def loss(need_dx):
        def f(pf_, pr_, x_):
            y = bidi_lstm_pallas(pf_, pr_, x_, lengths, 8, True, False,
                                 need_dx)
            return jnp.sum((y - tgt) ** 2)
        return f

    g_full = jax.grad(loss(True), argnums=(0, 1, 2))(pf, pr, x)
    g_skip = jax.grad(loss(False), argnums=(0, 1, 2))(pf, pr, x)
    for a, b in zip(jax.tree.leaves(g_full[:2]), jax.tree.leaves(g_skip[:2])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.asarray(g_skip[2]) == 0.0)
    assert np.any(np.asarray(g_full[2]) != 0.0)


def test_train_loss_grads_unchanged_by_input_leaf_skip():
    """End-to-end: ctc_alignment_loss param grads with the fused Pallas
    path (input_is_leaf=True threaded from the loss) match fuse_bidi=False
    literal-combinator grads."""
    from clstm_tpu.models.prefab import make_net_init
    from clstm_tpu.train import ctc_alignment_loss

    spec, params = make_net_init(
        "bidi", {"ninput": 5, "nhidden": 7, "noutput": 6})
    rng = np.random.RandomState(0)
    B, T = 4, 16
    batch = {
        "x": jnp.asarray(rng.rand(B, T, 5).astype(np.float32)),
        "lengths": jnp.asarray(np.array([16, 13, 8, 5], np.int32)),
        "targets": jnp.asarray(
            np.tile(np.array([0, 1, 0, 2, 0], np.int32), (B, 1))),
        "target_lengths": jnp.asarray(np.full(B, 5, np.int32)),
    }

    # Compare grads of the production loss (fused path, input_is_leaf
    # threaded; on CPU this runs the fused scan cell which ignores the
    # flag) against the literal-combinator loss.
    g1 = jax.grad(lambda p: ctc_alignment_loss(spec, p, batch)[0])(params)
    from clstm_tpu.models.spec import apply_net

    def loss_literal(p):
        logits = apply_net(spec, p, batch["x"], batch["lengths"],
                           logits=True, fuse_bidi=False).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        from clstm_tpu.ops.ctc import ctc_align_targets_batched
        from clstm_tpu.ops.seq import length_mask
        aligned = jax.lax.stop_gradient(ctc_align_targets_batched(
            jax.lax.stop_gradient(probs), batch["targets"],
            lengths=batch["lengths"],
            target_lengths=batch["target_lengths"]))
        mask = length_mask(batch["lengths"], T)
        ll = jax.nn.log_softmax(logits, axis=-1)
        return jnp.sum(jnp.sum(-jnp.sum(aligned * ll, -1) * mask, -1))

    g2 = jax.grad(loss_literal)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_with_state_false_same_output():
    """with_state=False (inference mode) must return bit-identical y to
    the state-emitting kernel — it only skips the hpf/hpr/cpf/cpr streams
    the backward pass would consume — and must still differentiate
    correctly (the custom_vjp forward rule re-runs WITH state)."""
    pf, pr, x, lengths = _setup()
    full = bidi_lstm_pallas(pf, pr, x, lengths, 8, True, False)
    lean = bidi_lstm_pallas(pf, pr, x, lengths, 8, True, False, True, False)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(lean))

    tgt = jax.random.normal(jax.random.PRNGKey(9), (4, 16, 14))

    def loss(with_state):
        def f(pf_, pr_):
            y = bidi_lstm_pallas(pf_, pr_, x, lengths, 8, True, False,
                                 True, with_state)
            return jnp.sum((y - tgt) ** 2)
        return jax.grad(f, argnums=(0, 1))(pf, pr)

    g_full = loss(True)
    g_lean = loss(False)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_lean)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
