"""Integration learning tests (reference test-lstm.cc; BASELINE config 1).

Trains a small LSTM+Softmax on the synthetic delayed-sequence task and
asserts the error drops below threshold — the reference's load-bearing
"does it actually learn" check, jitted end-to-end here.
"""

import jax
import jax.numpy as jnp
import numpy as np

from clstm_tpu.data.synth import delayed_sequence_batch
from clstm_tpu.models.prefab import make_net_init
from clstm_tpu.ops.ctc import mktargets_ids
from clstm_tpu.train import TrainState, make_train_step, make_predict_step


def test_lstm_learns_delayed_sequence():
    nsym, T, B = 5, 20, 16
    spec, params = make_net_init(
        "lstm1", {"ninput": nsym, "nhidden": 32, "noutput": nsym,
                  "initial": 0.1}, jax.random.PRNGKey(0))
    state = TrainState.create(params)
    step = make_train_step(spec, lr=0.2, momentum=0.9, loss_kind="frames",
                           normalization="batch")
    rng = np.random.RandomState(0)
    losses = []
    for i in range(150):
        b = delayed_sequence_batch(rng, B, T, nsym, delay=1)
        batch = {"x": jnp.asarray(b["x"]), "y": jnp.asarray(b["y"]),
                 "lengths": jnp.asarray(b["lengths"])}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))

    # Error rate on fresh data: frame accuracy past the delay must be high.
    b = delayed_sequence_batch(rng, B, T, nsym, delay=1)
    predict = make_predict_step(spec)
    ids, _ = predict(state.params, jnp.asarray(b["x"]), jnp.asarray(b["lengths"]))
    acc = float((np.asarray(ids)[:, 1:] == b["classes"][:, 1:]).mean())
    assert acc > 0.9, (acc, losses[::30])
    assert losses[-1] < 0.25 * losses[0], losses[::30]


def test_ctc_training_learns_toy_transduction():
    """Mini end-to-end CTC-alignment training: map a one-hot input string to
    its own symbols via CTC (identity transduction with repeated frames).
    BASELINE config 2 in miniature, CPU-runnable."""
    nsym = 4  # classes 0..3, 0 = blank
    B, T = 8, 24
    rep = 3  # each symbol spans 3 frames

    rng = np.random.RandomState(1)

    def make_batch():
        n = T // rep
        syms = rng.randint(1, nsym, size=(B, n))
        x = np.zeros((B, T, nsym), np.float32)
        for b in range(B):
            for i in range(n):
                x[b, i * rep:(i + 1) * rep, syms[b, i]] = 1.0
        S = 2 * n + 1
        tids = np.zeros((B, S), np.int32)
        tlens = np.zeros(B, np.int32)
        for b in range(B):
            ids = mktargets_ids(syms[b])
            tids[b, :len(ids)] = ids
            tlens[b] = len(ids)
        return (
            {"x": jnp.asarray(x),
             "lengths": jnp.asarray(np.full(B, T, np.int32)),
             "targets": jnp.asarray(tids),
             "target_lengths": jnp.asarray(tlens)},
            syms,
        )

    spec, params = make_net_init(
        "bidi", {"ninput": nsym, "nhidden": 16, "noutput": nsym,
                 "initial": 0.1}, jax.random.PRNGKey(2))
    state = TrainState.create(params)
    step = make_train_step(spec, lr=0.1, momentum=0.9, loss_kind="ctc",
                           normalization="batch")
    first = None
    for i in range(120):
        batch, _ = make_batch()
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < 0.5 * first, (first, last)

    # Decode a fresh batch and require mostly-correct transductions.
    from clstm_tpu.ops.ctc import decode_frames
    batch, syms = make_batch()
    predict = make_predict_step(spec)
    ids, vals = predict(state.params, batch["x"], batch["lengths"])
    correct = 0
    for b in range(B):
        got = decode_frames(np.asarray(ids[b]), np.asarray(vals[b]))
        if got == list(syms[b]):
            correct += 1
    assert correct >= B // 2, (correct, B)


def test_gradient_clipping():
    """Opt-in global-norm clip bounds the update magnitude."""
    import jax.numpy as jnp
    from clstm_tpu.train import clip_by_global_norm

    g = {"a": jnp.full((4,), 100.0), "b": jnp.full((3,), -50.0)}
    c = clip_by_global_norm(g, 1.0)
    norm = float(jnp.sqrt(sum(jnp.sum(v ** 2) for v in jax.tree.leaves(c))))
    assert abs(norm - 1.0) < 1e-5
    # under the limit -> unchanged
    g2 = {"a": jnp.full((4,), 0.1)}
    c2 = clip_by_global_norm(g2, 10.0)
    np.testing.assert_allclose(np.asarray(c2["a"]), 0.1, rtol=1e-6)


def test_normalization_modes():
    """Loss normalization {none, len, batch} scales as specified
    (reference lr-normalization attr; SURVEY.md §2 INetwork row)."""
    import jax
    import jax.numpy as jnp
    from clstm_tpu.models.prefab import make_net_init
    from clstm_tpu.ops.ctc import mktargets_ids
    from clstm_tpu.train import ctc_alignment_loss

    nsym, B, T = 4, 3, 12
    spec, params = make_net_init(
        "lstm1", {"ninput": nsym, "nhidden": 6, "noutput": nsym},
        jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T, nsym).astype(np.float32))
    tids = jnp.asarray(np.stack([mktargets_ids([1, 2]) for _ in range(B)]))
    batch = {"x": x, "lengths": jnp.full((B,), T, jnp.int32),
             "targets": tids, "target_lengths": jnp.full((B,), 5, jnp.int32)}

    l_none, _ = ctc_alignment_loss(spec, params, batch, normalization="none")
    l_batch, _ = ctc_alignment_loss(spec, params, batch, normalization="batch")
    l_len, _ = ctc_alignment_loss(spec, params, batch, normalization="len")
    np.testing.assert_allclose(float(l_batch), float(l_none) / B, rtol=1e-6)
    np.testing.assert_allclose(float(l_len), float(l_none) / T, rtol=1e-5)
    import pytest
    with pytest.raises(ValueError):
        ctc_alignment_loss(spec, params, batch, normalization="bogus")
