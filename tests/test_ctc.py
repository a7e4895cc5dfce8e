"""CTC alignment tests against an in-test numpy oracle.

The oracle transcribes the published ocropy/clstm alignment recipe
(forward_algorithm / ctc_align_targets; SURVEY.md §2 CTC row) directly in
numpy; the batched device implementation must match it, including under
padding.
"""

import numpy as np
import jax.numpy as jnp

from clstm_tpu.ops.ctc import (
    ctc_align_targets, ctc_align_targets_batched, forward_algorithm,
    mktargets, mktargets_ids, trivial_decode, decode_frames)


# ------------------------------ numpy oracle ------------------------------

def np_forward_algorithm(lmatch, skip=-5.0):
    T, S = lmatch.shape
    v = skip * np.arange(S, dtype=np.float64)
    path = []
    for i in range(T):
        w = np.roll(v, 1).copy()
        w[0] = skip * i
        v = np.logaddexp(v + lmatch[i], w + lmatch[i])
        path.append(v.copy())
    return np.array(path)


def np_ctc_align(probs, targets, skip=-5.0, lo=1e-5):
    outputs = np.maximum(lo, probs.astype(np.float64))
    outputs = outputs / outputs.sum(axis=1, keepdims=True)
    match = outputs @ targets.T
    lmatch = np.log(match)
    lr = np_forward_algorithm(lmatch, skip)
    rl = np_forward_algorithm(lmatch[::-1, ::-1], skip)[::-1, ::-1]
    both = lr + rl
    epath = np.exp(both - both.max())
    col = epath.sum(axis=0, keepdims=True)
    epath = epath / np.where(col == 0.0, 1e-9, col)
    aligned = np.maximum(lo, epath @ targets)
    aligned = aligned / aligned.sum(axis=1, keepdims=True)
    return aligned


def _rand_probs(rng, T, C):
    p = rng.rand(T, C).astype(np.float32) + 0.05
    return p / p.sum(axis=1, keepdims=True)


# --------------------------------- tests ----------------------------------

def test_mktargets():
    ids = mktargets_ids([3, 1, 4])
    np.testing.assert_array_equal(ids, [0, 3, 0, 1, 0, 4, 0])
    oh = mktargets([3, 1, 4], 6)
    assert oh.shape == (7, 6)
    np.testing.assert_array_equal(oh.argmax(1), ids)
    np.testing.assert_array_equal(ids, mktargets_ids([3, 1, 4], S=7))
    padded = mktargets_ids([3, 1], S=8)
    np.testing.assert_array_equal(padded, [0, 3, 0, 1, 0, 0, 0, 0])


def test_forward_algorithm_matches_oracle():
    rng = np.random.RandomState(0)
    lmatch = np.log(rng.rand(9, 5).astype(np.float32) + 0.01)
    got = np.asarray(forward_algorithm(jnp.asarray(lmatch)))
    want = np_forward_algorithm(lmatch)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_align_single_matches_oracle():
    rng = np.random.RandomState(1)
    C = 6
    classes = [2, 5, 1]
    targets = mktargets(classes, C)
    probs = _rand_probs(rng, 20, C)
    got = np.asarray(ctc_align_targets(jnp.asarray(probs), jnp.asarray(targets)))
    want = np_ctc_align(probs, targets)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-4)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_align_batched_matches_oracle_with_padding():
    rng = np.random.RandomState(2)
    C = 5
    cases = [([1, 3], 12), ([4, 2, 1, 3], 17), ([2], 7)]
    T = max(t for _, t in cases)
    S = max(2 * len(c) + 1 for c, _ in cases)
    B = len(cases)
    probs = np.zeros((B, T, C), np.float32)
    tids = np.zeros((B, S), np.int32)
    lens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    singles = []
    for b, (classes, t) in enumerate(cases):
        p = _rand_probs(rng, t, C)
        probs[b, :t] = p
        probs[b, t:] = 1.0 / C  # padding garbage (uniform)
        ids = mktargets_ids(classes)
        tids[b, :len(ids)] = ids
        lens[b] = t
        tlens[b] = len(ids)
        singles.append(np_ctc_align(p, mktargets(classes, C)))

    got = np.asarray(ctc_align_targets_batched(
        jnp.asarray(probs), jnp.asarray(tids),
        lengths=jnp.asarray(lens), target_lengths=jnp.asarray(tlens)))
    for b, (classes, t) in enumerate(cases):
        np.testing.assert_allclose(got[b, :t], singles[b], rtol=1e-2, atol=5e-4,
                                   err_msg=f"case {b}")


def test_align_peaks_on_confident_input():
    """When the network already outputs a clean path, alignment reproduces it."""
    C = 4
    classes = [1, 2, 3]
    # Frames: blank,1,1,blank,2,blank,3,blank
    seq = [0, 1, 1, 0, 2, 0, 3, 0]
    probs = np.full((len(seq), C), 0.02, np.float32)
    for t, c in enumerate(seq):
        probs[t, c] = 1.0
    probs /= probs.sum(1, keepdims=True)
    aligned = np.asarray(ctc_align_targets(jnp.asarray(probs),
                                           jnp.asarray(mktargets(classes, C))))
    np.testing.assert_array_equal(aligned.argmax(1), seq)


def test_trivial_decode():
    C = 4
    seq = [0, 1, 1, 0, 2, 2, 0, 0, 3]
    probs = np.full((len(seq), C), 0.01, np.float32)
    for t, c in enumerate(seq):
        probs[t, c] = 0.9
    # Make the second '1' frame the peak of its run.
    probs[2, 1] = 0.95
    ids, pos = trivial_decode(probs, return_positions=True)
    assert ids == [1, 2, 3]
    assert pos[0] == 2  # peak frame of the '1' run
    # two different chars in one blank-free run -> single peak char (reference
    # trivial_decode semantics)
    seq2 = [0, 1, 2, 0]
    p2 = np.full((4, C), 0.01, np.float32)
    p2[1, 1] = 0.6
    p2[2, 2] = 0.9
    assert trivial_decode(p2) == [2]


def test_decode_frames_equivalent():
    rng = np.random.RandomState(3)
    probs = _rand_probs(rng, 30, 5)
    ids = probs.argmax(1)
    vals = probs.max(1)
    assert decode_frames(ids, vals) == trivial_decode(probs)


def test_ctc_precision_env_escape_hatch(monkeypatch):
    """ctc_precision=highest routes the alignment einsums to f32 6-pass
    (the round-4 HIGH(bf16x3) rollback hatch — advisor note: the knob is
    hardware-only in effect, so on CPU the two must agree exactly; this
    test pins the env contract, bad values raise)."""
    from clstm_tpu.ops.ctc import _mxu_precision
    import jax

    assert _mxu_precision() == jax.lax.Precision.HIGH
    monkeypatch.setenv("ctc_precision", "highest")
    assert _mxu_precision() == jax.lax.Precision.HIGHEST
    monkeypatch.setenv("ctc_precision", "default")
    with np.testing.assert_raises(ValueError):
        _mxu_precision()

    # both tiers produce identical alignments on CPU (true-f32 backend)
    rng = np.random.RandomState(3)
    C = 6
    classes = [2, 5, 1]
    tids = mktargets_ids(classes)[None]
    probs = jnp.asarray(_rand_probs(rng, 16, C)[None])
    monkeypatch.setenv("ctc_precision", "high")
    a = np.asarray(ctc_align_targets_batched(
        probs, jnp.asarray(tids), lengths=jnp.asarray([16]),
        target_lengths=jnp.asarray([len(tids[0])])))
    monkeypatch.setenv("ctc_precision", "highest")
    b = np.asarray(ctc_align_targets_batched(
        probs, jnp.asarray(tids), lengths=jnp.asarray([16]),
        target_lengths=jnp.asarray([len(tids[0])])))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
