"""Pallas CTC DP kernel vs the lax.scan oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clstm_tpu.ops.ctc import NEG, _backward_dp, _forward_scan
from clstm_tpu.ops.pallas_ctc import ctc_backward_pallas, ctc_forward_pallas


@pytest.mark.parametrize("B,T,S", [(8, 256, 128), (16, 128, 128)])
def test_pallas_matches_scan(B, T, S):
    rng = np.random.RandomState(0)
    lmatch = np.log(rng.rand(B, T, S).astype(np.float32) + 1e-3)
    # mask some states invalid and some frames padded
    lmatch[:, :, 100:] = NEG
    lengths = rng.randint(T // 2, T + 1, size=B)
    tvalid = (np.arange(T)[None, :] < lengths[:, None])

    want = np.asarray(_forward_scan(jnp.asarray(lmatch), jnp.asarray(tvalid), -5.0))
    got = np.asarray(ctc_forward_pallas(jnp.asarray(lmatch),
                                        jnp.asarray(lengths.astype(np.int32)),
                                        skip=-5.0, interpret=True))
    # Compare only valid frames: the unmasked kernel intentionally lets
    # phantom (suffix-padding) frames evolve — the caller masks them out.
    for b in range(B):
        np.testing.assert_allclose(got[b, :lengths[b], :100],
                                   want[b, :lengths[b], :100],
                                   rtol=1e-5, atol=1e-5, err_msg=f"row {b}")


@pytest.mark.parametrize("B,T,S", [(8, 256, 128)])
def test_pallas_backward_matches_flipped_scan(B, T, S):
    rng = np.random.RandomState(2)
    lmatch = np.log(rng.rand(B, T, S).astype(np.float32) + 1e-3)
    tlens = rng.randint(10, 100, size=B)
    for b in range(B):
        lmatch[b, :, tlens[b]:] = NEG
    lengths = rng.randint(T // 2, T + 1, size=B)
    tvalid = (np.arange(T)[None, :] < lengths[:, None])

    want = np.asarray(_backward_dp(
        jnp.asarray(lmatch), jnp.asarray(tvalid),
        jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(tlens.astype(np.int32)), -5.0, False))
    got = np.asarray(ctc_backward_pallas(
        jnp.asarray(lmatch), jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(tlens.astype(np.int32)), skip=-5.0, interpret=True))
    # Compare valid (frame, state) cells only — the two implementations
    # differ freely in carry-through padding regions.
    for b in range(B):
        np.testing.assert_allclose(
            got[b, :lengths[b], :tlens[b]], want[b, :lengths[b], :tlens[b]],
            rtol=1e-5, atol=1e-5, err_msg=f"row {b}")


def test_pallas_odd_chunking():
    """T not divisible by the default chunk -> chunk shrinks correctly."""
    B, T, S = 8, 192, 128
    rng = np.random.RandomState(1)
    lmatch = np.log(rng.rand(B, T, S).astype(np.float32) + 1e-3)
    tvalid = np.ones((B, T), bool)
    want = np.asarray(_forward_scan(jnp.asarray(lmatch), jnp.asarray(tvalid), -5.0))
    got = np.asarray(ctc_forward_pallas(jnp.asarray(lmatch),
                                        jnp.full(B, T, np.int32),
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_both_lse_matches_scan_alignment():
    """ctc_both_pallas feeds ctc_align_targets_batched's fused TPU path;
    its (both, lse) must reproduce the scan recipe's normalized epath."""
    from clstm_tpu.ops.pallas_ctc import ctc_both_pallas
    B, T, S = 8, 64, 128
    rng = np.random.RandomState(3)
    lmatch = np.log(rng.rand(B, T, S).astype(np.float32) + 1e-3)
    tlens = rng.randint(5, 40, size=B)
    for b in range(B):
        lmatch[b, :, tlens[b]:] = NEG
    lengths = rng.randint(T // 2, T + 1, size=B)
    tvalid = (np.arange(T)[None, :] < lengths[:, None])

    lr = _forward_scan(jnp.asarray(lmatch), jnp.asarray(tvalid), -5.0)
    rl = _backward_dp(jnp.asarray(lmatch), jnp.asarray(tvalid),
                      jnp.asarray(lengths.astype(np.int32)),
                      jnp.asarray(tlens.astype(np.int32)), -5.0, False)
    both_w = np.asarray(lr + rl)
    both_w = np.where(tvalid[:, :, None], both_w, NEG)
    m = both_w.max(axis=(1, 2), keepdims=True)
    ep = np.exp(both_w - m)
    col = ep.sum(axis=1, keepdims=True)
    want = ep / np.where(col == 0.0, 1e-9, col)

    both, lse = ctc_both_pallas(
        jnp.asarray(lmatch), lr, jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(tlens.astype(np.int32)), skip=-5.0, interpret=True)
    both, lse = np.asarray(both), np.asarray(lse)
    got = np.where(both > 0.5 * NEG, np.exp(both - lse[:, None, :]), 0.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
