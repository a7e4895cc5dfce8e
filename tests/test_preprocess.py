"""On-device preprocessing parity vs the host scipy pipeline.

The north star makes normalization/transposition an on-device stage
(ops/preprocess.py); these tests pin it to the host implementation
(io/normalize.py + data/dataset.py prepare_line), which round 1 already
parity-tested against the native C++ port. Reference: extras.cc ≈L1-400
CenterNormalizer (unverified, mount empty)."""

import numpy as np
import jax.numpy as jnp
import pytest

from clstm_tpu.data.dataset import prepare_line
from clstm_tpu.data.lines import LineGenerator
from clstm_tpu.io.normalize import make_normalizer
from clstm_tpu.ops.preprocess import (
    estimate_out_T, pack_raw_images, prepare_batch_device)

TH, PAD = 48, 16


@pytest.fixture(scope="module")
def lines():
    gen = LineGenerator(seed=11)
    return [gen.render(gen.random_text(6, 18)) for _ in range(10)]


def _host(images, kind):
    out = []
    for im in images:
        n = make_normalizer(kind, TH)
        out.append(prepare_line(im, n, PAD))
    return out


@pytest.mark.parametrize("kind", ["none", "mean", "center"])
def test_device_prepare_matches_host(lines, kind):
    host = _host(lines, kind)
    buf, hs, ws = pack_raw_images(lines)
    xd, lengths = prepare_batch_device(
        jnp.asarray(buf), jnp.asarray(hs), jnp.asarray(ws), kind=kind,
        target_height=TH, out_T=512, pad=PAD)
    xd = np.asarray(xd)
    lengths = np.asarray(lengths)
    width_mismatch = 0
    mean_diffs = []
    for i, hx in enumerate(host):
        L = int(lengths[i])
        if hx.shape[0] != L:
            # r can drift by 1 on knife-edge mad values (float32 vs
            # float64); allow a rare occurrence but never silently.
            width_mismatch += 1
            continue
        d = np.abs(xd[i, :L] - hx)
        mean_diffs.append(d.mean())
        # Padding region must be exactly blank and lengths honored.
        assert np.all(xd[i, L:] == 0.0)
    assert width_mismatch <= 1, f"{width_mismatch}/10 width mismatches"
    # Parity envelope: occasional +-1px column shifts are allowed (plateau
    # knife edges); on average the strips must be essentially identical.
    assert np.mean(mean_diffs) < 2e-4, np.mean(mean_diffs)


def test_device_prepare_padding_invariance(lines):
    """Growing the raw buffer (more zero padding) must not change a line's
    output — the kernels must honor (h, w), not the buffer shape."""
    im = lines[0]
    buf1, h1, w1 = pack_raw_images([im])
    big = np.zeros((1, buf1.shape[1] + 13, buf1.shape[2] + 29), np.float32)
    big[0, :im.shape[0], :im.shape[1]] = im
    x1, l1 = prepare_batch_device(
        jnp.asarray(buf1), jnp.asarray(h1), jnp.asarray(w1), kind="center",
        target_height=TH, out_T=512, pad=PAD)
    x2, l2 = prepare_batch_device(
        jnp.asarray(big), jnp.asarray(h1), jnp.asarray(w1), kind="center",
        target_height=TH, out_T=512, pad=PAD)
    assert int(l1[0]) == int(l2[0])
    # Different buffer sizes change float32 summation order, which can flip
    # a knife-edge center column by 1px; demand near-identity, not bitwise.
    a, b = np.asarray(x1[0]), np.asarray(x2[0])
    assert np.mean(np.abs(a - b)) < 5e-4
    assert np.mean(np.abs(a - b) > 1e-5) < 0.01  # <1% of elements differ


def test_predict_batch_images_end_to_end(lines):
    """predict_batch_images wires the device stage into CLSTMOCR: decodes
    must agree with the host-prepared predict path on a (tiny random) net,
    frame for frame."""
    import jax
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.hl import CLSTMOCR

    ocr = CLSTMOCR(target_height=TH, dewarp="center", pad=PAD)
    ocr.createBidi(Codec.build(["abc"]), nhidden=8, seed=0)

    ids_d, vals_d, lengths = ocr.predict_batch_images(lines[:4])
    agree = 0
    for i, im in enumerate(lines[:4]):
        x = ocr.prepare(im)
        ids_h, vals_h = ocr._predict_one(x)
        L = int(lengths[i])
        if L == x.shape[0] and np.array_equal(ids_d[i, :L], ids_h):
            agree += 1
    assert agree >= 3, f"device/host frame ids agree on {agree}/4 lines"


def test_estimate_out_T_bounds_real_width(lines):
    buf, hs, ws = pack_raw_images(lines)
    est = estimate_out_T(lines, TH, PAD)
    _, lengths = prepare_batch_device(
        jnp.asarray(buf), jnp.asarray(hs), jnp.asarray(ws), kind="center",
        target_height=TH, out_T=1024, pad=PAD)
    assert int(np.max(np.asarray(lengths))) <= est


def test_augment_lines_invariants():
    """augment: strength 0 ~= identity; padding stays exactly zero; output
    bounded; deterministic in the key."""
    import jax
    import jax.numpy as jnp
    from clstm_tpu.ops.preprocess import augment_lines

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 64, 16).astype(np.float32))
    lengths = jnp.asarray(np.array([64, 40, 10, 1], np.int32))
    key = jax.random.PRNGKey(7)

    y0 = augment_lines(key, x, lengths, strength=0.0)
    mask = (np.arange(64)[None, :] < np.asarray(lengths)[:, None])[..., None]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x) * mask,
                               rtol=0, atol=1e-6)

    y1 = np.asarray(augment_lines(key, x, lengths, strength=1.0))
    assert np.all(y1[~np.broadcast_to(mask, y1.shape)] == 0.0)
    assert y1.min() >= 0.0 and y1.max() <= 1.5
    y1b = np.asarray(augment_lines(key, x, lengths, strength=1.0))
    np.testing.assert_array_equal(y1, y1b)
    y2 = np.asarray(augment_lines(jax.random.PRNGKey(8), x, lengths, 1.0))
    assert np.abs(y2 - y1).max() > 1e-3


def test_train_step_with_augment_runs():
    import jax
    import jax.numpy as jnp
    from clstm_tpu.models.prefab import make_net_init
    from clstm_tpu.ops.ctc import mktargets_ids
    from clstm_tpu.train import TrainState, make_train_step

    spec, params = make_net_init(
        "bidi", {"ninput": 8, "nhidden": 8, "noutput": 6},
        jax.random.PRNGKey(0))
    step = make_train_step(spec, lr=1e-3, momentum=0.9, loss_kind="ctc",
                           augment=1.0)
    state = TrainState.create(params)
    rng = np.random.RandomState(0)
    B, T = 4, 32
    tids = np.stack([mktargets_ids(rng.randint(1, 6, size=3))
                     for _ in range(B)])
    batch = {"x": jnp.asarray(rng.rand(B, T, 8).astype(np.float32)),
             "lengths": jnp.asarray(np.array([32, 30, 20, 25], np.int32)),
             "targets": jnp.asarray(tids),
             "target_lengths": jnp.full((B,), 7, jnp.int32)}
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    # different step counters -> different augmentation -> different loss
    assert float(m1["loss"]) != float(m2["loss"])
    assert np.isfinite(float(m2["loss"]))


def test_augment_shifts_translate_without_wraparound():
    """Shifts are zero-fill translations: content at one boundary must
    never reappear at the opposite boundary (regression: circular rolls
    wrapped end-of-line ink to the start for bucket-length lines)."""
    import jax
    import jax.numpy as jnp
    from clstm_tpu.ops.preprocess import augment_lines

    T, H = 32, 16
    x = np.zeros((1, T, H), np.float32)
    x[0, T - 1, H - 1] = 1.0  # impulse at the far time/height corner
    xj = jnp.asarray(x)
    lengths = jnp.asarray(np.array([T], np.int32))
    for seed in range(32):
        y = np.asarray(augment_lines(jax.random.PRNGKey(seed), xj, lengths,
                                     strength=1.0))
        # Noise floor is 0.05-std gaussian; the impulse is 1.0 (scaled
        # 0.8-1.2). Anything >0.5 in the first frames/rows would be ink
        # wrapped around a boundary.
        assert y[0, :8, :].max() < 0.5, f"time wraparound at seed {seed}"
        assert y[0, :, :8].max() < 0.5, f"height wraparound at seed {seed}"
