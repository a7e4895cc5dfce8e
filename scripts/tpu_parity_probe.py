"""On-REAL-TPU parity + learning checks for the production compute paths.

CPU interpret-mode unit tests CANNOT catch TPU-only numerics (e.g. the
default MXU matmul precision quantizing f32 operands to bf16 — the
round-2 CTC regression): run THIS on the real chip after any kernel or
precision change.

  python scripts/tpu_parity_probe.py            # parity probes (~5 min)
  probe_overfit=1 python scripts/tpu_parity_probe.py   # + 8-line overfit

Checks:
  1. fused bidi LSTM (production bf16 streams) vs the scan oracle, with
     PADDED variable-length rows at a training-like shape — forward and
     parameter gradients.
  2. CTC alignment (fused Pallas both+lse + HIGHEST-precision einsums)
     vs the scan recipe on valid frames.
  3. optionally, an 8-line overfit: a healthy trainer memorizes to
     CER < 2% within 2k updates (catches training-signal corruption
     that pointwise parity can miss).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from clstm_tpu.ops.lstm import bidi_lstm_apply, lstm_init
    from clstm_tpu.ops.pallas_lstm import bidi_lstm_pallas
    from clstm_tpu.ops.ctc import ctc_align_targets_batched, mktargets_ids

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    B, T, D, H = 16, 512, 48, 100
    kf, kr = jax.random.split(jax.random.PRNGKey(0))
    pf = lstm_init(kf, D, H, scale=0.3)
    pr = lstm_init(kr, D, H, scale=0.3)
    x = jnp.asarray(rng.rand(B, T, D).astype(np.float32))
    lengths = jnp.asarray(rng.randint(T // 4, T + 1, size=B).astype(np.int32))
    L = np.asarray(lengths)

    want = np.asarray(jax.jit(bidi_lstm_apply)(pf, pr, x, lengths))
    got = np.asarray(jax.jit(
        lambda a, b, x, l: bidi_lstm_pallas(a, b, x, l))(pf, pr, x, lengths))
    d = max(np.abs(got[b, :L[b]] - want[b, :L[b]]).max() for b in range(B))
    ok1 = d < 0.05
    print(f"lstm fwd padded-row parity: max {d:.5f} "
          f"{'OK' if ok1 else 'FAIL'}", flush=True)

    tgt = jnp.asarray(rng.rand(B, T, 2 * H).astype(np.float32))
    mask = (np.arange(T)[None, :] < L[:, None]).astype(np.float32)
    mj = jnp.asarray(mask)[:, :, None]
    g1 = jax.jit(lambda a, b: jax.grad(
        lambda a_, b_: jnp.sum(((bidi_lstm_apply(a_, b_, x, lengths)
                                 - tgt) * mj) ** 2),
        argnums=(0, 1))(a, b))(pf, pr)
    g2 = jax.jit(lambda a, b: jax.grad(
        lambda a_, b_: jnp.sum(((bidi_lstm_pallas(a_, b_, x, lengths)
                                 - tgt) * mj) ** 2),
        argnums=(0, 1))(a, b))(pf, pr)
    worst = 0.0
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        worst = max(worst, np.abs(a - b).max() / max(np.abs(a).max(), 1e-3))
    ok2 = worst < 0.05
    print(f"lstm grad parity (rel-to-max): {worst:.4f} "
          f"{'OK' if ok2 else 'FAIL'}", flush=True)

    C, nchars = 44, 20
    probs = rng.rand(B, T, C).astype(np.float32) + 1e-3
    probs /= probs.sum(-1, keepdims=True)
    S = 2 * nchars + 1
    tids = np.stack([mktargets_ids(rng.randint(1, C, size=nchars))
                     for _ in range(B)])
    tl = jnp.asarray(np.full(B, S, np.int32))
    a_pl = np.asarray(ctc_align_targets_batched(
        jnp.asarray(probs), jnp.asarray(tids), lengths=lengths,
        target_lengths=tl))
    a_sc = np.asarray(ctc_align_targets_batched(
        jnp.asarray(probs), jnp.asarray(tids), lengths=lengths,
        target_lengths=tl, use_pallas=False))
    d3 = max(np.abs(a_pl[b, :L[b]] - a_sc[b, :L[b]]).max() for b in range(B))
    ok3 = d3 < 1e-3
    print(f"ctc alignment parity (valid frames): max {d3:.6f} "
          f"{'OK' if ok3 else 'FAIL'}", flush=True)

    ok4 = True
    if os.environ.get("probe_overfit"):
        ok4 = overfit_check()
    if not (ok1 and ok2 and ok3 and ok4):
        print("PARITY PROBE: FAIL", flush=True)
        return 1
    print("PARITY PROBE: ALL OK", flush=True)
    return 0


def overfit_check() -> bool:
    """8 synthetic lines must memorize to CER < 2% within 2k updates."""
    import jax
    import jax.numpy as jnp

    from clstm_tpu.data.dataset import make_batches, prepare_line
    from clstm_tpu.data.lines import LineGenerator
    from clstm_tpu.io.normalize import make_normalizer
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.prefab import make_net_init
    from clstm_tpu.ops.ctc import decode_frames
    from clstm_tpu.train import TrainState, make_train_step
    from clstm_tpu.utils.metrics import levenshtein

    gen = LineGenerator(seed=0)
    samples = []
    for _ in range(8):
        text = gen.random_sentence()[:30]
        img = gen.render(text)
        norm = make_normalizer("center", 48)
        samples.append((prepare_line(img, norm), text))
    codec = Codec.build([t for _, t in samples])
    batch = next(make_batches(samples, codec, 8, t_buckets=(1024,),
                              s_buckets=(128,)))
    spec, params = make_net_init(
        "bidi", {"ninput": 48, "nhidden": 100, "noutput": codec.size()},
        jax.random.PRNGKey(0))
    step = make_train_step(spec, lr=3e-4, momentum=0.9, loss_kind="ctc")
    state = TrainState.create(params)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "texts"}
    for i in range(2001):
        state, m = step(state, jb)
    ids = np.asarray(m["frame_ids"])
    vals = np.asarray(m["frame_vals"])
    err = chars = 0
    for b in range(len(batch["texts"])):
        Lb = batch["lengths"][b]
        pred = codec.decode(decode_frames(ids[b][:Lb], vals[b][:Lb]))
        err += levenshtein(batch["texts"][b], pred)
        chars += len(batch["texts"][b])
    cer = err / max(chars, 1)
    ok = cer < 0.02
    print(f"overfit check: 8-line CER after 2k updates = {cer:.4f} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    return ok


if __name__ == "__main__":
    sys.exit(main())
