"""CTC-as-alignment: the reference's training signal, batched on device.

Reference: the CTC section of clstm.cc (≈L1100-1300, unverified; empty
mount — SURVEY.md §0): ``mktargets`` interleaves blanks into the target
string (S = 2N+1 states), ``forward_algorithm`` is a log-space DP over the
(time x state) lattice with transitions {stay, advance-by-one} plus a
per-state/per-time *skip penalty* used for initialization,
``ctc_align_targets`` combines forward and backward passes into per-frame
aligned posterior targets, and ``trivial_decode`` is the greedy decoder.
The algorithm lineage is ocropy's lstm.py (clstm is its C++ translation);
numerics here follow that recipe exactly, because the reference trains with
``outputs.d = aligned - outputs.v`` (alignment targets, NOT the textbook
CTC loss gradient) and CER parity depends on it (SURVEY.md §7).

TPU-native design: the DP recurrence is a ``lax.scan`` over time carrying
the [B, S] log-alpha vector; the state dimension is vectorized; batching is
handled with per-row time/state masks and flip-within-length (no ragged
shapes, no host round-trips). The whole alignment runs inside the jitted
training step under ``stop_gradient``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from clstm_tpu.ops.seq import flip_within_length

NEG = -1e30  # log-space "impossible" (finite to keep arithmetic NaN-free)
LO = 1e-5    # probability floor, as in the reference (lo = 1e-5)
SKIP = -5.0  # default skip penalty, as in the reference


def _mxu_precision():
    """MXU precision for the alignment einsums (trace-time env knob).

    Default HIGH (bf16x3): the one-hot operand is exact in bf16, so the
    3-pass product carries relative error <= 1.5e-5 (measured round 4 on
    the tunneled v5e) at ~0.46ms/step less than HIGHEST at the bench
    shape. ``ctc_precision=highest`` is the rollback escape hatch
    (round-4 advisor note: this knob's failure mode is hardware-only —
    CPU interpret computes true f32 either way — and DEFAULT precision
    once stalled training silently at 46% CER)."""
    import os
    p = os.environ.get("ctc_precision", "high").lower()
    if p == "highest":
        return jax.lax.Precision.HIGHEST
    if p != "high":
        raise ValueError(f"ctc_precision must be high|highest, got {p!r}")
    return jax.lax.Precision.HIGH


def mktargets_ids(classes, S: Optional[int] = None) -> np.ndarray:
    """Interleave CTC blanks (class 0) into a class-id sequence.

    Reference ``mktargets`` (clstm.cc ≈L1100) emits a one-hot [2N+1, nclasses]
    matrix; the id-vector form here is the batched equivalent (one-hot is
    materialized lazily on device). Optionally right-pad to S states with 0.
    """
    classes = list(classes)
    ids = np.zeros(2 * len(classes) + 1, dtype=np.int32)
    ids[1::2] = classes
    if S is not None:
        out = np.zeros(S, dtype=np.int32)
        out[: len(ids)] = ids[:S]
        return out
    return ids


def mktargets(classes, nclasses: int) -> np.ndarray:
    """One-hot [2N+1, nclasses] target matrix — the reference's exact output."""
    ids = mktargets_ids(classes)
    out = np.zeros((len(ids), nclasses), dtype=np.float32)
    out[np.arange(len(ids)), ids] = 1.0
    return out


def _forward_scan(lmatch: jax.Array, tvalid: jax.Array, skip: float) -> jax.Array:
    """Batched log-space forward DP.

    lmatch: [B, T, S] log match scores (NEG for invalid states).
    tvalid: [B, T] bool, True for valid frames (padded frames carry through).
    Returns lr: [B, T, S] log-alpha after each frame.

    Per the reference recurrence (clstm.cc forward_algorithm, ≈L1150):
      v0[j] = skip * j
      for each frame i: w = roll(v, 1); w[0] = skip * i
                        v = logaddexp(v + lmatch[i], w + lmatch[i])
    """
    B, T, S = lmatch.shape
    v0 = skip * jnp.arange(S, dtype=lmatch.dtype)[None, :].repeat(B, axis=0)
    lm_t = jnp.transpose(lmatch, (1, 0, 2))     # [T, B, S]
    tv_t = jnp.transpose(tvalid, (1, 0))        # [T, B]

    def step(v, inp):
        lm_i, valid_i, i = inp
        w = jnp.roll(v, 1, axis=1)
        w = w.at[:, 0].set(skip * i)
        v_new = jnp.logaddexp(v + lm_i, w + lm_i)
        v_next = jnp.where(valid_i[:, None], v_new, v)
        return v_next, v_next

    idx = jnp.arange(T, dtype=lmatch.dtype)
    _, lr = jax.lax.scan(step, v0, (lm_t, tv_t, idx))
    return jnp.transpose(lr, (1, 0, 2))


def forward_algorithm(lmatch: jax.Array, skip: float = SKIP) -> jax.Array:
    """Single-example [T, S] forward DP (reference-shaped API)."""
    lr = _forward_scan(lmatch[None], jnp.ones((1, lmatch.shape[0]), bool), skip)
    return lr[0]


def _forward_dp(lmatch: jax.Array, tvalid: jax.Array, skip: float,
                use_pallas: Optional[bool]) -> jax.Array:
    """Dispatch the DP to the Pallas TPU kernel or the lax.scan fallback.

    The scan is pure sequential latency (~15us/step on a tunneled v5e);
    the Pallas kernel keeps the log-alpha carry in VMEM across the whole
    T loop (ops/pallas_ctc.py). Auto mode uses Pallas exactly when the
    default backend is TPU.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _forward_scan(lmatch, tvalid, skip)
    from clstm_tpu.ops.pallas_ctc import ctc_forward_pallas
    B, T, S = lmatch.shape
    Sp = -(-S // 128) * 128
    Bp = -(-B // 8) * 8
    lm = lmatch
    if Sp != S:
        lm = jnp.pad(lm, ((0, 0), (0, 0), (0, Sp - S)),
                     constant_values=NEG)
    lengths = jnp.sum(tvalid.astype(jnp.int32), axis=1)  # contiguous prefix
    if Bp != B:
        lm = jnp.pad(lm, ((0, Bp - B), (0, 0), (0, 0)), constant_values=NEG)
        lengths = jnp.pad(lengths, (0, Bp - B))
    lr = ctc_forward_pallas(lm, lengths, skip=skip)
    return lr[:B, :, :S]


def _backward_dp(lmatch: jax.Array, tvalid: jax.Array, lengths: jax.Array,
                 target_lengths: jax.Array, skip: float,
                 use_pallas: Optional[bool]) -> jax.Array:
    """The second DP direction: flipped-forward on CPU, direct backward
    kernel on TPU (ops/pallas_ctc.py ctc_backward_pallas — avoids four
    full-array flip gathers)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        lm_rev = flip_within_length(lmatch, lengths)                 # flip time
        lm_rev = flip_within_length(jnp.swapaxes(lm_rev, 1, 2), target_lengths)
        lm_rev = jnp.swapaxes(lm_rev, 1, 2)                          # flip state
        rl = _forward_scan(lm_rev, tvalid, skip)
        rl = flip_within_length(rl, lengths)
        return jnp.swapaxes(
            flip_within_length(jnp.swapaxes(rl, 1, 2), target_lengths), 1, 2)
    from clstm_tpu.ops.pallas_ctc import ctc_backward_pallas
    B, T, S = lmatch.shape
    Sp = -(-S // 128) * 128
    Bp = -(-B // 8) * 8
    lm = lmatch
    if Sp != S:
        lm = jnp.pad(lm, ((0, 0), (0, 0), (0, Sp - S)), constant_values=NEG)
    tl = target_lengths
    lens = lengths
    if Bp != B:
        lm = jnp.pad(lm, ((0, Bp - B), (0, 0), (0, 0)), constant_values=NEG)
        lens = jnp.pad(lens, (0, Bp - B))
        tl = jnp.pad(tl, (0, Bp - B), constant_values=1)
    rl = ctc_backward_pallas(lm, lens, tl, skip=skip)
    return rl[:B, :, :S]


def ctc_align_targets_batched(
    probs: jax.Array,
    target_ids: jax.Array,
    *,
    lengths: Optional[jax.Array] = None,
    target_lengths: Optional[jax.Array] = None,
    skip: float = SKIP,
    lo: float = LO,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Batched CTC alignment: per-frame aligned posterior targets.

    Args:
      probs: [B, T, C] network posteriors (softmax outputs).
      target_ids: [B, S] blank-interleaved class ids (mktargets_ids), padded
        with zeros beyond each row's true state count.
      lengths: [B] true frame counts (None = all T valid).
      target_lengths: [B] true state counts (2N+1; None = all S valid).

    Returns aligned [B, T, C]; rows for padded frames are uniform (mask them
    in the loss). Matches the reference recipe step for step:
      outputs = max(lo, probs); outputs /= rowsum
      lmatch = log(outputs @ onehot(targets).T)
      both = forward(lmatch) + flipped-forward(flipped lmatch)
      epath = exp(both - max); normalize over time per state
      aligned = max(lo, epath @ onehot(targets)); normalize over classes
    """
    B, T, C = probs.shape
    S = target_ids.shape[1]
    f32 = jnp.float32
    probs = probs.astype(f32)

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((B,), S, jnp.int32)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if use_pallas:
        # Lane/sublane alignment for the DP kernels is applied to the TINY
        # per-row arrays (target_ids [B,S], lengths) BEFORE anything [B,T,*]
        # is built, so lmatch/both are born at the padded width and the
        # former jnp.pad + slice-back copies over [B,T,S] (two full HBM
        # round-trips at the bench shape) never happen. Padded states carry
        # svalid=False -> lmatch=NEG -> zero path mass, identically to the
        # sliced recipe.
        Sp = -(-S // 128) * 128
        Bp = -(-B // 8) * 8
        if Sp != S:
            target_ids = jnp.pad(target_ids, ((0, 0), (0, Sp - S)))
        if Bp != B:
            target_ids = jnp.pad(target_ids, ((0, Bp - B), (0, 0)))
            lengths = jnp.pad(lengths, (0, Bp - B))
            target_lengths = jnp.pad(target_lengths, (0, Bp - B),
                                     constant_values=1)
            probs = jnp.pad(probs, ((0, Bp - B), (0, 0), (0, 0)),
                            constant_values=1.0 / C)

    tvalid = jnp.arange(T)[None, :] < lengths[:, None]             # [*, T]
    svalid = (jnp.arange(target_ids.shape[1])[None, :]
              < target_lengths[:, None])                           # [*, S*]

    out = jnp.maximum(probs, lo)
    out = out / jnp.sum(out, axis=2, keepdims=True)

    onehot = jax.nn.one_hot(target_ids, C, dtype=f32)              # [*, S*, C]
    onehot = onehot * svalid[:, :, None]

    # lmatch[b,t,s] = log out[b,t,target_ids[b,s]]; NEG for invalid states.
    if use_pallas:
        # One-hot contraction instead of take_along_axis: the MXU batched
        # matmul beats the lane gather on TPU. Raised precision is
        # REQUIRED for correctness: TPU DEFAULT matmul precision
        # quantizes f32 operands to bf16 on the MXU (~0.4% relative
        # error), and quantized lmatch noises the alignment targets
        # enough to stall CTC training (round-2 regression: config-3 CER
        # stuck at ~46% vs <1% at 100k trials; hardware-only — CPU
        # interpret runs true f32 and shows parity). HIGH (bf16x3) is
        # the right tier, measured round 4 on the tunneled v5e: because
        # the one-hot operand is EXACT in bf16 (its low-part split is
        # zero), the 3-pass product carries relative error <= 1.5e-5
        # even on LO-floored probabilities — log-domain error 1.5e-5,
        # 250x tighter than the bf16 failure mode and far below any
        # training-relevant scale — while HIGHEST (f32 6-pass) costs a
        # measured 0.46ms/step of pure precision tax at the bench shape
        # (benchmarks/profile_ctc_loop.py). Round-3 note retained: on
        # the tunneled-v5e backend, take_along_axis over the class axis
        # itself returns WRONG values (max abs err 0.023 vs numpy — a
        # backend gather bug; exact on CPU), so the gather branch below
        # must stay CPU-only.
        prod = jnp.einsum("btc,bsc->bts", out, onehot,
                          preferred_element_type=f32,
                          precision=_mxu_precision())
        lmatch = jnp.log(jnp.maximum(prod, 1e-30))
    else:
        gathered = jnp.take_along_axis(
            out, target_ids[:, None, :].astype(jnp.int32), axis=2)
        lmatch = jnp.log(gathered)
    lmatch = jnp.where(svalid[:, None, :], lmatch, NEG)

    if use_pallas:
        # Fused TPU path: the second DP direction emits both = lr + rl and
        # its per-(b,s) logsumexp over time in ONE kernel pass, so the
        # epath normalization is a single fused exp — no separate rl
        # materialization, masking, global-max or colsum passes over
        # [B,T,S]. Mathematically identical to the scan recipe below:
        # exp(both - m)/colsum == exp(both - logsumexp_t both). All arrays
        # are already at the kernel-aligned (Bp, Sp) shape (see above) —
        # padded states are NEG throughout and fall out of the aligned
        # einsum as exact zeros via the zeroed onehot rows, so no [B,T,S]
        # pad or slice-back copies are needed.
        from clstm_tpu.ops.pallas_ctc import ctc_both_pallas, ctc_forward_pallas
        lr = ctc_forward_pallas(lmatch, lengths, skip=skip)
        both, lse = ctc_both_pallas(lmatch, lr, lengths, target_lengths,
                                    skip=skip)
        # Guard: all-NEG (t, s) columns (invalid states / fully padded
        # rows) must yield exactly zero path mass, as the scan path's
        # col==0 guard does.
        epath = jnp.where(both > 0.5 * NEG,
                          jnp.exp(both - lse[:, None, :]), 0.0)
    else:
        lr = _forward_dp(lmatch, tvalid, skip, use_pallas)
        rl = _backward_dp(lmatch, tvalid, lengths, target_lengths, skip,
                          use_pallas)
        both = lr + rl
        both = jnp.where(tvalid[:, :, None], both, NEG)
        both = jnp.where(svalid[:, None, :], both, NEG)

        m = jnp.max(both, axis=(1, 2), keepdims=True)
        epath = jnp.exp(both - m)                                    # [B, T, S]
        col = jnp.sum(epath, axis=1, keepdims=True)                  # per-state mass over time
        epath = epath / jnp.where(col == 0.0, 1e-9, col)

    # Raised precision here too: the result IS the training target; TPU
    # default precision would round epath/onehot to bf16 on the MXU.
    # HIGH suffices for the same reason as lmatch above (one-hot operand
    # exact in bf16 -> relative error <= 1.5e-5).
    aligned = jnp.einsum("bts,bsc->btc", epath, onehot,
                         precision=_mxu_precision())
    aligned = jnp.maximum(aligned, lo)
    aligned = aligned / jnp.sum(aligned, axis=2, keepdims=True)
    return aligned[:B]


def ctc_align_targets(probs: jax.Array, targets: jax.Array, *, skip: float = SKIP,
                      lo: float = LO) -> jax.Array:
    """Single-example reference-shaped API: probs [T, C], targets one-hot
    [S, C] (as produced by ``mktargets``) -> aligned [T, C]."""
    ids = jnp.argmax(targets, axis=1).astype(jnp.int32)
    return ctc_align_targets_batched(probs[None], ids[None], skip=skip, lo=lo)[0]


def greedy_frames(probs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device-side half of decoding: per-frame argmax ids and their probs.

    probs: [..., T, C] -> (ids [..., T], vals [..., T]). Cheap to transfer;
    the stateful run-collapse finishes on host (trivial_decode).
    """
    ids = jnp.argmax(probs, axis=-1)
    vals = jnp.max(probs, axis=-1)
    return ids, vals


def trivial_decode(probs, length: Optional[int] = None, return_positions: bool = False):
    """Greedy CTC decode of one line, reference semantics.

    Reference ``trivial_decode`` (clstm.cc ≈L1250, unverified): scan frames;
    within each maximal run delimited by blank-argmax frames, emit the single
    class with the highest frame probability (peak picking, ocropy's
    translate_back lineage), recording its frame index.

    Accepts [T, C] probabilities (numpy or jax). Returns list of class ids,
    or (ids, positions) when return_positions.
    """
    p = np.asarray(probs)
    if length is not None:
        p = p[:length]
    ids = p.argmax(axis=1)
    vals = p.max(axis=1)
    return decode_frames(ids, vals, return_positions)


def decode_frames(ids, vals, return_positions: bool = False):
    """Host-side run-collapse over per-frame (argmax id, prob) arrays."""
    ids = np.asarray(ids)
    vals = np.asarray(vals)
    out, pos = [], []
    mv, mc, mt = 0.0, -1, -1
    for t in range(len(ids)):
        c = int(ids[t])
        if c == 0:
            if mc > 0:
                out.append(mc)
                pos.append(mt)
            mv, mc, mt = 0.0, -1, -1
        elif vals[t] > mv:
            mv, mc, mt = float(vals[t]), c, t
    if mc > 0:
        out.append(mc)
        pos.append(mt)
    if return_positions:
        return out, pos
    return out
