"""Training: CTC-alignment loss + the reference's SGD semantics, one jit.

Reference training step (clstmocrtrain.cc ≈L100 / clstmhl.h train_utf8,
call stack SURVEY.md §3.1; all ≈L unverified):
  forward -> ctc_align_targets -> inject ``outputs.d = aligned - outputs.v``
  -> backward -> sgd_update.

Two semantics matter for parity and are replicated exactly:

1. **Delta convention.** The reference injects the delta at the *post-
   softmax* outputs, but backward_softmax (clstm_compute.cc ≈L300) applies
   it directly as the *pre-activation* (logit) delta — the classic
   softmax+CE shortcut. The JAX equivalent is the cross-entropy surrogate
   ``loss = -sum(stop_grad(aligned) * log_softmax(logits))`` whose logit
   gradient is ``probs - aligned`` — exactly the negated reference delta.

2. **Momentum.** Reference sgd_update (clstm.cc ≈L350) does
   ``W.v += lr * W.d; W.d *= momentum`` where backward *accumulates* into
   ``d``; unrolled this is heavy-ball: velocity_k = grad_k + mu*velocity_{k-1},
   params -= lr * velocity_k (sign flipped because our grad = -d).
   NOTE: like the reference, velocity is NOT checkpointed (.clstm stores no
   optimizer state; SURVEY.md §5 checkpoint/resume).

Learning-rate normalization modes {none, len, batch} scale each line's
contribution (attr ``normalization``; default none — low confidence on the
reference default).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from clstm_tpu.models.spec import NetSpec, apply_net
from clstm_tpu.ops.ctc import ctc_align_targets_batched, greedy_frames
from clstm_tpu.ops.seq import length_mask


@struct.dataclass
class TrainState:
    params: dict
    velocity: dict
    step: jax.Array

    @classmethod
    def create(cls, params: dict) -> "TrainState":
        return cls(
            params=params,
            velocity=jax.tree.map(jnp.zeros_like, params),
            step=jnp.zeros((), jnp.int32),
        )


def sgd_update(params: dict, velocity: dict, grads: dict, lr: float,
               momentum: float):
    """One reference-semantics SGD step; returns (params, velocity).

    velocity_k = grad_k + momentum * velocity_{k-1};  p -= lr * velocity_k.
    """
    velocity = jax.tree.map(lambda g, v: g + momentum * v, grads, velocity)
    params = jax.tree.map(lambda p, v: p - lr * v, params, velocity)
    return params, velocity


def ctc_alignment_loss(spec: NetSpec, params: dict, batch: dict, *,
                       normalization: str = "none", compute_dtype=None):
    """The reference training objective as a scalar surrogate loss.

    batch: {"x": [B,T,D], "lengths": [B], "targets": [B,S] blank-interleaved
    class ids, "target_lengths": [B]}.
    Returns (loss, (probs, aligned)).
    """
    x, lengths = batch["x"], batch["lengths"]
    # input_is_leaf: the train step differentiates w.r.t. params only, so
    # the fused input-layer kernel may skip its dx cotangent stream.
    logits = apply_net(spec, params, x, lengths, logits=True,
                       compute_dtype=compute_dtype, input_is_leaf=True)
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    aligned = jax.lax.stop_gradient(
        ctc_align_targets_batched(
            jax.lax.stop_gradient(probs), batch["targets"],
            lengths=lengths, target_lengths=batch["target_lengths"]))
    mask = length_mask(lengths, x.shape[1])                       # [B, T]
    ll = jax.nn.log_softmax(logits, axis=-1)
    per_frame = -jnp.sum(aligned * ll, axis=-1) * mask            # [B, T]
    per_line = jnp.sum(per_frame, axis=-1)                        # [B]
    if normalization == "len":
        per_line = per_line / jnp.maximum(lengths.astype(jnp.float32), 1.0)
        loss = jnp.sum(per_line)
    elif normalization == "batch":
        loss = jnp.sum(per_line) / x.shape[0]
    elif normalization == "none":
        loss = jnp.sum(per_line)
    else:
        raise ValueError(f"unknown normalization: {normalization!r}")
    return loss, (probs, aligned)


def frame_target_loss(spec: NetSpec, params: dict, batch: dict, *,
                      normalization: str = "none", compute_dtype=None):
    """Direct per-frame supervision (the reference test-lstm.cc setup: the
    delta ``targets - outputs`` is injected without CTC alignment).

    batch: {"x": [B,T,D], "lengths": [B], "y": [B,T,C] one-hot frame targets}.
    """
    x, lengths = batch["x"], batch["lengths"]
    # input_is_leaf: the train step differentiates w.r.t. params only, so
    # the fused input-layer kernel may skip its dx cotangent stream.
    logits = apply_net(spec, params, x, lengths, logits=True,
                       compute_dtype=compute_dtype, input_is_leaf=True)
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    mask = length_mask(lengths, x.shape[1])
    ll = jax.nn.log_softmax(logits, axis=-1)
    per_frame = -jnp.sum(batch["y"] * ll, axis=-1) * mask
    per_line = jnp.sum(per_frame, axis=-1)
    if normalization == "len":
        per_line = per_line / jnp.maximum(lengths.astype(jnp.float32), 1.0)
    loss = jnp.sum(per_line)
    if normalization == "batch":
        loss = loss / x.shape[0]
    return loss, (probs, batch["y"])


_LOSSES = {"ctc": ctc_alignment_loss, "frames": frame_target_loss}


def clip_by_global_norm(grads: dict, max_norm: float) -> dict:
    """Scale the gradient pytree so its global L2 norm is <= max_norm.

    The reference has no clipping (momentum can blow up on long runs —
    observed on the synthetic UW3 run around trial 150k); this is an
    opt-in stability addition, off by default for exact reference
    semantics."""
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in jax.tree.leaves(grads)))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads)


def unpack_report(report, L: Optional[int] = None):
    """Unpack a step's packed ``report`` metric in ONE host transfer.

    report = [loss, ids[0][:T], vals[0][:T]] as f32 (see make_train_step).
    Returns (loss, ids[:L] int64, vals[:L]). Separate np.asarray/float()
    calls on device arrays each cost a full round-trip (~30-60ms on a
    tunneled chip); reading reports through this helper costs exactly one.
    """
    import numpy as np

    rep = np.asarray(report)
    T = (rep.shape[0] - 1) // 2
    ids = rep[1:1 + T].astype(np.int64)
    vals = rep[1 + T:]
    if L is not None:
        ids, vals = ids[:L], vals[:L]
    return float(rep[0]), ids, vals


def _make_step_fn(spec: NetSpec, loss_kind: str, normalization: str,
                  compute_dtype, gradient_clip: float, augment: float,
                  augment_seed: int):
    """The pure training-step body shared by make_train_step (host-fed
    batches) and make_cached_train_step (in-jit gather from a
    device-resident cache group)."""
    loss_fn = _LOSSES[loss_kind]
    aug_base = jax.random.PRNGKey(augment_seed)

    def step(state: TrainState, batch: dict, lr_t, momentum_t):
        if augment > 0:
            # On-device train-time augmentation (ops/preprocess.py): the
            # key folds in the step counter, so it needs no extra inputs
            # and no host dispatch; augment=0 (default) is exact
            # reference semantics.
            from clstm_tpu.ops.preprocess import augment_lines
            key = jax.random.fold_in(aug_base, state.step)
            batch = dict(batch, x=augment_lines(key, batch["x"],
                                                batch["lengths"], augment))
        (loss, (probs, _aligned)), grads = jax.value_and_grad(
            lambda p: loss_fn(spec, p, batch,
                              normalization=normalization,
                              compute_dtype=compute_dtype),
            has_aux=True)(state.params)
        if gradient_clip > 0:
            grads = clip_by_global_norm(grads, gradient_clip)
        params, velocity = sgd_update(state.params, state.velocity, grads,
                                      lr_t, momentum_t)
        ids, vals = greedy_frames(probs)
        # report_ids/vals: row 0 only, sliced INSIDE the jit — the CLI
        # report path decodes one line; transferring the full [B, T]
        # arrays costs ~65ms over the tunneled link and an eager on-device
        # slice costs a pathological per-op dispatch (round-2 measurement:
        # e2e 4073 -> 2203 lines/s with eager slicing).
        # "report" additionally PACKS (loss, row-0 ids, row-0 vals) into
        # ONE f32 vector: every separate np.asarray/float() on a device
        # array is a full host round-trip (~30-60ms on a tunneled chip),
        # so the CLI report path reads a single array instead of three
        # (round-3 measurement: each report cost 3 RTTs ~ 100-180ms).
        # Class ids are exactly representable in f32 (codecs are << 2^24).
        f32 = jnp.float32
        packed = jnp.concatenate([loss.reshape(1).astype(f32),
                                  ids[0].astype(f32), vals[0].astype(f32)])
        metrics = {"loss": loss, "frame_ids": ids, "frame_vals": vals,
                   "report_ids": ids[0], "report_vals": vals[0],
                   "report": packed}
        new_state = TrainState(params=params, velocity=velocity,
                               step=state.step + 1)
        return new_state, metrics

    return step


def make_train_step(spec: NetSpec, lr: float = 1e-4, momentum: float = 0.9, *,
                    loss_kind: str = "ctc",
                    normalization: str = "none", compute_dtype=None,
                    gradient_clip: float = 0.0,
                    augment: float = 0.0, augment_seed: int = 0,
                    donate: bool = True):
    """Build the jitted end-to-end training step.

    Returns step(state, batch, lr=, momentum=) -> (state, metrics); lr and
    momentum are traced scalars (defaults bound here), so changing them at
    runtime — reference setLearningRate — does NOT recompile. metrics
    carries the scalar loss plus per-frame argmax ids/probs (tiny [B, T]
    arrays) so the host can greedy-decode report lines without transferring
    the full [B, T, C] posteriors. gradient_clip > 0 enables global-norm
    clipping (non-reference stability option).
    """
    step = _make_step_fn(spec, loss_kind, normalization, compute_dtype,
                         gradient_clip, augment, augment_seed)
    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def wrapped(state: TrainState, batch: dict, lr_arg=None, momentum_arg=None):
        return jitted(state, batch,
                      jnp.float32(lr if lr_arg is None else lr_arg),
                      jnp.float32(momentum if momentum_arg is None else momentum_arg))

    wrapped.jitted = jitted  # exposes _cache_size() for recompilation tests
    return wrapped


def make_cached_train_step(spec: NetSpec, lr: float = 1e-4,
                           momentum: float = 0.9, *,
                           loss_kind: str = "ctc",
                           normalization: str = "none", compute_dtype=None,
                           gradient_clip: float = 0.0,
                           augment: float = 0.0, augment_seed: int = 0,
                           input_onehot: int = 0,
                           donate: bool = True):
    """Fused gather+train step over a device-resident cache group.

    step(state, group, idx_all, j, lr=, momentum=) -> (state, metrics, j+1)
    where ``group`` is a DeviceDataset group dict (resident x/targets/
    lengths/tlens arrays incl. the sentinel row), ``idx_all`` the epoch's
    [nb, B] device index plan and ``j`` the ON-DEVICE batch counter. The
    batch gather happens INSIDE the jit, so each training batch costs ONE
    executable dispatch instead of two (separate gather + step): on a
    tunneled chip every dispatch enqueue pays a ~20ms RPC, which at the
    bench shape was ~40% of the steady-state e2e epoch time. nb is stable
    across epochs for a fixed (group, batch_size), so compilations stay
    one per bucket group, as before.

    ``input_onehot`` > 0: the resident ``xs`` carry int32 input ids (text
    corpora — data.device_cache.TextDeviceDataset) and the gathered batch
    is one-hot expanded to [B, T, input_onehot] inside the jit, so HBM
    holds 4 bytes/frame instead of 4*ni."""
    step = _make_step_fn(spec, loss_kind, normalization, compute_dtype,
                         gradient_clip, augment, augment_seed)

    def gstep(state, xs, targets, lengths, tlens, idx_all, j, lr_t, mom_t):
        idx = jax.lax.dynamic_index_in_dim(idx_all, j, 0, keepdims=False)
        x = xs[idx]
        if input_onehot:
            x = jax.nn.one_hot(x, input_onehot, dtype=jnp.float32)
        batch = {"x": x, "lengths": lengths[idx],
                 "targets": targets[idx], "target_lengths": tlens[idx]}
        new_state, metrics = step(state, batch, lr_t, mom_t)
        return new_state, metrics, j + 1

    jitted = jax.jit(gstep, donate_argnums=(0, 6) if donate else ())

    def wrapped(state, group: dict, idx_all, j, lr_arg=None,
                momentum_arg=None):
        return jitted(state, group["x"], group["targets"], group["lengths"],
                      group["tlens"], idx_all, j,
                      jnp.float32(lr if lr_arg is None else lr_arg),
                      jnp.float32(momentum if momentum_arg is None
                                  else momentum_arg))

    wrapped.jitted = jitted
    return wrapped


def make_multi_train_step(spec: NetSpec, k: int, lr: float = 1e-4,
                          momentum: float = 0.9, *,
                          loss_kind: str = "ctc",
                          normalization: str = "none", compute_dtype=None,
                          gradient_clip: float = 0.0,
                          augment: float = 0.0, augment_seed: int = 0,
                          input_onehot: int = 0,
                          donate: bool = True):
    """K fused gather+train steps per executable dispatch.

    step(state, group, idx_all, j, lr=, momentum=) -> (state, metrics, j+k):
    ``lax.scan`` of the make_cached_train_step body over ``k`` consecutive
    batches of the device-resident epoch index plan — the counter, the
    plan and the corpus all live on device, so k training batches cost ONE
    dispatch enqueue instead of k. On a tunneled chip each enqueue is
    ~20-36ms of host-side RPC against ~14ms of device compute per batch,
    which capped the round-3 CLI at ~26% of the device-step rate
    (reference hot loop: clstmocrtrain.cc ≈L100; BASELINE.json north-star
    train metric).

    step(state, group, idx_all, j, nvalid, lr=, momentum=) ->
    (state, metrics, j+nvalid). ``nvalid`` is a TRACED scalar: scan steps
    beyond it are skipped via lax.cond (XLA executes only the taken
    branch, so dead steps cost ~nothing and never touch state/velocity/
    counter) — remainder blocks of any length reuse the ONE compiled
    k-scan per group instead of compiling a short scan per distinct
    remainder (6 extra ~30s tunnel compiles on the round-4 bench corpus).

    metrics = {"loss": last-VALID-step loss, "report": last valid step's
    packed report, "report_all": [k, 1+2T] — every step's packed (loss,
    row-0 ids, row-0 vals); rows >= nvalid are zeros}: the CLI prints
    report_every-cadence lines from report_all rows, reading the whole
    [k, R] block in one deferred transfer (~KBs) instead of one ~55ms
    round-trip per report.

    The per-step math is byte-for-byte the make_cached_train_step body;
    trajectory equivalence vs k single-step dispatches over the same plan
    is asserted in tests/test_device_cache.py."""
    step = _make_step_fn(spec, loss_kind, normalization, compute_dtype,
                         gradient_clip, augment, augment_seed)

    def kstep(state, xs, targets, lengths, tlens, idx_all, j, nvalid,
              lr_t, mom_t):
        j_end = j + nvalid

        def body(carry, _):
            st, jj = carry

            def do(args):
                st, jj = args
                idx = jax.lax.dynamic_index_in_dim(idx_all, jj, 0,
                                                   keepdims=False)
                x = xs[idx]
                if input_onehot:
                    x = jax.nn.one_hot(x, input_onehot, dtype=jnp.float32)
                batch = {"x": x, "lengths": lengths[idx],
                         "targets": targets[idx],
                         "target_lengths": tlens[idx]}
                new_st, metrics = step(st, batch, lr_t, mom_t)
                return (new_st, jj + 1), metrics["report"]

            def skip(args):
                st, jj = args
                R = 1 + 2 * xs.shape[1]
                return (st, jj), jnp.zeros((R,), jnp.float32)

            return jax.lax.cond(jj < j_end, do, skip, (st, jj))

        (state, j), reports = jax.lax.scan(body, (state, j), None, length=k)
        last = jax.lax.dynamic_index_in_dim(reports, nvalid - 1, 0,
                                            keepdims=False)
        metrics = {"loss": last[0], "report": last, "report_all": reports}
        return state, metrics, j

    jitted = jax.jit(kstep, donate_argnums=(0, 6) if donate else ())

    def wrapped(state, group: dict, idx_all, j, nvalid=None, lr_arg=None,
                momentum_arg=None):
        return jitted(state, group["x"], group["targets"], group["lengths"],
                      group["tlens"], idx_all, j,
                      jnp.int32(k if nvalid is None else nvalid),
                      jnp.float32(lr if lr_arg is None else lr_arg),
                      jnp.float32(momentum if momentum_arg is None
                                  else momentum_arg))

    wrapped.jitted = jitted
    return wrapped


def make_predict_step(spec: NetSpec, *, compute_dtype=None, mesh=None,
                      axis: str = "data"):
    """Jitted inference: (params, x, lengths) -> per-frame (ids, vals).

    With ``mesh`` given, the step is compiled data-parallel over the mesh:
    params replicated, x/lengths (and the outputs) sharded along the batch
    dim — GSPMD partitions the batched forward with no collectives on the
    compute path. Batch rows must divide by the mesh's axis size."""

    def predict(params: dict, x: jax.Array, lengths: Optional[jax.Array]):
        probs = apply_net(spec, params, x, lengths, compute_dtype=compute_dtype,
                          inference=True)
        return greedy_frames(probs.astype(jnp.float32))

    if mesh is None:
        return jax.jit(predict)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis))
    return jax.jit(predict, in_shardings=(repl, row, row),
                   out_shardings=(row, row))


def make_forward(spec: NetSpec, *, compute_dtype=None):
    """Jitted plain forward (posteriors), for tests and external use."""

    @functools.partial(jax.jit)
    def forward(params: dict, x: jax.Array, lengths: Optional[jax.Array] = None):
        return apply_net(spec, params, x, lengths, compute_dtype=compute_dtype)

    return forward
