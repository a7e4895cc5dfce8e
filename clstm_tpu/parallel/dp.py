"""Data-parallel training step via shard_map.

Design (SURVEY.md §2 parallelism plan): each device computes the
CTC-alignment loss and gradients on its shard of a width-bucketed padded
line batch; gradients (and the scalar loss) are summed with ``psum`` over
the mesh's data axis — the collective XLA lowers onto the ICI ring — and
the (replicated) SGD-with-momentum update is applied identically on every
device. Semantically identical to the single-chip step on the concatenated
batch: per-line loss contributions are summed in both cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from clstm_tpu.models.spec import NetSpec
from clstm_tpu.ops.ctc import greedy_frames
from clstm_tpu.parallel.mesh import DATA_AXIS
from clstm_tpu.train import (TrainState, _LOSSES, clip_by_global_norm,
                             sgd_update)


def pmean_tree(tree, axis: str):
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis), tree)


def psum_tree(tree, axis: str):
    return jax.tree.map(lambda x: jax.lax.psum(x, axis), tree)


def _make_device_step_fn(spec: NetSpec, loss_kind: str, normalization: str,
                         compute_dtype, gradient_clip: float, augment: float,
                         augment_seed: int, axis: str):
    """The per-shard training-step body shared by make_parallel_train_step
    (host-fed sharded batches) and make_parallel_multi_train_step (in-scan
    gather from the replicated device cache): per-shard loss/grads,
    psum-reduced over ``axis``, identical replicated SGD update everywhere
    — the multi-chip twin of train._make_step_fn."""
    loss_fn = _LOSSES[loss_kind]
    aug_base = jax.random.PRNGKey(augment_seed)

    def device_step(state: TrainState, batch: dict, lr_t, momentum_t):
        if augment > 0:
            from clstm_tpu.ops.preprocess import augment_lines
            key = jax.random.fold_in(
                jax.random.fold_in(aug_base, state.step),
                jax.lax.axis_index(axis))
            batch = dict(batch, x=augment_lines(key, batch["x"],
                                                batch["lengths"], augment))
        (loss, (probs, _)), grads = jax.value_and_grad(
            lambda p: loss_fn(spec, p, batch,
                              normalization=normalization,
                              compute_dtype=compute_dtype),
            has_aux=True)(state.params)
        grads = psum_tree(grads, axis)
        loss = jax.lax.psum(loss, axis)
        if gradient_clip > 0:
            # Clip AFTER the psum so the update equals the single-device
            # clipped update on the full batch (see make_train_step).
            grads = clip_by_global_norm(grads, gradient_clip)
        params, velocity = sgd_update(state.params, state.velocity, grads,
                                      lr_t, momentum_t)
        ids, vals = greedy_frames(probs)
        # report_ids/vals: GLOBAL row 0 (lives on the axis-index-0 shard),
        # replicated via a masked psum — keeps the DP step's metrics API
        # interchangeable with make_train_step's (the CLI report path
        # reads the pre-sliced row to avoid the ~65ms full-[B,T] transfer;
        # round-2 advisor finding).
        first = (jax.lax.axis_index(axis) == 0)
        rep_ids = jax.lax.psum(jnp.where(first, ids[0], 0), axis)
        rep_vals = jax.lax.psum(jnp.where(first, vals[0], 0.0), axis)
        f32 = jnp.float32
        packed = jnp.concatenate([loss.reshape(1).astype(f32),
                                  rep_ids.astype(f32), rep_vals.astype(f32)])
        new_state = TrainState(params=params, velocity=velocity,
                               step=state.step + 1)
        return new_state, {"loss": loss, "frame_ids": ids,
                           "frame_vals": vals,
                           "report_ids": rep_ids, "report_vals": rep_vals,
                           "report": packed}

    return device_step


def make_parallel_train_step(spec: NetSpec, mesh: Mesh,
                             lr: float = 1e-4, momentum: float = 0.9, *,
                             loss_kind: str = "ctc",
                             normalization: str = "none",
                             compute_dtype=None,
                             gradient_clip: float = 0.0,
                             augment: float = 0.0, augment_seed: int = 0,
                             axis: str = DATA_AXIS,
                             donate: bool = True):
    """Build the jitted multi-chip training step.

    Returns step(state, batch, lr=, momentum=) with state replicated and
    batch sharded along ``axis`` (see parallel.mesh helpers). Gradients are
    psum-reduced, so the update equals the single-device update on the full
    batch (loss convention: summed per-line contributions). With
    augment > 0 each shard draws an independent on-device augmentation
    stream (key folds in both the step counter and the axis index), so the
    multi-chip trajectory matches single-device only at augment=0.
    """
    device_step = _make_device_step_fn(spec, loss_kind, normalization,
                                       compute_dtype, gradient_clip,
                                       augment, augment_seed, axis)

    batch_specs = {"x": P(axis), "lengths": P(axis),
                   "targets": P(axis), "target_lengths": P(axis)}
    if loss_kind == "frames":
        batch_specs = {"x": P(axis), "lengths": P(axis), "y": P(axis)}

    sharded = jax.shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), batch_specs, P(), P()),
        out_specs=(P(), {"loss": P(), "frame_ids": P(axis),
                         "frame_vals": P(axis),
                         "report_ids": P(), "report_vals": P(),
                         "report": P()}),
        # The scan carries inside lstm_apply start replicated and become
        # axis-varying on first use; keep the compute kernels mesh-agnostic
        # rather than threading pvary through them.
        check_vma=False,
    )

    # Declare input shardings (pytree prefixes) so the FIRST trace already
    # has the steady-state signature. Without this, call 1 sees uncommitted
    # arrays, the returned state comes back committed as NamedSharding(P()),
    # and feeding it into call 2 changes the sharding signature -> a full
    # silent retrace (~15s on the tunneled backend) in the middle of the
    # training loop (measured as a phantom 80x "mesh overhead" in the round-2
    # dp1 bench before root-causing).
    from jax.sharding import NamedSharding
    repl = NamedSharding(mesh, P())
    batch_sh = {k: NamedSharding(mesh, s) for k, s in batch_specs.items()}
    jitted = jax.jit(sharded, donate_argnums=(0,) if donate else (),
                     in_shardings=(repl, batch_sh, repl, repl))

    def wrapped(state, batch, lr_arg=None, momentum_arg=None):
        return jitted(state, batch,
                      jnp.float32(lr if lr_arg is None else lr_arg),
                      jnp.float32(momentum if momentum_arg is None else momentum_arg))

    return wrapped


def make_parallel_multi_train_step(spec: NetSpec, mesh: Mesh, k: int,
                                   lr: float = 1e-4, momentum: float = 0.9, *,
                                   loss_kind: str = "ctc",
                                   normalization: str = "none",
                                   compute_dtype=None,
                                   gradient_clip: float = 0.0,
                                   augment: float = 0.0,
                                   augment_seed: int = 0,
                                   axis: str = DATA_AXIS,
                                   input_onehot: int = 0,
                                   donate: bool = True):
    """K fused gather+train steps per dispatch, data-parallel over ``mesh``
    — the multi-chip twin of train.make_multi_train_step.

    step(state, group, idx_all, j, nvalid=, lr=, momentum=) ->
    (state, metrics, j+nvalid), with the SAME calling convention and
    metrics ({loss, report, report_all [k, 1+2T]}) as the single-device
    factory, so models.hl.train_batch_block and the CLIs drive either
    interchangeably.

    Structure: one shard_map whose body is a lax.scan over ``k``
    consecutive batches of the device-resident epoch plan. The cache
    group arrays and the [nb, B] index plan are REPLICATED on the mesh
    (data.device_cache places them so); inside the scan each device
    dynamic-slices its own B/n rows of the batch's index vector and
    gathers them locally — no collectives on the data path — then runs
    the per-shard loss/grad body with the gradient (and loss) psum over
    ``axis``, so every device applies the identical full-batch update
    (numerically the single-device K-scan up to f32 reduction order).
    Remainder blocks reuse the one compiled scan via the traced ``nvalid``
    lax.cond skip, exactly as the single-device factory.

    Why this exists (round-4 verdict weak #1): the round-4 dispatch-fusion
    wins were single-device-only — with a mesh set the CLI fell back to
    one epoch()-gather + one train_batch dispatch per batch, reproducing
    the structure that capped the round-3 CLI at 26% of the device rate.
    On the north-star v5e-8 this path keeps K batches per dispatch WITH
    the psum step (reference hot loop: clstmocrtrain.cc ≈L100;
    BASELINE.json north_star).

    ``input_onehot`` > 0: the resident ``xs`` carry int32 input ids
    (text-transduction corpora — data.device_cache.TextDeviceDataset) and
    each gathered batch is one-hot expanded to [B, T, input_onehot] on
    device inside the jit (HBM holds 4 bytes/frame instead of 4*ni).
    """
    device_step = _make_device_step_fn(spec, loss_kind, normalization,
                                       compute_dtype, gradient_clip,
                                       augment, augment_seed, axis)
    n = mesh.shape[axis]

    def kstep(state, xs, targets, lengths, tlens, idx_all, j, nvalid,
              lr_t, mom_t):
        j_end = j + nvalid
        bl = idx_all.shape[1] // n          # rows per device
        rank = jax.lax.axis_index(axis)
        T = xs.shape[1]
        R = 1 + 2 * T

        def body(carry, _):
            st, jj = carry

            def do(args):
                st, jj = args
                idx = jax.lax.dynamic_index_in_dim(idx_all, jj, 0,
                                                   keepdims=False)
                # This device's rows of the batch: the global batch is the
                # plan row; shard s owns rows [s*bl, (s+1)*bl) — shard 0's
                # local row 0 is the GLOBAL row 0, so the packed report's
                # masked psum (device_step) reports the same line as the
                # single-device path.
                loc = jax.lax.dynamic_slice(idx, (rank * bl,), (bl,))
                x = xs[loc]
                if input_onehot:
                    x = jax.nn.one_hot(x, input_onehot, dtype=jnp.float32)
                batch = {"x": x, "lengths": lengths[loc],
                         "targets": targets[loc],
                         "target_lengths": tlens[loc]}
                new_st, metrics = device_step(st, batch, lr_t, mom_t)
                return (new_st, jj + 1), metrics["report"]

            def skip(args):
                st, jj = args
                return (st, jj), jnp.zeros((R,), jnp.float32)

            return jax.lax.cond(jj < j_end, do, skip, (st, jj))

        (state, j), reports = jax.lax.scan(body, (state, j), None, length=k)
        last = jax.lax.dynamic_index_in_dim(reports, nvalid - 1, 0,
                                            keepdims=False)
        metrics = {"loss": last[0], "report": last, "report_all": reports}
        return state, metrics, j

    sharded = jax.shard_map(
        kstep, mesh=mesh,
        # Everything in is replicated (cache groups + plan + counter live
        # replicated on the mesh); everything out is replicated (psum'd
        # grads -> identical state, masked-psum reports).
        in_specs=(P(),) * 10,
        out_specs=(P(), {"loss": P(), "report": P(), "report_all": P()},
                   P()),
        check_vma=False,
    )
    from jax.sharding import NamedSharding
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(sharded, donate_argnums=(0, 6) if donate else (),
                     in_shardings=(repl,) * 10)

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
