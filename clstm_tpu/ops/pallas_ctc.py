"""Pallas TPU kernel for the CTC alignment forward DP.

The alignment DP (ops/ctc.py _forward_scan) is a T-step recurrence over a
tiny [B, S] state — as a lax.scan it is pure latency: each of T iterations
does a handful of VPU ops on ~100KB but pays full while-loop overhead
(~15us/iter measured; BASELINE.md round-1 profile shows the two DP
directions cost ~31ms of a 69ms train step at B=256, T=1024).

This kernel runs the whole recurrence on-chip: grid = (B tiles, T chunks)
with T sequential ("arbitrary") so the log-alpha state lives in a VMEM
scratch across chunks while lmatch blocks stream in via the pallas
pipeline. Both DP directions reuse this kernel (the caller flips lmatch
within true lengths, exactly as the scan path does).

No backward pass exists or is needed: alignment targets are computed under
stop_gradient (the reference's training rule; see train.py).

Layout requirements: S (state dim) padded to a multiple of 128 (lane
width) with NEG entries — ctc.py handles the padding. Frame validity is
derived from per-row ``lengths`` (padding must be a contiguous suffix):
the forward kernel needs no per-step masking at all (valid rows are
written before the recurrence enters a row's padding; the caller masks
``both``), while the backward kernel masks — it walks backward through
the padding before reaching valid frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clstm_tpu.ops.pallas_lstm import _vmem_limit

NEG = -1e30


def _kernel(lm_ref, out_ref, v_ref, *, skip: float, t_chunk: int):
    """One (B-tile, T-chunk) grid step of the alignment forward DP.

    lm_ref: [Bt, Tc, S] log match scores block (VMEM)
    out_ref: [Bt, Tc, S] log-alpha output block
    v_ref: [Bt, S] carry scratch, persists across the T grid dimension

    No per-step frame-validity masking: padding is a contiguous per-row
    suffix, this pass walks time forward, so all VALID output rows are
    written before the recurrence enters a row's phantom frames; phantom
    lr rows are garbage-but-finite and the caller masks them out of
    ``both`` before the exp/normalize stage (ops/ctc.py). Per-step
    masking is a large fraction of kernel time (select + compare each
    step). The backward kernel (_bwd_kernel) DOES mask — it walks time
    backward through the padding before reaching valid frames.
    """
    tc = pl.program_id(1)
    S = v_ref.shape[1]

    @pl.when(tc == 0)
    def _init():
        # v0[j] = skip * j  (iota must be integer on TPU, then cast)
        j = jax.lax.broadcasted_iota(jnp.int32, v_ref.shape, 1)
        v_ref[:, :] = skip * j.astype(jnp.float32)

    col0 = jax.lax.broadcasted_iota(jnp.int32, v_ref.shape, 1) == 0

    def body(r, v):
        i = (tc * t_chunk + r).astype(jnp.float32)  # global frame index
        lm = lm_ref[:, r, :]
        # w = roll(v, 1) with w[0] = skip * i
        w = pltpu.roll(v, 1, axis=1)
        w = jnp.where(col0, skip * i, w)
        v_new = jnp.logaddexp(v + lm, w + lm)
        out_ref[:, r, :] = v_new
        return v_new

    # Fully unrolled (capped at 32 — see _bwd_kernel), carry in registers:
    # the DP is VPU-latency-bound (~1.3us/step at the bench shape for ~10
    # vector ops + 1 logaddexp on [256,128]); loop bookkeeping and the
    # per-step VMEM round-trip of the carry are a measurable slice of
    # that. The scratch ref persists the carry only across T-chunks of
    # the grid.
    v_ref[:, :] = jax.lax.fori_loop(0, t_chunk, body, v_ref[:, :],
                                    unroll=min(t_chunk, 32))


def _bwd_kernel(lm_ref, lr_ref, len_ref, tlen_ref, out_ref, lse_ref,
                v_ref, m_ref, a_ref, *, skip: float, t_chunk: int,
                fuse_both: bool):
    """Direct backward DP — computes rl[t,s] (the flipped-forward pass of
    ops/ctc.py) without materializing any flipped arrays.

    Derivation: with u_t[s] := flipped_forward_v[T'-1-t][S'-1-s] (T', S'
    the per-row true lengths), the recurrence becomes
        u_t = lm_t + logaddexp(u_{t+1}, roll(u_{t+1}, -1))
    with the boundary column s = tlen-1 replaced by skip*(len-1-t) and the
    initial (t >= len) state u[s] = skip*(tlen-1-s). Frames t >= len carry
    through; states s >= tlen are NEG via lmatch. The grid walks T chunks
    in reverse via the index maps.

    With fuse_both=True the kernel additionally streams in the FORWARD
    pass's log-alphas ``lr`` and emits, in one pass, the posterior-path
    lattice ``both[t,s] = lr[t,s] + rl[t,s]`` (NEG on invalid frames) plus
    the per-(row, state) log-sum-exp of ``both`` over time (running
    max/scaled-sum pair) — replacing three full XLA passes over [B,T,S]
    (mask, global max, exp+colsum) in ctc_align_targets_batched.
    """
    tc = pl.program_id(1)
    S = v_ref.shape[1]

    def expand(m128):
        if S > 128:
            return jnp.concatenate([m128] * (S // 128), axis=1)
        return m128

    tlen = expand(tlen_ref[:, :])                      # [Bt, S]
    col = jax.lax.broadcasted_iota(jnp.int32, v_ref.shape, 1).astype(jnp.float32)

    @pl.when(tc == 0)
    def _init():
        # u_init[s] = skip * (tlen - 1 - s); NEG for s >= tlen.
        u0 = skip * (tlen - 1.0 - col)
        v_ref[:, :] = jnp.where(col < tlen, u0, NEG)
        if fuse_both:
            m_ref[:, :] = jnp.full_like(m_ref, NEG)
            a_ref[:, :] = jnp.zeros_like(a_ref)

    nT = pl.num_programs(1)
    lv = expand(len_ref[:, :])  # loop-invariant: true frame counts [Bt, S]
    bcol = col == tlen - 1.0    # loop-invariant: boundary column mask

    def body(rr, carry):
        v, mlse, alse = carry
        r = t_chunk - 1 - rr
        t = ((nT - 1 - tc) * t_chunk + r).astype(jnp.float32)
        lm = lm_ref[:, r, :]
        # w[s] = u_{t+1}[s+1], with the boundary column s == tlen-1 set to
        # skip * (len - 1 - t). (pltpu.roll requires non-negative shifts:
        # roll by S-1 == roll by -1.)
        w = pltpu.roll(v, S - 1, axis=1)
        w = jnp.where(bcol, skip * (lv - 1.0 - t), w)
        v_new = jnp.logaddexp(v + lm, w + lm)
        m = (lv > t).astype(jnp.float32)
        v_next = m * v_new + (1.0 - m) * v
        if fuse_both:
            both = jnp.where(m > 0.0, lr_ref[:, r, :] + v_next, NEG)
            out_ref[:, r, :] = both
            mx = jnp.maximum(mlse, both)
            alse = alse * jnp.exp(mlse - mx) + jnp.exp(both - mx)
            mlse = mx
        else:
            out_ref[:, r, :] = v_next
        return v_next, mlse, alse

    # Unrolled with register-resident carries — see _kernel. The m/a
    # running-lse pair only touches VMEM at chunk boundaries. Without
    # fuse_both the m/a slots are dead (the body passes them through):
    # seed them with zeros rather than loading uninitialized scratch
    # (round-3 advisor item). Unroll is capped at 32: t_chunk is a
    # caller-tunable static arg and a full unroll of a larger chunk
    # multiplies kernel code size with three [b_tile, S] carries live
    # per step (round-3 advisor item).
    if fuse_both:
        init = (v_ref[:, :], m_ref[:, :], a_ref[:, :])
    else:
        init = (v_ref[:, :], jnp.zeros_like(m_ref), jnp.zeros_like(a_ref))
    v_fin, m_fin, a_fin = jax.lax.fori_loop(0, t_chunk, body, init,
                                            unroll=min(t_chunk, 32))
    v_ref[:, :] = v_fin
    if fuse_both:
        m_ref[:, :] = m_fin
        a_ref[:, :] = a_fin
        # Running pair is complete only after the last chunk; earlier
        # writes to the VMEM-resident block are harmlessly overwritten.
        lse_ref[:, :] = m_fin + jnp.log(jnp.maximum(a_fin, 1e-30))


def _bwd_call(lmatch, lr, lengths, target_lengths, *, skip, b_tile, t_chunk,
              interpret, fuse_both):
    B, T, S = lmatch.shape
    assert S % 128 == 0, f"S must be lane-aligned, got {S}"
    b_tile = min(b_tile, B)
    while B % b_tile:
        b_tile //= 2
    t_chunk = min(t_chunk, T)
    while T % t_chunk:
        t_chunk //= 2
    # 3 streamed blocks (lm, lr, both), double-buffered, under ~36MB
    while b_tile > 8 and 6 * b_tile * t_chunk * S * 4 > 36 * 1024 * 1024:
        b_tile //= 2

    len_bc = jnp.broadcast_to(lengths.astype(jnp.float32)[:, None], (B, 128))
    tlen_bc = jnp.broadcast_to(target_lengths.astype(jnp.float32)[:, None],
                               (B, 128))
    nT = T // t_chunk
    grid = (B // b_tile, nT)
    rev = lambda b, t: (b, nT - 1 - t, 0)
    stream = pl.BlockSpec((b_tile, t_chunk, S), rev, memory_space=pltpu.VMEM)
    small = pl.BlockSpec((b_tile, 128), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((b_tile, S), lambda b, t: (b, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, skip=skip, t_chunk=t_chunk,
                          fuse_both=fuse_both),
        grid=grid,
        in_specs=[stream, stream, small, small],
        out_specs=[stream, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, S), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b_tile, S), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=interpret,
    )(lmatch, lr, len_bc, tlen_bc)
    return out


@functools.partial(jax.jit, static_argnames=("skip", "b_tile", "t_chunk",
                                             "interpret"))
def ctc_backward_pallas(lmatch: jax.Array, lengths: jax.Array,
                        target_lengths: jax.Array, *,
                        skip: float = -5.0, b_tile: int = 256,
                        t_chunk: int = 32, interpret: bool = False) -> jax.Array:
    """rl [B, T, S] — equals flip(forward(flip(lmatch))) from the scan
    path, computed in place without flips."""
    rl, _ = _bwd_call(lmatch, lmatch, lengths, target_lengths, skip=skip,
                      b_tile=b_tile, t_chunk=t_chunk, interpret=interpret,
                      fuse_both=False)
    return rl


@functools.partial(jax.jit, static_argnames=("skip", "b_tile", "t_chunk",
                                             "interpret"))
def ctc_both_pallas(lmatch: jax.Array, lr: jax.Array, lengths: jax.Array,
                    target_lengths: jax.Array, *,
                    skip: float = -5.0, b_tile: int = 256,
                    t_chunk: int = 32,
                    interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Fused second DP direction: one pass produces
    ``both[t,s] = lr[t,s] + rl[t,s]`` (NEG on invalid frames; invalid
    states are << NEG via lmatch) and ``lse[b,s] = logsumexp_t both`` —
    so the caller's epath normalization is a single fused
    ``exp(both - lse)`` with no [B,T,S] reduction passes."""
    return _bwd_call(lmatch, lr, lengths, target_lengths, skip=skip,
                     b_tile=b_tile, t_chunk=t_chunk, interpret=interpret,
                     fuse_both=True)


@functools.partial(jax.jit, static_argnames=("skip", "b_tile", "t_chunk",
                                             "interpret"))
def ctc_forward_pallas(lmatch: jax.Array, lengths: jax.Array, *,
                       skip: float = -5.0, b_tile: int = 256,
                       t_chunk: int = 32, interpret: bool = False) -> jax.Array:
    """Batched log-space alignment DP on TPU.

    lmatch: [B, T, S] (S a multiple of 128, invalid states NEG).
    lengths: [B] true frame counts (padding is a contiguous suffix; padded
    frames carry the state through unchanged).
    Returns lr [B, T, S] — the same recurrence as the scan path.
    """
    B, T, S = lmatch.shape
    assert S % 128 == 0, f"S must be lane-aligned, got {S}"
    b_tile = min(b_tile, B)
    while B % b_tile:
        b_tile //= 2
    t_chunk = min(t_chunk, T)
    while T % t_chunk:
        t_chunk //= 2

    while b_tile > 8 and 4 * b_tile * t_chunk * S * 4 > 36 * 1024 * 1024:
        b_tile //= 2
    grid = (B // b_tile, T // t_chunk)
    return pl.pallas_call(
        functools.partial(_kernel, skip=skip, t_chunk=t_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_tile, t_chunk, S),
                         lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, t_chunk, S),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_tile, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=interpret,
    )(lmatch)
