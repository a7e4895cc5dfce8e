"""Pallas TPU kernels for the fused bidirectional LSTM cell.

The lax.scan bidi cell (ops/lstm.py bidi_lstm_apply) pays per-iteration
dispatch and MXU issue latency on every one of T steps whose work is tiny.
These kernels run the entire recurrence on-core with the state in VMEM.
Round-2 redesign (the round-1 version was kernel-fast but glue-bound:
~20ms of a 32ms step was XLA transposes/concats around 8ms of kernels):

* **Batch-major [B, T, lanes] everywhere.** No [T, B, *] transposes exist
  anywhere on the path; Pallas blocks are (b_tile, t_chunk, lanes) and the
  grid walks (B tiles, T chunks) with T sequential.
* **The input projection lives INSIDE the kernels.** The host packs
  ``xcat = [x | flip(x) | 1]`` ([B, T, 2D+1], bf16, ~67MB for the bench
  shape) and the kernels compute the per-chunk gate pre-activations
  ``xz = xcat @ Wcat`` on the MXU in VMEM. Round 1 materialized xz
  [B, T, 8Hp] in HBM — 512MB written by prep, read again by BOTH kernels;
  that traffic is gone.
* **Both directions fused in one block-diagonal gate-major matmul**:
  combined state ``hcat [B, 2Hp]`` times ``Wbd [2Hp, 8Hp]`` with column
  blocks ``[gi | gf | go | ci]``, forward direction in the first Hp lanes
  of each block, reverse in the second.
* **The forward kernel emits (h_seq, hprev, cprev)** — the pre-step state
  streams the backward pass needs, at zero extra cost (they are the loop
  carries). Round 1 rebuilt them outside with two [T,B,2Hp] concat-shifts.
* **The backward kernel consumes gradients and accumulates dWcat/dWh
  in-place**: dz never goes to HBM. Per chunk it recomputes xz, runs the
  reverse recurrence (one matmul per step on the critical path:
  ``Dh' = dz @ Wbd^T``), stages dz in VMEM scratch, then does three
  amortized chunk matmuls: ``dWcat += xcat^T dz``, ``dWh += hprev^T dz``,
  ``dxcat = dz @ Wcat^T``. c_seq is recomputed from (hprev, cprev, xz) —
  it is not even stored.

Reference semantics (NPLSTM, clstm.cc ≈L600-800, unverified): gates
(gi,gf,go) sigmoid, ci tanh, c' = gf*c + gi*ci, h' = tanh(c')*go — same
math as ops/lstm.py, equivalence (forward and gradients) asserted in
tests/test_pallas_lstm.py.

Precision: ``xz_bf16=True`` (production default) streams activations and
runs the MXU matmuls in bfloat16 with f32 accumulation and f32 gate math /
loop carries (~1e-3 relative effect, well under CTC-alignment noise;
round-1 CER runs used bf16 streams). ``xz_bf16=False`` is the strict-f32
verification mode the equivalence tests run.

Hidden size is padded to Hp (multiple of 128, the lane width); padded h/c
columns stay exactly zero through the recurrence (zero weight columns ->
ci = 0 -> c = gf*0 = 0). There is NO per-step length masking inside the
kernels — padding is a contiguous per-row suffix, so masking is only
needed on the layer output and the incoming cotangents, both applied
outside; per-step masking measured at ~80% of kernel runtime in round 1.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clstm_tpu.ops.seq import flip_within_length

HP = 128           # default padded per-direction hidden size (lane width)
MAX_B_TILE = 256   # batch rows per grid tile (B=512 runs 2 tiles, no VMEM
                   # chunk-halving — the round-1 B=512 regression)


def _hp_for(H: int) -> int:
    """Lane-aligned padded hidden size for a given nhidden."""
    return -(-H // 128) * 128


# ---------------------------------------------------------------------------
# Layout helpers (all plain XLA, outside the kernels)
# ---------------------------------------------------------------------------

def _pad_gates(W, H: int, in_dim: int, in_pad: int, hp: int = HP):
    """[in_dim, 4H] -> [in_pad, 4*hp] with each gate block padded to hp."""
    out = jnp.zeros((in_pad, 4 * hp), jnp.float32)
    for g in range(4):
        out = out.at[:in_dim, g * hp:g * hp + H].set(
            W[:, g * H:(g + 1) * H].astype(jnp.float32))
    return out


def _gm_weight(Wp, g: int, hp: int = HP):
    """[in, 4Hp] group-g padded weights -> [in, 8Hp] gate-major placement
    (zeros in the other group's lanes). Folding the gate-major permutation
    into the WEIGHTS keeps the big [B,T,*] activations in natural layout —
    permuting activations instead costs full passes over the sequence."""
    n = Wp.shape[0]
    out = jnp.zeros((n, 4, 2, hp), jnp.float32)
    out = out.at[:, :, g, :].set(Wp.reshape(n, 4, hp))
    return out.reshape(n, 8 * hp)


def _gm_cols(arr, g: int, H: int, axis: int = -1, hp: int = HP):
    """Slice group g's [*, 4H] reference-layout block out of a gate-major
    [*, 8Hp] array along ``axis``."""
    parts = []
    for k in range(4):
        lo = k * 2 * hp + g * hp
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(lo, lo + H)
        parts.append(arr[tuple(idx)])
    return jnp.concatenate(parts, axis=axis)


def _make_wbd(params_f: dict, params_r: dict, H: int, hp: int = HP):
    """Block-diagonal gate-major recurrent weights [2hp, 8hp]."""
    rows = []
    for g, p in ((0, params_f), (1, params_r)):
        Whp = _pad_gates(p["Wh"], H, H, hp, hp)       # [hp, 4hp]
        block = jnp.zeros((hp, 4, 2, hp), jnp.float32)
        block = block.at[:, :, g, :].set(Whp.reshape(hp, 4, hp))
        rows.append(block.reshape(hp, 8 * hp))
    return jnp.concatenate(rows, axis=0)              # [2hp, 8hp]


def _make_wcat(params_f: dict, params_r: dict, H: int, D: int, dp: int,
               hp: int = HP):
    """Input-projection weights for the packed [x | flip(x) | 1] stream:
    rows 0:D -> forward Wx (group 0), D:2D -> reverse Wx (group 1), row 2D
    -> both biases; rows beyond 2D+1 are zero padding to ``dp``."""
    Wf = _gm_weight(_pad_gates(params_f["Wx"], H, D, D, hp), 0, hp)
    Wr = _gm_weight(_pad_gates(params_r["Wx"], H, D, D, hp), 1, hp)
    bf = _gm_weight(_pad_gates(params_f["b"][None, :], H, 1, 1, hp), 0, hp)[0]
    br = _gm_weight(_pad_gates(params_r["b"][None, :], H, 1, 1, hp), 1, hp)[0]
    out = jnp.zeros((dp, 8 * hp), jnp.float32)
    out = out.at[:D].set(Wf).at[D:2 * D].set(Wr).at[2 * D].set(bf + br)
    return out


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _gates(z, c_prev, gh: int):
    gi = jax.nn.sigmoid(z[:, 0 * gh:1 * gh])
    gf = jax.nn.sigmoid(z[:, 1 * gh:2 * gh])
    go = jax.nn.sigmoid(z[:, 2 * gh:3 * gh])
    ci = jnp.tanh(z[:, 3 * gh:4 * gh])
    c_new = gf * c_prev + gi * ci
    return gi, gf, go, ci, c_new


def _fill_xz(xz_ref, xcat_ref, wcat, t_chunk, cd):
    """Per-chunk input projection on the MXU into TIME-LEADING scratch
    [tc, bt, 8hp], one sub-matmul per step so operand/result values stay
    small (a single [bt*tc, 8hp] f32 dot result blows the Mosaic
    scoped-stack limit at full tiles).

    Time-leading scratch is the load-bearing layout choice: the serial
    recurrence then indexes scratch on the LEADING dim (aligned full-tile
    2D vectors). Per-step indexing on the SUBLANE dim of the streamed
    (bt, tc, lanes) blocks costs a relayout inside the dependency chain —
    measured ~2x on the whole kernel (6.8ms vs 3.5ms at B=256, T=1024)."""
    for k in range(t_chunk):
        xz_ref[k] = jnp.dot(
            xcat_ref[:, k, :].astype(cd), wcat,
            preferred_element_type=jnp.float32).astype(xz_ref.dtype)


def _fwd_kernel(xcat_ref, wcat_ref, wbd_ref, hseq_ref, hprev_ref, cprev_ref,
                h_ref, c_ref, xz_ref, hn_s, hs_s, cs_s, *, t_chunk: int,
                gh: int, compute_bf16: bool):
    """Forward recurrence over one (b_tile, t_chunk) block.

    Emits h_seq (post-step, for the layer output) and hprev/cprev (pre-step
    carries, consumed by the backward kernel). NO per-step length masking —
    padding is a contiguous per-row SUFFIX (data/dataset bucketing
    invariant): phantom-frame state never feeds a valid frame forward, the
    caller masks the layer output, and the backward cotangents are exactly
    zero through phantom frames, so phantom values poison nothing. Phantom
    frames cannot produce NaN: x is zero-padded so z stays bounded (h in
    tanh range)."""
    tc_id = pl.program_id(1)
    cd = jnp.bfloat16 if compute_bf16 else jnp.float32

    @pl.when(tc_id == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    wbd = wbd_ref[...].astype(cd)
    _fill_xz(xz_ref, xcat_ref, wcat_ref[...].astype(cd), t_chunk, cd)

    # Statically unrolled over the chunk (Mosaic rejects DYNAMIC stores on
    # the sublane dim; static leading-dim scratch indexing is free). h/c
    # stay in registers; per-step results go to time-leading staging
    # scratch, bulk-transposed into the (bt, tc, lanes) output blocks once
    # per chunk (see _fill_xz for why).
    h, c = h_ref[...], c_ref[...]
    for r in range(t_chunk):
        hs_s[r] = h.astype(hs_s.dtype)
        cs_s[r] = c.astype(cs_s.dtype)
        z = xz_ref[r] + jnp.dot(
            h.astype(cd), wbd, preferred_element_type=jnp.float32)
        gi, gf, go, ci, c = _gates(z, c, gh)
        h = jnp.tanh(c) * go
        hn_s[r] = h.astype(hn_s.dtype)
    h_ref[...] = h
    c_ref[...] = c
    hseq_ref[...] = jnp.transpose(hn_s[...], (1, 0, 2))
    hprev_ref[...] = jnp.transpose(hs_s[...], (1, 0, 2))
    cprev_ref[...] = jnp.transpose(cs_s[...], (1, 0, 2))


def _bwd_kernel(xcat_ref, hprev_ref, cprev_ref, g_ref,
                wcat_ref, wbd_ref, wbdt_ref, wcatt_ref,
                dxcat_ref, dwcat_ref, dwh_ref,
                Dh_ref, Dc_ref, dz_ref, xz_ref, hp_s, cp_s, g_s, dxc_s,
                *, t_chunk: int, gh: int, compute_bf16: bool):
    """Reverse-grid backward step over one (b_tile, t_chunk) block.

    Recomputes gates and c_new from (xcat, hprev, cprev); carries Dh/Dc
    [bt, gh] in scratch; stages dz [bt, tc, 8hp] in scratch, then runs the
    amortized chunk contractions. dWcat/dWh accumulate across the WHOLE
    grid in VMEM-resident output blocks (constant index maps).

    NO per-step length masking (see _fwd_kernel): the caller zeroes the
    padded-frame cotangents g outside, and the carries initialize to zero,
    so through every phantom frame dh_new = g + Dh = 0, hence dz = 0,
    hence zero contribution to every gradient — the zeros propagate
    EXACTLY until the recurrence crosses into each row's valid region."""
    b_id, tc_id = pl.program_id(0), pl.program_id(1)
    cd = jnp.bfloat16 if compute_bf16 else jnp.float32

    @pl.when(tc_id == 0)
    def _init_carries():
        Dh_ref[...] = jnp.zeros_like(Dh_ref)
        Dc_ref[...] = jnp.zeros_like(Dc_ref)

    @pl.when((b_id == 0) & (tc_id == 0))
    def _init_accums():
        dwcat_ref[...] = jnp.zeros_like(dwcat_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)

    wbd = wbd_ref[...].astype(cd)
    wbdt = wbdt_ref[...].astype(cd)
    _fill_xz(xz_ref, xcat_ref, wcat_ref[...].astype(cd), t_chunk, cd)
    # Stage the streamed inputs time-leading (see _fill_xz): one bulk
    # transpose per chunk instead of a per-step in-chain relayout.
    hp_s[...] = jnp.transpose(hprev_ref[...], (1, 0, 2))
    cp_s[...] = jnp.transpose(cprev_ref[...], (1, 0, 2))
    g_s[...] = jnp.transpose(g_ref[...], (1, 0, 2))

    # Statically unrolled (see _fwd_kernel); Dh/Dc stay in registers.
    Dh, Dc = Dh_ref[...], Dc_ref[...]
    for r in range(t_chunk - 1, -1, -1):
        h_prev = hp_s[r].astype(jnp.float32)
        c_prev = cp_s[r].astype(jnp.float32)
        z = xz_ref[r] + jnp.dot(
            h_prev.astype(cd), wbd, preferred_element_type=jnp.float32)
        gi, gf, go, ci, c_new = _gates(z, c_prev, gh)
        tc_new = jnp.tanh(c_new)

        dh_new = g_s[r].astype(jnp.float32) + Dh
        dc_new = Dc + dh_new * go * (1.0 - tc_new * tc_new)
        dgo = dh_new * tc_new * go * (1.0 - go)
        dgf = dc_new * c_prev * gf * (1.0 - gf)
        dgi = dc_new * ci * gi * (1.0 - gi)
        dci = dc_new * gi * (1.0 - ci * ci)
        dz = jnp.concatenate([dgi, dgf, dgo, dci], axis=1)   # [bt, 8hp]

        Dh = jnp.dot(dz.astype(cd), wbdt,
                     preferred_element_type=jnp.float32)
        Dc = dc_new * gf
        dz_ref[r] = dz.astype(dz_ref.dtype)
    Dh_ref[...] = Dh
    Dc_ref[...] = Dc

    # Amortized chunk contractions on the MXU, one sub-matmul per step
    # (small stack values; see _fill_xz). dz never leaves VMEM.
    tdot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    wcatt = wcatt_ref[...].astype(cd)
    dwcat = dwcat_ref[...]
    dwh = dwh_ref[...]
    for k in range(t_chunk):
        dzk = dz_ref[k].astype(cd)
        dwcat += tdot(xcat_ref[:, k, :].astype(cd), dzk)
        dwh += tdot(hp_s[k].astype(cd), dzk)
        dxc_s[k] = jnp.dot(
            dzk, wcatt, preferred_element_type=jnp.float32).astype(
                dxc_s.dtype)
    dwcat_ref[...] = dwcat
    dwh_ref[...] = dwh
    dxcat_ref[...] = jnp.transpose(dxc_s[...], (1, 0, 2))


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

# VMEM budget for streamed blocks + scratch. v5e physical VMEM is 128MB;
# the XLA default SCOPED limit is 16MB but pallas raises it via
# CompilerParams(vmem_limit_bytes=_VMEM_LIMIT) below (verified empirically:
# 48MB of scratch executes fine on the chip). Leave headroom for weights,
# carries, accumulators and compiler temporaries.
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_BUDGET = 48 * 1024 * 1024


def _pick_tiles(B: int, T: int, trow_fn, target_tc: int) -> tuple[int, int]:
    """Choose (b_tile, t_chunk). Mosaic requires the second-minor block dim
    (t_chunk) to be a multiple of 8 or the full T, so VMEM pressure is
    relieved by shrinking b_tile (the MAJOR block dim, unconstrained), not
    the chunk. trow_fn(bt) gives streamed+scratch bytes per time-row."""
    if T % 8 == 0 and target_tc % 8 == 0 and T % target_tc == 0:
        tc = target_tc
    elif T % 8 == 0:
        tc = 8
    else:
        tc = T
    bt = min(B, MAX_B_TILE)
    while B % bt:
        bt -= 1
    while bt > 1 and trow_fn(bt) * tc > _VMEM_BUDGET:
        nb = bt - 1
        while B % nb:
            nb -= 1
        bt = nb
    return bt, tc


def _fwd_trow_bytes(bt: int, dp: int, hp: int, nb: int) -> int:
    gh = 2 * hp
    xcat = 2 * bt * dp * nb                 # double-buffered input block
    outs = 2 * 3 * bt * gh * nb             # h_seq/hprev/cprev blocks
    xz_scratch = bt * 4 * gh * 4            # f32 chunk projection
    staging = 3 * bt * gh * nb              # time-leading output staging
    return xcat + outs + xz_scratch + staging


def _bwd_trow_bytes(bt: int, dp: int, hp: int, nb: int) -> int:
    gh = 2 * hp
    ins = 2 * bt * (dp + 3 * gh) * nb       # xcat + hprev/cprev/g blocks
    dxcat = 2 * bt * dp * nb
    xz_scratch = bt * 4 * gh * 4
    dz_scratch = bt * 4 * gh * nb
    staging = (3 * bt * gh + bt * dp) * nb  # hp/cp/g + dxcat staging
    return ins + dxcat + xz_scratch + dz_scratch + staging


def _fixed_bytes(dp: int, hp: int, bt: int, nb: int) -> int:
    """Weights + carries + accumulators resident across the grid."""
    gh = 2 * hp
    weights = (dp + 2 * gh + dp) * 4 * gh * nb   # wcat, wbd+wbdt, wcatt
    carries = 2 * bt * gh * 4
    accums = (dp + gh) * 4 * gh * 4
    return weights + carries + accums


def _call_fwd(xcat, wcat, wbd, *, b_tile, t_chunk, interpret, compute_bf16,
              seq_dtype):
    B, T, dp = xcat.shape
    gh = wbd.shape[0]
    grid = (B // b_tile, T // t_chunk)
    stream = pl.BlockSpec((b_tile, t_chunk, gh), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_chunk=t_chunk, gh=gh,
                          compute_bf16=compute_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_tile, t_chunk, dp), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, 4 * gh), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, 4 * gh), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[stream, stream, stream],
        out_shape=[jax.ShapeDtypeStruct((B, T, gh), seq_dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((b_tile, gh), jnp.float32),
            pltpu.VMEM((b_tile, gh), jnp.float32),
            pltpu.VMEM((t_chunk, b_tile, 4 * gh), jnp.float32),
            pltpu.VMEM((t_chunk, b_tile, gh), seq_dtype),
            pltpu.VMEM((t_chunk, b_tile, gh), seq_dtype),
            pltpu.VMEM((t_chunk, b_tile, gh), seq_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xcat, wcat, wbd)


def _call_bwd(xcat, hprev, cprev, gseq, wcat, wbd, *, b_tile, t_chunk,
              interpret, compute_bf16, dx_dtype):
    B, T, dp = xcat.shape
    gh = wbd.shape[0]
    nT = T // t_chunk
    grid = (B // b_tile, nT)
    rev = lambda b, t: (b, nT - 1 - t, 0)
    stream = pl.BlockSpec((b_tile, t_chunk, gh), rev, memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda b, t: (0, 0),
                                        memory_space=pltpu.VMEM)
    wdt = jnp.bfloat16 if compute_bf16 else jnp.float32
    dz_dt = jnp.bfloat16 if compute_bf16 else jnp.float32
    return pl.pallas_call(
        functools.partial(_bwd_kernel, t_chunk=t_chunk, gh=gh,
                          compute_bf16=compute_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_tile, t_chunk, dp), rev, memory_space=pltpu.VMEM),
            stream, stream, stream,
            const2((dp, 4 * gh)),
            const2((gh, 4 * gh)),
            const2((4 * gh, gh)),
            const2((4 * gh, dp)),
        ],
        out_specs=[
            pl.BlockSpec((b_tile, t_chunk, dp), rev, memory_space=pltpu.VMEM),
            const2((dp, 4 * gh)),
            const2((gh, 4 * gh)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, dp), dx_dtype),
            jax.ShapeDtypeStruct((dp, 4 * gh), jnp.float32),
            jax.ShapeDtypeStruct((gh, 4 * gh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_tile, gh), jnp.float32),
            pltpu.VMEM((b_tile, gh), jnp.float32),
            pltpu.VMEM((t_chunk, b_tile, 4 * gh), dz_dt),
            pltpu.VMEM((t_chunk, b_tile, 4 * gh), jnp.float32),
            pltpu.VMEM((t_chunk, b_tile, gh), dz_dt),
            pltpu.VMEM((t_chunk, b_tile, gh), dz_dt),
            pltpu.VMEM((t_chunk, b_tile, gh), dz_dt),
            pltpu.VMEM((t_chunk, b_tile, dp), dx_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xcat, hprev, cprev, gseq,
      wcat.astype(wdt), wbd.astype(wdt),
      jnp.swapaxes(wbd, 0, 1).astype(wdt),
      jnp.swapaxes(wcat, 0, 1).astype(wdt))


def _prep(params_f, params_r, x, lengths, bf16: bool):
    """Pack the [x | flip(x) | 1] stream and the gate-major weights."""
    B, T, D = x.shape
    H = params_f["Wh"].shape[0]
    hp = _hp_for(H)
    dp = -(-(2 * D + 1) // 128) * 128
    xr = flip_within_length(x, lengths)
    ones = jnp.ones((B, T, 1), x.dtype)
    pad = jnp.zeros((B, T, dp - 2 * D - 1), x.dtype)
    xcat = jnp.concatenate([x, xr, ones, pad], axis=-1)
    xcat = xcat.astype(jnp.bfloat16 if bf16 else jnp.float32)
    wcat = _make_wcat(params_f, params_r, H, D, dp, hp)
    wbd = _make_wbd(params_f, params_r, H, hp)
    lens = jnp.full((B,), T, jnp.int32) if lengths is None else lengths
    return xcat, wcat, wbd, lens, H, hp, dp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def bidi_lstm_pallas(params_f: dict, params_r: dict, x: jax.Array,
                     lengths: Optional[jax.Array], t_chunk: int = 8,
                     interpret: bool = False, xz_bf16: bool = True) -> jax.Array:
    """Fused bidi LSTM via Pallas; same contract as ops.lstm.bidi_lstm_apply:
    x [B,T,D] -> [B,T,2H] (forward then backward features, padding zero).

    xz_bf16=True (production default) streams activations and runs the MXU
    matmuls in bfloat16 with f32 accumulation (~1e-3 relative effect on
    activations, well under CTC-alignment noise). False = strict-f32
    verification mode."""
    y, _ = _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
                     xz_bf16)
    return y


def _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret, xz_bf16=True):
    B, T, D = x.shape
    xcat, wcat, wbd, lens, H, hp, dp = _prep(params_f, params_r, x, lengths,
                                             xz_bf16)
    nb = 2 if xz_bf16 else 4
    wdt = jnp.bfloat16 if xz_bf16 else jnp.float32
    bt, tc = _pick_tiles(B, T, lambda b: _fwd_trow_bytes(b, dp, hp, nb),
                         t_chunk)
    h_seq, hprev, cprev = _call_fwd(
        xcat, wcat.astype(wdt), wbd.astype(wdt), b_tile=bt, t_chunk=tc,
        interpret=interpret, compute_bf16=xz_bf16,
        seq_dtype=jnp.bfloat16 if xz_bf16 else jnp.float32)
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
    hm = h_seq.astype(jnp.float32) * mask[:, :, None]
    y = jnp.concatenate(
        [hm[..., :H], flip_within_length(hm[..., hp:hp + H], lengths)],
        axis=-1).astype(x.dtype)
    res = (params_f, params_r, x, lengths, xcat, wcat, wbd, hprev, cprev,
           H, hp, dp)
    return y, res


def _vjp_fwd(params_f, params_r, x, lengths, t_chunk, interpret, xz_bf16):
    return _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
                     xz_bf16)


def _vjp_bwd(t_chunk, interpret, xz_bf16, res, gy):
    (params_f, params_r, x, lengths, xcat, wcat, wbd, hprev, cprev,
     H, hp, dp) = res
    gh = 2 * hp
    B, T, D = x.shape
    gy = gy.astype(jnp.float32)
    lens = jnp.full((B,), T, jnp.int32) if lengths is None else lengths
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
    # Cotangents of the stored carries in the combined [B,T,2Hp] layout;
    # zero on padded frames so the kernel's no-masking invariant holds.
    gdt = jnp.bfloat16 if xz_bf16 else jnp.float32
    gseq = jnp.zeros((B, T, gh), jnp.float32)
    gseq = gseq.at[..., :H].set(gy[..., :H])
    gseq = gseq.at[..., hp:hp + H].set(
        flip_within_length(gy[..., H:], lengths))
    gseq = (gseq * mask[:, :, None]).astype(gdt)

    nb = 2 if xz_bf16 else 4
    bt, tc = _pick_tiles(B, T, lambda b: _bwd_trow_bytes(b, dp, hp, nb),
                         t_chunk)
    dxcat, dwcat, dwh = _call_bwd(
        xcat, hprev, cprev, gseq, wcat, wbd, b_tile=bt, t_chunk=tc,
        interpret=interpret, compute_bf16=xz_bf16, dx_dtype=gdt)

    # Gate-major -> reference-layout extraction on the small weight grads.
    grads = []
    for g, p, lo in ((0, params_f, 0), (1, params_r, D)):
        dWx = _gm_cols(dwcat[lo:lo + D], g, H, hp=hp)
        dWh = _gm_cols(dwh[g * hp:g * hp + H], g, H, hp=hp)
        db = _gm_cols(dwcat[2 * D], g, H, hp=hp)
        grads.append({"Wx": dWx.astype(p["Wx"].dtype),
                      "Wh": dWh.astype(p["Wh"].dtype),
                      "b": db.astype(p["b"].dtype)})

    dx = (dxcat[..., :D].astype(jnp.float32)
          + flip_within_length(dxcat[..., D:2 * D].astype(jnp.float32),
                               lengths)).astype(x.dtype)
    return grads[0], grads[1], dx, None


bidi_lstm_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def fits_pallas(B: int, T: int, t_chunk: int = 8, H: int = 100) -> bool:
    """Conservative check that the kernel's VMEM footprint is safe and the
    shapes tile cleanly (B a multiple of 8 for sublane alignment; any such
    B works — batches tile over the grid)."""
    hp = _hp_for(H)
    dp = 128  # minimum; larger D only grows streamed blocks linearly
    bt, tc = _pick_tiles(B, T, lambda b: _bwd_trow_bytes(b, dp, hp, 2),
                         t_chunk)
    fixed = _fixed_bytes(dp, hp, bt, 2)
    return (B % 8 == 0 and fixed < 8 * 1024 * 1024
            and _bwd_trow_bytes(bt, dp, hp, 2) * tc <= _VMEM_BUDGET)
