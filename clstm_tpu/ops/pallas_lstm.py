"""Pallas TPU kernels for the fused bidirectional LSTM cell.

The lax.scan bidi cell (ops/lstm.py bidi_lstm_apply) pays per-iteration
dispatch and MXU issue latency on every one of T steps whose work is tiny;
these kernels run the entire recurrence on-core with the state in VMEM.
Three rounds of profiling shaped the design (benchmarks/profile_step.py):

* **Batch-major [B, T, lanes] everywhere.** Pallas blocks are
  (b_tile, t_chunk, lanes) on a (B tiles, T chunks) grid; B > MAX_B_TILE
  tiles over the grid instead of halving VMEM chunks.
* **No gathers anywhere.** The reverse direction does NOT consume
  flip-within-length gathers. Instead the kernels receive the SAME input
  array twice — once through a forward block index map and once through a
  time-reversed one — and reset the reverse-direction state at each row's
  valid-region boundary with a per-step mask. Globally-reversed chain
  order + boundary reset is EXACTLY flip-within-length semantics
  (reference ``Reversed``, clstm.cc ≈L800-1000): the reverse recurrence
  starts from zero state at t = len-1 and walks to t = 0; outputs for
  t >= len are exact zeros. Outputs use the same trick in reverse: the
  forward kernel writes the reverse-direction half through a time-reversed
  OUTPUT block map, so y leaves the kernel already in original time order
  and the old flip/mask epilogue pass is gone.
* **The input projection lives INSIDE the kernels** from a packed
  ``xcat = [x | 1]`` stream; the round-1 xz [B, T, 8Hp] HBM tensor
  (512MB written + read twice at the bench shape) is gone.
* **One matmul per step on the serial chain**: both directions' recurrent
  matmuls fuse into one block-diagonal gate-major product — combined
  state ``hcat [B, 2Hp]`` times ``Wbd [2Hp, 8Hp]`` with column blocks
  ``[gi | gf | go | ci]``, forward direction in the first Hp lanes of
  each block, reverse in the second.
* **The forward kernel emits (yf, yr, hprev, cprev)** — the layer output
  as two per-direction halves already in original time order (see above),
  plus the pre-step state streams the backward pass needs (its loop
  carries, free to store).
* **The backward kernel accumulates dWf/dWr/dWh in VMEM-resident output
  blocks and emits dx directly; dz never touches HBM.** c_seq is not even
  stored — c_new is recomputed from (hprev, cprev, xcat).
* **In-kernel per-step state lives in TIME-LEADING scratch**, bulk
  transposed to/from the streamed blocks once per chunk. Per-step indexing
  on the sublane dim of a (b, t, lanes) block costs an in-chain relayout —
  measured 2x on the whole kernel (6.8ms vs 3.5ms at B=256, T=1024).

Reference semantics (NPLSTM, clstm.cc ≈L600-800, unverified): gates
(gi,gf,go) sigmoid, ci tanh, c' = gf*c + gi*ci, h' = tanh(c')*go — same
math as ops/lstm.py, equivalence (forward and gradients) asserted in
tests/test_pallas_lstm.py and re-measured against the scan path on chip.

Precision: ``xz_bf16=True`` (production default) streams activations and
runs the MXU matmuls in bfloat16 with f32 accumulation and f32 gate math /
loop carries (~1e-4 absolute effect on activations, well under
CTC-alignment noise). ``xz_bf16=False`` is the strict-f32 verification
mode the equivalence tests run.

Hidden size is padded to Hp (multiple of 128, the lane width); padded h/c
columns stay exactly zero through the recurrence (zero weight columns ->
ci = 0 -> c = gf*0 = 0). Forward-direction phantom frames (t >= len) are
garbage-but-bounded and masked at the layer output; backward-direction
phantom frames are exact zeros by the boundary-reset mask; cotangents are
zeroed outside, so phantom frames contribute nothing to any gradient.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _make_wdir(params: dict, g: int, H: int, D: int, hp: int = HP,
               with_bias_of=None):
    """Per-direction input projection [D+1, 8hp] for the ``[x | 1]``
    stream: rows 0:D = Wx in group-g lanes, row D = bias. The COMBINED
    bias of both directions goes into the forward matrix (``with_bias_of``
    supplies the other direction's params); the reverse matrix carries a
    zero bias row so the two per-chunk projections can simply add."""
    W = _gm_weight(_pad_gates(params["Wx"], H, D, D, hp), g, hp)
    out = jnp.zeros((D + 1, 8 * hp), jnp.float32)
    out = out.at[:D].set(W)
    if with_bias_of is not None:
        b0 = _gm_weight(_pad_gates(params["b"][None, :], H, 1, 1, hp), g, hp)[0]
        b1 = _gm_weight(
            _pad_gates(with_bias_of["b"][None, :], H, 1, 1, hp), 1 - g, hp)[0]
        out = out.at[D].set(b0 + b1)
    return out


def _make_wxt(params_f: dict, params_r: dict, H: int, D: int, hp: int = HP):
    """Per-direction dx projections ([8hp, D], [8hp, D]). Kept as two
    matrices (not one [8hp, 2D] concat) so the kernel can stage each
    direction's dx into its own output stream — the reverse one through a
    time-reversed output block map — without unaligned lane slicing."""
    Wf = _gm_weight(_pad_gates(params_f["Wx"], H, D, D, hp), 0, hp)
    Wr = _gm_weight(_pad_gates(params_r["Wx"], H, D, D, hp), 1, hp)
    return Wf.T, Wr.T


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _gates(z, c_prev, gh: int):
    if z.dtype == jnp.bfloat16:
        # Mosaic cannot lower `logistic` on bf16 vectors (its internal
        # f32 constant broadcast trips 'vector.broadcast' verification);
        # the tanh form is mathematically identical and weak-typed
        # constants stay bf16.
        def sig(v):
            return 0.5 * (jnp.tanh(v * 0.5) + 1.0)
    else:
        sig = jax.nn.sigmoid
    gi = sig(z[:, 0 * gh:1 * gh])
    gf = sig(z[:, 1 * gh:2 * gh])
    go = sig(z[:, 2 * gh:3 * gh])
    ci = jnp.tanh(z[:, 3 * gh:4 * gh])
    c_new = gf * c_prev + gi * ci
    return gi, gf, go, ci, c_new


def _fill_xz(xz_ref, xf_ref, xr_ref, wf, wr, t_chunk, cd):
    """Per-chunk input projection into TIME-LEADING scratch [tc, bt, 8hp]:
    xz[r] = x_fwd[r] @ Wf + x_rev[r] @ Wr (bias folded into Wf's ones
    row). One sub-matmul pair per step keeps operand/result values small —
    a single [bt*tc, 8hp] f32 dot result blows the Mosaic scoped stack.
    xr_ref arrives through a time-reversed block index map; in-block rows
    reverse here, so chain step r sees original time T-1-s."""
    for k in range(t_chunk):
        xz_ref[k] = (
            jnp.dot(xf_ref[:, k, :].astype(cd), wf,
                    preferred_element_type=jnp.float32)
            + jnp.dot(xr_ref[:, t_chunk - 1 - k, :].astype(cd), wr,
                      preferred_element_type=jnp.float32)
        ).astype(xz_ref.dtype)


def _fill_xz_hoisted(xz_ref, xzf_ref, xzr_ref, xzf_s, xzr_s, t_chunk, hp):
    """Stage HOISTED per-direction projection streams (compact [bt, tc,
    4hp], computed by one big XLA matmul — see _proj_stream) into the
    gate-major [tc, bt, 8hp] scratch. Used when the input dim is large
    (dc > hp): at D=400/H=200 the in-kernel per-step projection costs
    ~7ms per kernel pass while the hoisted big matmul runs near MXU peak.

    Streams are first bulk-transposed into TIME-LEADING scratch: indexing
    the streamed block's sublane (time) dim gives vectors with non-zero
    sublane offsets, and Mosaic's concatenate requires matching offsets on
    non-concat dims ("result/input offset mismatch" — hit on hardware).
    After staging, the per-step interleave is 8 lane-aligned hp-wide
    slices (vreg selects, no shuffles); xzr arrives through the
    time-reversed block map, in-block rows reverse here — identical view
    mechanics to _fill_xz."""
    xzf_s[...] = jnp.transpose(xzf_ref[...], (1, 0, 2))
    xzr_s[...] = jnp.transpose(xzr_ref[...], (1, 0, 2))
    for k in range(t_chunk):
        f = xzf_s[k]
        r = xzr_s[t_chunk - 1 - k]
        xz_ref[k] = jnp.concatenate(
            [jnp.concatenate([f[:, g * hp:(g + 1) * hp],
                              r[:, g * hp:(g + 1) * hp]], axis=1)
             for g in range(4)], axis=1).astype(xz_ref.dtype)


def _rev_mask(len_gh, lane_ge_hp, s_f, T):
    """[bt, gh] per-step mask: 1 on forward lanes; on reverse lanes 1 iff
    chain step s has entered the row's valid region (s >= T - len, i.e.
    original time T-1-s < len). Multiplying h/c by it each step zeroes the
    reverse state through the phantom prefix and restarts it from exactly
    zero at t = len-1 — flip-within-length semantics without the gather."""
    active = (len_gh > (T - 1.0 - s_f)).astype(jnp.float32)
    return jnp.maximum(active, 1.0 - lane_ge_hp)


def _full_mask(len_gh, lane_ge_hp, s_f, T):
    """[bt, gh] per-step frame-validity mask for BOTH directions: forward
    lanes active iff original time s < len, reverse lanes per _rev_mask.
    Used by the backward kernel so raw (unmasked) output cotangents can be
    streamed in: (g + Dh) * full_mask zeroes phantom-frame contributions
    in-kernel, replacing the former XLA-side gy mask multiply."""
    act_f = (len_gh > s_f).astype(jnp.float32)
    act_r = (len_gh > (T - 1.0 - s_f)).astype(jnp.float32)
    return act_f * (1.0 - lane_ge_hp) + act_r * lane_ge_hp


def _fwd_kernel(*refs, t_chunk: int, gh: int, T: int, compute_bf16: bool,
                proj_in: bool = False):
    """Forward recurrence over one (b_tile, t_chunk) block.

    Emits the layer output directly in ORIGINAL time order as two
    per-direction streams — yf (forward lanes, frame-validity masked
    in-kernel) through a plain output block map and yr (reverse lanes)
    through a time-REVERSED output block map with in-block row reversal —
    plus hprev/cprev (pre-step carries, consumed by the backward kernel).
    The former [B,T,2hp] mask+flip+concat XLA epilogue reduces to a
    slice+concat of the two halves (round-2 lever: the epilogue was a full
    HBM pass over the sequence per layer). Forward STATE carries no
    per-step length masking — padding is a contiguous per-row SUFFIX
    (data/dataset bucketing invariant) so phantom forward state never
    feeds a valid frame; only the yf WRITE is masked. Reverse lanes are
    masked by _rev_mask (their boundary reset IS the flip semantics), so
    yr's phantom prefix is exact zeros already.

    proj_in=True: the input projection was hoisted to one big XLA matmul
    (large-D layers, see _fill_xz_hoisted) — the first two refs are the
    compact per-direction xz streams and there are no wf/wr operands."""
    if proj_in:
        (xf_ref, xr_ref, len_ref, wbd_ref,
         yf_ref, yr_ref, hprev_ref, cprev_ref,
         h_ref, c_ref, xz_ref, yf_s, yr_s, hs_s, cs_s, xzf_s, xzr_s) = refs
    else:
        (xf_ref, xr_ref, len_ref, wf_ref, wr_ref, wbd_ref,
         yf_ref, yr_ref, hprev_ref, cprev_ref,
         h_ref, c_ref, xz_ref, yf_s, yr_s, hs_s, cs_s) = refs
    tc_id = pl.program_id(1)
    cd = jnp.bfloat16 if compute_bf16 else jnp.float32

    @pl.when(tc_id == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    wbd = wbd_ref[...].astype(cd)
    if proj_in:
        _fill_xz_hoisted(xz_ref, xf_ref, xr_ref, xzf_s, xzr_s, t_chunk,
                         gh // 2)
    else:
        _fill_xz(xz_ref, xf_ref, xr_ref, wf_ref[...].astype(cd),
                 wr_ref[...].astype(cd), t_chunk, cd)
    hp = gh // 2
    len_gh = jnp.concatenate([len_ref[...]] * (gh // 128), axis=1)
    lane_ge_hp = (jax.lax.broadcasted_iota(
        jnp.int32, len_gh.shape, 1) >= hp).astype(jnp.float32)

    # Statically unrolled over the chunk (Mosaic rejects DYNAMIC stores on
    # the sublane dim; time-leading scratch keeps per-step indexing on the
    # leading dim — see module docstring). h/c stay in registers.
    len_hp = len_gh[:, :hp]
    h, c = h_ref[...], c_ref[...]
    for r in range(t_chunk):
        hs_s[r] = h.astype(hs_s.dtype)
        cs_s[r] = c.astype(cs_s.dtype)
        s_f = (tc_id * t_chunk + r).astype(jnp.float32)
        m = _rev_mask(len_gh, lane_ge_hp, s_f, float(T))
        z = xz_ref[r] + jnp.dot(
            h.astype(cd), wbd, preferred_element_type=jnp.float32)
        gi, gf, go, ci, c_new = _gates(z, c, gh)
        c = c_new * m
        h = jnp.tanh(c_new) * go * m
        # yf: mask phantom forward frames at the WRITE (s_f is original
        # time for forward lanes). yr: chain step s_f is original time
        # T-1-s_f; in-block row reversal + the reversed output block map
        # land it at its original-time position.
        yf_s[r] = (h[:, :hp] * (len_hp > s_f).astype(jnp.float32)
                   ).astype(yf_s.dtype)
        yr_s[t_chunk - 1 - r] = h[:, hp:].astype(yr_s.dtype)
    h_ref[...] = h
    c_ref[...] = c
    yf_ref[...] = jnp.transpose(yf_s[...], (1, 0, 2))
    yr_ref[...] = jnp.transpose(yr_s[...], (1, 0, 2))
    hprev_ref[...] = jnp.transpose(hs_s[...], (1, 0, 2))
    cprev_ref[...] = jnp.transpose(cs_s[...], (1, 0, 2))


def _bwd_kernel(*refs, t_chunk: int, gh: int, T: int, compute_bf16: bool,
                proj_in: bool = False, need_dx: bool = True):
    """Reverse-grid backward step over one (b_tile, t_chunk) block.

    Recomputes gates and c_new from (xcat views, hprev, cprev); carries
    Dh/Dc [bt, gh] in registers across the unroll (scratch across chunks);
    stages dz time-leading, then runs the amortized chunk contractions.
    dWf/dWr/dWh accumulate across the WHOLE grid in VMEM-resident output
    blocks (constant index maps). The _rev_mask multiply is the exact VJP
    of the forward boundary reset; through every phantom frame dz = 0, so
    phantom frames contribute nothing to any gradient.

    proj_in=True: xz comes from hoisted streams (refs 3-4); the xcat views
    are still streamed for the dWf/dWr contractions, and wf/wr drop out.
    need_dx=False (the network's INPUT layer — its dx cotangent has no
    consumer) drops the wxf/wxr operands, the dx output streams and their
    staging scratch, and skips the dz@wx matmuls entirely.

    The output cotangent arrives as two RAW per-direction streams gf/gr
    (no XLA-side masking or flipping): gf in original==chain order, gr in
    original time through the composed-forward block map, rows reversed
    here to chain order. _full_mask zeroes phantom-frame contributions for
    both directions in-kernel. dx leaves the same way: dxf through the
    (grid-composed) original-time map, dxr staged row-reversed through the
    mirrored map, so the caller just adds the halves — no flip pass."""
    refs = list(refs)
    if proj_in:
        (xf_ref, xr_ref, xzf_ref, xzr_ref, len_ref,
         hprev_ref, cprev_ref, gf_ref, gr_ref, wbd_ref, wbdt_ref) = refs[:11]
        refs = refs[11:]
        wf_ref = wr_ref = None
    else:
        (xf_ref, xr_ref, len_ref, hprev_ref, cprev_ref, gf_ref, gr_ref,
         wf_ref, wr_ref, wbd_ref, wbdt_ref) = refs[:11]
        refs = refs[11:]
    if need_dx:
        wxf_ref, wxr_ref, dxf_ref, dxr_ref = refs[:4]
        refs = refs[4:]
    (dwf_ref, dwr_ref, dwh_ref,
     Dh_ref, Dc_ref, dz_ref, xz_ref, hp_s, cp_s, gf_s, gr_s) = refs[:11]
    refs = refs[11:]
    if need_dx:
        dxf_s, dxr_s = refs[:2]
        refs = refs[2:]
    if proj_in:
        xzf_s, xzr_s = refs
    b_id, tc_id = pl.program_id(0), pl.program_id(1)
    nT = pl.num_programs(1)
    cd = jnp.bfloat16 if compute_bf16 else jnp.float32

    @pl.when(tc_id == 0)
    def _init_carries():
        Dh_ref[...] = jnp.zeros_like(Dh_ref)
        Dc_ref[...] = jnp.zeros_like(Dc_ref)

    @pl.when((b_id == 0) & (tc_id == 0))
    def _init_accums():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dwr_ref[...] = jnp.zeros_like(dwr_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)

    wbd = wbd_ref[...].astype(cd)
    wbdt = wbdt_ref[...].astype(cd)
    if proj_in:
        _fill_xz_hoisted(xz_ref, xzf_ref, xzr_ref, xzf_s, xzr_s, t_chunk,
                         gh // 2)
    else:
        _fill_xz(xz_ref, xf_ref, xr_ref, wf_ref[...].astype(cd),
                 wr_ref[...].astype(cd), t_chunk, cd)
    # Stage streamed inputs time-leading: one bulk transpose per chunk
    # instead of a per-step in-chain relayout.
    hp_s[...] = jnp.transpose(hprev_ref[...], (1, 0, 2))
    cp_s[...] = jnp.transpose(cprev_ref[...], (1, 0, 2))
    gf_s[...] = jnp.transpose(gf_ref[...], (1, 0, 2))
    gr_s[...] = jnp.transpose(gr_ref[...], (1, 0, 2))
    hp = gh // 2
    len_gh = jnp.concatenate([len_ref[...]] * (gh // 128), axis=1)
    lane_ge_hp = (jax.lax.broadcasted_iota(
        jnp.int32, len_gh.shape, 1) >= hp).astype(jnp.float32)
    chunk0 = (nT - 1 - tc_id) * t_chunk   # first chain step of this block

    # NOTE (round-2 measurement): running this VJP elementwise chain in
    # bf16 gave NO speedup on v5e (91.0ms vs 89.2ms bidi2 step) — the VPU
    # runs bf16 elementwise at f32 rate here — while adding ~1e-2 gradient
    # noise, so the chain stays f32.
    Dh, Dc = Dh_ref[...], Dc_ref[...]
    for r in range(t_chunk - 1, -1, -1):
        h_prev = hp_s[r].astype(jnp.float32)
        c_prev = cp_s[r].astype(jnp.float32)
        s_f = (chunk0 + r).astype(jnp.float32)
        m = _full_mask(len_gh, lane_ge_hp, s_f, float(T))
        z = xz_ref[r] + jnp.dot(
            h_prev.astype(cd), wbd, preferred_element_type=jnp.float32)
        gi, gf, go, ci, c_new = _gates(z, c_prev, gh)
        tc_new = jnp.tanh(c_new)

        g_r = jnp.concatenate(
            [gf_s[r], gr_s[t_chunk - 1 - r]], axis=1).astype(jnp.float32)
        dh_new = (g_r + Dh) * m
        dc_new = Dc * m + dh_new * go * (1.0 - tc_new * tc_new)
        dgo = dh_new * tc_new * go * (1.0 - go)
        dgf = dc_new * c_prev * gf * (1.0 - gf)
        dgi = dc_new * ci * gi * (1.0 - gi)
        dci = dc_new * gi * (1.0 - ci * ci)
        dz = jnp.concatenate([dgi, dgf, dgo, dci], axis=1)   # [bt, 8hp]

        Dh = jnp.dot(dz.astype(cd), wbdt, preferred_element_type=jnp.float32)
        Dc = dc_new * gf
        dz_ref[r] = dz.astype(dz_ref.dtype)
    Dh_ref[...] = Dh
    Dc_ref[...] = Dc

    # Amortized chunk contractions on the MXU, one sub-matmul set per step
    # (small stack values; see _fill_xz). dz never leaves VMEM.
    tdot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    wxf = wxf_ref[...].astype(cd) if need_dx else None
    wxr = wxr_ref[...].astype(cd) if need_dx else None
    dwf, dwr, dwh = dwf_ref[...], dwr_ref[...], dwh_ref[...]
    for k in range(t_chunk):
        dzk = dz_ref[k].astype(cd)
        dwf += tdot(xf_ref[:, k, :].astype(cd), dzk)
        dwr += tdot(xr_ref[:, t_chunk - 1 - k, :].astype(cd), dzk)
        dwh += tdot(hp_s[k].astype(cd), dzk)
        if need_dx:
            # dxf at chain row k == original row k of this (rev-mapped)
            # block; dxr rows reverse into the mirrored (fwd-mapped) block.
            dxf_s[k] = jnp.dot(dzk, wxf,
                               preferred_element_type=jnp.float32
                               ).astype(dxf_s.dtype)
            dxr_s[t_chunk - 1 - k] = jnp.dot(
                dzk, wxr, preferred_element_type=jnp.float32
            ).astype(dxr_s.dtype)
    dwf_ref[...] = dwf
    dwr_ref[...] = dwr
    dwh_ref[...] = dwh
    if need_dx:
        dxf_ref[...] = jnp.transpose(dxf_s[...], (1, 0, 2))
        dxr_ref[...] = jnp.transpose(dxr_s[...], (1, 0, 2))


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

# VMEM budget for streamed blocks + scratch. v5e physical VMEM is far above
# the 16MB default SCOPED limit (verified empirically: 48MB of scratch
# executes fine); pallas raises the cap via
# CompilerParams(vmem_limit_bytes=_vmem_limit()). Leave headroom for
# weights, carries, accumulators and compiler temporaries. The raised cap
# is gated on the device GENERATION: v4/v5/v6 chips carry >=64MB physical
# VMEM; on an unrecognized (older/smaller) TPU we keep the conservative
# 16MB scoped window so kernels that don't fit degrade to the scan path
# through fits_pallas instead of failing Mosaic compilation.
_KNOWN_BIG_VMEM = ("v4", "v5", "v6", "v7")


@functools.lru_cache(maxsize=None)
def _vmem_limits() -> tuple:
    """(scoped vmem_limit_bytes, streaming budget) for the current backend.
    Non-TPU backends (CPU interpret-mode tests) use the v5e values so tile
    selection matches production."""
    try:
        dev = jax.devices()[0]
        if dev.platform == "tpu":
            kind = dev.device_kind.lower().replace(" ", "")
            if not any(g in kind for g in _KNOWN_BIG_VMEM):
                return 16 * 1024 * 1024, 8 * 1024 * 1024
    except Exception:
        pass
    return 96 * 1024 * 1024, 48 * 1024 * 1024


def _vmem_limit() -> int:
    return _vmem_limits()[0]


def _vmem_budget() -> int:
    return _vmem_limits()[1]


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
    while bt > 1 and trow_fn(bt) * tc > _vmem_budget():
        nb = bt - 1
        while B % nb:
            nb -= 1
        bt = nb
    return bt, tc


def _fwd_trow_bytes(bt: int, dc: int, hp: int, nb: int,
                    hoisted: bool = False) -> int:
    gh = 2 * hp
    sdim = 4 * hp if hoisted else dc        # hoisted xz streams vs xcat
    xcat = 2 * 2 * bt * sdim * nb           # two double-buffered views
    outs = 2 * 3 * bt * gh * nb             # h_seq/hprev/cprev blocks
    xz_scratch = bt * 4 * gh * 4            # f32 chunk projection
    staging = 3 * bt * gh * nb              # time-leading output staging
    if hoisted:
        staging += 2 * bt * 4 * hp * nb     # stream time-leading staging
    return xcat + outs + xz_scratch + staging


def _bwd_trow_bytes(bt: int, dc: int, hp: int, nb: int,
                    hoisted: bool = False) -> int:
    gh = 2 * hp
    ins = 2 * bt * (2 * dc + 3 * gh) * nb   # x views + hprev/cprev/g
    if hoisted:
        ins += 2 * 2 * bt * 4 * hp * nb     # + the two xz streams
        ins += 2 * bt * 4 * hp * nb         # + their time-leading staging
    dx = 2 * 2 * bt * dc * nb               # dx block + staging
    xz_scratch = bt * 4 * gh * 4
    dz_scratch = bt * 4 * gh * nb
    staging = 3 * bt * gh * nb              # hprev/cprev/g staging
    return ins + dx + xz_scratch + dz_scratch + staging


def _proj_stream(xcat, params, H, hp, cd):
    """One direction's hoisted compact input projection [B, T, 4hp]: a
    single fully-parallel MXU matmul over the whole sequence (bias folded
    through xcat's ones column). Used when dc > hp — at D=400/H=200 the
    per-step in-kernel projection costs ~7ms per kernel pass while this
    runs near MXU peak (~2ms) plus stream traffic."""
    D = xcat.shape[-1] - 1
    W = _pad_gates(params["Wx"], H, D, D, hp)            # [D, 4hp]
    b = _pad_gates(params["b"][None, :], H, 1, 1, hp)    # [1, 4hp]
    wfull = jnp.concatenate([W, b], axis=0)              # [dc, 4hp]
    out = jax.lax.dot_general(
        xcat.astype(cd), wfull.astype(cd),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.astype(cd)


def _fixed_bytes(dc: int, hp: int, bt: int, nb: int,
                 hoisted: bool = False) -> int:
    """Weights + carries + accumulators resident across the grid. When the
    input projection is hoisted (dc > hp) the [dc, 4gh] wf/wr blocks drop
    out of the kernel (replaced by the compact proj streams, which are
    per-row streamed and counted in _bwd_trow_bytes)."""
    gh = 2 * hp
    win = 0 if hoisted else 2 * dc
    weights = (win + 2 * gh) * 4 * gh * nb + 4 * gh * 2 * dc * nb
    carries = 2 * bt * gh * 4
    accums = (2 * dc + gh) * 4 * gh * 4
    return weights + carries + accums


def _len_bc(lengths, B, T):
    lens = (jnp.full((B,), T, jnp.float32) if lengths is None
            else lengths.astype(jnp.float32))
    return jnp.broadcast_to(lens[:, None], (B, 128))


def _call_fwd(xcat, len_bc, wf, wr, wbd, *, b_tile, t_chunk, interpret,
              compute_bf16, seq_dtype, proj=None):
    """proj=(xzf, xzr) switches to the hoisted-projection variant: the two
    compact [B, T, 4hp] streams replace the xcat views and wf/wr."""
    B, T, dc = xcat.shape
    gh = wbd.shape[0]
    nT = T // t_chunk
    grid = (B // b_tile, nT)
    sdim = 4 * (gh // 2) if proj is not None else dc
    xspec_f = pl.BlockSpec((b_tile, t_chunk, sdim), lambda b, t: (b, t, 0),
                           memory_space=pltpu.VMEM)
    xspec_r = pl.BlockSpec((b_tile, t_chunk, sdim),
                           lambda b, t: (b, nT - 1 - t, 0),
                           memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((b_tile, t_chunk, gh), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    hp = gh // 2
    y_fwd = pl.BlockSpec((b_tile, t_chunk, hp), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM)
    y_rev = pl.BlockSpec((b_tile, t_chunk, hp), lambda b, t: (b, nT - 1 - t, 0),
                         memory_space=pltpu.VMEM)
    const2 = lambda shape, m=lambda b, t: (0, 0): pl.BlockSpec(
        shape, m, memory_space=pltpu.VMEM)
    if proj is not None:
        in_specs = [xspec_f, xspec_r,
                    const2((b_tile, 128), lambda b, t: (b, 0)),
                    const2((gh, 4 * gh))]
        operands = (proj[0], proj[1], len_bc, wbd)
    else:
        in_specs = [xspec_f, xspec_r,
                    const2((b_tile, 128), lambda b, t: (b, 0)),
                    const2((dc, 4 * gh)),
                    const2((dc, 4 * gh)),
                    const2((gh, 4 * gh))]
        operands = (xcat, xcat, len_bc, wf, wr, wbd)
    scratch = [
        pltpu.VMEM((b_tile, gh), jnp.float32),
        pltpu.VMEM((b_tile, gh), jnp.float32),
        pltpu.VMEM((t_chunk, b_tile, 4 * gh), jnp.float32),
        pltpu.VMEM((t_chunk, b_tile, hp), seq_dtype),
        pltpu.VMEM((t_chunk, b_tile, hp), seq_dtype),
        pltpu.VMEM((t_chunk, b_tile, gh), seq_dtype),
        pltpu.VMEM((t_chunk, b_tile, gh), seq_dtype),
    ]
    if proj is not None:
        sdt = proj[0].dtype
        scratch += [pltpu.VMEM((t_chunk, b_tile, sdim), sdt)] * 2
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_chunk=t_chunk, gh=gh, T=T,
                          compute_bf16=compute_bf16,
                          proj_in=proj is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=[y_fwd, y_rev, stream, stream],
        out_shape=[jax.ShapeDtypeStruct((B, T, hp), seq_dtype)] * 2
        + [jax.ShapeDtypeStruct((B, T, gh), seq_dtype)] * 2,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(*operands)


def _call_bwd(xcat, len_bc, hprev, cprev, gyf, gyr, wf, wr, wbd, wxfr,
              *, b_tile, t_chunk, interpret, compute_bf16, dx_dtype,
              proj=None, need_dx=True):
    """proj=(xzf, xzr) adds the hoisted-projection streams (gate
    recomputation source); the xcat views stay for the dWf/dWr
    contractions and wf/wr drop out. need_dx=False drops the dx outputs
    (returned as None) and their in-kernel matmuls/streams.

    gyf/gyr are the RAW per-direction output cotangents [B, T, hp], both
    in original time order (masking and the reverse direction's
    chain-order relayout happen in-kernel via _full_mask and the block
    maps). Returns (dxf, dxr) halves likewise in original time order."""
    B, T, dc = xcat.shape
    gh = wbd.shape[0]
    hp = gh // 2
    nT = T // t_chunk
    grid = (B // b_tile, nT)
    rev = lambda b, t: (b, nT - 1 - t, 0)
    fwd_map = lambda b, t: (b, t, 0)
    # The backward grid walks chain chunks in reverse; composing the
    # reverse-view map with the grid reversal makes the reverse view's map
    # the PLAIN one (and the forward view's the reversed one).
    xspec_f = pl.BlockSpec((b_tile, t_chunk, dc), rev, memory_space=pltpu.VMEM)
    xspec_r = pl.BlockSpec((b_tile, t_chunk, dc), fwd_map,
                           memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((b_tile, t_chunk, gh), rev, memory_space=pltpu.VMEM)
    g_f = pl.BlockSpec((b_tile, t_chunk, hp), rev, memory_space=pltpu.VMEM)
    g_r = pl.BlockSpec((b_tile, t_chunk, hp), fwd_map,
                       memory_space=pltpu.VMEM)
    const2 = lambda shape, m=lambda b, t: (0, 0): pl.BlockSpec(
        shape, m, memory_space=pltpu.VMEM)
    wdt = jnp.bfloat16 if compute_bf16 else jnp.float32
    dz_dt = jnp.bfloat16 if compute_bf16 else jnp.float32
    if proj is not None:
        sdim = 4 * hp
        zspec_f = pl.BlockSpec((b_tile, t_chunk, sdim), rev,
                               memory_space=pltpu.VMEM)
        zspec_r = pl.BlockSpec((b_tile, t_chunk, sdim), fwd_map,
                               memory_space=pltpu.VMEM)
        in_specs = [
            xspec_f, xspec_r, zspec_f, zspec_r,
            const2((b_tile, 128), lambda b, t: (b, 0)),
            stream, stream, g_f, g_r,
            const2((gh, 4 * gh)),
            const2((4 * gh, gh)),
        ]
        operands = [xcat, xcat, proj[0], proj[1], len_bc,
                    hprev, cprev, gyf, gyr, wbd.astype(wdt),
                    jnp.swapaxes(wbd, 0, 1).astype(wdt)]
    else:
        in_specs = [
            xspec_f, xspec_r,
            const2((b_tile, 128), lambda b, t: (b, 0)),
            stream, stream, g_f, g_r,
            const2((dc, 4 * gh)),
            const2((dc, 4 * gh)),
            const2((gh, 4 * gh)),
            const2((4 * gh, gh)),
        ]
        operands = [xcat, xcat, len_bc, hprev, cprev, gyf, gyr,
                    wf.astype(wdt), wr.astype(wdt), wbd.astype(wdt),
                    jnp.swapaxes(wbd, 0, 1).astype(wdt)]
    out_specs = [
        const2((dc, 4 * gh)),
        const2((dc, 4 * gh)),
        const2((gh, 4 * gh)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((dc, 4 * gh), jnp.float32),
        jax.ShapeDtypeStruct((dc, 4 * gh), jnp.float32),
        jax.ShapeDtypeStruct((gh, 4 * gh), jnp.float32),
    ]
    if need_dx:
        D = wxfr[0].shape[1]
        in_specs += [const2((4 * gh, D)), const2((4 * gh, D))]
        operands += [wxfr[0].astype(wdt), wxfr[1].astype(wdt)]
        out_specs = [pl.BlockSpec((b_tile, t_chunk, D), rev,
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((b_tile, t_chunk, D), fwd_map,
                                  memory_space=pltpu.VMEM)] + out_specs
        out_shape = [jax.ShapeDtypeStruct((B, T, D), dx_dtype)] * 2 + out_shape
    scratch = [
        pltpu.VMEM((b_tile, gh), jnp.float32),
        pltpu.VMEM((b_tile, gh), jnp.float32),
        pltpu.VMEM((t_chunk, b_tile, 4 * gh), dz_dt),
        pltpu.VMEM((t_chunk, b_tile, 4 * gh), jnp.float32),
        pltpu.VMEM((t_chunk, b_tile, gh), dz_dt),
        pltpu.VMEM((t_chunk, b_tile, gh), dz_dt),
        pltpu.VMEM((t_chunk, b_tile, hp), dz_dt),
        pltpu.VMEM((t_chunk, b_tile, hp), dz_dt),
    ]
    if need_dx:
        scratch += [pltpu.VMEM((t_chunk, b_tile, D), dx_dtype)] * 2
    if proj is not None:
        scratch += [pltpu.VMEM((t_chunk, b_tile, 4 * hp),
                               proj[0].dtype)] * 2
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, t_chunk=t_chunk, gh=gh, T=T,
                          compute_bf16=compute_bf16,
                          proj_in=proj is not None, need_dx=need_dx),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(*operands)
    if need_dx:
        return out
    return (None, None, *out)


def _prep(params_f, params_r, x, lengths, bf16: bool):
    """Pack the [x | 1] stream and the gate-major weights. NO gathers —
    the reverse direction is realized inside the kernels via time-reversed
    block views plus the boundary-reset mask."""
    B, T, D = x.shape
    H = params_f["Wh"].shape[0]
    hp = _hp_for(H)
    xcat = jnp.concatenate([x, jnp.ones((B, T, 1), x.dtype)], axis=-1)
    xcat = xcat.astype(jnp.bfloat16 if bf16 else jnp.float32)
    wf = _make_wdir(params_f, 0, H, D, hp, with_bias_of=params_r)
    wr = _make_wdir(params_r, 1, H, D, hp)
    wbd = _make_wbd(params_f, params_r, H, hp)
    return xcat, wf, wr, wbd, _len_bc(lengths, B, T), H, hp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def bidi_lstm_pallas(params_f: dict, params_r: dict, x: jax.Array,
                     lengths: Optional[jax.Array], t_chunk: int = 8,
                     interpret: bool = False, xz_bf16: bool = True,
                     need_dx: bool = True) -> jax.Array:
    """Fused bidi LSTM via Pallas; same contract as ops.lstm.bidi_lstm_apply:
    x [B,T,D] -> [B,T,2H] (forward then backward features, padding zero).

    xz_bf16=True (production default) streams activations and runs the MXU
    matmuls in bfloat16 with f32 accumulation (~1e-4 absolute effect on
    activations, well under CTC-alignment noise). False = strict-f32
    verification mode.

    need_dx=False declares that the caller will not consume the cotangent
    w.r.t. ``x`` (the net's input layer: x is training data). The backward
    kernel then skips the dz@wx matmuls and the two [B,T,D] dx streams — a
    custom_vjp body is opaque to XLA's dead-code elimination, so the dead
    computation must be dropped at trace time. The returned x-cotangent is
    exact zeros."""
    y, _ = _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
                     xz_bf16)
    return y


def _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret, xz_bf16=True):
    B, T, D = x.shape
    xcat, wf, wr, wbd, len_bc, H, hp = _prep(params_f, params_r, x, lengths,
                                             xz_bf16)
    dc = D + 1
    nb = 2 if xz_bf16 else 4
    wdt = jnp.bfloat16 if xz_bf16 else jnp.float32
    proj = None
    if dc > hp:
        # Large input dim: hoist the projection out of the serial kernel
        # (one big parallel matmul per direction; see _proj_stream).
        proj = (_proj_stream(xcat, params_f, H, hp, wdt),
                _proj_stream(xcat, params_r, H, hp, wdt))
    bt, tc = _pick_tiles(
        B, T,
        lambda b: _fwd_trow_bytes(b, dc, hp, nb, hoisted=proj is not None),
        t_chunk)
    yf, yr, hprev, cprev = _call_fwd(
        xcat, len_bc, wf.astype(wdt), wr.astype(wdt), wbd.astype(wdt),
        b_tile=bt, t_chunk=tc, interpret=interpret, compute_bf16=xz_bf16,
        seq_dtype=jnp.bfloat16 if xz_bf16 else jnp.float32, proj=proj)
    # Both halves come out of the kernel ALREADY in original time order
    # (reversed output block map + in-block row reversal for yr) and
    # already masked/zero on padded frames — the epilogue is one lane
    # slice+concat, no flip pass, no mask multiply, no f32 round-trip.
    # Production mode emits y in bf16: the halves are ALREADY stored bf16
    # by the kernel and every downstream consumer (next bidi layer's xcat,
    # the affine MXU matmuls) casts to bf16 anyway, so this is lossless
    # while halving the inter-layer glue bandwidth.
    y_dt = jnp.bfloat16 if (xz_bf16 and x.dtype == jnp.float32) else x.dtype
    y = jnp.concatenate([yf[..., :H], yr[..., :H]], axis=-1).astype(y_dt)
    res = (params_f, params_r, x, lengths, xcat, wf, wr, wbd, len_bc,
           hprev, cprev, H, hp, proj)
    return y, res


def _vjp_fwd(params_f, params_r, x, lengths, t_chunk, interpret, xz_bf16,
             need_dx):
    return _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
                     xz_bf16)


def _vjp_bwd(t_chunk, interpret, xz_bf16, need_dx, res, gy):
    (params_f, params_r, x, lengths, xcat, wf, wr, wbd, len_bc,
     hprev, cprev, H, hp, proj) = res
    gh = 2 * hp
    B, T, D = x.shape
    dc = D + 1
    # RAW per-direction cotangent halves, both in ORIGINAL time order,
    # lane-padded H -> hp. No mask multiply (the kernel's _full_mask
    # zeroes phantom frames) and no flip pass (the kernel's block maps
    # re-order the reverse half to chain order) — the former
    # zeros+set+flip gseq assembly was a full HBM pass over [B,T,2hp].
    gdt = jnp.bfloat16 if xz_bf16 else jnp.float32
    gy = gy.astype(gdt)
    pad = ((0, 0), (0, 0), (0, hp - H))
    gyf = jnp.pad(gy[..., :H], pad)
    gyr = jnp.pad(gy[..., H:], pad)

    wxfr = _make_wxt(params_f, params_r, H, D, hp)
    nb = 2 if xz_bf16 else 4
    bt, tc = _pick_tiles(
        B, T,
        lambda b: _bwd_trow_bytes(b, dc, hp, nb, hoisted=proj is not None),
        t_chunk)
    dxf, dxr, dwf, dwr, dwh = _call_bwd(
        xcat, len_bc, hprev, cprev, gyf, gyr, wf, wr, wbd, wxfr,
        b_tile=bt, t_chunk=tc, interpret=interpret, compute_bf16=xz_bf16,
        dx_dtype=gdt, proj=proj, need_dx=need_dx)

    # Gate-major -> reference-layout extraction on the small weight grads.
    grads = []
    for g, p, dwx in ((0, params_f, dwf), (1, params_r, dwr)):
        dWx = _gm_cols(dwx[:D], g, H, hp=hp)
        db = _gm_cols(dwx[D], g, H, hp=hp)
        dWh = _gm_cols(dwh[g * hp:g * hp + H], g, H, hp=hp)
        grads.append({"Wx": dWx.astype(p["Wx"].dtype),
                      "Wh": dWh.astype(p["Wh"].dtype),
                      "b": db.astype(p["b"].dtype)})

    if need_dx:
        # Both halves already in original time order — plain add, no flip.
        dx = (dxf.astype(jnp.float32) + dxr.astype(jnp.float32)
              ).astype(x.dtype)
    else:
        dx = jnp.zeros_like(x)
    return grads[0], grads[1], dx, None


bidi_lstm_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def fits_pallas(B: int, T: int, t_chunk: int = 8, H: int = 100,
                D: int = 48) -> bool:
    """Conservative check that the kernel's VMEM footprint is safe and the
    shapes tile cleanly (B a multiple of 8 for sublane alignment; any such
    B works — batches tile over the grid).

    Uses the REAL input dim ``D`` and the same hoisted-projection decision
    (dc > hp) and per-row byte model the kernel wrappers use, so the gate
    tests exactly the configuration _pick_tiles will run — a large-D layer
    that would blow VMEM is routed to the scan fallback instead of failing
    Mosaic compilation (round-2 advisor finding: the old hardcoded dc=64
    tested a different kernel than the one that ran)."""
    hp = _hp_for(H)
    dc = D + 1
    hoisted = dc > hp
    trow = lambda b: _bwd_trow_bytes(b, dc, hp, 2, hoisted=hoisted)
    bt, tc = _pick_tiles(B, T, trow, t_chunk)
    fixed = _fixed_bytes(dc, hp, bt, 2, hoisted=hoisted)
    # The streamed blocks get _vmem_budget(); the resident weights/
    # accumulators must fit in the remaining scoped-limit headroom.
    return (B % 8 == 0 and fixed <= _vmem_limit() - _vmem_budget()
            and trow(bt) * tc <= _vmem_budget())
