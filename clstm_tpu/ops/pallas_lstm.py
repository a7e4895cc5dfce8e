"""Pallas TPU kernels for the fused bidirectional LSTM cell.

The lax.scan bidi cell (ops/lstm.py bidi_lstm_apply) pays per-iteration
dispatch and MXU issue latency on every one of T steps whose work is tiny;
these kernels run the entire recurrence on-core with the state in VMEM.
Four rounds of profiling shaped the design (benchmarks/profile_step.py):

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
* **Per-direction SPLIT recurrent matmuls** (round-4 restructure): each
  chain step runs ``h_f @ Whf [hp, 4hp]`` and ``h_r @ Whr [hp, 4hp]`` as
  two independent dots. Rounds 1-3 fused them into one block-diagonal
  ``hcat [bt, 2hp] @ Wbd [2hp, 8hp]`` product "to keep one matmul on the
  serial chain" — but the chain is MXU-THROUGHPUT-bound, not issue-bound,
  and the dense block-diagonal product burns 2x the MACs on structural
  zeros (half of Wbd is zero by construction). Measured on the chained
  microbenchmark at the bench shape (1024 steps, bt=256): fused 4.19ms vs
  split 2.80ms. The same 2x waste is removed from the backward kernel's
  ``dz @ Wbd^T`` cotangent matmul and from the dW chunk contractions
  (the gate-major form computed a [*, 8hp] outer product and DISCARDED
  the other direction's half at extraction). The two directions' chains
  are data-independent, so the split dots also give Mosaic cross-direction
  ILP to hide VPU gate latency under the other direction's MXU pass.
* **The forward kernel emits (yf, yr, hprev, cprev)** — the layer output
  as two per-direction halves already in original time order (see above),
  plus the pre-step state streams the backward pass needs (its loop
  carries, free to store).
* **The backward kernel accumulates dWf/dWr/dWhf/dWhr in VMEM-resident
  output blocks and emits dx directly; dz never touches HBM.** c_seq is
  not even stored — c_new is recomputed from (hprev, cprev, xcat).
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


def _ref_cols(arr, H: int, axis: int = -1, hp: int = HP):
    """Slice the [*, 4H] reference-layout block out of a gate-padded
    [*, 4hp] array along ``axis`` (inverse of _pad_gates' column pad)."""
    parts = []
    for k in range(4):
        lo = k * hp
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(lo, lo + H)
        parts.append(arr[tuple(idx)])
    return jnp.concatenate(parts, axis=axis)


def _make_win(params: dict, H: int, D: int, hp: int = HP):
    """One direction's input projection [D+1, 4hp] for the ``[x | 1]``
    stream: rows 0:D = Wx gate-padded, row D = this direction's bias."""
    out = jnp.zeros((D + 1, 4 * hp), jnp.float32)
    out = out.at[:D].set(_pad_gates(params["Wx"], H, D, D, hp))
    out = out.at[D].set(_pad_gates(params["b"][None, :], H, 1, 1, hp)[0])
    return out


def _make_wh(params: dict, H: int, hp: int = HP):
    """One direction's recurrent weights [hp, 4hp], gate-padded."""
    return _pad_gates(params["Wh"], H, H, hp, hp)


def _make_wxt(params_f: dict, params_r: dict, H: int, D: int, hp: int = HP):
    """Per-direction dx projections ([4hp, D], [4hp, D]). Kept as two
    matrices so the kernel can stage each direction's dx into its own
    output stream — the reverse one through a time-reversed output block
    map — without unaligned lane slicing."""
    Wf = _pad_gates(params_f["Wx"], H, D, D, hp)
    Wr = _pad_gates(params_r["Wx"], H, D, D, hp)
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


def _fill_xz_split(xzf_s, xzr_s, xf_ref, xr_ref, wf, wr, t_chunk, cd):
    """Per-chunk per-direction input projections into TIME-LEADING scratch
    [tc, bt, 4hp], CHAIN-ordered: xzf_s[r] = x_fwd[r] @ Wf (bias folded
    into the ones row), xzr_s[r] = x at original time T-1-r @ Wr. One
    sub-matmul pair per step keeps operand/result values small — a single
    [bt*tc, 4hp] f32 dot result blows the Mosaic scoped stack. xr_ref
    arrives through a time-reversed block index map; in-block rows reverse
    here, so chain step r sees original time T-1-r."""
    for k in range(t_chunk):
        xzf_s[k] = jnp.dot(xf_ref[:, k, :].astype(cd), wf,
                           preferred_element_type=jnp.float32)
        xzr_s[k] = jnp.dot(xr_ref[:, t_chunk - 1 - k, :].astype(cd), wr,
                           preferred_element_type=jnp.float32)


def _stage_hoisted(xzf_s, xzr_s, xzf_ref, xzr_ref):
    """Stage HOISTED per-direction projection streams (compact [bt, tc,
    4hp], computed by one big XLA matmul — see _proj_stream) into
    time-leading scratch. Used when the input dim is large (dc > hp): at
    D=400/H=200 the in-kernel per-step projection costs ~7ms per kernel
    pass while the hoisted big matmul runs near MXU peak.

    Bulk transpose, not per-step sublane indexing: indexing the streamed
    block's sublane (time) dim gives vectors with non-zero sublane
    offsets, and Mosaic's concatenate requires matching offsets on
    non-concat dims ("result/input offset mismatch" — hit on hardware).
    xzr arrives through the time-reversed block map; rows stay in
    ORIGINAL order here (the chain loop reads xzr_s[tc-1-r]), unlike
    _fill_xz_split's chain-ordered fill — hence the ``hoisted`` flag on
    the chain loops. The round-3 gate-major 8hp interleave stage is gone:
    the per-direction streams feed the per-direction dots directly."""
    xzf_s[...] = jnp.transpose(xzf_ref[...], (1, 0, 2)).astype(xzf_s.dtype)
    xzr_s[...] = jnp.transpose(xzr_ref[...], (1, 0, 2)).astype(xzr_s.dtype)


def _fwd_kernel(*refs, t_chunk: int, hp: int, T: int, compute_bf16: bool,
                proj_in: bool = False, emit_state: bool = True):
    """Forward recurrence over one (b_tile, t_chunk) block.

    Emits the layer output directly in ORIGINAL time order as two
    per-direction streams — yf (forward half, frame-validity masked
    in-kernel) through a plain output block map and yr (reverse half)
    through a time-REVERSED output block map with in-block row reversal —
    plus hprev/cprev (pre-step carries [bt, 2hp] = [h_f | h_r], consumed
    by the backward kernel). Forward STATE carries no per-step length
    masking — padding is a contiguous per-row SUFFIX (data/dataset
    bucketing invariant) so phantom forward state never feeds a valid
    frame; only the yf WRITE is masked. The reverse state is masked by
    the boundary-reset multiply (that IS the flip semantics), so yr's
    phantom prefix is exact zeros already.

    proj_in=True: the input projection was hoisted to one big XLA matmul
    (large-D layers, see _stage_hoisted) — the first two refs are the
    compact per-direction xz streams and there are no wf/wr operands."""
    refs = list(refs)
    if proj_in:
        (xf_ref, xr_ref, len_ref, whf_ref, whr_ref) = refs[:5]
        refs = refs[5:]
        wf_ref = wr_ref = None
    else:
        (xf_ref, xr_ref, len_ref, wf_ref, wr_ref, whf_ref, whr_ref) = refs[:7]
        refs = refs[7:]
    if emit_state:
        (yf_ref, yr_ref, hprev_ref, cprev_ref,
         hf_ref, cf_ref, hr_ref, cr_ref, xzf_s, xzr_s,
         yf_s, yr_s, hs_s, cs_s) = refs
    else:
        (yf_ref, yr_ref,
         hf_ref, cf_ref, hr_ref, cr_ref, xzf_s, xzr_s,
         yf_s, yr_s) = refs
    tc_id = pl.program_id(1)
    cd = jnp.bfloat16 if compute_bf16 else jnp.float32

    @pl.when(tc_id == 0)
    def _init():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        cf_ref[...] = jnp.zeros_like(cf_ref)
        hr_ref[...] = jnp.zeros_like(hr_ref)
        cr_ref[...] = jnp.zeros_like(cr_ref)

    whf = whf_ref[...].astype(cd)
    whr = whr_ref[...].astype(cd)
    if proj_in:
        _stage_hoisted(xzf_s, xzr_s, xf_ref, xr_ref)
    else:
        _fill_xz_split(xzf_s, xzr_s, xf_ref, xr_ref,
                       wf_ref[...].astype(cd), wr_ref[...].astype(cd),
                       t_chunk, cd)
    len_hp = jnp.concatenate([len_ref[...]] * (hp // 128), axis=1)

    # Statically unrolled over the chunk (Mosaic rejects DYNAMIC stores on
    # the sublane dim; time-leading scratch keeps per-step indexing on the
    # leading dim — see module docstring). h/c stay in registers. The two
    # directions' dots are data-independent — free MXU/VPU overlap.
    hf, cf = hf_ref[...], cf_ref[...]
    hr, cr = hr_ref[...], cr_ref[...]
    for r in range(t_chunk):
        if emit_state:
            # Pre-step state staging for the backward kernel; skipped
            # entirely in inference mode (emit_state=False) — a no-grad
            # forward never consumes it and XLA cannot DCE outputs of an
            # opaque kernel.
            hs_s[r] = jnp.concatenate([hf, hr], axis=1).astype(hs_s.dtype)
            cs_s[r] = jnp.concatenate([cf, cr], axis=1).astype(cs_s.dtype)
        s_f = (tc_id * t_chunk + r).astype(jnp.float32)
        zf = xzf_s[r] + jnp.dot(
            hf.astype(cd), whf, preferred_element_type=jnp.float32)
        zr_src = xzr_s[t_chunk - 1 - r] if proj_in else xzr_s[r]
        zr = zr_src + jnp.dot(
            hr.astype(cd), whr, preferred_element_type=jnp.float32)
        _, _, gof, _, cf_new = _gates(zf, cf, hp)
        _, _, gor, _, cr_new = _gates(zr, cr, hp)
        cf = cf_new
        hf = jnp.tanh(cf_new) * gof
        # Reverse boundary reset: zero until chain step s has entered the
        # row's valid region (s >= T - len, i.e. original time < len).
        mr = (len_hp > (float(T) - 1.0 - s_f)).astype(jnp.float32)
        cr = cr_new * mr
        hr = jnp.tanh(cr_new) * gor * mr
        # yf: mask phantom forward frames at the WRITE (s_f is original
        # time for the forward half). yr: chain step s_f is original time
        # T-1-s_f; in-block row reversal + the reversed output block map
        # land it at its original-time position.
        yf_s[r] = (hf * (len_hp > s_f).astype(jnp.float32)
                   ).astype(yf_s.dtype)
        yr_s[t_chunk - 1 - r] = hr.astype(yr_s.dtype)
    hf_ref[...] = hf
    cf_ref[...] = cf
    hr_ref[...] = hr
    cr_ref[...] = cr
    yf_ref[...] = jnp.transpose(yf_s[...], (1, 0, 2))
    yr_ref[...] = jnp.transpose(yr_s[...], (1, 0, 2))
    if emit_state:
        hprev_ref[...] = jnp.transpose(hs_s[...], (1, 0, 2))
        cprev_ref[...] = jnp.transpose(cs_s[...], (1, 0, 2))


def _bwd_kernel(*refs, t_chunk: int, hp: int, T: int, compute_bf16: bool,
                proj_in: bool = False, need_dx: bool = True):
    """Reverse-grid backward step over one (b_tile, t_chunk) block.

    Recomputes gates and c_new from (xcat views, hprev, cprev); carries
    per-direction Dh/Dc [bt, hp] in registers across the unroll (scratch
    across chunks); stages dz time-leading, then runs the amortized chunk
    contractions. dWf/dWr/dWhf/dWhr accumulate across the WHOLE grid in
    VMEM-resident output blocks (constant index maps); every computed
    column is a real gradient column (the round-3 gate-major layout
    computed [*, 8hp] products and discarded half at extraction). The
    per-direction mask multiplies are the exact VJP of the forward
    boundary reset / output masking; through every phantom frame dz = 0,
    so phantom frames contribute nothing to any gradient.

    proj_in=True: xz comes from hoisted streams (refs 3-4); the xcat views
    are still streamed for the dWf/dWr contractions, and wf/wr drop out.
    need_dx=False (the network's INPUT layer — its dx cotangent has no
    consumer) drops the wxf/wxr operands, the dx output streams and their
    staging scratch, and skips the dz@wx matmuls entirely.

    The output cotangent arrives as two RAW per-direction streams gf/gr
    (no XLA-side masking or flipping): gf in original==chain order, gr in
    original time through the composed-forward block map, rows reversed
    here to chain order. The frame-validity masks zero phantom-frame
    contributions for both directions in-kernel. dx leaves the same way:
    dxf through the (grid-composed) original-time map, dxr staged
    row-reversed through the mirrored map, so the caller just adds the
    halves — no flip pass."""
    refs = list(refs)
    if proj_in:
        (xf_ref, xr_ref, xzf_ref, xzr_ref, len_ref,
         hprev_ref, cprev_ref, gf_ref, gr_ref,
         whf_ref, whr_ref, whft_ref, whrt_ref) = refs[:13]
        refs = refs[13:]
        wf_ref = wr_ref = None
    else:
        (xf_ref, xr_ref, len_ref, hprev_ref, cprev_ref, gf_ref, gr_ref,
         wf_ref, wr_ref, whf_ref, whr_ref, whft_ref, whrt_ref) = refs[:13]
        refs = refs[13:]
    if need_dx:
        wxf_ref, wxr_ref, dxf_ref, dxr_ref = refs[:4]
        refs = refs[4:]
    (dwf_ref, dwr_ref, dwhf_ref, dwhr_ref,
     Dhf_ref, Dcf_ref, Dhr_ref, Dcr_ref,
     dzf_ref, dzr_ref, xzf_s, xzr_s, hp_s, cp_s, gf_s, gr_s) = refs[:16]
    refs = refs[16:]
    if need_dx:
        dxf_s, dxr_s = refs
    b_id, tc_id = pl.program_id(0), pl.program_id(1)
    nT = pl.num_programs(1)
    cd = jnp.bfloat16 if compute_bf16 else jnp.float32

    @pl.when(tc_id == 0)
    def _init_carries():
        Dhf_ref[...] = jnp.zeros_like(Dhf_ref)
        Dcf_ref[...] = jnp.zeros_like(Dcf_ref)
        Dhr_ref[...] = jnp.zeros_like(Dhr_ref)
        Dcr_ref[...] = jnp.zeros_like(Dcr_ref)

    @pl.when((b_id == 0) & (tc_id == 0))
    def _init_accums():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dwr_ref[...] = jnp.zeros_like(dwr_ref)
        dwhf_ref[...] = jnp.zeros_like(dwhf_ref)
        dwhr_ref[...] = jnp.zeros_like(dwhr_ref)

    whf = whf_ref[...].astype(cd)
    whr = whr_ref[...].astype(cd)
    whft = whft_ref[...].astype(cd)
    whrt = whrt_ref[...].astype(cd)
    if proj_in:
        _stage_hoisted(xzf_s, xzr_s, xzf_ref, xzr_ref)
    else:
        _fill_xz_split(xzf_s, xzr_s, xf_ref, xr_ref,
                       wf_ref[...].astype(cd), wr_ref[...].astype(cd),
                       t_chunk, cd)
    # Stage streamed inputs time-leading: one bulk transpose per chunk
    # instead of a per-step in-chain relayout.
    hp_s[...] = jnp.transpose(hprev_ref[...], (1, 0, 2))
    cp_s[...] = jnp.transpose(cprev_ref[...], (1, 0, 2))
    gf_s[...] = jnp.transpose(gf_ref[...], (1, 0, 2))
    gr_s[...] = jnp.transpose(gr_ref[...], (1, 0, 2))
    len_hp = jnp.concatenate([len_ref[...]] * (hp // 128), axis=1)
    chunk0 = (nT - 1 - tc_id) * t_chunk   # first chain step of this block

    # NOTE (round-2 measurement): running this VJP elementwise chain in
    # bf16 gave NO speedup on v5e (91.0ms vs 89.2ms bidi2 step) — the VPU
    # runs bf16 elementwise at f32 rate here — while adding ~1e-2 gradient
    # noise, so the chain stays f32.
    Dhf, Dcf = Dhf_ref[...], Dcf_ref[...]
    Dhr, Dcr = Dhr_ref[...], Dcr_ref[...]
    for r in range(t_chunk - 1, -1, -1):
        h_prev = hp_s[r].astype(jnp.float32)
        c_prev = cp_s[r].astype(jnp.float32)
        s_f = (chunk0 + r).astype(jnp.float32)
        zf = xzf_s[r] + jnp.dot(
            h_prev[:, :hp].astype(cd), whf, preferred_element_type=jnp.float32)
        zr_src = xzr_s[t_chunk - 1 - r] if proj_in else xzr_s[r]
        zr = zr_src + jnp.dot(
            h_prev[:, hp:].astype(cd), whr, preferred_element_type=jnp.float32)
        gif, gff, gof, cif, cf_new = _gates(zf, c_prev[:, :hp], hp)
        gir, gfr, gor, cir, cr_new = _gates(zr, c_prev[:, hp:], hp)
        tcf = jnp.tanh(cf_new)
        tcr = jnp.tanh(cr_new)
        mf = (len_hp > s_f).astype(jnp.float32)
        mr = (len_hp > (float(T) - 1.0 - s_f)).astype(jnp.float32)

        dhf = (gf_s[r].astype(jnp.float32) + Dhf) * mf
        dcf = Dcf * mf + dhf * gof * (1.0 - tcf * tcf)
        dzf = jnp.concatenate(
            [dcf * cif * gif * (1.0 - gif),
             dcf * c_prev[:, :hp] * gff * (1.0 - gff),
             dhf * tcf * gof * (1.0 - gof),
             dcf * gif * (1.0 - cif * cif)], axis=1)     # [bt, 4hp]
        Dhf = jnp.dot(dzf.astype(cd), whft, preferred_element_type=jnp.float32)
        Dcf = dcf * gff
        dzf_ref[r] = dzf.astype(dzf_ref.dtype)

        dhr = (gr_s[t_chunk - 1 - r].astype(jnp.float32) + Dhr) * mr
        dcr = Dcr * mr + dhr * gor * (1.0 - tcr * tcr)
        dzr = jnp.concatenate(
            [dcr * cir * gir * (1.0 - gir),
             dcr * c_prev[:, hp:] * gfr * (1.0 - gfr),
             dhr * tcr * gor * (1.0 - gor),
             dcr * gir * (1.0 - cir * cir)], axis=1)     # [bt, 4hp]
        Dhr = jnp.dot(dzr.astype(cd), whrt, preferred_element_type=jnp.float32)
        Dcr = dcr * gfr
        dzr_ref[r] = dzr.astype(dzr_ref.dtype)
    Dhf_ref[...] = Dhf
    Dcf_ref[...] = Dcf
    Dhr_ref[...] = Dhr
    Dcr_ref[...] = Dcr

    # Amortized chunk contractions on the MXU, one sub-matmul set per step
    # (small stack values; see _fill_xz_split). dz never leaves VMEM.
    tdot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    wxf = wxf_ref[...].astype(cd) if need_dx else None
    wxr = wxr_ref[...].astype(cd) if need_dx else None
    dwf, dwr = dwf_ref[...], dwr_ref[...]
    dwhf, dwhr = dwhf_ref[...], dwhr_ref[...]
    for k in range(t_chunk):
        dzfk = dzf_ref[k].astype(cd)
        dzrk = dzr_ref[k].astype(cd)
        dwf += tdot(xf_ref[:, k, :].astype(cd), dzfk)
        dwr += tdot(xr_ref[:, t_chunk - 1 - k, :].astype(cd), dzrk)
        dwhf += tdot(hp_s[k][:, :hp].astype(cd), dzfk)
        dwhr += tdot(hp_s[k][:, hp:].astype(cd), dzrk)
        if need_dx:
            # dxf at chain row k == original row k of this (rev-mapped)
            # block; dxr rows reverse into the mirrored (fwd-mapped) block.
            dxf_s[k] = jnp.dot(dzfk, wxf,
                               preferred_element_type=jnp.float32
                               ).astype(dxf_s.dtype)
            dxr_s[t_chunk - 1 - k] = jnp.dot(
                dzrk, wxr, preferred_element_type=jnp.float32
            ).astype(dxr_s.dtype)
    dwf_ref[...] = dwf
    dwr_ref[...] = dwr
    dwhf_ref[...] = dwhf
    dwhr_ref[...] = dwhr
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
    outs = 2 * 3 * bt * gh * nb             # y halves + hprev/cprev blocks
    xz_scratch = 2 * bt * 4 * hp * 4        # f32 per-direction projections
    staging = 3 * bt * gh * nb              # time-leading output staging
    return xcat + outs + xz_scratch + staging


def _bwd_trow_bytes(bt: int, dc: int, hp: int, nb: int,
                    hoisted: bool = False) -> int:
    gh = 2 * hp
    ins = 2 * bt * (2 * dc + 3 * gh) * nb   # x views + hprev/cprev/g
    if hoisted:
        ins += 2 * 2 * bt * 4 * hp * nb     # + the two xz streams
    dx = 2 * 2 * bt * dc * nb               # dx block + staging
    xz_scratch = 2 * bt * 4 * hp * 4        # f32 per-direction projections
    dz_scratch = 2 * bt * 4 * hp * nb
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
    input projection is hoisted (dc > hp) the [dc, 4hp] wf/wr blocks drop
    out of the kernel (replaced by the compact proj streams, which are
    per-row streamed and counted in _bwd_trow_bytes)."""
    win = 0 if hoisted else 2 * dc
    weights = (win + 4 * hp) * 4 * hp * nb + 2 * 4 * hp * dc * nb
    carries = 4 * bt * hp * 4
    accums = (2 * dc + 2 * hp) * 4 * hp * 4
    return weights + carries + accums


def _len_bc(lengths, B, T):
    lens = (jnp.full((B,), T, jnp.float32) if lengths is None
            else lengths.astype(jnp.float32))
    return jnp.broadcast_to(lens[:, None], (B, 128))


def _call_fwd(xcat, len_bc, wf, wr, whf, whr, *, b_tile, t_chunk, interpret,
              compute_bf16, seq_dtype, proj=None, emit_state=True):
    """proj=(xzf, xzr) switches to the hoisted-projection variant: the two
    compact [B, T, 4hp] streams replace the xcat views and wf/wr."""
    B, T, dc = xcat.shape
    hp = whf.shape[0]
    gh = 2 * hp
    nT = T // t_chunk
    grid = (B // b_tile, nT)
    sdim = 4 * hp if proj is not None else dc
    xspec_f = pl.BlockSpec((b_tile, t_chunk, sdim), lambda b, t: (b, t, 0),
                           memory_space=pltpu.VMEM)
    xspec_r = pl.BlockSpec((b_tile, t_chunk, sdim),
                           lambda b, t: (b, nT - 1 - t, 0),
                           memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((b_tile, t_chunk, gh), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    y_fwd = pl.BlockSpec((b_tile, t_chunk, hp), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM)
    y_rev = pl.BlockSpec((b_tile, t_chunk, hp), lambda b, t: (b, nT - 1 - t, 0),
                         memory_space=pltpu.VMEM)
    const2 = lambda shape, m=lambda b, t: (0, 0): pl.BlockSpec(
        shape, m, memory_space=pltpu.VMEM)
    if proj is not None:
        in_specs = [xspec_f, xspec_r,
                    const2((b_tile, 128), lambda b, t: (b, 0)),
                    const2((hp, 4 * hp)),
                    const2((hp, 4 * hp))]
        operands = (proj[0], proj[1], len_bc, whf, whr)
    else:
        in_specs = [xspec_f, xspec_r,
                    const2((b_tile, 128), lambda b, t: (b, 0)),
                    const2((dc, 4 * hp)),
                    const2((dc, 4 * hp)),
                    const2((hp, 4 * hp)),
                    const2((hp, 4 * hp))]
        operands = (xcat, xcat, len_bc, wf, wr, whf, whr)
    scratch = [
        pltpu.VMEM((b_tile, hp), jnp.float32),   # hf
        pltpu.VMEM((b_tile, hp), jnp.float32),   # cf
        pltpu.VMEM((b_tile, hp), jnp.float32),   # hr
        pltpu.VMEM((b_tile, hp), jnp.float32),   # cr
        pltpu.VMEM((t_chunk, b_tile, 4 * hp), jnp.float32),  # xzf
        pltpu.VMEM((t_chunk, b_tile, 4 * hp), jnp.float32),  # xzr
        pltpu.VMEM((t_chunk, b_tile, hp), seq_dtype),        # yf staging
        pltpu.VMEM((t_chunk, b_tile, hp), seq_dtype),        # yr staging
    ]
    out_specs = [y_fwd, y_rev]
    out_shape = [jax.ShapeDtypeStruct((B, T, hp), seq_dtype)] * 2
    if emit_state:
        scratch += [pltpu.VMEM((t_chunk, b_tile, gh), seq_dtype)] * 2
        out_specs += [stream, stream]
        out_shape += [jax.ShapeDtypeStruct((B, T, gh), seq_dtype)] * 2
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_chunk=t_chunk, hp=hp, T=T,
                          compute_bf16=compute_bf16,
                          proj_in=proj is not None, emit_state=emit_state),
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


def _call_bwd(xcat, len_bc, hprev, cprev, gyf, gyr, wf, wr, whf, whr, wxfr,
              *, b_tile, t_chunk, interpret, compute_bf16, dx_dtype,
              proj=None, need_dx=True):
    """proj=(xzf, xzr) adds the hoisted-projection streams (gate
    recomputation source); the xcat views stay for the dWf/dWr
    contractions and wf/wr drop out. need_dx=False drops the dx outputs
    (returned as None) and their in-kernel matmuls/streams.

    gyf/gyr are the RAW per-direction output cotangents [B, T, hp], both
    in original time order (masking and the reverse direction's
    chain-order relayout happen in-kernel via the per-direction masks and
    the block maps). Returns (dxf, dxr) halves likewise in original time
    order."""
    B, T, dc = xcat.shape
    hp = whf.shape[0]
    gh = 2 * hp
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
    whs = [whf.astype(wdt), whr.astype(wdt),
           jnp.swapaxes(whf, 0, 1).astype(wdt),
           jnp.swapaxes(whr, 0, 1).astype(wdt)]
    wh_specs = [const2((hp, 4 * hp)), const2((hp, 4 * hp)),
                const2((4 * hp, hp)), const2((4 * hp, hp))]
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
        ] + wh_specs
        operands = [xcat, xcat, proj[0], proj[1], len_bc,
                    hprev, cprev, gyf, gyr] + whs
    else:
        in_specs = [
            xspec_f, xspec_r,
            const2((b_tile, 128), lambda b, t: (b, 0)),
            stream, stream, g_f, g_r,
            const2((dc, 4 * hp)),
            const2((dc, 4 * hp)),
        ] + wh_specs
        operands = [xcat, xcat, len_bc, hprev, cprev, gyf, gyr,
                    wf.astype(wdt), wr.astype(wdt)] + whs
    out_specs = [
        const2((dc, 4 * hp)),
        const2((dc, 4 * hp)),
        const2((hp, 4 * hp)),
        const2((hp, 4 * hp)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((dc, 4 * hp), jnp.float32),
        jax.ShapeDtypeStruct((dc, 4 * hp), jnp.float32),
        jax.ShapeDtypeStruct((hp, 4 * hp), jnp.float32),
        jax.ShapeDtypeStruct((hp, 4 * hp), jnp.float32),
    ]
    if need_dx:
        D = wxfr[0].shape[1]
        in_specs += [const2((4 * hp, D)), const2((4 * hp, D))]
        operands += [wxfr[0].astype(wdt), wxfr[1].astype(wdt)]
        out_specs = [pl.BlockSpec((b_tile, t_chunk, D), rev,
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((b_tile, t_chunk, D), fwd_map,
                                  memory_space=pltpu.VMEM)] + out_specs
        out_shape = [jax.ShapeDtypeStruct((B, T, D), dx_dtype)] * 2 + out_shape
    scratch = [
        pltpu.VMEM((b_tile, hp), jnp.float32),   # Dhf
        pltpu.VMEM((b_tile, hp), jnp.float32),   # Dcf
        pltpu.VMEM((b_tile, hp), jnp.float32),   # Dhr
        pltpu.VMEM((b_tile, hp), jnp.float32),   # Dcr
        pltpu.VMEM((t_chunk, b_tile, 4 * hp), dz_dt),        # dzf
        pltpu.VMEM((t_chunk, b_tile, 4 * hp), dz_dt),        # dzr
        pltpu.VMEM((t_chunk, b_tile, 4 * hp), jnp.float32),  # xzf
        pltpu.VMEM((t_chunk, b_tile, 4 * hp), jnp.float32),  # xzr
        pltpu.VMEM((t_chunk, b_tile, gh), dz_dt),            # hprev staging
        pltpu.VMEM((t_chunk, b_tile, gh), dz_dt),            # cprev staging
        pltpu.VMEM((t_chunk, b_tile, hp), dz_dt),            # gf staging
        pltpu.VMEM((t_chunk, b_tile, hp), dz_dt),            # gr staging
    ]
    if need_dx:
        scratch += [pltpu.VMEM((t_chunk, b_tile, D), dx_dtype)] * 2
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, t_chunk=t_chunk, hp=hp, T=T,
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
    """Pack the [x | 1] stream and the per-direction gate-padded weights.
    NO gathers — the reverse direction is realized inside the kernels via
    time-reversed block views plus the boundary-reset mask."""
    B, T, D = x.shape
    H = params_f["Wh"].shape[0]
    hp = _hp_for(H)
    xcat = jnp.concatenate([x, jnp.ones((B, T, 1), x.dtype)], axis=-1)
    xcat = xcat.astype(jnp.bfloat16 if bf16 else jnp.float32)
    wf = _make_win(params_f, H, D, hp)
    wr = _make_win(params_r, H, D, hp)
    whf = _make_wh(params_f, H, hp)
    whr = _make_wh(params_r, H, hp)
    return xcat, wf, wr, whf, whr, _len_bc(lengths, B, T), H, hp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def bidi_lstm_pallas(params_f: dict, params_r: dict, x: jax.Array,
                     lengths: Optional[jax.Array], t_chunk: int = 8,
                     interpret: bool = False, xz_bf16: bool = True,
                     need_dx: bool = True,
                     with_state: bool = True) -> jax.Array:
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
    exact zeros.

    with_state=False (inference mode): the forward kernel skips the
    hprev/cprev pre-step state streams (2x [B,T,2hp], only ever consumed
    by the backward pass) — their per-step staging stores and HBM writes
    are pure waste in a no-grad forward, and XLA cannot DCE outputs of an
    opaque kernel. Measured on the tunneled v5e at the bench shape:
    fwd-only 3.05 -> 2.37 ms/pass; batched inference 52.6k -> 69.8k
    lines/s. Under jax.grad the custom_vjp forward rule runs instead of
    this body and always emits state, so the flag is safe to set from
    call-site intent alone (a wrong True only costs the speedup)."""
    y, _ = _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
                     xz_bf16, with_state=with_state)
    return y


def _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
              xz_bf16=True, with_state=True):
    B, T, D = x.shape
    xcat, wf, wr, whf, whr, len_bc, H, hp = _prep(params_f, params_r, x,
                                                  lengths, xz_bf16)
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
    outs = _call_fwd(
        xcat, len_bc, wf.astype(wdt), wr.astype(wdt), whf.astype(wdt),
        whr.astype(wdt), b_tile=bt, t_chunk=tc, interpret=interpret,
        compute_bf16=xz_bf16,
        seq_dtype=jnp.bfloat16 if xz_bf16 else jnp.float32, proj=proj,
        emit_state=with_state)
    yf, yr = outs[:2]
    hprev, cprev = (outs[2], outs[3]) if with_state else (None, None)
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
    res = (params_f, params_r, x, lengths, xcat, wf, wr, whf, whr, len_bc,
           hprev, cprev, H, hp, proj)
    return y, res


def _vjp_fwd(params_f, params_r, x, lengths, t_chunk, interpret, xz_bf16,
             need_dx, with_state):
    # The backward pass always needs the state streams, whatever the
    # primal-body flag said.
    return _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
                     xz_bf16, with_state=True)


def _vjp_bwd(t_chunk, interpret, xz_bf16, need_dx, with_state, res, gy):
    (params_f, params_r, x, lengths, xcat, wf, wr, whf, whr, len_bc,
     hprev, cprev, H, hp, proj) = res
    B, T, D = x.shape
    dc = D + 1
    # RAW per-direction cotangent halves, both in ORIGINAL time order,
    # lane-padded H -> hp. No mask multiply (the kernel's per-direction
    # masks zero phantom frames) and no flip pass (the kernel's block maps
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
    dxf, dxr, dwf, dwr, dwhf, dwhr = _call_bwd(
        xcat, len_bc, hprev, cprev, gyf, gyr, wf, wr, whf, whr, wxfr,
        b_tile=bt, t_chunk=tc, interpret=interpret, compute_bf16=xz_bf16,
        dx_dtype=gdt, proj=proj, need_dx=need_dx)

    # Gate-padded -> reference-layout extraction on the small weight grads.
    grads = []
    for p, dwx, dwh in ((params_f, dwf, dwhf), (params_r, dwr, dwhr)):
        dWx = _ref_cols(dwx[:D], H, hp=hp)
        db = _ref_cols(dwx[D], H, hp=hp)
        dWh = _ref_cols(dwh[:H], H, hp=hp)
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
