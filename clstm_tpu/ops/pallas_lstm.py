"""Pallas TPU kernels for the fused bidirectional LSTM cell.

The lax.scan bidi cell (ops/lstm.py bidi_lstm_apply) pays per-iteration
dispatch and MXU issue latency on every one of T steps whose work is tiny;
measured ~19ms forward / ~44ms forward+backward at B=256, T=1024 on v5e
(BASELINE.md round-1 profile). These kernels run the entire recurrence
on-core with the state in VMEM and — the key trick — reduce the critical
path to ONE matmul per timestep:

* **Input projections are hoisted out** of the recurrence into one big XLA
  matmul (``xz = x @ Wx + b``), streamed through the kernel in bf16.
* **Both directions' recurrent matmuls are fused into one block-diagonal
  matmul** in a gate-major layout: the combined state ``hcat [B, 2*Hp]``
  multiplies ``Wbd [2*Hp, 8*Hp]`` whose column blocks are
  ``[gi | gf | go | ci]``, each 2*Hp wide with the forward direction in the
  first Hp lanes and the reverse direction in the second. All gate math is
  then fully vectorized over ``[B, 2*Hp]`` with no per-group slicing.
* **Backward emits only dz** (the pre-activation cotangents, bf16): the
  in-kernel critical path is dz = f(Dh, Dc) -> Dh' = dz @ Wbd^T, one
  matmul per step; the heavy, parallel gradient contractions (dWx, dWh,
  db, dx) happen outside as large MXU-efficient XLA matmuls over the full
  [T, B, *] sequences.

Reference semantics (NPLSTM, clstm.cc ≈L600-800, unverified): gates
(gi,gf,go) sigmoid, ci tanh, c' = gf*c + gi*ci, h' = tanh(c')*go — same
math as ops/lstm.py, equivalence (forward and gradients) asserted in
tests/test_pallas_lstm.py.

Hidden size is padded to Hp=128 (lane width); padded h/c columns stay
exactly zero through the recurrence (zero weight columns -> ci = 0 ->
c = gf*0 = 0). There is NO per-step length masking inside the kernels —
padding is a contiguous per-row suffix, so masking is only needed on the
layer output and the incoming cotangents, both applied outside; per-step
masking measured at ~80% of kernel runtime (select + iota-compare on
[B, 2Hp] every step).
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
GH = 2 * HP        # default combined state width (both directions)
MAX_ROWS = 512     # fall back to the scan path above this batch size


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
    into the WEIGHTS keeps the big [T,B,*] activations in natural layout —
    permuting activations instead costs several 0.5-1GB transposes per
    step (measured ~19ms of a 23ms forward)."""
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


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(xz_ref, wbd_ref, h_seq_ref, c_seq_ref,
                h_ref, c_ref, *, t_chunk: int, gh: int = GH):
    """xz_ref [Tc,B,8Hp] (bf16, gate-major, bias folded), wbd_ref
    [2Hp,8Hp]; outputs h_seq/c_seq [Tc,B,2Hp] (carries); scratch h/c
    [B,2Hp].

    NO per-step length masking — measured at ~80% of kernel time and
    provably unnecessary here: padding is a contiguous per-row SUFFIX
    (data/dataset bucketing invariant), so phantom-frame state never feeds
    a valid frame in this forward pass; phantom h_seq/c_seq values are
    garbage but (a) the caller masks the layer output y outside, and
    (b) the backward pass's cotangents are exactly zero through phantom
    frames (see _bwd_kernel), so they contribute nothing to any gradient.
    Phantom frames cannot produce NaN: x is zero-padded, so z = bias +
    h@Wbd stays bounded (h in tanh range)."""
    tc = pl.program_id(0)

    @pl.when(tc == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    def body(r, _):
        z = xz_ref[r].astype(jnp.float32) + jnp.dot(
            h_ref[:, :], wbd_ref[:, :], preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(z[:, 0 * gh:1 * gh])
        gf = jax.nn.sigmoid(z[:, 1 * gh:2 * gh])
        go = jax.nn.sigmoid(z[:, 2 * gh:3 * gh])
        ci = jnp.tanh(z[:, 3 * gh:4 * gh])
        c_new = gf * c_ref[:, :] + gi * ci
        h_new = jnp.tanh(c_new) * go
        c_ref[:, :] = c_new
        h_ref[:, :] = h_new
        h_seq_ref[r] = h_new.astype(h_seq_ref.dtype)
        c_seq_ref[r] = c_new.astype(c_seq_ref.dtype)
        return _

    jax.lax.fori_loop(0, t_chunk, body, None)


def _bwd_kernel(xz_ref, hprev_ref, cprev_ref, cseq_ref, g_ref,
                wbd_ref, wbdt_ref, dz_ref, Dh_ref, Dc_ref, *, t_chunk: int,
                gh: int = GH):
    """Reverse-grid step emitting dz [Tc,B,8Hp]. Carries Dh/Dc [B,2Hp] in
    scratch; gates recomputed from hprev/cprev.

    NO per-step length masking (see _fwd_kernel): the caller zeroes the
    padded-frame cotangents g outside, and the carries initialize to zero,
    so through every phantom frame dh_new = g + Dh = 0, hence dz = 0,
    hence Dh' = 0 and Dc' = Dc*0... = 0 — the zeros propagate EXACTLY
    until the recurrence crosses into each row's valid region, which is
    precisely the masked semantics."""
    tc = pl.program_id(0)

    @pl.when(tc == 0)
    def _init():
        Dh_ref[...] = jnp.zeros_like(Dh_ref)
        Dc_ref[...] = jnp.zeros_like(Dc_ref)

    def body(rr, _):
        r = t_chunk - 1 - rr
        h_prev = hprev_ref[r].astype(jnp.float32)
        c_prev = cprev_ref[r].astype(jnp.float32)
        z = xz_ref[r].astype(jnp.float32) + jnp.dot(
            h_prev, wbd_ref[:, :], preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(z[:, 0 * gh:1 * gh])
        gf = jax.nn.sigmoid(z[:, 1 * gh:2 * gh])
        go = jax.nn.sigmoid(z[:, 2 * gh:3 * gh])
        ci = jnp.tanh(z[:, 3 * gh:4 * gh])
        tc_new = jnp.tanh(cseq_ref[r].astype(jnp.float32))

        dh_new = g_ref[r] + Dh_ref[:, :]
        dc_new = Dc_ref[:, :] + dh_new * go * (1.0 - tc_new * tc_new)
        dgo = dh_new * tc_new * go * (1.0 - go)
        dgf = dc_new * c_prev * gf * (1.0 - gf)
        dgi = dc_new * ci * gi * (1.0 - gi)
        dci = dc_new * gi * (1.0 - ci * ci)
        dz = jnp.concatenate([dgi, dgf, dgo, dci], axis=1)   # [B,8Hp]

        Dh_ref[:, :] = jnp.dot(
            dz, wbdt_ref[:, :], preferred_element_type=jnp.float32)
        Dc_ref[:, :] = dc_new * gf
        dz_ref[r] = dz.astype(dz_ref.dtype)
        return _

    jax.lax.fori_loop(0, t_chunk, body, None)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _pick_chunk(T: int, target: int) -> int:
    t = min(target, T)
    while T % t:
        t -= 1
    return t


# Scoped VMEM budget for streamed blocks (the hard limit is 16MB; leave
# room for weights, carries and compiler scratch).
_VMEM_BUDGET = 10 * 1024 * 1024


def _auto_chunk(T: int, B: int, bytes_per_trow: int, target: int = 8) -> int:
    """Largest chunk <= target dividing T whose double-buffered streamed
    blocks fit the VMEM budget."""
    t = _pick_chunk(T, target)
    while t > 1 and t * bytes_per_trow > _VMEM_BUDGET:
        t = _pick_chunk(T, t - 1)
    return t


def _fwd_trow_bytes(B: int, xz_bytes: int, hp: int = HP,
                    seq_bytes: int = 4) -> int:
    # xz block + 2 output blocks, all double-buffered.
    gh = 2 * hp
    return 2 * (B * 4 * gh * xz_bytes) + 2 * 2 * (B * gh * seq_bytes)


def _bwd_trow_bytes(B: int, xz_bytes: int, dz_bytes: int, hp: int = HP,
                    seq_bytes: int = 4) -> int:
    # xz + 3 seq inputs (hprev/cprev/cseq) + f32 g + dz out, double-buffered.
    gh = 2 * hp
    return 2 * (B * 4 * gh * xz_bytes) + 2 * 3 * (B * gh * seq_bytes) \
        + 2 * (B * gh * 4) + 2 * (B * 4 * gh * dz_bytes)


def _call_fwd(xz, wbd, *, t_chunk, interpret, seq_dtype=jnp.float32):
    T, B, four_gh = xz.shape
    gh = four_gh // 4
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_chunk=t_chunk, gh=gh),
        grid=(T // t_chunk,),
        in_specs=[
            pl.BlockSpec((t_chunk, B, 4 * gh), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, 4 * gh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk, B, gh), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, gh), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, gh), seq_dtype),
            jax.ShapeDtypeStruct((T, B, gh), seq_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, gh), jnp.float32),
            pltpu.VMEM((B, gh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xz, wbd)


def _call_bwd(xz, hprev, cprev, cseq, gseq, wbd, wbdt,
              *, t_chunk, interpret, dz_dtype=jnp.bfloat16):
    T, B, four_gh = xz.shape
    gh = four_gh // 4
    nT = T // t_chunk
    rev = lambda t: (nT - 1 - t, 0, 0)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, t_chunk=t_chunk, gh=gh),
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((t_chunk, B, 4 * gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, 4 * gh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * gh, gh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_chunk, B, 4 * gh), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, 4 * gh), dz_dtype),
        scratch_shapes=[
            pltpu.VMEM((B, gh), jnp.float32),
            pltpu.VMEM((B, gh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xz, hprev, cprev, cseq, gseq, wbd, wbdt)


def _prep(params_f, params_r, x, lengths, xz_dtype):
    B, T, D = x.shape
    H = params_f["Wh"].shape[0]
    xr = flip_within_length(x, lengths)
    x2 = jnp.stack([x, xr], axis=1).astype(jnp.float32)      # [B,2,T,D]
    x2 = jnp.transpose(x2, (2, 1, 0, 3))                     # [T,2,B,D]
    # Input projections directly in gate-major layout via weight-folded
    # permutation: one einsum, no activation reshuffles.
    hp = _hp_for(H)
    Wx_gm = jnp.stack([
        _gm_weight(_pad_gates(params_f["Wx"], H, D, D, hp), 0, hp),
        _gm_weight(_pad_gates(params_r["Wx"], H, D, D, hp), 1, hp)])
    b_gm = (_gm_weight(_pad_gates(params_f["b"][None, :], H, 1, 1, hp), 0, hp)[0]
            + _gm_weight(_pad_gates(params_r["b"][None, :], H, 1, 1, hp), 1, hp)[0])
    xz = jnp.einsum("tgbd,gdo->tbo", x2, Wx_gm,
                    preferred_element_type=jnp.float32) + b_gm
    xz = xz.astype(xz_dtype)                                  # [T,B,8hp]

    lens = jnp.full((B,), T, jnp.int32) if lengths is None else lengths
    wbd = _make_wbd(params_f, params_r, H, hp)
    return x2, xz, Wx_gm, wbd, lens, H, hp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def bidi_lstm_pallas(params_f: dict, params_r: dict, x: jax.Array,
                     lengths: Optional[jax.Array], t_chunk: int = 8,
                     interpret: bool = False, xz_bf16: bool = True) -> jax.Array:
    """Fused bidi LSTM via Pallas; same contract as ops.lstm.bidi_lstm_apply:
    x [B,T,D] -> [B,T,2H] (forward then backward features, padding zero).

    xz_bf16 streams the hoisted input projections in bfloat16 (halves the
    dominant HBM traffic; ~1e-3 relative effect on activations, well under
    CTC-alignment noise). Set False for strict-f32 verification."""
    y, _ = _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
                     xz_bf16)
    return y


def _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret, xz_bf16=True):
    B, T, D = x.shape
    x2, xz, Wx_gm, wbd, lens, H, hp = _prep(
        params_f, params_r, x, lengths,
        jnp.bfloat16 if xz_bf16 else jnp.float32)
    nb = 2 if xz_bf16 else 4
    tc = _auto_chunk(T, B, _fwd_trow_bytes(B, nb, hp, seq_bytes=nb), t_chunk)
    h_seq, c_seq = _call_fwd(
        xz, wbd, t_chunk=tc, interpret=interpret,
        seq_dtype=jnp.bfloat16 if xz_bf16 else jnp.float32)
    mask = (jnp.arange(T)[:, None] < lens[None, :]).astype(jnp.float32)
    hm = h_seq.astype(jnp.float32) * mask[:, :, None]
    y_f = jnp.transpose(hm[:, :, :H], (1, 0, 2))             # [B,T,H]
    y_r = flip_within_length(
        jnp.transpose(hm[:, :, hp:hp + H], (1, 0, 2)), lengths)
    y = jnp.concatenate([y_f, y_r], axis=-1).astype(x.dtype)
    res = (params_f, params_r, x, lengths, x2, xz, Wx_gm, wbd,
           h_seq, c_seq, H, hp)
    return y, res


def _vjp_fwd(params_f, params_r, x, lengths, t_chunk, interpret, xz_bf16):
    return _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
                     xz_bf16)


def _vjp_bwd(t_chunk, interpret, xz_bf16, res, gy):
    (params_f, params_r, x, lengths, x2, xz, Wx_gm, wbd,
     h_seq, c_seq, H, hp) = res
    gh = 2 * hp
    B, T, D = x.shape
    gy = gy.astype(jnp.float32)
    # Cotangents of the stored carries in the combined [T,B,2Hp] layout.
    g_f = jnp.transpose(gy[..., :H], (1, 0, 2))
    g_r = jnp.transpose(flip_within_length(gy[..., H:], lengths), (1, 0, 2))
    gseq = jnp.zeros((T, B, gh), jnp.float32)
    gseq = gseq.at[:, :, :H].set(g_f).at[:, :, hp:hp + H].set(g_r)
    # The y = mask*h_seq mask multiplies in-kernel via m; apply here too so
    # padded-frame cotangents vanish identically.
    lens = jnp.full((B,), T, jnp.int32) if lengths is None else lengths
    mask = (jnp.arange(T)[:, None] < lens[None, :]).astype(jnp.float32)
    gseq = gseq * mask[:, :, None]

    zero = jnp.zeros((1, B, gh), h_seq.dtype)
    hprev = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    cprev = jnp.concatenate([zero, c_seq[:-1]], axis=0)
    nb = 2 if xz_bf16 else 4
    tc = _auto_chunk(T, B, _bwd_trow_bytes(B, nb, nb, hp, seq_bytes=nb),
                     t_chunk)
    dz = _call_bwd(xz, hprev, cprev, c_seq, gseq, wbd,
                   jnp.swapaxes(wbd, 0, 1), t_chunk=tc, interpret=interpret,
                   dz_dtype=jnp.bfloat16 if xz_bf16 else jnp.float32)

    # All-group contractions on the MXU, no activation reshuffles; the
    # gate-major -> reference-layout extraction happens on the small
    # weight-gradient tensors.
    dWx_gm = jnp.einsum("tgbd,tbo->gdo", x2, dz,
                        preferred_element_type=jnp.float32)  # [2,D,8Hp]
    dWh_gm = jnp.einsum("tbh,tbo->ho", hprev, dz,
                        preferred_element_type=jnp.float32)  # [2Hp,8Hp]
    db_gm = jnp.sum(dz.astype(jnp.float32), axis=(0, 1))     # [8Hp]
    dx2 = jnp.einsum("tbo,gdo->tgbd", dz, Wx_gm,
                     preferred_element_type=jnp.float32)     # [T,2,B,D]

    grads = []
    for g, p in ((0, params_f), (1, params_r)):
        dWx = _gm_cols(dWx_gm[g], g, H, hp=hp)
        dWh = _gm_cols(dWh_gm[g * hp:g * hp + H], g, H, hp=hp)
        db = _gm_cols(db_gm, g, H, hp=hp)
        grads.append({"Wx": dWx.astype(p["Wx"].dtype),
                      "Wh": dWh.astype(p["Wh"].dtype),
                      "b": db.astype(p["b"].dtype)})

    dx_f = jnp.transpose(dx2[:, 0], (1, 0, 2))               # [B,T,D]
    dx_r = flip_within_length(jnp.transpose(dx2[:, 1], (1, 0, 2)), lengths)
    dx = (dx_f + dx_r).astype(x.dtype)
    return grads[0], grads[1], dx, None


bidi_lstm_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def fits_pallas(B: int, T: int, t_chunk: int = 8, H: int = 100) -> bool:
    """Conservative check that the kernel's VMEM footprint is safe."""
    hp = _hp_for(H)
    # Weights + carries must fit beside the streamed blocks at chunk >= 1.
    fixed = (2 * hp) * (8 * hp) * 4 * 2 + 4 * (MAX_ROWS * 2 * hp * 4)
    return (B <= MAX_ROWS and T % _pick_chunk(T, t_chunk) == 0
            and fixed < 14 * 1024 * 1024
            and _bwd_trow_bytes(B, 2, 2, hp) <= _VMEM_BUDGET)
