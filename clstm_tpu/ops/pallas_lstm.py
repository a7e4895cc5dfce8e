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
c = gf*0 = 0). Frame validity is (length > t) against a lane-broadcast
lengths array (a [B] column load does not lower on Mosaic).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clstm_tpu.ops.seq import flip_within_length

HP = 128           # padded per-direction hidden size (lane width)
GH = 2 * HP        # combined state width (both directions)
MAX_ROWS = 512     # fall back to the scan path above this batch size


# ---------------------------------------------------------------------------
# Layout helpers (all plain XLA, outside the kernels)
# ---------------------------------------------------------------------------

def _pad_gates(W, H: int, in_dim: int, in_pad: int):
    """[in_dim, 4H] -> [in_pad, 4Hp] with each gate block padded to Hp."""
    out = jnp.zeros((in_pad, 4 * HP), jnp.float32)
    for g in range(4):
        out = out.at[:in_dim, g * HP:g * HP + H].set(
            W[:, g * H:(g + 1) * H].astype(jnp.float32))
    return out


def _gate_major(xz4):
    """[..., 2, 4*Hp] per-group gate blocks -> [..., 8*Hp] gate-major
    (k-major, group-minor): columns [k*2Hp + g*Hp : k*2Hp + (g+1)*Hp]."""
    lead = xz4.shape[:-2]
    a = xz4.reshape(lead + (2, 4, HP))
    a = jnp.swapaxes(a, -3, -2)              # [..., 4, 2, HP]
    return a.reshape(lead + (4 * GH,))


def _from_gate_major(z):
    """[..., 8*Hp] gate-major -> [..., 2, 4*Hp] per-group layout."""
    lead = z.shape[:-1]
    a = z.reshape(lead + (4, 2, HP))
    a = jnp.swapaxes(a, -3, -2)              # [..., 2, 4, HP]
    return a.reshape(lead + (2, 4 * HP))


def _make_wbd(params_f: dict, params_r: dict, H: int):
    """Block-diagonal gate-major recurrent weights [2Hp, 8Hp]."""
    rows = []
    for g, p in ((0, params_f), (1, params_r)):
        Whp = _pad_gates(p["Wh"], H, H, HP)          # [Hp, 4Hp]
        block = jnp.zeros((HP, 4, 2, HP), jnp.float32)
        block = block.at[:, :, g, :].set(Whp.reshape(HP, 4, HP))
        rows.append(block.reshape(HP, 4 * GH))
    return jnp.concatenate(rows, axis=0)              # [2Hp, 8Hp]


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(xz_ref, len_ref, wbd_ref, h_seq_ref, c_seq_ref,
                h_ref, c_ref, *, t_chunk: int):
    """xz_ref [Tc,B,8Hp] (bf16, gate-major, bias folded), len_ref [B,2Hp],
    wbd_ref [2Hp,8Hp]; outputs h_seq/c_seq [Tc,B,2Hp] (carries); scratch
    h/c [B,2Hp]."""
    tc = pl.program_id(0)

    @pl.when(tc == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    def body(r, _):
        i = (tc * t_chunk + r).astype(jnp.float32)
        m = (len_ref[:, :] > i).astype(jnp.float32)          # [B,2Hp]
        z = xz_ref[r].astype(jnp.float32) + jnp.dot(
            h_ref[:, :], wbd_ref[:, :], preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(z[:, 0 * GH:1 * GH])
        gf = jax.nn.sigmoid(z[:, 1 * GH:2 * GH])
        go = jax.nn.sigmoid(z[:, 2 * GH:3 * GH])
        ci = jnp.tanh(z[:, 3 * GH:4 * GH])
        c_new = gf * c_ref[:, :] + gi * ci
        h_new = jnp.tanh(c_new) * go
        c_next = m * c_new + (1.0 - m) * c_ref[:, :]
        h_next = m * h_new + (1.0 - m) * h_ref[:, :]
        c_ref[:, :] = c_next
        h_ref[:, :] = h_next
        h_seq_ref[r] = h_next
        c_seq_ref[r] = c_next
        return _

    jax.lax.fori_loop(0, t_chunk, body, None)


def _bwd_kernel(xz_ref, len_ref, hprev_ref, cprev_ref, cseq_ref, g_ref,
                wbd_ref, wbdt_ref, dz_ref, Dh_ref, Dc_ref, *, t_chunk: int):
    """Reverse-grid step emitting dz [Tc,B,8Hp] (bf16). Carries Dh/Dc
    [B,2Hp] in scratch; gates recomputed from hprev/cprev."""
    tc = pl.program_id(0)
    nT = pl.num_programs(0)

    @pl.when(tc == 0)
    def _init():
        Dh_ref[...] = jnp.zeros_like(Dh_ref)
        Dc_ref[...] = jnp.zeros_like(Dc_ref)

    def body(rr, _):
        r = t_chunk - 1 - rr
        i = ((nT - 1 - tc) * t_chunk + r).astype(jnp.float32)
        m = (len_ref[:, :] > i).astype(jnp.float32)
        h_prev = hprev_ref[r]
        c_prev = cprev_ref[r]
        z = xz_ref[r].astype(jnp.float32) + jnp.dot(
            h_prev, wbd_ref[:, :], preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(z[:, 0 * GH:1 * GH])
        gf = jax.nn.sigmoid(z[:, 1 * GH:2 * GH])
        go = jax.nn.sigmoid(z[:, 2 * GH:3 * GH])
        ci = jnp.tanh(z[:, 3 * GH:4 * GH])
        tc_new = jnp.tanh(cseq_ref[r])

        dh_new = m * (g_ref[r] + Dh_ref[:, :])
        dc_new = m * Dc_ref[:, :] + dh_new * go * (1.0 - tc_new * tc_new)
        dgo = dh_new * tc_new * go * (1.0 - go)
        dgf = dc_new * c_prev * gf * (1.0 - gf)
        dgi = dc_new * ci * gi * (1.0 - gi)
        dci = dc_new * gi * (1.0 - ci * ci)
        dz = jnp.concatenate([dgi, dgf, dgo, dci], axis=1)   # [B,8Hp]

        Dh_ref[:, :] = (1.0 - m) * Dh_ref[:, :] + jnp.dot(
            dz, wbdt_ref[:, :], preferred_element_type=jnp.float32)
        Dc_ref[:, :] = (1.0 - m) * Dc_ref[:, :] + dc_new * gf
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


def _fwd_trow_bytes(B: int, xz_bytes: int) -> int:
    # xz block + 2 f32 output blocks, all double-buffered.
    return 2 * (B * 4 * GH * xz_bytes) + 2 * 2 * (B * GH * 4)


def _bwd_trow_bytes(B: int, xz_bytes: int, dz_bytes: int) -> int:
    # xz + 4 f32 inputs (hprev/cprev/cseq/g) + dz output, double-buffered.
    return 2 * (B * 4 * GH * xz_bytes) + 2 * 4 * (B * GH * 4) \
        + 2 * (B * 4 * GH * dz_bytes)


def _call_fwd(xz, len_bc, wbd, *, t_chunk, interpret):
    T, B, _ = xz.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_chunk=t_chunk),
        grid=(T // t_chunk,),
        in_specs=[
            pl.BlockSpec((t_chunk, B, 4 * GH), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, GH), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GH, 4 * GH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk, B, GH), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, GH), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, GH), jnp.float32),
            jax.ShapeDtypeStruct((T, B, GH), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, GH), jnp.float32),
            pltpu.VMEM((B, GH), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xz, len_bc, wbd)


def _call_bwd(xz, len_bc, hprev, cprev, cseq, gseq, wbd, wbdt,
              *, t_chunk, interpret, dz_dtype=jnp.bfloat16):
    T, B, _ = xz.shape
    nT = T // t_chunk
    rev = lambda t: (nT - 1 - t, 0, 0)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, t_chunk=t_chunk),
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((t_chunk, B, 4 * GH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, GH), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, GH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, GH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, GH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, GH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((GH, 4 * GH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * GH, GH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_chunk, B, 4 * GH), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, 4 * GH), dz_dtype),
        scratch_shapes=[
            pltpu.VMEM((B, GH), jnp.float32),
            pltpu.VMEM((B, GH), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xz, len_bc, hprev, cprev, cseq, gseq, wbd, wbdt)


def _prep(params_f, params_r, x, lengths, xz_dtype):
    B, T, D = x.shape
    H = params_f["Wh"].shape[0]
    xr = flip_within_length(x, lengths)
    x2 = jnp.stack([x, xr], axis=1).astype(jnp.float32)      # [B,2,T,D]
    x2 = jnp.transpose(x2, (2, 1, 0, 3))                     # [T,2,B,D]
    # Input projections, per group, padded to gate blocks + bias, then
    # gate-major combined: [T,B,8Hp], streamed bf16.
    xz_g = []
    for g, p in ((0, params_f), (1, params_r)):
        Wxp = _pad_gates(p["Wx"], H, D, D)                   # [D,4Hp]
        bp = _pad_gates(p["b"][None, :], H, 1, 1)[0]         # [4Hp]
        xz_g.append(jnp.einsum("tbd,do->tbo", x2[:, g], Wxp,
                               preferred_element_type=jnp.float32) + bp)
    xz4 = jnp.stack(xz_g, axis=2)                            # [T,B,2,4Hp]
    xz = _gate_major(xz4).astype(xz_dtype)                   # [T,B,8Hp]

    lens = jnp.full((B,), T, jnp.int32) if lengths is None else lengths
    len_bc = jnp.broadcast_to(lens.astype(jnp.float32)[:, None], (B, GH))
    wbd = _make_wbd(params_f, params_r, H)
    return x2, xz, len_bc, wbd, lens, H


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
    x2, xz, len_bc, wbd, lens, H = _prep(
        params_f, params_r, x, lengths,
        jnp.bfloat16 if xz_bf16 else jnp.float32)
    tc = _auto_chunk(T, B, _fwd_trow_bytes(B, 2 if xz_bf16 else 4), t_chunk)
    h_seq, c_seq = _call_fwd(xz, len_bc, wbd, t_chunk=tc, interpret=interpret)
    mask = (jnp.arange(T)[:, None] < lens[None, :]).astype(jnp.float32)
    hm = h_seq * mask[:, :, None]
    y_f = jnp.transpose(hm[:, :, :H], (1, 0, 2))             # [B,T,H]
    y_r = flip_within_length(
        jnp.transpose(hm[:, :, HP:HP + H], (1, 0, 2)), lengths)
    y = jnp.concatenate([y_f, y_r], axis=-1).astype(x.dtype)
    res = (params_f, params_r, x, lengths, x2, xz, len_bc, wbd,
           h_seq, c_seq, H)
    return y, res


def _vjp_fwd(params_f, params_r, x, lengths, t_chunk, interpret, xz_bf16):
    return _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret,
                     xz_bf16)


def _vjp_bwd(t_chunk, interpret, xz_bf16, res, gy):
    (params_f, params_r, x, lengths, x2, xz, len_bc, wbd,
     h_seq, c_seq, H) = res
    B, T, D = x.shape
    gy = gy.astype(jnp.float32)
    # Cotangents of the stored carries in the combined [T,B,2Hp] layout.
    g_f = jnp.transpose(gy[..., :H], (1, 0, 2))
    g_r = jnp.transpose(flip_within_length(gy[..., H:], lengths), (1, 0, 2))
    gseq = jnp.zeros((T, B, GH), jnp.float32)
    gseq = gseq.at[:, :, :H].set(g_f).at[:, :, HP:HP + H].set(g_r)
    # The y = mask*h_seq mask multiplies in-kernel via m; apply here too so
    # padded-frame cotangents vanish identically.
    lens = jnp.full((B,), T, jnp.int32) if lengths is None else lengths
    mask = (jnp.arange(T)[:, None] < lens[None, :]).astype(jnp.float32)
    gseq = gseq * mask[:, :, None]

    zero = jnp.zeros((1, B, GH), jnp.float32)
    hprev = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    cprev = jnp.concatenate([zero, c_seq[:-1]], axis=0)
    nb = 2 if xz_bf16 else 4
    tc = _auto_chunk(T, B, _bwd_trow_bytes(B, nb, nb), t_chunk)
    dz = _call_bwd(xz, len_bc, hprev, cprev, c_seq, gseq, wbd,
                   jnp.swapaxes(wbd, 0, 1), t_chunk=tc, interpret=interpret,
                   dz_dtype=jnp.bfloat16 if xz_bf16 else jnp.float32)

    dz4 = _from_gate_major(dz.astype(jnp.float32))           # [T,B,2,4Hp]
    grads = []
    dxs = []
    for g, p in ((0, params_f), (1, params_r)):
        dz_g = dz4[:, :, g]                                  # [T,B,4Hp]
        Wxp = _pad_gates(p["Wx"], H, D, D)
        # Large parallel contractions on the MXU (outside the kernel).
        dWx_p = jnp.einsum("tbd,tbo->do", x2[:, g], dz_g,
                           preferred_element_type=jnp.float32)
        dWh_p = jnp.einsum("tbh,tbo->ho", hprev[:, :, g * HP:(g + 1) * HP],
                           dz_g, preferred_element_type=jnp.float32)
        db_p = jnp.sum(dz_g, axis=(0, 1))
        dx_g = jnp.einsum("tbo,do->tbd", dz_g, Wxp,
                          preferred_element_type=jnp.float32)
        dxs.append(dx_g)
        dWx = jnp.concatenate(
            [dWx_p[:, k * HP:k * HP + H] for k in range(4)], axis=1)
        dWh = jnp.concatenate(
            [dWh_p[:H, k * HP:k * HP + H] for k in range(4)], axis=1)
        db = jnp.concatenate([db_p[k * HP:k * HP + H] for k in range(4)])
        grads.append({"Wx": dWx.astype(p["Wx"].dtype),
                      "Wh": dWh.astype(p["Wh"].dtype),
                      "b": db.astype(p["b"].dtype)})

    dx_f = jnp.transpose(dxs[0], (1, 0, 2))                  # [B,T,D]
    dx_r = flip_within_length(jnp.transpose(dxs[1], (1, 0, 2)), lengths)
    dx = (dx_f + dx_r).astype(x.dtype)
    return grads[0], grads[1], dx, None


bidi_lstm_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def fits_pallas(B: int, T: int, t_chunk: int = 8) -> bool:
    """Conservative check that the kernel's VMEM footprint is safe."""
    return B <= MAX_ROWS and T % _pick_chunk(T, t_chunk) == 0
