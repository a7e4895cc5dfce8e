"""Pallas TPU kernels for the fused bidirectional LSTM cell.

The lax.scan bidi cell (ops/lstm.py bidi_lstm_apply) pays XLA while-loop
and op-dispatch latency on every one of T iterations whose per-step work
([B,H]x[H,4H] matmul + gate VPU math) is tiny; measured ~19ms forward /
~44ms forward+backward at B=256, T=1024 on v5e (BASELINE.md round-1
profile). These kernels run the entire recurrence on-core: the (h, c)
carries live in VMEM scratch across a sequential T-chunk grid, the gate
weights stay resident in VMEM, and x/h sequences stream through the
pallas pipeline.

Reference semantics (NPLSTM, clstm.cc ≈L600-800, unverified): gates
(gi,gf,go) sigmoid, ci tanh, c' = gf*c + gi*ci, h' = tanh(c')*go — same
math as ops/lstm.py, verified equivalent in tests/test_pallas_lstm.py.

Layout: hidden dim padded to Hp (lane-aligned, 128); the fused gate axis
is [4*Hp] with gate g at columns [g*Hp, (g+1)*Hp). Padded h/c columns stay
exactly zero through the recurrence (zero weight columns -> ci = 0 ->
c = gf*0 = 0). Both directions ride a leading group axis of size 2 (the
second group sees time-flipped inputs, exactly like bidi_lstm_apply).

Backward is a custom VJP: gates are recomputed from the saved (h, c)
sequences (one extra matmul per step instead of 400MB of saved gate
activations), weight gradients accumulate directly in the output blocks
(constant index map = VMEM-resident accumulator).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clstm_tpu.ops.seq import flip_within_length

HP = 128          # padded hidden size (lane width)
MAX_ROWS = 512    # fall back to the scan path above this batch size


def _pad_params(params: dict, H: int, D: int):
    """Fused [D,4H]/[H,4H]/[4H] weights -> gate-aligned padded layout
    [D,4Hp]/[Hp,4Hp]/[4Hp]."""
    Wx, Wh, b = params["Wx"], params["Wh"], params["b"]
    Wx_p = jnp.zeros((D, 4 * HP), Wx.dtype)
    Wh_p = jnp.zeros((HP, 4 * HP), Wh.dtype)
    b_p = jnp.zeros((4 * HP,), b.dtype)
    for g in range(4):
        Wx_p = Wx_p.at[:, g * HP:g * HP + H].set(Wx[:, g * H:(g + 1) * H])
        Wh_p = Wh_p.at[:H, g * HP:g * HP + H].set(Wh[:, g * H:(g + 1) * H])
        b_p = b_p.at[g * HP:g * HP + H].set(b[g * H:(g + 1) * H])
    return Wx_p, Wh_p, b_p


def _unpad_wgrads(dWx_p, dWh_p, db_p, H: int, D: int):
    Wx = jnp.concatenate([dWx_p[:, g * HP:g * HP + H] for g in range(4)], 1)
    Wh = jnp.concatenate([dWh_p[:H, g * HP:g * HP + H] for g in range(4)], 1)
    b = jnp.concatenate([db_p[g * HP:g * HP + H] for g in range(4)])
    return Wx, Wh, b


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, len_ref, wx_ref, wh_ref, b_ref, h_seq_ref, c_seq_ref,
                h_ref, c_ref, *, t_chunk: int):
    """x_ref [Tc,2,B,D], len_ref [B,Hp] lane-broadcast lengths (a [B]
    column load does not lower on Mosaic; this layout matches the state
    arrays directly), weights [2,...], outputs h_seq/c_seq [Tc,2,B,Hp]
    (carry values h_t, c_t), scratch h/c [2,B,Hp]."""
    tc = pl.program_id(0)

    @pl.when(tc == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    def body(r, _):
        i = (tc * t_chunk + r).astype(jnp.float32)   # global frame index
        m = (len_ref[:, :] > i).astype(jnp.float32)  # [B,Hp]
        for g in range(2):
            z = (jnp.dot(x_ref[r, g], wx_ref[g],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h_ref[g], wh_ref[g],
                           preferred_element_type=jnp.float32)
                 + b_ref[g, :][None, :])
            gi = jax.nn.sigmoid(z[:, 0 * HP:1 * HP])
            gf = jax.nn.sigmoid(z[:, 1 * HP:2 * HP])
            go = jax.nn.sigmoid(z[:, 2 * HP:3 * HP])
            ci = jnp.tanh(z[:, 3 * HP:4 * HP])
            c_new = gf * c_ref[g] + gi * ci
            h_new = jnp.tanh(c_new) * go
            c_next = m * c_new + (1.0 - m) * c_ref[g]
            h_next = m * h_new + (1.0 - m) * h_ref[g]
            c_ref[g] = c_next
            h_ref[g] = h_next
            h_seq_ref[r, g] = h_next
            c_seq_ref[r, g] = c_next
        return _

    jax.lax.fori_loop(0, t_chunk, body, None)


# ---------------------------------------------------------------------------
# Backward kernel (reverse time order via reversed index maps)
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, len_ref, hprev_ref, cprev_ref, cseq_ref, g_ref,
                wx_ref, wh_ref, b_ref, wxt_ref, wht_ref,
                dx_ref, dwx_ref, dwh_ref, db_ref,
                Dh_ref, Dc_ref, *, t_chunk: int):
    """Reverse-mode step. Block refs (chunk tc counts back from the end):
    x [Tc,2,B,D], len_ref [B,Hp] lane-broadcast lengths, hprev/cprev/cseq/g
    (cotangent of h_seq) [Tc,2,B,Hp]; wxt [2,4Hp,D], wht [2,4Hp,Hp]
    pre-transposed weights; outputs dx [Tc,2,B,D] and weight-grad
    accumulators dwx [2,D,4Hp], dwh [2,Hp,4Hp], db [2,1,4Hp] (constant
    index maps = VMEM-resident); scratch carries Dh/Dc [2,B,Hp]."""
    tc = pl.program_id(0)
    nT = pl.num_programs(0)

    @pl.when(tc == 0)
    def _init():
        Dh_ref[...] = jnp.zeros_like(Dh_ref)
        Dc_ref[...] = jnp.zeros_like(Dc_ref)
        dwx_ref[...] = jnp.zeros_like(dwx_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    def body(rr, _):
        r = t_chunk - 1 - rr                          # reverse within chunk
        i = ((nT - 1 - tc) * t_chunk + r).astype(jnp.float32)
        m = (len_ref[:, :] > i).astype(jnp.float32)   # [B,Hp]
        for g in range(2):
            x_t = x_ref[r, g]
            h_prev = hprev_ref[r, g]
            c_prev = cprev_ref[r, g]
            # Recompute gates (cheaper than saving [T,2,B,4Hp] to HBM).
            z = (jnp.dot(x_t, wx_ref[g], preferred_element_type=jnp.float32)
                 + jnp.dot(h_prev, wh_ref[g],
                           preferred_element_type=jnp.float32)
                 + b_ref[g, :][None, :])
            gi = jax.nn.sigmoid(z[:, 0 * HP:1 * HP])
            gf = jax.nn.sigmoid(z[:, 1 * HP:2 * HP])
            go = jax.nn.sigmoid(z[:, 2 * HP:3 * HP])
            ci = jnp.tanh(z[:, 3 * HP:4 * HP])
            tc_new = jnp.tanh(cseq_ref[r, g])

            dh_new = m * (g_ref[r, g] + Dh_ref[g])
            dc_new = m * Dc_ref[g] + dh_new * go * (1.0 - tc_new * tc_new)
            dgo = dh_new * tc_new * go * (1.0 - go)
            dgf = dc_new * c_prev * gf * (1.0 - gf)
            dgi = dc_new * ci * gi * (1.0 - gi)
            dci = dc_new * gi * (1.0 - ci * ci)
            dz = jnp.concatenate([dgi, dgf, dgo, dci], axis=1)  # [B,4Hp]

            Dh_ref[g] = (1.0 - m) * Dh_ref[g] + jnp.dot(
                dz, wht_ref[g], preferred_element_type=jnp.float32)
            Dc_ref[g] = (1.0 - m) * Dc_ref[g] + dc_new * gf
            dx_ref[r, g] = jnp.dot(dz, wxt_ref[g],
                                   preferred_element_type=jnp.float32)
            dwx_ref[g] += jax.lax.dot_general(
                x_t, dz, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwh_ref[g] += jax.lax.dot_general(
                h_prev, dz, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db_ref[g, 0] += jnp.sum(dz, axis=0)
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


def _fwd_call(x2, len_bc, Wx2, Wh2, b2, *, t_chunk: int, interpret: bool):
    T, G, B, D = x2.shape
    nT = T // t_chunk
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_chunk=t_chunk),
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((t_chunk, 2, B, D), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, HP), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D, 4 * HP), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HP, 4 * HP), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * HP), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk, 2, B, HP), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, 2, B, HP), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 2, B, HP), jnp.float32),
            jax.ShapeDtypeStruct((T, 2, B, HP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, HP), jnp.float32),
            pltpu.VMEM((2, B, HP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, len_bc, Wx2, Wh2, b2)


def _bwd_call(x2, len_bc, hprev, cprev, cseq, gseq, Wx2, Wh2, b2, WxT2, WhT2,
              *, t_chunk: int, interpret: bool):
    T, G, B, D = x2.shape
    nT = T // t_chunk
    rev = lambda t: (nT - 1 - t, 0, 0, 0)
    const3 = lambda t: (0, 0, 0)
    dx, dwx, dwh, db = pl.pallas_call(
        functools.partial(_bwd_kernel, t_chunk=t_chunk),
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((t_chunk, 2, B, D), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, HP), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, 2, B, HP), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, 2, B, HP), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, 2, B, HP), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, 2, B, HP), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D, 4 * HP), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HP, 4 * HP), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * HP), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * HP, D), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * HP, HP), const3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk, 2, B, D), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D, 4 * HP), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HP, 4 * HP), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 4 * HP), const3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 2, B, D), jnp.float32),
            jax.ShapeDtypeStruct((2, D, 4 * HP), jnp.float32),
            jax.ShapeDtypeStruct((2, HP, 4 * HP), jnp.float32),
            jax.ShapeDtypeStruct((2, 1, 4 * HP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, HP), jnp.float32),
            pltpu.VMEM((2, B, HP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, len_bc, hprev, cprev, cseq, gseq, Wx2, Wh2, b2, WxT2, WhT2)
    return dx, dwx, dwh, db


# ---------------------------------------------------------------------------
# custom-VJP public op
# ---------------------------------------------------------------------------

def _prep(params_f, params_r, x, lengths):
    B, T, D = x.shape
    H = params_f["Wh"].shape[0]
    xr = flip_within_length(x, lengths)
    x2 = jnp.stack([x, xr], axis=1)                   # [B,2,T,D]
    x2 = jnp.transpose(x2, (2, 1, 0, 3)).astype(jnp.float32)  # [T,2,B,D]
    if lengths is None:
        lens = jnp.full((B,), T, jnp.int32)
    else:
        lens = lengths
    valid = (jnp.arange(T)[:, None] < lens[None, :]).astype(jnp.float32)
    len_bc = jnp.broadcast_to(lens.astype(jnp.float32)[:, None], (B, HP))
    Wf = _pad_params(params_f, H, D)
    Wr = _pad_params(params_r, H, D)
    Wx2 = jnp.stack([Wf[0], Wr[0]])
    Wh2 = jnp.stack([Wf[1], Wr[1]])
    b2 = jnp.stack([Wf[2], Wr[2]])
    return x2, valid, len_bc, Wx2, Wh2, b2, H


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bidi_lstm_pallas(params_f: dict, params_r: dict, x: jax.Array,
                     lengths: Optional[jax.Array], t_chunk: int = 8,
                     interpret: bool = False) -> jax.Array:
    """Fused bidi LSTM via Pallas; same contract as ops.lstm.bidi_lstm_apply:
    x [B,T,D] -> [B,T,2H] (forward features then backward features, padded
    frames zero)."""
    y, _ = _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret)
    return y


def _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret):
    B, T, D = x.shape
    x2, valid, len_bc, Wx2, Wh2, b2, H = _prep(params_f, params_r, x, lengths)
    tc = _pick_chunk(T, t_chunk)
    h_seq, c_seq = _fwd_call(x2, len_bc, Wx2, Wh2, b2, t_chunk=tc,
                             interpret=interpret)
    mask = valid[:, None, :, None]                     # [T,1,B,1]
    y_f = (h_seq[:, 0] * mask[:, 0])[:, :, :H]         # [T,B,H]
    y_r = (h_seq[:, 1] * mask[:, 0])[:, :, :H]
    y_f = jnp.transpose(y_f, (1, 0, 2))
    y_r = flip_within_length(jnp.transpose(y_r, (1, 0, 2)), lengths)
    y = jnp.concatenate([y_f, y_r], axis=-1).astype(x.dtype)
    res = (params_f, params_r, x, lengths, x2, valid, len_bc, h_seq, c_seq,
           Wx2, Wh2, b2, H)
    return y, res


def _vjp_fwd(params_f, params_r, x, lengths, t_chunk, interpret):
    return _fwd_impl(params_f, params_r, x, lengths, t_chunk, interpret)


def _vjp_bwd(t_chunk, interpret, res, gy):
    (params_f, params_r, x, lengths, x2, valid, len_bc, h_seq, c_seq,
     Wx2, Wh2, b2, H) = res
    B, T, D = x.shape
    gy = gy.astype(jnp.float32)
    # Cotangents of the *stored carries* h_seq: y was mask*h_seq sliced to
    # H and (for the reverse group) time-flipped.
    g_f = jnp.transpose(gy[..., :H], (1, 0, 2))        # [T,B,H]
    g_r = jnp.transpose(flip_within_length(gy[..., H:], lengths), (1, 0, 2))
    mask = valid[:, :, None]
    pad_cols = jnp.zeros((T, B, HP - H), jnp.float32)
    g_f = jnp.concatenate([g_f, pad_cols], -1) * mask
    g_r = jnp.concatenate([g_r, pad_cols], -1) * mask
    gseq = jnp.stack([g_f, g_r], axis=1)               # [T,2,B,Hp]

    zero = jnp.zeros((1, 2, B, HP), jnp.float32)
    hprev = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    cprev = jnp.concatenate([zero, c_seq[:-1]], axis=0)
    WxT2 = jnp.swapaxes(Wx2, 1, 2)
    WhT2 = jnp.swapaxes(Wh2, 1, 2)
    # The backward kernel streams 4 [Tc,2,B,Hp] blocks (hprev/cprev/cseq/g)
    # plus x and dx; half the forward chunk keeps it under the 16MB VMEM
    # scoped limit at B=256.
    tc = _pick_chunk(T, max(1, t_chunk // 2))
    dx2, dwx, dwh, db = _bwd_call(x2, len_bc, hprev, cprev, c_seq, gseq,
                                  Wx2, Wh2, b2, WxT2, WhT2,
                                  t_chunk=tc, interpret=interpret)
    # x2 = [x, flip(x)] -> dx = dx2[:,0] + flip(dx2[:,1])
    dx_f = jnp.transpose(dx2[:, 0], (1, 0, 2))         # [B,T,D]
    dx_r = flip_within_length(jnp.transpose(dx2[:, 1], (1, 0, 2)), lengths)
    dx = (dx_f + dx_r).astype(x.dtype)

    grads = []
    for g, params in ((0, params_f), (1, params_r)):
        gWx, gWh, gb = _unpad_wgrads(dwx[g], dwh[g], db[g, 0], H, D)
        grads.append({"Wx": gWx.astype(params["Wx"].dtype),
                      "Wh": gWh.astype(params["Wh"].dtype),
                      "b": gb.astype(params["b"].dtype)})
    return grads[0], grads[1], dx, None


bidi_lstm_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def fits_pallas(B: int, T: int, t_chunk: int = 8) -> bool:
    """Conservative check that the kernel's VMEM footprint is safe."""
    return B <= MAX_ROWS and T % _pick_chunk(T, t_chunk) == 0
