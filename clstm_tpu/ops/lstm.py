"""Batched LSTM cell: the TPU-native NPLSTM.

Reference: ``GenericNPLSTM<>`` / ``NPLSTM`` in clstm.cc (≈L600-800) with its
per-timestep kernels in clstm_compute.cc (≈L1-450) — forward_stack1 builds
the source vector [1; x_t; h_{t-1}], four matmuls against WGI/WGF/WGO/WCI
(each shaped (nhidden, 1+ninput+nhidden), bias folded in as column 0) produce
the gates, then statemem (c_t = gf⊙c_{t-1} + gi⊙ci) and nonlingate
(h_t = tanh(c_t)⊙go). All citations approximate/unverified (empty mount;
SURVEY.md §0).

TPU-first redesign (not a translation):

* The four per-gate matrices are **fused** into two matrices split by data
  dependence: ``Wx [D, 4H]`` (input half) and ``Wh [H, 4H]`` (recurrent
  half), plus bias ``b [4H]``. Gate order along the 4H axis is
  ``(gi, gf, go, ci)`` — the reference's weight-name order — so the proto
  converter (io/proto.py) can map slices to WGI/WGF/WGO/WCI exactly.
* The input projection ``x @ Wx`` has no time dependence, so it is hoisted
  out of the recurrence into ONE [B*T, D]x[D, 4H] matmul — large, batched,
  MXU-shaped — instead of T small matvecs.
* The recurrence is a single ``lax.scan`` over time carrying (h, c); only
  the [B, H]x[H, 4H] recurrent matmul and the elementwise gate math live
  inside the loop. XLA fuses the gate nonlinearities into the matmul
  epilogue; a fused Pallas cell (ops/pallas_lstm.py) replaces the scan body
  on TPU for the hot path.
* Right-padding is handled with a per-step validity mask: padded steps emit
  zeros and carry (h, c) through unchanged.

Equivalence to the reference weight layout:
  WGI = concat([b[0:H, None], Wx[:, 0:H].T, Wh[:, 0:H].T], axis=1), etc.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from clstm_tpu.ops.seq import flip_within_length

GATE_ORDER = ("GI", "GF", "GO", "CI")


def lstm_init(key: jax.Array, ninput: int, nhidden: int, *, scale: float = 0.01,
              dtype=jnp.float32) -> dict:
    """Initialize fused LSTM parameters.

    Reference init is uniform in [-scale, scale] over the whole
    (nhidden, 1+ninput+nhidden) matrix (clstm.cc weight init, ≈L600-800,
    unverified; attr ``initial`` / rinit "unif").
    """
    kx, kh, kb = jax.random.split(key, 3)
    return {
        "Wx": jax.random.uniform(kx, (ninput, 4 * nhidden), dtype, -scale, scale),
        "Wh": jax.random.uniform(kh, (nhidden, 4 * nhidden), dtype, -scale, scale),
        "b": jax.random.uniform(kb, (4 * nhidden,), dtype, -scale, scale),
    }


def lstm_apply(params: dict, x: jax.Array, lengths: Optional[jax.Array] = None,
               *, compute_dtype=None, unroll: int = 1) -> jax.Array:
    """Run the LSTM over a right-padded batch.

    Args:
      params: {"Wx": [D, 4H], "Wh": [H, 4H], "b": [4H]}.
      x: [B, T, D] right-padded inputs.
      lengths: [B] true lengths, or None for fully-dense batches.
      compute_dtype: optional dtype (e.g. bfloat16) for the matmuls; params
        are cast per-use, accumulation stays float32 via
        preferred_element_type.
      unroll: lax.scan unroll factor.

    Returns: h sequence [B, T, H] (padded steps are exactly zero).
    """
    Wx, Wh, b = params["Wx"], params["Wh"], params["b"]
    B, T, D = x.shape
    H = Wh.shape[0]
    cd = compute_dtype or x.dtype

    # Hoisted input projection: one big MXU matmul over all timesteps.
    xz = jax.lax.dot_general(
        x.astype(cd), Wx.astype(cd),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)                      # [B, T, 4H] f32
    xz = jnp.transpose(xz, (1, 0, 2))              # time-major for scan

    if lengths is not None:
        valid = (jnp.arange(T)[:, None] < lengths[None, :])[..., None]  # [T, B, 1]
    else:
        valid = jnp.ones((T, 1, 1), dtype=bool)

    Wh_c = Wh.astype(cd)

    def step(carry, inp):
        h, c = carry
        zx_t, valid_t = inp
        z = zx_t + jnp.dot(h.astype(cd), Wh_c, preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(z[:, 0 * H:1 * H])
        gf = jax.nn.sigmoid(z[:, 1 * H:2 * H])
        go = jax.nn.sigmoid(z[:, 2 * H:3 * H])
        ci = jnp.tanh(z[:, 3 * H:4 * H])
        c_new = gf * c + gi * ci                   # reference forward_statemem
        h_new = jnp.tanh(c_new) * go               # reference forward_nonlingate
        c_next = jnp.where(valid_t, c_new, c)
        h_next = jnp.where(valid_t, h_new, h)
        h_out = jnp.where(valid_t, h_new, jnp.zeros_like(h_new))
        return (h_next, c_next), h_out

    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    _, hs = jax.lax.scan(step, (h0, c0), (xz, valid), unroll=unroll)
    return jnp.transpose(hs, (1, 0, 2)).astype(x.dtype)  # [B, T, H]


def bidi_lstm_apply(params_f: dict, params_r: dict, x: jax.Array,
                    lengths: Optional[jax.Array] = None, *,
                    compute_dtype=None, unroll: int = 1) -> jax.Array:
    """Fused bidirectional LSTM: both directions in ONE lax.scan.

    Semantically identical to
      concat([lstm_apply(params_f, x), flip(lstm_apply(params_r, flip(x)))])
    — the reference's Parallel(NPLSTM, Reversed(NPLSTM)) (clstm_prefab.cc
    "bidi") — but with the two recurrences stacked on a leading group axis
    so the sequential dependency chain is T steps instead of 2T. The
    recurrence is latency-bound at CLSTM sizes (the per-step matmul is tiny
    for the MXU), so halving the chain ≈ halves wall-clock (BASELINE.md
    round-1 observations).

    Returns [B, T, 2H]: forward features then backward features, matching
    the reference Parallel concat order.
    """
    B, T, D = x.shape
    H = params_f["Wh"].shape[0]
    cd = compute_dtype or x.dtype
    xr = flip_within_length(x, lengths)

    # Input projections for both streams in one einsum: [2, B, T, 4H].
    Wx2 = jnp.stack([params_f["Wx"], params_r["Wx"]]).astype(cd)   # [2, D, 4H]
    b2 = jnp.stack([params_f["b"], params_r["b"]]).astype(jnp.float32)
    x2 = jnp.stack([x, xr]).astype(cd)                             # [2, B, T, D]
    xz = jnp.einsum("gbtd,gdo->gbto", x2, Wx2,
                    preferred_element_type=jnp.float32) + b2[:, None, None, :]
    xz = jnp.transpose(xz, (2, 0, 1, 3))                           # [T, 2, B, 4H]

    if lengths is not None:
        valid = (jnp.arange(T)[:, None] < lengths[None, :])[:, None, :, None]
    else:
        valid = jnp.ones((T, 1, 1, 1), dtype=bool)

    Wh2 = jnp.stack([params_f["Wh"], params_r["Wh"]]).astype(cd)   # [2, H, 4H]

    def step(carry, inp):
        h, c = carry                                               # [2, B, H]
        zx_t, valid_t = inp
        z = zx_t + jnp.einsum("gbh,gho->gbo", h.astype(cd), Wh2,
                              preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(z[..., 0 * H:1 * H])
        gf = jax.nn.sigmoid(z[..., 1 * H:2 * H])
        go = jax.nn.sigmoid(z[..., 2 * H:3 * H])
        ci = jnp.tanh(z[..., 3 * H:4 * H])
        c_new = gf * c + gi * ci
        h_new = jnp.tanh(c_new) * go
        c_next = jnp.where(valid_t, c_new, c)
        h_next = jnp.where(valid_t, h_new, h)
        h_out = jnp.where(valid_t, h_new, jnp.zeros_like(h_new))
        return (h_next, c_next), h_out

    h0 = jnp.zeros((2, B, H), jnp.float32)
    c0 = jnp.zeros((2, B, H), jnp.float32)
    _, hs = jax.lax.scan(step, (h0, c0), (xz, valid), unroll=unroll)
    yf = jnp.transpose(hs[:, 0], (1, 0, 2))                        # [B, T, H]
    yr = flip_within_length(jnp.transpose(hs[:, 1], (1, 0, 2)), lengths)
    return jnp.concatenate([yf, yr], axis=-1).astype(x.dtype)
