"""Loop-in-jit A/B attribution of the CTC alignment block's device time.

The alignment maps probs [B,T,C] -> aligned [B,T,C] (shape-preserving),
so an 8-deep dependent fori_loop of the whole block runs in ONE dispatch
with 8x the device work — enqueue floor and timing noise are amortized
away (profile_ctc_cum.py shows the tunnel's ~2ms RPC floor swallows any
stage under ~2ms). Variants knock out one stage at a time; the delta vs
"full" is that stage's true device cost.

Usage: python benchmarks/profile_ctc_loop.py  (env prof_* as profile_ctc)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOOP = 8


def timeit(fn, reps, *args):
    import jax
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return (time.time() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from clstm_tpu.ops.ctc import LO, NEG, SKIP, mktargets_ids
    from clstm_tpu.ops.pallas_ctc import ctc_both_pallas, ctc_forward_pallas

    B = int(os.environ.get("prof_batch", 256))
    T = int(os.environ.get("prof_T", 1024))
    C = int(os.environ.get("prof_nclasses", 96))
    nchars = int(os.environ.get("prof_nchars", 40))
    reps = int(os.environ.get("prof_reps", 10))
    f32 = jnp.float32
    HI = jax.lax.Precision.HIGHEST

    rng = np.random.RandomState(0)
    S = 2 * nchars + 1
    Sp = -(-S // 128) * 128
    tids = np.zeros((B, Sp), np.int32)
    for b in range(B):
        tids[b, :S] = mktargets_ids(rng.randint(1, C, size=nchars))
    probs = jnp.asarray(rng.dirichlet(np.ones(C), size=(B, T)).astype(np.float32))
    target_ids = jnp.asarray(tids)
    lengths = jnp.full((B,), 900, jnp.int32)
    tlens = jnp.full((B,), S, jnp.int32)
    svalid = (jnp.arange(Sp)[None, :] < tlens[:, None])

    def block(p, *, do_norm=True, do_lmatch=True, do_fwd=True, do_both=True,
              do_aligned=True, hi=True):
        prec = HI if hi else None
        if do_norm:
            o = jnp.maximum(p, LO)
            out = o / jnp.sum(o, 2, keepdims=True)
        else:
            out = p
        onehot = jax.nn.one_hot(target_ids, C, dtype=f32) * svalid[:, :, None]
        if do_lmatch:
            prod = jnp.einsum("btc,bsc->bts", out, onehot,
                              preferred_element_type=f32, precision=prec)
            lm = jnp.log(jnp.maximum(prod, 1e-30))
            lm = jnp.where(svalid[:, None, :], lm, NEG)
        else:
            # stand-in of the right shape, trivially derived from out
            lm = jnp.broadcast_to(
                jnp.log(jnp.maximum(out[:, :, :1], 1e-30)), (B, T, Sp))
            lm = jnp.where(svalid[:, None, :], lm, NEG)
        if do_fwd:
            lr = ctc_forward_pallas(lm, lengths, skip=SKIP)
        else:
            lr = lm
        if do_both:
            both, lse = ctc_both_pallas(lm, lr, lengths, tlens, skip=SKIP)
        else:
            both = lr
            lse = jnp.max(both, axis=1)
        epath = jnp.where(both > 0.5 * NEG, jnp.exp(both - lse[:, None, :]), 0.0)
        if do_aligned:
            a = jnp.einsum("bts,bsc->btc", epath, onehot, precision=prec)
        else:
            a = jnp.broadcast_to(jnp.sum(epath, 2, keepdims=True), (B, T, C))
        a = jnp.maximum(a, LO)
        return a / jnp.sum(a, 2, keepdims=True)

    def looped(**kw):
        def f(p):
            return jax.lax.fori_loop(
                0, LOOP, lambda i, q: block(q, **kw), p)
        return jax.jit(f)

    full = timeit(looped(), reps, probs)
    print(f"full_x{LOOP}            {full:8.3f}  per-iter {full / LOOP:6.3f}")
    for name, kw in [("no_norm", dict(do_norm=False)),
                     ("no_lmatch", dict(do_lmatch=False)),
                     ("no_fwd", dict(do_fwd=False)),
                     ("no_both", dict(do_both=False)),
                     ("no_aligned", dict(do_aligned=False)),
                     ("default_prec", dict(hi=False))]:
        ms = timeit(looped(**kw), reps, probs)
        print(f"{name:18s} {ms:8.3f}  per-iter {ms / LOOP:6.3f}  "
              f"stage_cost {(full - ms) / LOOP:+6.3f}")


if __name__ == "__main__":
    main()
