"""Cumulative in-one-jit decomposition of the CTC alignment block.

Standalone per-stage jits are enqueue-bound on the tunneled chip (~2ms
RPC floor hides every stage under ~2ms — see profile_ctc.py numbers), so
this measures CUMULATIVE prefixes of the alignment pipeline, each as ONE
dispatch, pipelined over reps; successive deltas are true device times.

Usage: python benchmarks/profile_ctc_cum.py  (env prof_* as profile_ctc)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    reps = int(os.environ.get("prof_reps", 30))
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

    def p_norm(p):
        o = jnp.maximum(p, LO)
        return o / jnp.sum(o, 2, keepdims=True)

    def p_lmatch(p):
        out = p_norm(p)
        onehot = jax.nn.one_hot(target_ids, C, dtype=f32) * svalid[:, :, None]
        prod = jnp.einsum("btc,bsc->bts", out, onehot,
                          preferred_element_type=f32, precision=HI)
        lm = jnp.log(jnp.maximum(prod, 1e-30))
        return jnp.where(svalid[:, None, :], lm, NEG), onehot

    def p_fwd(p):
        lm, oh = p_lmatch(p)
        return ctc_forward_pallas(lm, lengths, skip=SKIP), lm, oh

    def p_both(p):
        lr, lm, oh = p_fwd(p)
        both, lse = ctc_both_pallas(lm, lr, lengths, tlens, skip=SKIP)
        return both, lse, oh

    def p_full(p):
        both, lse, oh = p_both(p)
        epath = jnp.where(both > 0.5 * NEG, jnp.exp(both - lse[:, None, :]), 0.0)
        a = jnp.einsum("bts,bsc->btc", epath, oh, precision=HI)
        a = jnp.maximum(a, LO)
        return a / jnp.sum(a, 2, keepdims=True)

    stages = [("norm", p_norm), ("+lmatch", p_lmatch), ("+fwd", p_fwd),
              ("+both", p_both), ("+epath+aligned(full)", p_full)]
    prev = 0.0
    for name, fn in stages:
        j = jax.jit(fn)
        ms = timeit(j, reps, probs)
        print(f"{name:22s} {ms:8.3f}  (delta {ms - prev:+7.3f})")
        prev = ms


if __name__ == "__main__":
    main()
