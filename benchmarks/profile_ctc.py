"""Sub-stage timing of the CTC alignment block on the real chip.

The round-3 step profile put ctc_align_targets_batched at 4.5ms of a
13.6ms train step (33%) at the bench shape — this breaks that 4.5ms down
so the round-4 fusion work (VERDICT item 4) targets the real cost.
Standalone jits pay HBM round-trips between stages that the fused step
would not, so treat the numbers as an upper-bound decomposition.

Usage: python benchmarks/profile_ctc.py   (env: prof_batch/prof_T/...)
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
    leaves = jax.tree.leaves(out)
    np.asarray(leaves[0].ravel()[0])  # host-transfer sync (see bench.py)
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
    reps = int(os.environ.get("prof_reps", 20))
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

    norm = jax.jit(lambda p: (lambda o: o / jnp.sum(o, 2, keepdims=True))(
        jnp.maximum(p, LO)))
    out = norm(probs)
    print(f"norm_ms              {timeit(norm, reps, probs):8.3f}")

    mk_onehot = jax.jit(lambda ids: jax.nn.one_hot(ids, C, dtype=f32)
                        * svalid[:, :, None])
    onehot = mk_onehot(target_ids)
    print(f"onehot_ms            {timeit(mk_onehot, reps, target_ids):8.3f}")

    def lmatch_fn(out, onehot):
        prod = jnp.einsum("btc,bsc->bts", out, onehot,
                          preferred_element_type=f32, precision=HI)
        lm = jnp.log(jnp.maximum(prod, 1e-30))
        return jnp.where(svalid[:, None, :], lm, NEG)
    lmatch_j = jax.jit(lmatch_fn)
    lmatch = lmatch_j(out, onehot)
    print(f"lmatch_hi_ms         {timeit(lmatch_j, reps, out, onehot):8.3f}")

    # the einsum alone, and at default precision, to see what HIGHEST costs
    e_hi = jax.jit(lambda o, h: jnp.einsum("btc,bsc->bts", o, h,
                                           preferred_element_type=f32,
                                           precision=HI))
    print(f"  einsum_hi_ms       {timeit(e_hi, reps, out, onehot):8.3f}")
    e_def = jax.jit(lambda o, h: jnp.einsum("btc,bsc->bts", o, h,
                                            preferred_element_type=f32))
    print(f"  einsum_def_ms      {timeit(e_def, reps, out, onehot):8.3f}")

    fwd = jax.jit(lambda lm, l: ctc_forward_pallas(lm, l, skip=SKIP))
    lr = fwd(lmatch, lengths)
    print(f"fwd_kernel_ms        {timeit(fwd, reps, lmatch, lengths):8.3f}")

    both_j = jax.jit(lambda lm, lr, l, tl: ctc_both_pallas(lm, lr, l, tl,
                                                           skip=SKIP))
    both, lse = both_j(lmatch, lr, lengths, tlens)
    print(f"both_kernel_ms       {timeit(both_j, reps, lmatch, lr, lengths, tlens):8.3f}")

    ep = jax.jit(lambda b, l: jnp.where(b > 0.5 * NEG,
                                        jnp.exp(b - l[:, None, :]), 0.0))
    epath = ep(both, lse)
    print(f"epath_ms             {timeit(ep, reps, both, lse):8.3f}")

    def aligned_fn(epath, onehot):
        a = jnp.einsum("bts,bsc->btc", epath, onehot, precision=HI)
        a = jnp.maximum(a, LO)
        return a / jnp.sum(a, 2, keepdims=True)
    al = jax.jit(aligned_fn)
    print(f"aligned_hi_ms        {timeit(al, reps, epath, onehot):8.3f}")

    # fused epath-into-aligned variant: does XLA fuse exp into the dot?
    def aligned_fused(both, lse, onehot):
        epath = jnp.where(both > 0.5 * NEG,
                          jnp.exp(both - lse[:, None, :]), 0.0)
        a = jnp.einsum("bts,bsc->btc", epath, onehot, precision=HI)
        a = jnp.maximum(a, LO)
        return a / jnp.sum(a, 2, keepdims=True)
    alf = jax.jit(aligned_fused)
    print(f"epath+aligned_ms     {timeit(alf, reps, both, lse, onehot):8.3f}")

    # end-to-end alignment (the real fused jit, as the train step sees it)
    from clstm_tpu.ops.ctc import ctc_align_targets_batched
    full = jax.jit(lambda p: ctc_align_targets_batched(
        p, target_ids[:, :S], lengths=lengths, target_lengths=tlens))
    print(f"full_align_ms        {timeit(full, reps, probs):8.3f}")


if __name__ == "__main__":
    main()
