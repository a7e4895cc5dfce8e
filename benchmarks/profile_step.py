"""Component-level timing of the train step on the real chip.

Prints per-component times (ms) for the UW3 bench profile so perf work
targets the real bottleneck. Usage: python benchmarks/profile_step.py
Env: prof_batch=256 prof_T=1024 prof_net=bidi prof_nhidden=100
     prof_nclasses=96 prof_reps=10
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps, *args):
    out = fn(*args)
    jax_block(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.time() - t0) / reps * 1e3


def jax_block(out):
    import jax
    # host transfer sync: on the tunneled axon backend block_until_ready can
    # return early (see bench.py), so pull one scalar.
    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[0] if hasattr(leaves[0], "ravel") else leaves[0]))


def main():
    import jax
    import jax.numpy as jnp
    from clstm_tpu.models.prefab import make_net_init
    from clstm_tpu.models.spec import apply_net
    from clstm_tpu.ops.ctc import ctc_align_targets_batched, mktargets_ids
    from clstm_tpu.ops.pallas_lstm import bidi_lstm_pallas
    from clstm_tpu.train import TrainState, make_train_step

    B = int(os.environ.get("prof_batch", 256))
    T = int(os.environ.get("prof_T", 1024))
    net = os.environ.get("prof_net", "bidi")
    nhidden = int(os.environ.get("prof_nhidden", 100))
    nclasses = int(os.environ.get("prof_nclasses", 96))
    reps = int(os.environ.get("prof_reps", 10))
    height, nchars = 48, 40

    spec, params = make_net_init(
        net, {"ninput": height, "nhidden": nhidden, "noutput": nclasses},
        jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    S = 2 * nchars + 1
    tids = np.zeros((B, S), np.int32)
    for b in range(B):
        tids[b] = mktargets_ids(rng.randint(1, nclasses, size=nchars))
    x = jnp.asarray(rng.rand(B, T, height).astype(np.float32))
    lengths = jnp.full((B,), 900, jnp.int32)
    targets = jnp.asarray(tids)
    tlens = jnp.full((B,), S, jnp.int32)

    # Find the LSTM params inside the net tree for isolated cell timing.
    def find_lstm_pair(spec, params):
        # bidi prefab: Stacked(Parallel(LSTM, Reversed(LSTM)), Softmax)
        if net.startswith("bidi"):
            par = params["sub"][0]["sub"]
            pf = par[0]["weights"]
            pr = par[1]["sub"][0]["weights"]
            return pf, pr
        return None

    pair = find_lstm_pair(spec, params)
    if pair is not None:
        pf, pr = pair
        fwd = jax.jit(lambda pf, pr, x, l: bidi_lstm_pallas(pf, pr, x, l))
        print(f"lstm_fwd_ms          {timeit(fwd, reps, pf, pr, x, lengths):8.2f}")

        def fwdbwd(pf, pr, x, l):
            def f(pf, pr):
                y = bidi_lstm_pallas(pf, pr, x, l)
                return jnp.sum(y * y)
            return jax.grad(f, argnums=(0, 1))(pf, pr)
        fb = jax.jit(fwdbwd)
        print(f"lstm_fwdbwd_ms       {timeit(fb, reps, pf, pr, x, lengths):8.2f}")

    # Full net forward (probs)
    net_fwd = jax.jit(lambda p, x, l: apply_net(spec, p, x, l))
    probs = net_fwd(params, x, lengths)
    print(f"net_fwd_ms           {timeit(net_fwd, reps, params, x, lengths):8.2f}")

    # CTC alignment alone
    ctc = jax.jit(lambda p: ctc_align_targets_batched(
        p, targets, lengths=lengths, target_lengths=tlens))
    print(f"ctc_align_ms         {timeit(ctc, reps, probs):8.2f}")

    # Full train step
    state = TrainState.create(params)
    step = make_train_step(spec, lr=1e-4, momentum=0.9, loss_kind="ctc",
                           donate=False)
    batch = {"x": x, "lengths": lengths, "targets": targets,
             "target_lengths": tlens}
    st2, m = step(state, batch)
    jax_block(m["loss"])
    t0 = time.time()
    for _ in range(reps):
        st2, m = step(state, batch)
    jax_block(m["loss"])
    dt = (time.time() - t0) / reps * 1e3
    print(f"train_step_ms        {dt:8.2f}   ({B / dt * 1e3:.0f} lines/s)")


if __name__ == "__main__":
    main()
