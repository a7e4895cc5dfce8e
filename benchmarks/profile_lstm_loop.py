"""Loop-in-jit timing of the fused bidi LSTM kernels on the real chip.

Same method as profile_ctc_loop.py: K dependent iterations inside ONE
dispatch (param-feedback for fwd+bwd, tiny-perturbation feedback for
fwd-only), so the tunnel's ~2ms per-dispatch RPC floor and weather are
amortized away. This is the A/B harness behind the round-4 kernel
decisions (split per-direction matmuls kept; per-direction state-stream
split REVERTED at 8.87 vs 7.95 ms/iter; with_state=False inference mode
kept at 2.4 vs 5.5 ms fwd-only).

Usage: python benchmarks/profile_lstm_loop.py
Env: prof_batch=256 prof_T=1024 prof_nhidden=100 prof_D=48 prof_K=8
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from clstm_tpu.ops.lstm import lstm_init
    from clstm_tpu.ops.pallas_lstm import bidi_lstm_pallas

    B = int(os.environ.get("prof_batch", 256))
    T = int(os.environ.get("prof_T", 1024))
    H = int(os.environ.get("prof_nhidden", 100))
    D = int(os.environ.get("prof_D", 48))
    K = int(os.environ.get("prof_K", 8))
    reps = int(os.environ.get("prof_reps", 6))

    pf = lstm_init(jax.random.PRNGKey(0), D, H, scale=0.3)
    pr = lstm_init(jax.random.PRNGKey(1), D, H, scale=0.3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T, D).astype(np.float32))
    lengths = jnp.full((B,), int(T * 0.9), jnp.int32)

    def timeit(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        return (time.time() - t0) / reps / K * 1e3

    def loss(pf_, pr_):
        y = bidi_lstm_pallas(pf_, pr_, x, lengths)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def body(i, c):
        pf_, pr_ = c
        gf, gr = jax.grad(loss, argnums=(0, 1))(pf_, pr_)
        upd = lambda p, g: jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
        return upd(pf_, gf), upd(pr_, gr)

    fb = jax.jit(lambda a, b: jax.lax.fori_loop(0, K, body, (a, b)))
    ms = timeit(fb, pf, pr)
    print(f"fwdbwd per-iter: {ms:.3f} ms  ({B / ms * 1e3:.0f} lines/s "
          "fwd+bwd only)")

    for ws in (True, False):
        def fwd_body(i, c, ws=ws):
            y = bidi_lstm_pallas(c[0], c[1], x, lengths, 8, False, True,
                                 True, ws)
            bump = 1e-20 * jnp.sum(y.astype(jnp.float32))
            return jax.tree.map(lambda a: a + bump, c[0]), c[1]

        f1 = jax.jit(lambda a, b, ws=ws: jax.lax.fori_loop(
            0, K, fwd_body, (a, b)))
        print(f"fwd-only with_state={ws}: {timeit(f1, pf, pr):.3f} ms/iter")


if __name__ == "__main__":
    main()
