"""Batch-tile (bt) sweep of the fused bidi LSTM kernels on the real chip.

Round-5 question: the chain step is dot-LATENCY-bound at bt=256
(measured 2.73us/step for the two split recurrent dots vs ~0.34us of
pure MXU throughput), so a LARGER single grid tile could raise the
frames/s ceiling sublinearly in per-step cost — the round-1 "B=512
regression" that set MAX_B_TILE=256 was measured on the round-1 fused
block-diagonal kernel with precomputed HBM xz, not on the round-4 split
kernel whose per-row VMEM footprint is far smaller.

Method: loop-in-jit (K dependent iterations per dispatch, same as
profile_lstm_loop.py) over fwd+bwd and fwd-only at
  (B=256, tile 256)  - the production baseline
  (B=512, tile 256)  - two grid tiles (what MAX_B_TILE=256 does today)
  (B=512, tile 512)  - ONE grid tile (the experiment)
  (B=384, tile 384)  - intermediate single tile
Reports ms/iter and Mframes/s so the winner is directly comparable to
the 22M frames/s zero-waste ceiling (runs/r5/waste_ceiling.jsonl).

Usage: python benchmarks/r5_bt_sweep.py
Env: prof_T=1024 prof_nhidden=100 prof_D=48 prof_K=8 prof_reps=6
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from clstm_tpu.ops import pallas_lstm as pk
    from clstm_tpu.ops.lstm import lstm_init

    T = int(os.environ.get("prof_T", 1024))
    H = int(os.environ.get("prof_nhidden", 100))
    D = int(os.environ.get("prof_D", 48))
    K = int(os.environ.get("prof_K", 8))
    reps = int(os.environ.get("prof_reps", 6))

    pf = lstm_init(jax.random.PRNGKey(0), D, H, scale=0.3)
    pr = lstm_init(jax.random.PRNGKey(1), D, H, scale=0.3)
    rng = np.random.RandomState(0)

    def timeit(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        return (time.time() - t0) / reps / K * 1e3

    results = []
    for B, tile in ((256, 256), (512, 256), (512, 512), (384, 384)):
        pk.MAX_B_TILE = tile
        x = jnp.asarray(rng.rand(B, T, D).astype(np.float32))
        lengths = jnp.full((B,), int(T * 0.9), jnp.int32)

        def loss(pf_, pr_):
            y = pk.bidi_lstm_pallas(pf_, pr_, x, lengths)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def body(i, c):
            gf, gr = jax.grad(loss, argnums=(0, 1))(c[0], c[1])
            upd = lambda p, g: jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
            return upd(c[0], gf), upd(c[1], gr)

        def fwd_body(i, c):
            y = pk.bidi_lstm_pallas(c[0], c[1], x, lengths, 8, False, True,
                                    True, False)
            bump = 1e-20 * jnp.sum(y.astype(jnp.float32))
            return jax.tree.map(lambda a: a + bump, c[0]), c[1]

        row = {"B": B, "tile": tile}
        try:
            fb = jax.jit(lambda a, b: jax.lax.fori_loop(0, K, body, (a, b)))
            ms = timeit(fb, pf, pr)
            row["fwdbwd_ms"] = round(ms, 3)
            row["fwdbwd_mframes_s"] = round(B * T / ms / 1e3, 2)
            f1 = jax.jit(lambda a, b: jax.lax.fori_loop(
                0, K, fwd_body, (a, b)))
            ms = timeit(f1, pf, pr)
            row["fwd_ms"] = round(ms, 3)
            row["fwd_mframes_s"] = round(B * T / ms / 1e3, 2)
        except Exception as e:  # Mosaic/VMEM failures are data, not crashes
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(row), flush=True)
        results.append(row)
    pk.MAX_B_TILE = 256
    return results


if __name__ == "__main__":
    main()
