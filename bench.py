"""Benchmark harness: UW3-profile BIDILSTM-CTC training throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "lines/sec", "vs_baseline": N/proxy}

Profile matches BASELINE.json's north-star config: bidi LSTM (nhidden=100
per direction), target_height=48, ~900-frame lines (bucketed to 1024),
96-class alphabet, CTC-alignment training — the same per-line math as the
reference's clstmocrtrain hot path (SURVEY.md §3.1). The baseline is the
single-core reference proxy (benchmarks/reference_proxy.py), cached in
benchmarks/baseline_proxy.json; the reference itself publishes no numbers
(BASELINE.md).

Extra env knobs: bench_batch=256 bench_T=1024 bench_steps=20 bench_bf16=0
bench_net=bidi bench_nhidden=100 bench_nclasses=96 (set net=bidi2
nhidden=200 nclasses=400 for the config-4 deep large-alphabet profile).
"""

from __future__ import annotations

import json
import os
import sys
import time


def get_baseline() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "baseline_proxy.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["lines_per_sec"])
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "benchmarks"))
    from reference_proxy import measure_lines_per_sec
    rate = measure_lines_per_sec(nlines=10)
    try:
        with open(path, "w") as f:
            json.dump({"lines_per_sec": rate,
                       "config": "T=900 nhidden=100 nclasses=96 single-core"},
                      f)
    except OSError:
        pass
    return rate


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from clstm_tpu.models.prefab import make_net_init
    from clstm_tpu.ops.ctc import mktargets_ids
    from clstm_tpu.train import TrainState, make_train_step

    B = int(os.environ.get("bench_batch", 256))
    T = int(os.environ.get("bench_T", 1024))
    true_T = 900
    steps = int(os.environ.get("bench_steps", 20))
    use_bf16 = os.environ.get("bench_bf16", "0") not in ("0", "")
    net = os.environ.get("bench_net", "bidi")
    nhidden = int(os.environ.get("bench_nhidden", 100))
    nclasses = int(os.environ.get("bench_nclasses", 96))
    height, nchars = 48, 40

    spec, params = make_net_init(
        net, {"ninput": height, "nhidden": nhidden, "noutput": nclasses},
        jax.random.PRNGKey(0))
    state = TrainState.create(params)
    step = make_train_step(
        spec, lr=1e-4, momentum=0.9, loss_kind="ctc",
        compute_dtype=jnp.bfloat16 if use_bf16 else None)

    rng = np.random.RandomState(0)
    S = 2 * nchars + 1
    tids = np.zeros((B, S), np.int32)
    for b in range(B):
        tids[b] = mktargets_ids(rng.randint(1, nclasses, size=nchars))
    batch = {
        "x": jnp.asarray(rng.rand(B, T, height).astype(np.float32)),
        "lengths": jnp.full((B,), true_T, jnp.int32),
        "targets": jnp.asarray(tids),
        "target_lengths": jnp.full((B,), S, jnp.int32),
    }

    # Warmup/compile. NOTE: sync via host transfer (float(...)) — on the
    # tunneled axon backend block_until_ready can return before execution
    # completes, which silently inflates rates by orders of magnitude.
    state, m = step(state, batch)
    float(m["loss"])
    t0 = time.time()
    for _ in range(steps):
        state, m = step(state, batch)
    float(m["loss"])
    dt = time.time() - t0
    rate = steps * B / dt

    baseline = get_baseline()
    metric = "uw3_bidilstm_ctc_train_lines_per_sec_per_chip"
    if (net, nhidden, nclasses) != ("bidi", 100, 96):
        metric = f"{net}_nh{nhidden}_nc{nclasses}_ctc_train_lines_per_sec_per_chip"
    print(json.dumps({
        "metric": metric,
        "value": round(rate, 2),
        "unit": "lines/sec",
        "vs_baseline": round(rate / baseline, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
