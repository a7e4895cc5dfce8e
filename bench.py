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

bench_mode selects the metric (default "device"):
  device  resident-batch device-step rate (kernel metric, the headline)
  e2e     END-TO-END clstmocrtrain rate: the real CLI hot loop — host
          batching (make_batches/pad_batch_rows), H2D transfer, jitted
          step, periodic report decode — on a synthetic UW3-shaped
          dataset (north-star metric; reference hot path
          clstmocrtrain.cc ≈L100)
  dp1     shard_map 1-device DP step vs the plain step: reports the DP
          step's rate; vs_baseline is the plain-step rate ratio (mesh-path
          overhead regression guard — target >0.95)
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


def bench_e2e() -> int:
    """End-to-end clstmocrtrain throughput on a synthetic UW3-shaped
    dataset: the EXACT CLI hot loop (clstm_tpu/cli/clstmocrtrain.py
    main()), timed over steady-state epochs after a warmup epoch."""
    import time

    import numpy as np

    from clstm_tpu.cli.clstmocrtrain import evaluate  # noqa: F401 (import check)
    from clstm_tpu.data.dataset import OcrDataset, make_batches, pad_batch_rows
    from clstm_tpu.data.device_cache import DeviceDataset
    from clstm_tpu.data.lines import LineGenerator, make_dataset_dir
    from clstm_tpu.models.hl import CLSTMOCR
    from clstm_tpu.ops.ctc import decode_frames

    B = int(os.environ.get("bench_batch", 256))
    nlines = int(os.environ.get("bench_e2e_lines", 2048))
    epochs = int(os.environ.get("bench_e2e_epochs", 3))
    report_every = int(os.environ.get("report_every", 500))
    work = os.environ.get("bench_e2e_dir", "/tmp/clstm_bench_e2e")

    manifest = os.path.join(work, "train.files")
    if not os.path.exists(manifest):
        os.makedirs(work, exist_ok=True)
        gen = LineGenerator(seed=0)
        texts = [gen.random_sentence() for _ in range(nlines)]
        m = make_dataset_dir(os.path.join(work, "train"), nlines, gen=gen,
                             texts=texts)
        with open(manifest, "w") as f:
            f.write(open(m).read())

    ds = OcrDataset(manifest, target_height=48, dewarp="center")
    codec = ds.build_codec()
    ocr = CLSTMOCR(target_height=48, dewarp="center")
    ocr.createBidi(codec, 100, kind="bidi", seed=0)
    ocr.setLearningRate(1e-4, 0.9)
    samples = ds.load_all()

    rng = np.random.RandomState(0)
    stream = os.environ.get("bench_e2e_stream", "0") not in ("0", "")
    dcache = None if stream else DeviceDataset(samples, codec)

    def one_epoch(report: bool) -> int:
        """The clstmocrtrain hot loop: device-cache epoch by default (the
        CLI's cache=auto path — streaming over the tunneled link is H2D
        bound at 31 MB/s, measured 170 lines/s vs 15.2k resident);
        bench_e2e_stream=1 forces the host-streaming path."""
        trials = 0
        nxt = report_every
        batches = (make_batches(samples, codec, B, rng=rng) if stream
                   else dcache.epoch(B, rng=rng))
        for batch in batches:
            nreal = len(batch["texts"])
            if stream:
                m = ocr.train_batch(pad_batch_rows(batch, B))
            else:
                m = ocr.train_batch({k: batch[k] for k in (
                    "x", "lengths", "targets", "target_lengths")})
            trials += nreal
            if report and trials >= nxt:
                nxt += report_every
                # the CLI's report path: decode one row on host
                L = int(np.asarray(
                    batch.get("host_lengths", batch["lengths"]))[0])
                ids = np.asarray(m["report_ids"])[:L]
                vals = np.asarray(m["report_vals"])[:L]
                codec.decode(decode_frames(ids, vals))
        float(m["loss"])  # sync
        return trials

    one_epoch(report=True)          # warmup epoch (compiles all buckets)
    t0 = time.time()
    total = 0
    for _ in range(epochs):
        total += one_epoch(report=True)
    rate = total / (time.time() - t0)
    print(json.dumps({
        "metric": "uw3_clstmocrtrain_e2e_train_lines_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "lines/sec",
        "vs_baseline": round(rate / get_baseline(), 2),
    }))
    return 0


def bench_dp1() -> int:
    """shard_map 1-device DP step vs the plain jitted step: regression
    guard for mesh-path overhead (VERDICT round-1 item 10). vs_baseline is
    the DP/plain rate ratio — keep it >0.95."""
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from clstm_tpu.models.prefab import make_net_init
    from clstm_tpu.ops.ctc import mktargets_ids
    from clstm_tpu.parallel.dp import make_parallel_train_step
    from clstm_tpu.train import TrainState, make_train_step

    B = int(os.environ.get("bench_batch", 256))
    T = int(os.environ.get("bench_T", 1024))
    steps = int(os.environ.get("bench_steps", 20))
    height, nchars, nclasses = 48, 40, 96

    spec, params = make_net_init(
        "bidi", {"ninput": height, "nhidden": 100, "noutput": nclasses},
        jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    S = 2 * nchars + 1
    tids = np.zeros((B, S), np.int32)
    for b in range(B):
        tids[b] = mktargets_ids(rng.randint(1, nclasses, size=nchars))
    batch = {
        "x": jnp.asarray(rng.rand(B, T, height).astype(np.float32)),
        "lengths": jnp.full((B,), 900, jnp.int32),
        "targets": jnp.asarray(tids),
        "target_lengths": jnp.full((B,), S, jnp.int32),
    }

    def rate_of(step):
        # fresh param copies: both steps donate their state buffers.
        # TWO warmup steps: the second runs with the fed-back (committed)
        # state, so any sharding-signature retrace lands here, not in the
        # timed loop.
        state = TrainState.create(jax.tree.map(jnp.copy, params))
        for _ in range(2):
            state, m = step(state, batch)
        float(m["loss"])
        t0 = time.time()
        for _ in range(steps):
            state, m = step(state, batch)
        float(m["loss"])
        return steps * B / (time.time() - t0)

    plain = rate_of(make_train_step(spec, lr=1e-4, momentum=0.9,
                                    loss_kind="ctc"))
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    dp = rate_of(make_parallel_train_step(spec, mesh, lr=1e-4, momentum=0.9,
                                          loss_kind="ctc"))
    print(json.dumps({
        "metric": "dp_shardmap1_vs_plain_train_lines_per_sec",
        "value": round(dp, 2),
        "unit": "lines/sec",
        "vs_baseline": round(dp / plain, 4),
    }))
    return 0


def main() -> int:
    mode = os.environ.get("bench_mode", "device")
    if mode == "e2e":
        return bench_e2e()
    if mode == "dp1":
        return bench_dp1()

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
