"""Benchmark harness: UW3-profile BIDILSTM-CTC training throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "lines/sec", "vs_baseline": N/proxy,
   "ms_per_step": ..., "model_tflops_per_step": ..., "pct_peak_bf16": ...,
   "e2e": {...}, "dp1": {...}, "infer": {...}}

The headline metric/value is the resident-batch device-step rate; the same
line carries the end-to-end CLI rate ("e2e" — the north-star train metric
through the real clstmocrtrain hot loop, median of timed epochs), the
batched inference rate ("infer" — the north star's serving half), and the
shard_map-1-device mesh overhead guard ("dp1", median-of-k INTERLEAVED
plain/DP leg ratio, target >0.95 — single-shot ratios flip with tunnel
weather), plus ms/step + an analytic model-FLOPs estimate and % of the
chip's bf16 peak so "fast" stays calibrated as shapes change.

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

bench_mode selects what runs (default "all"):
  infer   batched inference (serving) rate via the jitted predict step
  all     device-step headline + e2e + dp1 + infer in ONE JSON line
  device  resident-batch device-step rate only (kernel metric)
  e2e     END-TO-END clstmocrtrain rate only: the real CLI hot loop — host
          batching, device cache, jitted step, periodic report decode — on
          a synthetic UW3-shaped dataset (north-star metric; reference hot
          path clstmocrtrain.cc ≈L100). Prepared lines are cached as .npy
          in bench_e2e_dir so repeat runs skip host preprocessing.
  dp1     shard_map 1-device DP step vs the plain step: reports the DP
          step's rate; vs_baseline is the DP/plain rate ratio (mesh-path
          overhead regression guard — target >0.95)
  dp8     8-way DP e2e clstmocrtrain rate on the virtual CPU mesh (CPU
          correctness/wiring check, not a TPU perf number)
  filter_e2e  END-TO-END clstmfiltertrain rate: the CLI's device-resident
          fused-blocks hot loop on the CMU-shaped synthetic g2p corpus
          (BASELINE config 5 train half; run-cmu task)
  infer_e2e   END-TO-END clstmocr rate: proto load + PNG decode + device
          preprocess + predict + CTC decode + sidecar write over a
          synthetic page set (BASELINE config 5 inference half)
"mode=all" runs device + e2e + dp1 + infer + filter_e2e + infer_e2e + dp8.
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


# Dense bf16 peak TFLOP/s per chip by device kind (public spec sheets).
_PEAK_BF16 = {"v4": 275e12, "v5lite": 197e12, "v5e": 197e12,
              "v5p": 459e12, "v6lite": 918e12, "v6e": 918e12}


def _chip_peak_flops():
    import jax
    dev = jax.devices()[0]
    if dev.platform != "tpu":
        return None
    kind = dev.device_kind.lower().replace(" ", "")
    for k, v in _PEAK_BF16.items():
        if k in kind:
            return v
    return None


def _train_step_flops(B: int, true_T: int, H: int, D: int, C: int,
                      layers: int = 1) -> float:
    """Analytic model-FLOPs estimate for one CTC train step.

    Forward matmul MACs per timestep per direction: gates 4H*(D+1+H);
    softmax head C*(2H+1) per timestep. Backward ~2x forward (dx + dw
    products). CTC DP and elementwise work excluded — this is the
    MXU-relevant floor, good for an order-of-magnitude MFU."""
    per_t = 0.0
    d = D
    for _ in range(layers):
        per_t += 2 * (4 * H * (d + 1 + H))   # both directions
        d = 2 * H                            # next stacked layer input
    per_t += C * (d + 1)
    return 2.0 * 3.0 * B * true_T * per_t    # MACs->FLOPs x (fwd + 2x bwd)


def bench_e2e() -> dict:
    """End-to-end clstmocrtrain throughput on a synthetic UW3-shaped
    dataset: the EXACT CLI hot loop (clstm_tpu/cli/clstmocrtrain.py
    main()), timed over steady-state epochs after a warmup epoch."""
    import numpy as np

    from clstm_tpu.data.dataset import OcrDataset, make_batches, pad_batch_rows
    from clstm_tpu.data.device_cache import DeviceDataset
    from clstm_tpu.data.lines import LineGenerator, make_dataset_dir
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.hl import CLSTMOCR
    from clstm_tpu.ops.ctc import decode_frames

    B = int(os.environ.get("bench_batch", 256))
    nlines = int(os.environ.get("bench_e2e_lines", 1024))
    # 5 timed reps by default (each rep is a steps_per_dispatch-epoch run,
    # ~0.7s): one epoch is a ~250ms window on the tunneled chip, where a
    # single ~50ms RTT hiccup swings the rate by 20% (measured spread
    # 2.9-5.0k l/s with epochs=1), and whole-rep tunnel stalls happen
    # (BENCH_r04's 855 l/s rep) — a median of 5 tolerates two bad reps
    # where the round-4 median of 3 tolerated one.
    epochs = int(os.environ.get("bench_e2e_epochs", 5))
    report_every = int(os.environ.get("report_every", 500))
    work = os.environ.get("bench_e2e_dir", "/tmp/clstm_bench_e2e")

    # Prepared-corpus cache: rendering + host normalization of the corpus
    # is a one-time cost; repeat runs (and the driver's audit run) load
    # .npy blobs instead (keeps the whole bench ~2-3 min on the tunneled
    # chip — round-2 verdict item 3).
    cache = os.path.join(work, f"prepared_{nlines}.npz")
    if os.path.exists(cache):
        blob = np.load(cache, allow_pickle=True)
        samples = list(zip(blob["xs"], blob["texts"]))
        codec = Codec(list(blob["codec"]))
    else:
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
        samples = ds.load_all()
        try:
            np.savez(cache,
                     xs=np.array([x for x, _ in samples], dtype=object),
                     texts=np.array([t for _, t in samples], dtype=object),
                     codec=np.array(codec.codec, np.int64))
        except OSError:
            pass

    ocr = CLSTMOCR(target_height=48, dewarp="center")
    ocr.createBidi(codec, 100, kind="bidi", seed=0)
    ocr.setLearningRate(1e-4, 0.9)

    rng = np.random.RandomState(0)
    stream = os.environ.get("bench_e2e_stream", "0") not in ("0", "")
    # K=64 (round-5 sweep on the tunneled chip): 16 -> 34.2k, 32 -> 44.1k,
    # 64 -> 46.8k lines/s — within 4% of the pure-loop rate; dispatch
    # overhead and partial-batch remainders both amortize with K.
    block_k = int(os.environ.get("steps_per_dispatch", 64))
    # Mirror the CLI's cache-path grouping (t_buckets env: fine =
    # default finer width grid + sb-merged groups, round-5 padding A/B
    # +4%; auto = corpus-adaptive DP cuts — data/dataset.py auto_t_cuts).
    from clstm_tpu.data.dataset import T_BUCKETS_FINE
    tb_mode = os.environ.get("t_buckets", "fine")
    cache_kw = (dict(t_buckets="auto", merge_sb=True,
                     auto_hints=dict(batch_size=B, epochs=block_k,
                                     k=block_k))
                if tb_mode == "auto"
                else dict(t_buckets=T_BUCKETS_FINE, merge_sb=True))
    dcache = None if stream else DeviceDataset(samples, codec, **cache_kw)

    def one_run(report: bool = True) -> int:
        """The clstmocrtrain hot loop: block_k EPOCHS per run via
        multi-step fused dispatches over the device cache (the CLI's
        cache=auto single-device path: K batches per dispatch via
        lax.scan over the on-device multi-epoch plan — epochs == k makes
        every block full-size; reports at report_every cadence are read
        one block deferred so the RTT overlaps compute — see
        cli/clstmocrtrain.py); bench_e2e_stream=1 forces the
        host-streaming path (H2D bound at 31 MB/s over the tunneled
        link: 170 lines/s vs 15.2k resident), one epoch per run."""
        from clstm_tpu.train import unpack_report
        trials = 0
        nxt = report_every
        if stream:
            m = None
            for batch in make_batches(samples, codec, B, rng=rng):
                m = ocr.train_batch(pad_batch_rows(batch, B))
                trials += len(batch["texts"])
                if report and trials >= nxt:
                    while nxt <= trials:
                        nxt += max(report_every, 1)
                    L = int(np.asarray(batch["lengths"])[0])
                    _, ids, vals = unpack_report(m["report"], L)
                    codec.decode(decode_frames(ids, vals))
            float(m["loss"])  # sync
            return trials

        pending = None

        def flush():
            nonlocal pending
            if pending is None:
                return
            m, crossings, btexts, bhls = pending
            pending = None
            rep = np.asarray(m["report_all"])
            for tr, s in crossings:
                L = int(bhls[s][0])
                _, ids, vals = unpack_report(rep[s], L)
                codec.decode(decode_frames(ids, vals))

        for block in dcache.epoch_blocks(B, block_k, rng=rng,
                                         epochs=block_k):
            m = ocr.train_batch_block(block, k_max=block_k)
            flush()  # previous block's report — overlaps this dispatch
            crossings = []
            for s, n in enumerate(block["nreal_per"]):
                trials += n
                if report and trials >= nxt:
                    while nxt <= trials:
                        nxt += max(report_every, 1)
                    crossings.append((trials, s))
            if crossings:
                m["report_all"].copy_to_host_async()  # see clstmocrtrain
                pending = (m, crossings, block["texts"],
                           block["host_lengths"])
        flush()
        float(m["loss"])  # sync
        return trials

    one_run(report=True)            # warmup run (compiles all buckets)
    rates = []
    for _ in range(epochs):         # timed reps (median — a single ~50ms
        t0 = time.time()            # RTT hiccup swings a short run's rate
        n = one_run(report=True)    # ~20% on the tunneled chip; round-3
        rates.append(n / (time.time() - t0))  # verdict: medians, not sums)
    rates.sort()
    rate = rates[len(rates) // 2]
    return {
        "metric": "uw3_clstmocrtrain_e2e_train_lines_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "lines/sec",
        "vs_baseline": round(rate / get_baseline(), 2),
        "run_rates": [round(r, 1) for r in rates],
        "steps_per_dispatch": block_k,
    }


def bench_filter_e2e() -> dict:
    """End-to-end clstmfiltertrain throughput on the CMU-shaped synthetic
    g2p corpus (BASELINE config 5 train half; scripts/run-cmu task): the
    CLI's device-resident fused-blocks hot loop
    (cli/clstmfiltertrain.train_blocks — TextDeviceDataset int-id corpus,
    on-device one-hot, K train steps per dispatch), timed over
    steady-state epochs. Round-4 verdict weak #2: the host-streaming loop
    recorded a flat 330 pairs/s on the chip (runs/r3/cmu-b16.jsonl)."""
    import numpy as np

    from clstm_tpu.data.device_cache import TextDeviceDataset
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.hl import CLSTMText

    B = int(os.environ.get("bench_filter_batch", 256))
    npairs = int(os.environ.get("bench_filter_pairs", 4096))
    reps = int(os.environ.get("bench_e2e_epochs", 5))
    block_k = int(os.environ.get("steps_per_dispatch", 64))

    # The run-cmu synthetic g2p task (digraph rules; same codec shapes and
    # CTC slack profile as grapheme->phoneme).
    rules = {"th": "T", "ch": "C", "sh": "S", "ee": "i", "oo": "u",
             "ng": "N"}
    letters = "abcdefghilmnoprstu"

    def g2p(word):
        out, i = [], 0
        while i < len(word):
            if word[i:i + 2] in rules:
                out.append(rules[word[i:i + 2]])
                i += 2
            else:
                out.append(word[i].upper())
                i += 1
        return "".join(out)

    rng = np.random.RandomState(0)
    seen, pairs = set(), []
    while len(pairs) < npairs:
        w = "".join(letters[rng.randint(len(letters))]
                    for _ in range(rng.randint(3, 10)))
        if w not in seen:
            seen.add(w)
            pairs.append((w, g2p(w)))

    model = CLSTMText(input_repeat=3)
    icodec = Codec.build(a for a, _ in pairs)
    codec = Codec.build(b for _, b in pairs)
    model.createBidi(icodec, codec, 100, seed=0)
    model.setLearningRate(1e-4, 0.9)
    dcache = TextDeviceDataset(pairs, icodec, codec, input_repeat=3)

    def one_run() -> int:
        trials = 0
        for block in dcache.epoch_blocks(B, block_k, rng=rng,
                                         epochs=block_k):
            m = model.train_batch_block(block, k_max=block_k)
            trials += int(block["nreal"])
        float(m["loss"])  # host-transfer sync (see bench_device note)
        return trials

    one_run()                       # warmup (compiles all bucket groups)
    rates = []
    for _ in range(reps):
        t0 = time.time()
        n = one_run()
        rates.append(n / (time.time() - t0))
    rates.sort()
    return {
        "metric": "cmu_clstmfiltertrain_e2e_train_pairs_per_sec_per_chip",
        "value": round(rates[len(rates) // 2], 2),
        "unit": "pairs/sec",
        "run_rates": [round(r, 1) for r in rates],
        "batch": B, "steps_per_dispatch": block_k,
    }


def bench_infer_e2e() -> dict:
    """End-to-end clstmocr CLI throughput (BASELINE config 5 inference
    half; reference clstmocr.cc ≈L1-150): proto model load, then per rep
    PNG decode -> bucketed device preprocess -> jitted predict -> CTC
    decode -> .txt sidecar write, over a synthetic page set — the REAL
    cli/clstmocr.py path (predict_pages + write_outputs), so the gap to
    bench_infer's jitted-step rate is the measured host-stage cost."""
    import numpy as np

    from clstm_tpu.cli.clstmocr import predict_pages, write_outputs
    from clstm_tpu.data.lines import LineGenerator, make_dataset_dir
    from clstm_tpu.io.png import read_png
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.hl import CLSTMOCR

    npages = int(os.environ.get("bench_infer_pages", 256))
    reps = int(os.environ.get("bench_e2e_epochs", 5))
    work = os.environ.get("bench_e2e_dir", "/tmp/clstm_bench_e2e")
    pagedir = os.path.join(work, f"pages_{npages}")
    manifest = os.path.join(pagedir, "manifest.files")
    if not os.path.exists(manifest):
        os.makedirs(pagedir, exist_ok=True)
        gen = LineGenerator(seed=1)
        texts = [gen.random_sentence() for _ in range(npages)]
        m = make_dataset_dir(os.path.join(pagedir, "p"), npages, gen=gen,
                             texts=texts)
        os.replace(m, manifest)
    files = [l.split("\t")[0] for l in open(manifest).read().splitlines()]

    # Proto model load (config 5 names it): build once, save, load back.
    model_path = os.path.join(work, "infer_e2e_model.clstm")
    if not os.path.exists(model_path):
        tmp = CLSTMOCR(target_height=48, dewarp="center")
        gen = LineGenerator(seed=1)
        tmp.createBidi(Codec.build([gen.charset]), 100, seed=0)
        tmp.save(model_path, sidecar=False)
    ocr = CLSTMOCR(dewarp="center")
    ocr.load(model_path)
    ocr.target_height = ocr.spec.iget("ninput", ocr.target_height)

    def one_run() -> int:
        images = [read_png(f) for f in files]
        results = predict_pages(ocr, images, device_preprocess=1)
        write_outputs(ocr, files, images, results, output="sidecar")
        return len(files)

    one_run()                       # warmup (compiles preprocess+predict)
    rates = []
    for _ in range(reps):
        t0 = time.time()
        n = one_run()
        rates.append(n / (time.time() - t0))
    rates.sort()
    return {
        "metric": "uw3_clstmocr_e2e_infer_lines_per_sec_per_chip",
        "value": round(rates[len(rates) // 2], 2),
        "unit": "lines/sec",
        "run_rates": [round(r, 1) for r in rates],
        "pages": npages,
    }


def bench_dp1() -> dict:
    """shard_map 1-device DP step vs the plain jitted step: regression
    guard for mesh-path overhead (VERDICT round-1 item 10). vs_baseline is
    the DP/plain rate ratio — keep it >0.95."""
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

    # INTERLEAVED legs, median-of-k ratio: two separately-timed single
    # legs on a tunnel with ±15% weather read "regressed" or "improved"
    # by luck (round-3 verdict weak #1: the single-shot guard recorded
    # 0.92 and 1.05 on consecutive runs of identical code). Alternating
    # plain/DP legs back-to-back puts both under the same weather; the
    # median of per-pair ratios is the guard.
    # 5 interleaved pairs (round-4 verdict weak #5: per-leg spread is
    # ±3%, so k=3 could hide a real 3-4% mesh regression in one leg's
    # noise; the median of 5 plus the reported min bound it).
    reps = int(os.environ.get("bench_dp1_reps", 5))
    plain_step = make_train_step(spec, lr=1e-4, momentum=0.9,
                                 loss_kind="ctc")
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    dp_step = make_parallel_train_step(spec, mesh, lr=1e-4, momentum=0.9,
                                       loss_kind="ctc")

    def make_state():
        return TrainState.create(jax.tree.map(jnp.copy, params))

    # TWO warmup steps each: the second runs with the fed-back (committed)
    # state, so any sharding-signature retrace lands here, not in the
    # timed loop.
    ps, ds = make_state(), make_state()
    for _ in range(2):
        ps, mp = plain_step(ps, batch)
        ds, md = dp_step(ds, batch)
    float(mp["loss"]), float(md["loss"])

    def leg(step, state):
        t0 = time.time()
        for _ in range(steps):
            state, m = step(state, batch)
        float(m["loss"])
        return state, time.time() - t0

    ratios, dp_rates = [], []
    for _ in range(reps):
        ps, tp = leg(plain_step, ps)
        ds, td = leg(dp_step, ds)
        dp_rates.append(steps * B / td)
        ratios.append(tp / td)   # dp_rate / plain_rate
    ratios.sort()
    dp_rates.sort()
    return {
        "metric": "dp_shardmap1_vs_plain_train_lines_per_sec",
        "value": round(dp_rates[len(dp_rates) // 2], 2),
        "unit": "lines/sec",
        "vs_baseline": round(ratios[len(ratios) // 2], 4),
        "ratios": [round(r, 4) for r in ratios],
        "min_ratio": round(ratios[0], 4),
    }


def bench_dp8() -> dict:
    """8-way DP clstmocrtrain e2e on the virtual CPU mesh: exercises the
    full product path (CLI mesh wiring + sharded DeviceDataset + psum
    step). A wiring/correctness check — CPU rates are not TPU numbers."""
    import subprocess
    import tempfile

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (env.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8").strip(),
    })
    with tempfile.TemporaryDirectory() as td:
        code = (
            "import jax; jax.config.update('jax_platforms','cpu')\n"
            "import sys, time, numpy as np\n"
            "from clstm_tpu.data.lines import LineGenerator, make_dataset_dir\n"
            "gen = LineGenerator(seed=0)\n"
            "texts=[gen.random_sentence() for _ in range(64)]\n"
            f"m=make_dataset_dir('{td}/train', 64, gen=gen, texts=texts)\n"
            "import os\n"
            "os.environ.update(save_name='" + td + "/m', ntrain='256',"
            " lrate='1e-4', batch_size='32', report_every='128',"
            " test_every='10000', save_every='10000', mesh='8')\n"
            "from clstm_tpu.cli import clstmocrtrain\n"
            "t0=time.time(); clstmocrtrain.main([m]);"
            " print('DP8RATE', 256/(time.time()-t0))\n")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=1200)
        rate = 0.0
        for ln in out.stdout.splitlines():
            if ln.startswith("DP8RATE"):
                rate = float(ln.split()[1])
        ok = "data-parallel over 8 devices" in out.stdout and rate > 0
        return {
            "metric": "dp8_virtual_mesh_clstmocrtrain_lines_per_sec_cpu",
            "value": round(rate, 2),
            "unit": "lines/sec (cpu)",
            "ok": ok,
        }


def bench_device() -> dict:
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
    ms_per_step = 1e3 * dt / steps

    baseline = get_baseline()
    metric = "uw3_bidilstm_ctc_train_lines_per_sec_per_chip"
    if (net, nhidden, nclasses) != ("bidi", 100, 96):
        metric = f"{net}_nh{nhidden}_nc{nclasses}_ctc_train_lines_per_sec_per_chip"
    layers = 2 if net == "bidi2" else 1
    flops = _train_step_flops(B, true_T, nhidden, height, nclasses, layers)
    out = {
        "metric": metric,
        "value": round(rate, 2),
        "unit": "lines/sec",
        "vs_baseline": round(rate / baseline, 2),
        "ms_per_step": round(ms_per_step, 2),
        "model_tflops_per_step": round(flops / 1e12, 4),
    }
    peak = _chip_peak_flops()
    if peak:
        out["pct_peak_bf16"] = round(100.0 * (flops / (dt / steps)) / peak, 2)
    return out


def bench_infer() -> dict:
    """Batched inference (serving) rate: the jitted predict step used by
    clstmocr's bucketed page inference (make_predict_step -> per-frame
    argmax ids/vals; the host run-collapse costs ~us/line and is excluded
    the same way the reference's stdout write would be)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clstm_tpu.models.prefab import make_net_init
    from clstm_tpu.train import make_predict_step

    B = int(os.environ.get("bench_batch", 256))
    T = int(os.environ.get("bench_T", 1024))
    steps = int(os.environ.get("bench_steps", 20))
    net = os.environ.get("bench_net", "bidi")
    nhidden = int(os.environ.get("bench_nhidden", 100))
    nclasses = int(os.environ.get("bench_nclasses", 96))
    height = 48

    spec, params = make_net_init(
        net, {"ninput": height, "nhidden": nhidden, "noutput": nclasses},
        jax.random.PRNGKey(0))
    predict = make_predict_step(spec)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T, height).astype(np.float32))
    lengths = jnp.full((B,), 900, jnp.int32)

    ids, vals = predict(params, x, lengths)
    float(jnp.sum(vals))  # host-transfer sync (see bench_device note)
    t0 = time.time()
    for _ in range(steps):
        ids, vals = predict(params, x, lengths)
    float(jnp.sum(vals))
    dt = time.time() - t0
    rate = steps * B / dt
    metric = "uw3_bidilstm_infer_lines_per_sec_per_chip"
    if (net, nhidden, nclasses) != ("bidi", 100, 96):
        metric = f"{net}_nh{nhidden}_nc{nclasses}_infer_lines_per_sec_per_chip"
    return {"metric": metric, "value": round(rate, 2), "unit": "lines/sec",
            "ms_per_batch": round(1e3 * dt / steps, 2)}


def main() -> int:
    from clstm_tpu.utils.config import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: repeat bench runs skip
    #                         the ~5 min of per-shape tunnel compiles
    mode = os.environ.get("bench_mode", "all")
    if mode == "e2e":
        print(json.dumps(bench_e2e()))
        return 0
    if mode == "infer":
        print(json.dumps(bench_infer()))
        return 0
    if mode == "dp1":
        print(json.dumps(bench_dp1()))
        return 0
    if mode == "dp8":
        print(json.dumps(bench_dp8()))
        return 0
    if mode == "filter_e2e":
        print(json.dumps(bench_filter_e2e()))
        return 0
    if mode == "infer_e2e":
        print(json.dumps(bench_infer_e2e()))
        return 0
    result = bench_device()
    if mode == "all":
        # One line, all driver-audited metrics: e2e + dp1 + infer +
        # filter_e2e + infer_e2e + dp8 ride along as nested objects (the
        # north star is train+INFER lines/sec at the FRAMEWORK level —
        # round-4 verdict items 1/2/4); a failure in any must not lose
        # the headline.
        for name, fn in (("e2e", bench_e2e), ("dp1", bench_dp1),
                         ("infer", bench_infer),
                         ("filter_e2e", bench_filter_e2e),
                         ("infer_e2e", bench_infer_e2e),
                         ("dp8", bench_dp8)):
            try:
                result[name] = fn()
            except Exception as e:  # pragma: no cover - defensive
                result[name] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
