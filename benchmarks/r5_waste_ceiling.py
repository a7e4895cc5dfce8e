"""Round-5 zero-waste ceiling probe (verdict weak #3 closure).

How close is the fine-bucket cache grouping to "optimal" — a hypothetical
executor with ZERO padding waste? Direct on-chip measurement instead of a
simulation: run the same model/loop on (a) the real bench corpus under the
product-default grouping (t_buckets=fine: FINE grid + merge_sb), and
(b) uniform corpora whose every line is EXACTLY a bucket length (every
frame computed is a true frame, every batch full — no masked frames, no
zero rows, one group). The uniform runs give the chip's true-frame
throughput ceiling at that T; the real corpus's frames/s over the
bracketing ceilings is the fraction-of-optimal.

frames/s = lines/s x mean true frames; optimal lines/s for the real
corpus = ceiling frames/s / mean true frames. Uniform T=256 and T=512
bracket the corpus mean (385).

Run: python benchmarks/r5_waste_ceiling.py  (tunneled chip, ~6 min; needs
/tmp/clstm_bench_e2e/prepared_1024.npz from a prior bench_mode=e2e run).
Results recorded in runs/r5/waste_ceiling.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def uniform_samples(samples, T):
    """Crop/tile every line to exactly T frames; truncate text so the CTC
    lattice stays valid (2S+1 <= T/2). Throughput probe only — the loss is
    meaningless, the work profile is exact."""
    out = []
    smax = max(1, T // 4 - 1)
    for x, t in samples:
        if x.shape[0] >= T:
            xi = x[:T]
        else:
            reps = -(-T // x.shape[0])
            xi = np.tile(x, (reps, 1))[:T]
        out.append((np.ascontiguousarray(xi), str(t)[:smax]))
    return out


def measure(ds, codec, B, K, E, reps=3):
    from clstm_tpu.models.hl import CLSTMOCR

    ocr = CLSTMOCR(target_height=48, dewarp="center")
    ocr.createBidi(codec, 100, kind="bidi", seed=0)
    ocr.setLearningRate(1e-4, 0.9)
    rng = np.random.RandomState(0)

    def one_run():
        n = 0
        for block in ds.epoch_blocks(B, K, rng=rng, epochs=E):
            m = ocr.train_batch_block(block, k_max=K)
            n += int(block["nreal"])
        float(m["loss"])
        return n

    one_run()  # warmup (compiles)
    rates = []
    for _ in range(reps):
        t0 = time.time()
        n = one_run()
        rates.append(n / (time.time() - t0))
    rates.sort()
    return rates[len(rates) // 2], rates


def main():
    from clstm_tpu.utils.config import enable_compile_cache
    enable_compile_cache()  # ~11 fine groups; fresh compiles would eat
    #                         ~6 min of tunnel time per process otherwise
    from clstm_tpu.data.dataset import T_BUCKETS_FINE
    from clstm_tpu.data.device_cache import DeviceDataset
    from clstm_tpu.models.codec import Codec

    blob = np.load("/tmp/clstm_bench_e2e/prepared_1024.npz",
                   allow_pickle=True)
    samples = list(zip(blob["xs"], blob["texts"]))
    codec = Codec(list(blob["codec"]))
    B, K, E = 256, 16, 16
    f_real = float(np.mean([x.shape[0] for x, _ in samples]))

    out = {"mean_true_frames": round(f_real, 1)}
    rows = []

    rate, rates = measure(
        DeviceDataset(samples, codec, t_buckets=T_BUCKETS_FINE,
                      merge_sb=True), codec, B, K, E)
    out["real_fine"] = {"lines_per_s": round(rate, 1),
                        "rates": [round(r, 1) for r in rates],
                        "frames_per_s": round(rate * f_real, 1)}
    print("real_fine", json.dumps(out["real_fine"]), flush=True)

    for T in (256, 384, 512):
        us = uniform_samples(samples, T)
        rate, rates = measure(
            DeviceDataset(us, codec, t_buckets=(T,), merge_sb=True),
            codec, B, K, E)
        out[f"uniform_{T}"] = {
            "lines_per_s": round(rate, 1),
            "rates": [round(r, 1) for r in rates],
            "frames_per_s": round(rate * T, 1),
            "opt_lines_per_s_at_real_mix": round(rate * T / f_real, 1)}
        print(f"uniform_{T}", json.dumps(out[f"uniform_{T}"]), flush=True)
        rows.append(rate * T)

    ceiling = float(np.mean(rows))
    out["fraction_of_optimal"] = round(
        out["real_fine"]["frames_per_s"] / ceiling, 4)
    print("RESULT", json.dumps(out))
    os.makedirs("runs/r5", exist_ok=True)
    with open("runs/r5/waste_ceiling.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
