"""Round-5 padding A/B, part 3: corpus-adaptive DP cuts (auto_t_cuts)
vs the fine+merged product default, pure fused-blocks loop, one process
(shared tunnel weather), E=64/K=64 matching the product defaults.

Context: bench_e2e measured t_buckets=auto 6% BELOW fine on the tunnel
twice (48.7k frames-only model, 49.0k S-aware model) while the S-aware
cost model predicts a ~5% WIN — so ~11% of real cost is unmodeled. This
probe isolates WHERE by running the exact cut sets head-to-head in the
pure loop at three dispatch penalties (0 -> 24 groups, 440k -> 9, the
live-measured one), plus fine at both merge settings.

Usage: python benchmarks/r5_padding_ab3.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from clstm_tpu.data.dataset import T_BUCKETS_FINE, auto_t_cuts
    from clstm_tpu.data.device_cache import (DeviceDataset,
                                             measure_dispatch_penalty_rows)
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.hl import CLSTMOCR
    from clstm_tpu.utils.config import enable_compile_cache

    enable_compile_cache()
    blob = np.load("/tmp/clstm_bench_e2e/prepared_1024.npz",
                   allow_pickle=True)
    samples = list(zip(blob["xs"], blob["texts"]))
    codec = Codec(list(blob["codec"]))
    B, K, E = 256, 64, 64

    lens = [x.shape[0] for x, _ in samples]
    svals = [2 * len(codec.encode(str(t))) + 1 for _, t in samples]
    pen_live = measure_dispatch_penalty_rows()
    print(f"# live dispatch penalty: {pen_live:,.0f} rows", flush=True)

    def cuts_at(pen):
        return auto_t_cuts(lens, batch_size=B, epochs=E, k=K,
                           dispatch_penalty_rows=pen, s_lengths=svals)

    variants = [
        ("fine_merged", dict(t_buckets=T_BUCKETS_FINE, merge_sb=True)),
        ("auto_pen_live", dict(t_buckets=cuts_at(pen_live), merge_sb=True)),
        ("auto_pen0", dict(t_buckets=cuts_at(0.0), merge_sb=True)),
        ("auto_pen440k", dict(t_buckets=cuts_at(440e3), merge_sb=True)),
    ]
    out = {}
    for name, kw in variants:
        ocr = CLSTMOCR(target_height=48, dewarp="center")
        ocr.createBidi(codec, 100, kind="bidi", seed=0)
        ocr.setLearningRate(1e-4, 0.9)
        ds = DeviceDataset(samples, codec, **kw)
        rng = np.random.RandomState(0)

        def one_run():
            n = 0
            for block in ds.epoch_blocks(B, K, rng=rng, epochs=E):
                m = ocr.train_batch_block(block, k_max=K)
                n += int(block["nreal"])
            float(m["loss"])
            return n

        one_run()
        rates = []
        for _ in range(3):
            t0 = time.time()
            n = one_run()
            rates.append(n / (time.time() - t0))
        rates.sort()
        out[name] = {"median": round(rates[1], 1),
                     "rates": [round(r, 1) for r in rates],
                     "groups": len(ds.groups),
                     "cuts": list(kw["t_buckets"])}
        print(name, json.dumps(out[name]), flush=True)
    print("RESULT", json.dumps(out))


if __name__ == "__main__":
    main()
