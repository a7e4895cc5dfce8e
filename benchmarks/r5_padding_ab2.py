"""Round-5 padding A/B, part 2: fine T buckets WITHOUT sb merging (the
part-1 surprise was that merge_sb alone LOSES 5.6% — the wider CTC
lattice costs more than the removed zero-row padding saves), plus plan
epochs=32 variants. Part 1 (benchmarks/r5_padding_ab.py, recorded
/tmp/padding_ab.log -> runs/r5/padding_ab.jsonl):
  base_e16         46890 l/s  (16 groups)
  merged_e16       44269 l/s  ( 6 groups)
  merged_fine_e16  48872 l/s  (11 groups)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FINE = (128, 160, 192, 224, 256, 320, 384, 448, 512, 640, 768, 896,
        1024, 1280, 1536, 2048, 3072, 4096)


def main():
    from clstm_tpu.data.device_cache import DeviceDataset
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.hl import CLSTMOCR

    blob = np.load("/tmp/clstm_bench_e2e/prepared_1024.npz",
                   allow_pickle=True)
    samples = list(zip(blob["xs"], blob["texts"]))
    codec = Codec(list(blob["codec"]))
    B, K = 256, 16

    variants = [
        ("fine_e16", dict(t_buckets=FINE), 16),
        ("fine_e32", dict(t_buckets=FINE), 32),
        ("merged_fine_e32", dict(merge_sb=True, t_buckets=FINE), 32),
    ]
    out = {}
    for name, kw, E in variants:
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
                     "groups": len(ds.groups)}
        print(name, json.dumps(out[name]), flush=True)
    print("RESULT", json.dumps(out))


if __name__ == "__main__":
    main()
