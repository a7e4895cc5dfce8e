"""clstmocr — OCR inference CLI.

Reference: clstmocr.cc (≈L1-150, unverified). Usage:
  load=model.clstm clstmocr IMG.png [IMG2.png ...]
Env params:
  load=model.clstm  (required) model file
  output=text       "text" prints to stdout; "sidecar" writes IMG.txt files
  charseg=0         also print per-character x positions (CharPrediction,
                    in ORIGINAL image columns)
  dewarp=center / target_height: taken from the model's input size by
  default; dewarp kind from env.
  device_preprocess=1  run normalization/transposition ON DEVICE
                    (ops/preprocess.py, the north-star preprocessing
                    stage); 0 = host scipy path.
  compile_cache=    persistent XLA compile cache dir (""=default
                    /tmp/clstm_tpu_xla_cache, off=disable) — repeat runs
                    skip per-shape compiles
Batched page inference (BASELINE config 5): all given images are bucketed
and run as batches, not one by one.
"""

from __future__ import annotations

import sys

import numpy as np

from clstm_tpu.data.dataset import T_BUCKETS, bucket_for
from clstm_tpu.io.png import read_png
from clstm_tpu.models.hl import CLSTMOCR
from clstm_tpu.ops.ctc import decode_frames
from clstm_tpu.utils.config import getienv, getsenv


def predict_pages(ocr: CLSTMOCR, images, device_preprocess: int = 1) -> dict:
    """The CLI's bucketed batched page-inference core: -> {image index:
    (frame classes, peak positions, frame vals, width scale)}. Shared with
    bench.py's infer_e2e mode so the benchmark measures the REAL clstmocr
    path (reference clstmocr.cc ≈L1-150 per-PNG loop, batched)."""
    results: dict = {}
    if device_preprocess:
        # On-device normalize+prepare: bucket raw lines by ESTIMATED
        # normalized width, one prepare+predict launch per bucket.
        from clstm_tpu.ops.preprocess import estimate_out_T

        by_bucket: dict = {}
        for i, img in enumerate(images):
            tb = bucket_for(
                estimate_out_T([img], ocr.target_height, ocr.pad), T_BUCKETS)
            by_bucket.setdefault(tb, []).append(i)
        # Two phases: enqueue EVERY bucket's upload+prepare+predict first
        # (sync=False returns un-fetched device arrays), then fetch —
        # bucket k+1's transfers and compute overlap bucket k's
        # device->host read instead of serializing on it.
        pending = []
        for tb, idxs in by_bucket.items():
            pending.append((idxs, ocr.predict_batch_images(
                [images[i] for i in idxs], sync=False)))
        for idxs, (ids_d, vals_d, lengths_d) in pending:
            ids, vals = np.asarray(ids_d), np.asarray(vals_d)
            lengths = np.asarray(lengths_d)
            for r, i in enumerate(idxs):
                L = int(lengths[r])
                cls, pos = decode_frames(ids[r][:L], vals[r][:L],
                                         return_positions=True)
                # width scale: normalized cols per source col
                scale = max(L - 2 * ocr.pad, 1) / max(images[i].shape[1], 1)
                results[i] = (cls, pos, vals[r], scale)
    else:
        # Host scipy path (reference behavior).
        prepared = []
        scales = []
        for img in images:
            prepared.append(ocr.prepare(img))
            scales.append(ocr._scale)
        by_bucket = {}
        for i, x in enumerate(prepared):
            tb = bucket_for(x.shape[0], T_BUCKETS)
            by_bucket.setdefault(tb, []).append(i)
        for tb, idxs in by_bucket.items():
            H = prepared[idxs[0]].shape[1]
            xb = np.zeros((len(idxs), tb, H), np.float32)
            lengths = np.zeros(len(idxs), np.int32)
            for r, i in enumerate(idxs):
                x = prepared[i]
                T = min(x.shape[0], tb)
                xb[r, :T] = x[:T]
                lengths[r] = T
            ids, vals = ocr.predict_batch(xb, lengths)
            for r, i in enumerate(idxs):
                L = lengths[r]
                cls, pos = decode_frames(ids[r][:L], vals[r][:L],
                                         return_positions=True)
                results[i] = (cls, pos, vals[r], scales[i])
    return results


def write_outputs(ocr: CLSTMOCR, argv, images, results: dict,
                  output: str = "text", charseg: int = 0) -> None:
    """Decode + emit results (stdout or .txt sidecars; reference output
    stage of clstmocr.cc)."""
    for i, f in enumerate(argv):
        cls, pos, vals, scale = results[i]
        text = ocr.codec.decode(cls)
        if output == "sidecar":
            out = f
            for ext in (".png", ".jpg", ".jpeg"):
                if out.endswith(ext):
                    out = out[: -len(ext)]
                    break
            with open(out + ".txt", "w", encoding="utf-8") as fh:
                fh.write(text + "\n")
        else:
            print(f"{f}\t{text}")
        if charseg:
            w = images[i].shape[1]
            for j, (c, t) in enumerate(zip(cls, pos)):
                ch = chr(ocr.codec.codec[c])
                col = int(np.clip(round((t - ocr.pad) / scale), 0, w - 1))
                print(f"# {j} {col} {ch!r} {vals[t]:.3f}")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    from clstm_tpu.utils.config import enable_compile_cache
    enable_compile_cache(getsenv("compile_cache", ""))
    load = getsenv("load", "")
    if not load or not argv:
        print(__doc__)
        return 1
    output = getsenv("output", "text")
    charseg = getienv("charseg", 0)
    dewarp = getsenv("dewarp", "center")
    device_preprocess = getienv("device_preprocess", 1)

    ocr = CLSTMOCR(dewarp=dewarp)
    ocr.load(load)
    # target_height is the net's input dim (persisted in proto attrs).
    ocr.target_height = ocr.spec.iget("ninput", ocr.target_height)

    images = [read_png(f) for f in argv]
    results = predict_pages(ocr, images, device_preprocess)
    write_outputs(ocr, argv, images, results, output, charseg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
