"""clstmfilter — string-transduction inference CLI.

Reference: clstmfilter.cc (≈L1-100, unverified). Reads lines from stdin,
writes transduced lines to stdout in order. Env: load=filter.clstm
(required); batch_size=64 batches lines through bucketed padded batches
(batch_size=1 restores strict line-at-a-time streaming).
"""

from __future__ import annotations

import sys

import numpy as np

from clstm_tpu.data.dataset import bucket_for
from clstm_tpu.models.hl import CLSTMText
from clstm_tpu.ops.ctc import decode_frames
from clstm_tpu.utils.config import getienv, getsenv


def _predict_batched(model: CLSTMText, lines, batch_size: int):
    """Bucketed batched inference preserving input order."""
    encoded = [model.encode_input(s) for s in lines]
    order = sorted(range(len(lines)), key=lambda i: encoded[i].shape[0])
    out = [""] * len(lines)
    ni = model.icodec.size()
    t_buckets = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512)
    for lo in range(0, len(order), batch_size):
        idxs = order[lo:lo + batch_size]
        tb = bucket_for(max(encoded[i].shape[0] for i in idxs), t_buckets)
        xb = np.zeros((len(idxs), tb, ni), np.float32)
        lengths = np.zeros(len(idxs), np.int32)
        for r, i in enumerate(idxs):
            x = encoded[i]
            T = min(x.shape[0], tb)
            xb[r, :T] = x[:T]
            lengths[r] = T
        ids, vals = model.predict_batch(xb, lengths)
        for r, i in enumerate(idxs):
            L = lengths[r]
            out[i] = model.codec.decode(decode_frames(ids[r][:L], vals[r][:L]))
    return out


def main(argv=None) -> int:
    from clstm_tpu.utils.config import enable_compile_cache
    enable_compile_cache(getsenv("compile_cache", ""))
    load = getsenv("load", "")
    if not load:
        print(__doc__)
        return 1
    batch_size = getienv("batch_size", 64)
    model = CLSTMText()
    model.load(load)
    if batch_size <= 1:
        for line in sys.stdin:
            print(model.predict(line.rstrip("\n")), flush=True)
        return 0
    lines = [ln.rstrip("\n") for ln in sys.stdin]
    for s in _predict_batched(model, lines, batch_size):
        print(s)
    return 0


if __name__ == "__main__":
    sys.exit(main())
