"""Evaluate a saved .clstm model's CER on a manifest of line images.

Usage:  python scripts/eval_cer.py MODEL.clstm FILES [batch_size]

Loads the model, prepares the lines with the model's stored normalizer
settings, and prints one JSON line {"model", "files", "lines", "chars",
"cer"}. This is the independent measurement used for the BASELINE.md
config-3 record (fresh held-out set, not the training-time test set).
"""

from __future__ import annotations

import json
import os
import sys

# Runnable as `python scripts/eval_cer.py` from anywhere: `python file.py`
# puts the script's dir (scripts/) on sys.path, not the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clstm_tpu.cli.clstmocrtrain import evaluate
from clstm_tpu.data.dataset import OcrDataset
from clstm_tpu.data.device_cache import DeviceDataset
from clstm_tpu.models.hl import CLSTMOCR
from clstm_tpu.utils.config import getienv, getsenv


def main(argv):
    model, files = argv[0], argv[1]
    batch_size = int(argv[2]) if len(argv) > 2 else 32
    target_height = getienv("target_height", 48)
    dewarp = getsenv("dewarp", "center")
    ocr = CLSTMOCR(target_height=target_height, dewarp=dewarp)
    ocr.load(model)
    ds = OcrDataset(files, target_height=target_height, dewarp=dewarp)
    samples = ds.load_all()
    cache = DeviceDataset(samples, ocr.codec)
    cer = evaluate(ocr, cache, ocr.codec, batch_size)
    nchars = sum(len(t) for _, t in samples)
    print(json.dumps({"model": model, "files": files, "lines": len(samples),
                      "chars": nchars, "cer": round(cer, 6)}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
