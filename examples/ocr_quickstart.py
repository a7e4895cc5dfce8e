"""End-to-end OCR quickstart: render a synthetic dataset, train a bidi
LSTM with CTC alignment, recognize, save/load the .clstm model.

Run:  python examples/ocr_quickstart.py
(a few minutes on a TPU chip; works on CPU too, slower)
"""

import os
import sys
import tempfile

import numpy as np

# Runnable without installing: `python examples/ocr_quickstart.py` puts
# examples/ on sys.path, not the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clstm_tpu import CLSTMOCR
from clstm_tpu.cli.clstmocrtrain import evaluate
from clstm_tpu.data.dataset import OcrDataset, make_batches
from clstm_tpu.data.lines import LineGenerator, make_dataset_dir
from clstm_tpu.io.png import read_png


def main():
    # 1. A synthetic dataset: PNG line images + .gt.txt transcripts + manifest
    #    (swap in your own manifest of real line images here).
    work = tempfile.mkdtemp()
    gen = LineGenerator(seed=0)
    texts = [gen.random_sentence() for _ in range(64)]
    manifest = make_dataset_dir(work, len(texts), gen=gen, texts=texts)
    ds = OcrDataset(manifest, target_height=48, dewarp="center")

    # 2. Model: the reference's standard bidirectional LSTM recognizer.
    codec = ds.build_codec()
    ocr = CLSTMOCR(target_height=48, dewarp="center")
    ocr.createBidi(codec, nhidden=100)
    ocr.setLearningRate(6e-4, 0.9)
    ocr.gradient_clip = 10.0

    # 3. Batched CTC-alignment training (width-bucketed padded batches).
    samples = ds.load_all()
    rng = np.random.RandomState(0)
    for epoch in range(1200):
        for batch in make_batches(samples, codec, batch_size=16, rng=rng):
            metrics = ocr.train_batch(batch)
        if epoch % 300 == 299:
            err = evaluate(ocr, samples, codec, 16)
            print(f"epoch {epoch + 1}: loss {float(metrics['loss']):.1f} "
                  f"train CER {err:.4f}")

    # 4. Recognize a line (reference single-line API).
    img = read_png(ds.files[0])
    print("truth:", ds.text(0))
    print("pred: ", ocr.predict_utf8(img))
    for cp in ocr.predict(img)[:5]:
        print(f"  char {cp.c!r} at x={cp.x} p={cp.p:.2f}")

    # 5. Save / reload the .clstm model (reference proto format).
    ocr.save(f"{work}/model.clstm")
    ocr2 = CLSTMOCR(target_height=48, dewarp="center")
    ocr2.load(f"{work}/model.clstm")
    assert ocr2.predict_utf8(img) == ocr.predict_utf8(img)
    print(f"model round-tripped through {work}/model.clstm")


if __name__ == "__main__":
    main()
