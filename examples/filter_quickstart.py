"""String-transduction quickstart: train a CLSTMText filter (the
clstmfiltertrain/clstmfilter model) on a toy spelling-normalization task,
batched, then run it like a unix filter and round-trip the .clstm file.

Run:  python examples/filter_quickstart.py
(about a minute on a TPU chip; works on CPU too, slower)
"""

import os
import sys
import tempfile

import numpy as np

# Runnable without installing: `python examples/filter_quickstart.py` puts
# examples/ on sys.path, not the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clstm_tpu import CLSTMText
from clstm_tpu.cli.clstmfiltertrain import evaluate
from clstm_tpu.data.dataset import make_text_batches, pad_batch_rows
from clstm_tpu.models.codec import Codec


def main():
    # 1. A toy transduction: strip vowel doubling ("aa" -> "a") — the same
    #    shape of task as the reference's run-cmu grapheme->phoneme recipe
    #    (input/output codecs differ; output is shorter than input).
    rng = np.random.RandomState(0)
    letters = list("abcdefgh")

    def sample():
        out = "".join(rng.choice(letters) for _ in range(rng.randint(3, 9)))
        inp = "".join(c * 2 if c in "aeiou" else c for c in out)
        return inp, out

    pairs = sorted({sample() for _ in range(600)})
    train_pairs, test_pairs = pairs[:500], pairs[500:]

    # 2. Model: same bidi LSTM machinery as OCR; the input is one-hot
    #    characters instead of image columns. input_repeat gives the CTC
    #    alignment slack when outputs are nearly as long as inputs.
    model = CLSTMText(input_repeat=2)
    model.createBidi(Codec.build(a for a, _ in train_pairs),
                     Codec.build(b for _, b in train_pairs),
                     nhidden=64)
    model.setLearningRate(3e-4, 0.9)

    # 3. Batched training (bucketed padded batches, jitted device step).
    for epoch in range(60):
        for batch in make_text_batches(train_pairs, model.icodec, model.codec,
                                       16, rng=rng,
                                       input_repeat=model.input_repeat):
            model.train_batch(pad_batch_rows(batch, 16))
        if epoch % 20 == 19:
            err = evaluate(model, test_pairs, batch_size=16)
            print(f"epoch {epoch + 1}: test CER {err:.4f}")

    # 4. Use it like the clstmfilter CLI: string in, string out.
    for inp, truth in test_pairs[:5]:
        print(f"{inp!r} -> {model.predict(inp)!r}   (truth {truth!r})")

    # 5. Save/load the .clstm (reference format; includes both codecs).
    path = tempfile.mktemp(suffix=".clstm")
    model.save(path)
    clone = CLSTMText()
    clone.load(path)
    assert clone.predict(test_pairs[0][0]) == model.predict(test_pairs[0][0])
    print("saved + reloaded:", path)


if __name__ == "__main__":
    main()
