"""High-level API tests: CLSTMOCR / CLSTMText (reference clstmhl.h),
end-to-end on tiny synthetic data."""

import numpy as np
import pytest

from clstm_tpu.data.dataset import OcrDataset, make_batches
from clstm_tpu.data.lines import LineGenerator, make_dataset_dir
from clstm_tpu.models.codec import Codec
from clstm_tpu.models.hl import CLSTMOCR, CLSTMText, CharPrediction


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    path = tmp_path_factory.mktemp("ocr")
    gen = LineGenerator(seed=3, fontsize=(20, 22), warp_amp=(0.0, 0.0),
                        noise=0.0, charset="ab")
    texts = [gen.random_text(2, 4) for _ in range(8)]
    manifest = make_dataset_dir(str(path), len(texts), gen=gen, texts=texts)
    return OcrDataset(manifest, target_height=24, dewarp="none")


def test_ocr_train_and_roundtrip(tiny_ds, tmp_path):
    codec = tiny_ds.build_codec()
    ocr = CLSTMOCR(target_height=24, dewarp="none")
    ocr.createBidi(codec, nhidden=24, seed=1)
    ocr.setLearningRate(6e-3, 0.9)

    samples = [tiny_ds.load(i) for i in range(len(tiny_ds))]
    rng = np.random.RandomState(0)
    losses = []
    for epoch in range(80):
        for batch in make_batches(samples, codec, batch_size=8, rng=rng):
            m = ocr.train_batch(batch)
            losses.append(float(m["loss"]) / len(batch["texts"]))
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])

    from clstm_tpu.io.png import read_png as _rp
    exact = sum(ocr.predict_utf8(_rp(tiny_ds.files[i])) == tiny_ds.text(i)
                for i in range(len(tiny_ds)))
    assert exact >= 5, (exact, len(tiny_ds))

    # Reference single-line APIs.
    from clstm_tpu.io.png import read_png
    img = read_png(tiny_ds.files[0])
    pred = ocr.predict_utf8(img)
    assert isinstance(pred, str)
    chars = ocr.predict(img)
    assert all(isinstance(c, CharPrediction) for c in chars)
    assert [c.c for c in chars] == list(pred)
    # x positions monotonically increase
    xs = [c.x for c in chars]
    assert xs == sorted(xs)

    # train_utf8 single-line path works and returns a string.
    out = ocr.train_utf8(img, tiny_ds.text(0))
    assert isinstance(out, str)

    # save -> load -> identical predictions (.clstm proto round trip).
    f = str(tmp_path / "m.clstm")
    ocr.save(f)
    ocr2 = CLSTMOCR(target_height=24, dewarp="none")
    ocr2.load(f)
    assert ocr2.codec.codec == codec.codec
    assert ocr2.predict_utf8(img) == ocr.predict_utf8(img)


def test_text_transduction_learns():
    """CLSTMText: toy clstmfilter task — uppercase the first half of a
    3-letter-alphabet string. Note the CTC constraint: the output must be
    comfortably shorter than the input frame count, or alignment has no
    slack (same constraint as the reference's filter tasks)."""
    rng = np.random.RandomState(0)

    def norep(n):
        s = [rng.choice(list("abc"))]
        while len(s) < n:
            c = rng.choice(list("abc"))
            if c != s[-1]:
                s.append(c)
        return "".join(s)

    ins = [norep(6) for _ in range(24)]
    outs = [s[:3].upper() for s in ins]
    icodec = Codec.build(ins)
    codec = Codec.build(outs)
    t = CLSTMText()
    t.createBidi(icodec, codec, nhidden=16, seed=0)
    t.setLearningRate(0.05, 0.9)
    for epoch in range(50):
        for a, b in zip(ins, outs):
            pred = t.train(a, b)
            assert isinstance(pred, str)
    ok = sum(t.predict(a) == b for a, b in zip(ins, outs))
    assert ok >= len(ins) * 2 // 3, (ok, len(ins))


def test_text_input_repeat_round_trips(tmp_path):
    """input_repeat persists through .clstm save/load (a k-trained model
    must not silently decode at k=1)."""
    icodec = Codec.build(["ab"])
    codec = Codec.build(["AB"])
    t = CLSTMText(input_repeat=3)
    t.createBidi(icodec, codec, nhidden=8, seed=0)
    assert t.encode_input("ab").shape[0] == 6
    f = str(tmp_path / "f.clstm")
    t.save(f)
    t2 = CLSTMText()
    t2.load(f)
    assert t2.input_repeat == 3
    assert t2.encode_input("ab").shape[0] == 6
    assert t2.predict("ab") == t.predict("ab")
