"""Native I/O runtime tests: C++ results must match the Python/scipy
pipeline (io/normalize.py, data/dataset.py, utils/metrics.py)."""

import numpy as np
import pytest

from clstm_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)")


def test_png_round_trip(tmp_path):
    img = np.linspace(0, 1, 64 * 32, dtype=np.float32).reshape(32, 64)
    f = str(tmp_path / "n.png")
    native.write_png(f, img)
    back = native.read_png(f)
    np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)
    # cross-check against the PIL path
    from clstm_tpu.io.png import read_png as pil_read
    np.testing.assert_allclose(pil_read(f), back, atol=1 / 255.0)


def test_levenshtein_matches_python():
    from clstm_tpu.utils.metrics import levenshtein as pylev
    rng = np.random.RandomState(0)
    for _ in range(20):
        a = list(rng.randint(0, 5, size=rng.randint(0, 30)))
        b = list(rng.randint(0, 5, size=rng.randint(0, 30)))
        assert native.levenshtein(a, b) == pylev(a, b)


def _test_image(h=60, w=300, seed=0):
    rng = np.random.RandomState(seed)
    img = np.ones((h, w), np.float32)
    xs = np.arange(w)
    centers = h / 2 + 6 * np.sin(2 * np.pi * xs / (2 * w))
    for x in range(w):
        c = int(centers[x])
        img[c - 4:c + 4, x] = rng.rand(8) * 0.2
    return img


@pytest.mark.parametrize("dewarp", ["none", "mean", "center"])
def test_prepare_line_matches_python(dewarp):
    from clstm_tpu.data.dataset import prepare_line as py_prepare
    from clstm_tpu.io.normalize import make_normalizer

    img = _test_image()
    want = py_prepare(img, make_normalizer(dewarp, 32), pad=8)
    got = native.prepare_line(img, 32, pad=8, dewarp=dewarp)
    assert got.shape == want.shape, (got.shape, want.shape)
    # float32-vs-scipy accumulation can flip per-column argmax ties in the
    # center curve, shifting isolated columns by one row; demand agreement
    # everywhere but a small tie-region fraction.
    d = np.abs(got - want)
    assert d.mean() < 1e-3, d.mean()
    assert (d > 5e-3).mean() < 0.01, (d > 5e-3).mean()


def test_prefetch_loader(tmp_path):
    from clstm_tpu.data.lines import LineGenerator, make_dataset_dir
    from clstm_tpu.data.dataset import OcrDataset

    gen = LineGenerator(seed=7, fontsize=(20, 24), charset="abc")
    manifest = make_dataset_dir(str(tmp_path / "ds"), 6, gen=gen)
    ds = OcrDataset(manifest, target_height=32, dewarp="center")
    with native.PrefetchLoader(ds.files, 32, pad=16, dewarp="center",
                               nthreads=4) as loader:
        assert len(loader) == 6
        close = 0
        for i in range(6):
            x = loader.get(i)
            want, _ = ds.load(i)
            assert x.shape == want.shape
            d = np.abs(x - want)
            # Lines whose estimated half-window r lands exactly on an int
            # boundary can flip by one between float pipelines, rescaling
            # the whole strip slightly; most lines must match tightly and
            # every line must still be visually identical.
            assert d.mean() < 0.05, (i, d.mean())
            close += d.mean() < 1e-3
        assert close >= 4, close


def test_loader_decode_error(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png")
    with native.PrefetchLoader([str(bad)], 32) as loader:
        with pytest.raises(IOError):
            loader.get(0)
