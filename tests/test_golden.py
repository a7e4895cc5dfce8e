"""Golden .clstm byte fixtures: any drift in the on-disk format fails here.

The .clstm format is the bit-compatibility contract with the reference
(clstm_proto.cc ≈L1-250, unverified; SURVEY.md §3.3). With the reference
mount empty, these fixtures are the forcing function: they freeze OUR
current byte layout so accidental format drift (field renumbering, weight
renaming, layout changes) is caught loudly, and they give the
mount-appears checklist (scripts/verify_reference_compat.py) known inputs.

If a format change is ever INTENTIONAL (e.g. the real reference proto
turns out to differ), regenerate the fixtures with
``python scripts/verify_reference_compat.py --regolden`` and say so in the
commit message.
"""

import hashlib
import os

import numpy as np
import jax

from clstm_tpu.io.proto import load_net, save_net

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

# sha256 of the committed fixtures (locked 2026-08-16, round 2).
HASHES = {
    "bidi_tiny.clstm":
        "642b4cfd3fc3721b791e998881079061612f5d73e45c4809888a0b5cddc92c9a",
    "lstm1_tiny.clstm":
        "64a444f26313d7ba3dc93a1e018dfd49b74ef1d8771ecd403de462c7f9c5a5cf",
}


def _sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_golden_fixtures_unchanged():
    for name, want in HASHES.items():
        assert _sha(os.path.join(GOLDEN, name)) == want, (
            f"{name} bytes changed on disk — golden fixtures must only "
            "change with a deliberate --regolden")


def test_golden_load_save_is_byte_identical(tmp_path):
    """Loading a golden file and re-saving it must reproduce the bytes
    exactly: proves the loader/saver pair is lossless and the format stable."""
    for name in HASHES:
        src = os.path.join(GOLDEN, name)
        spec, params, codec, icodec = load_net(src)
        out = str(tmp_path / name)
        save_net(out, spec, params, codec=codec, icodec=icodec)
        with open(src, "rb") as f:
            a = f.read()
        with open(out, "rb") as f:
            b = f.read()
        assert a == b, f"{name}: save(load(x)) != x — format drift"


def test_golden_bidi_structure_and_inference():
    """The golden bidi fixture must load into a working net with the
    reference topology (Stacked[Parallel[NPLSTM, Reversed[NPLSTM]],
    SoftmaxLayer]) and produce finite posteriors."""
    from clstm_tpu.models.spec import apply_net, resolve_kind

    spec, params, codec, icodec = load_net(
        os.path.join(GOLDEN, "bidi_tiny.clstm"))
    assert resolve_kind(spec.kind) == "Stacked"
    assert [resolve_kind(s.kind) for s in spec.sub] == ["Parallel",
                                                        "SoftmaxLayer"]
    assert codec is not None and codec.size() == 4
    x = np.linspace(0, 1, 2 * 16 * 6, dtype=np.float32).reshape(2, 16, 6)
    probs = np.asarray(apply_net(spec, params, x,
                                 np.array([16, 12], np.int32)))
    assert probs.shape == (2, 16, 4)
    assert np.isfinite(probs[0]).all()
    np.testing.assert_allclose(probs[0].sum(-1), 1.0, rtol=1e-5)
