""".clstm proto save/load tests (reference clstm_proto.cc; SURVEY.md §3.3).

Round-trip must be bitwise for weights, structural for the spec tree, and
the reloaded net must produce identical outputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clstm_tpu.io.proto import (
    save_net, load_net, proto_of_net, net_of_proto, _GATES)
from clstm_tpu.io import clstm_pb2
from clstm_tpu.models.codec import Codec
from clstm_tpu.models.prefab import make_net_init
from clstm_tpu.models.spec import apply_net


def _make(kind="bidi", **kw):
    args = {"ninput": 6, "nhidden": 5, "noutput": 7, **kw}
    return make_net_init(kind, args, jax.random.PRNGKey(3))


def test_round_trip_bitwise(tmp_path):
    spec, params = _make()
    codec = Codec.build(["hello", "würld"])
    f = str(tmp_path / "model.clstm")
    save_net(f, spec, params, codec=codec)
    spec2, params2, codec2, icodec2 = load_net(f)

    assert spec2 == spec
    assert codec2.codec == codec.codec
    assert icodec2 is None

    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 6))
    lengths = jnp.array([9, 4])
    y1 = apply_net(spec, params, x, lengths)
    y2 = apply_net(spec2, params2, x, lengths)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_reference_weight_layout(tmp_path):
    """The proto must carry reference-layout arrays: per-gate WGI/WGF/WGO/WCI
    of shape (nhidden, 1+ninput+nhidden) with bias as column 0, and affine
    W1 of shape (noutput, 1+ninput) (SURVEY.md §3.3 contract)."""
    spec, params = _make("lstm1")
    node = proto_of_net(spec, params)
    assert node.kind == "Stacked"
    lstm, soft = node.sub[0], node.sub[1]
    assert lstm.kind == "NPLSTM" and soft.kind == "SoftmaxLayer"
    names = [a.name for a in lstm.weights]
    assert names == list(_GATES)
    for a in lstm.weights:
        assert tuple(a.dim) == (5, 1 + 6 + 5)
    (w1,) = soft.weights
    assert w1.name == "W1"
    assert tuple(w1.dim) == (7, 1 + 5)

    # Bias column: gate g bias must equal our fused b slice.
    b = np.asarray(params["sub"][0]["weights"]["b"])
    wgi = np.asarray(lstm.weights[0].value).reshape(5, 12)
    np.testing.assert_array_equal(wgi[:, 0], b[:5])
    # Input block must equal Wx slice transposed.
    Wx = np.asarray(params["sub"][0]["weights"]["Wx"])
    np.testing.assert_array_equal(wgi[:, 1:7], Wx[:, :5].T)
    Wh = np.asarray(params["sub"][0]["weights"]["Wh"])
    np.testing.assert_array_equal(wgi[:, 7:], Wh[:, :5].T)


def test_load_accepts_W_spelling(tmp_path):
    """SURVEY.md §3.3 names the affine array "W"; upstream source says "W1".
    The loader accepts both."""
    spec, params = _make("softmax", ninput=4, noutput=3)
    node = proto_of_net(spec, params)
    (arr,) = node.weights
    arr.name = "W"
    spec2, params2 = net_of_proto(node)
    np.testing.assert_array_equal(np.asarray(params2["weights"]["W"]),
                                  np.asarray(params["weights"]["W"]))


def test_icodec_round_trip(tmp_path):
    spec, params = _make()
    codec = Codec.build(["abc"])
    icodec = Codec.build(["xyz"])
    f = str(tmp_path / "m.clstm")
    save_net(f, spec, params, codec=codec, icodec=icodec)
    _, _, c2, i2 = load_net(f)
    assert c2.codec == codec.codec
    assert i2.codec == icodec.codec


def test_corrupt_file_raises(tmp_path):
    f = tmp_path / "bad.clstm"
    f.write_bytes(b"\x00\x01garbage")
    with pytest.raises(Exception):
        load_net(str(f))


def test_bidi2_round_trip_bitwise(tmp_path):
    """Deep 2-stack net (config 4 shape) round-trips bitwise."""
    spec, params = make_net_init(
        "bidi2", {"ninput": 6, "nhidden": 5, "noutput": 7, "nhidden2": 4},
        jax.random.PRNGKey(9))
    f = str(tmp_path / "deep.clstm")
    save_net(f, spec, params, codec=Codec.build(["xyz"]))
    spec2, params2, codec2, _ = load_net(f)
    assert spec2 == spec
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 6))
    l = jnp.array([7, 3])
    np.testing.assert_array_equal(
        np.asarray(apply_net(spec, params, x, l)),
        np.asarray(apply_net(spec2, params2, x, l)))


def test_attrs_round_trip(tmp_path):
    """Arbitrary attrs (e.g. input_repeat, initial) survive the proto."""
    from clstm_tpu.models.spec import init_net, layer
    spec = layer("SoftmaxLayer", 3, 2, {"initial": "0.05", "custom_key": "v"})
    params = init_net(spec, jax.random.PRNGKey(0))
    f = str(tmp_path / "a.clstm")
    save_net(f, spec, params)
    spec2, _, _, _ = load_net(f)
    assert spec2.get("custom_key") == "v"
    assert spec2.dget("initial") == 0.05


def test_load_accepts_separate_bias_wb(tmp_path):
    """Some reference builds may store affines unfused as "w" [O,D] + "b"
    [O] (unverifiable with the mount empty); the loader accepts that layout
    too (ADVICE.md round 1)."""
    spec, params = _make("softmax", ninput=4, noutput=3)
    node = proto_of_net(spec, params)
    W = np.asarray(params["weights"]["W"])   # [D, O]
    b = np.asarray(params["weights"]["b"])   # [O]
    del node.weights[:]
    wa = node.weights.add()
    wa.name = "w"
    wa.dim.extend(W.T.shape)
    wa.value.extend(W.T.reshape(-1).tolist())
    ba = node.weights.add()
    ba.name = "b"
    ba.dim.extend(b.shape)
    ba.value.extend(b.tolist())
    spec2, params2 = net_of_proto(node)
    np.testing.assert_array_equal(np.asarray(params2["weights"]["W"]), W)
    np.testing.assert_array_equal(np.asarray(params2["weights"]["b"]), b)
