""".clstm protobuf checkpoint save/load.

Reference: clstm_proto.cc (≈L1-250, unverified; empty mount — SURVEY.md §0):
``proto_of_net`` walks the INetwork tree into NetworkProto {kind, attrs,
named weight Arrays with dims, codec int arrays, recursive sub};
``load_net`` reconstructs via make_layer(kind), sets attrs, fills weights by
name. This is the bit-compatibility contract (SURVEY.md §3.3): kinds
("Stacked","Parallel","Reversed","NPLSTM","SoftmaxLayer",...), weight names
(WGI/WGF/WGO/WCI for the LSTM; W1 — with "W" accepted — for affine layers),
shapes (nhidden, 1+ninput+nhidden) with the bias folded in as column 0, and
row-major float arrays.

Layout conversion: the TPU-native LSTM stores fused (Wx [D,4H], Wh [H,4H],
b [4H]) with gate order (GI,GF,GO,CI) (ops/lstm.py); each reference gate
matrix is the transposed [bias | input | recurrent] slice:
    ref_Wg = concat([b_g[:,None], Wx_g.T, Wh_g.T], axis=1)  # [H, 1+D+H]
Affine layers store (W [D,O], b [O]); reference W1 = [b | W.T]  # [O, 1+D].
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from clstm_tpu.io import clstm_pb2
from clstm_tpu.models.codec import Codec
from clstm_tpu.models.spec import NetSpec, resolve_kind

# Layer kinds whose weights are a single affine (reference Full-style).
_AFFINE_KINDS = {"LinearLayer", "SigmoidLayer", "TanhLayer", "ReluLayer",
                 "SoftmaxLayer"}
# Name the reference uses for the affine weight array. "W1" per the final
# upstream source (low confidence; SURVEY.md §3.3 says "W" — the loader
# accepts both spellings, plus separate-bias "w"/"b" variants).
AFFINE_WEIGHT_NAME = "W1"

_GATES = ("WGI", "WGF", "WGO", "WCI")  # order matches ops/lstm.py GATE_ORDER


def _add_array(node, name: str, arr: np.ndarray):
    a = node.weights.add()
    a.name = name
    a.dim.extend(int(d) for d in arr.shape)
    a.value.extend(np.asarray(arr, np.float32).reshape(-1).tolist())


def _get_arrays(node) -> dict:
    out = {}
    for a in node.weights:
        out[a.name] = np.asarray(a.value, np.float32).reshape(tuple(a.dim))
    return out


def proto_of_net(spec: NetSpec, params: dict,
                 codec: Optional[Codec] = None,
                 icodec: Optional[Codec] = None,
                 _root: bool = True):
    """Recursively build a NetworkProto tree from (spec, params)."""
    node = clstm_pb2.NetworkProto()
    kind = resolve_kind(spec.kind)
    node.kind = kind
    for k, v in spec.attr:
        kv = node.attribute.add()
        kv.key = k
        kv.value = v
    w = {k: np.asarray(v) for k, v in params["weights"].items()}
    if kind == "NPLSTM":
        Wx, Wh, b = w["Wx"], w["Wh"], w["b"]
        H = Wh.shape[0]
        for g, name in enumerate(_GATES):
            s = slice(g * H, (g + 1) * H)
            ref = np.concatenate(
                [b[s][:, None], Wx[:, s].T, Wh[:, s].T], axis=1)
            _add_array(node, name, ref)
    elif kind in _AFFINE_KINDS:
        W, b = w["W"], w["b"]
        ref = np.concatenate([b[:, None], W.T], axis=1)  # [O, 1+D]
        _add_array(node, AFFINE_WEIGHT_NAME, ref)
    elif w:
        for name, arr in w.items():
            _add_array(node, name, arr)
    if _root:
        if codec is not None:
            node.codec.extend(int(c) for c in codec.codec)
        if icodec is not None:
            node.icodec.extend(int(c) for c in icodec.codec)
    for s, p in zip(spec.sub, params["sub"]):
        node.sub.append(proto_of_net(s, p, _root=False))
    return node


def net_of_proto(node) -> Tuple[NetSpec, dict]:
    """Reconstruct (spec, params) from a NetworkProto tree."""
    kind = resolve_kind(node.kind)
    attr = {kv.key: kv.value for kv in node.attribute}
    subs = [net_of_proto(s) for s in node.sub]
    spec = NetSpec.make(kind, attr, [s for s, _ in subs])
    arrays = _get_arrays(node)
    weights = {}
    if kind == "NPLSTM":
        gates = [arrays[name] for name in _GATES]
        H = gates[0].shape[0]
        D = gates[0].shape[1] - 1 - H
        b = np.concatenate([g[:, 0] for g in gates])
        Wx = np.concatenate([g[:, 1:1 + D].T for g in gates], axis=1)
        Wh = np.concatenate([g[:, 1 + D:].T for g in gates], axis=1)
        weights = {"Wx": jnp.asarray(Wx), "Wh": jnp.asarray(Wh),
                   "b": jnp.asarray(b)}
    elif kind in _AFFINE_KINDS:
        ref = None
        for name in (AFFINE_WEIGHT_NAME, "W", "W1"):
            if name in arrays:
                ref = arrays[name]
                break
        if ref is not None:
            weights = {"W": jnp.asarray(ref[:, 1:].T),
                       "b": jnp.asarray(ref[:, 0])}
        elif "w" in arrays:
            # Separate-bias variant: "w" [O, D] + optional "b" [O] (some
            # reference builds store the affine unfused — unverifiable with
            # the mount empty, so accept both layouts).
            wa = arrays["w"]
            ba = arrays.get("b", np.zeros(wa.shape[0], np.float32))
            weights = {"W": jnp.asarray(wa.T), "b": jnp.asarray(ba)}
        else:
            raise ValueError(f"{kind}: no affine weight array in "
                             f"{sorted(arrays)}")
    elif arrays:
        weights = {k: jnp.asarray(v) for k, v in arrays.items()}
    params = {"weights": weights, "sub": [p for _, p in subs]}
    return spec, params


def save_net(fname: str, spec: NetSpec, params: dict,
             codec: Optional[Codec] = None,
             icodec: Optional[Codec] = None) -> None:
    """Serialize to a .clstm file (reference save_net)."""
    node = proto_of_net(spec, params, codec=codec, icodec=icodec)
    with open(fname, "wb") as f:
        f.write(node.SerializeToString())


def load_net(fname: str):
    """Load a .clstm file -> (spec, params, codec, icodec).

    codec/icodec are None when absent from the file (reference nets always
    persist at least ``codec`` when trained via the high-level API).
    """
    node = clstm_pb2.NetworkProto()
    with open(fname, "rb") as f:
        node.ParseFromString(f.read())
    spec, params = net_of_proto(node)
    codec = Codec(list(node.codec)) if node.codec else None
    icodec = Codec(list(node.icodec)) if node.icodec else None
    return spec, params, codec, icodec
