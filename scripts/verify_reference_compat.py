#!/usr/bin/env python
"""Runnable .clstm bit-compatibility checklist against the real reference.

The reference mount (/root/reference) was EMPTY in rounds 1-2 (SURVEY.md
§0), so our clstm.proto field numbers, the affine weight name ("W1" vs
"W"), and the attribute keys are best-effort reconstructions. THE MOMENT a
reference tree is available, run:

    python scripts/verify_reference_compat.py [--reference /root/reference]

It performs, in order:
  1. proto schema diff    — parse the reference clstm.proto, compare every
                            message/field name+number against ours.
  2. weight-name check    — grep the reference sources for the affine
                            weight array name ("W1" / "W" / "w") and the
                            LSTM gate names WGI/WGF/WGO/WCI.
  3. attr-key check       — grep for the attribute keys written on save
                            (ninput/nhidden/noutput).
  4. checkpoint load      — if any *.clstm files exist under the reference
                            tree (or are passed via --checkpoint), load
                            them end-to-end through io/proto.py and run a
                            forward pass.
Exit code 0 = all checks pass (or are cleanly skipped with the mount still
empty); 1 = any divergence found. Divergences print a FIX: line naming the
repo file to update.

--regolden regenerates tests/golden/*.clstm and prints the new sha256
hashes to paste into tests/test_golden.py (use only after an INTENTIONAL
format change).
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUR_PROTO = os.path.join(REPO, "clstm_tpu", "io", "clstm.proto")

# What our writer emits (io/proto.py); checked against the reference source.
OUR_AFFINE_NAME = "W1"
OUR_GATES = ("WGI", "WGF", "WGO", "WCI")
OUR_ATTR_KEYS = ("ninput", "nhidden", "noutput")


def parse_proto_fields(text: str) -> dict:
    """-> {message: {field_name: number}} (proto2/3 subset, good enough)."""
    out = {}
    msg = None
    for line in text.splitlines():
        line = line.split("//")[0].strip()
        m = re.match(r"message\s+(\w+)", line)
        if m:
            msg = m.group(1)
            out[msg] = {}
            continue
        m = re.match(
            r"(?:required|optional|repeated)?\s*[\w.]+\s+(\w+)\s*=\s*(\d+)",
            line)
        if m and msg:
            out[msg][m.group(1)] = int(m.group(2))
    return out


def check_proto_schema(ref_proto_path: str) -> list:
    problems = []
    with open(OUR_PROTO) as f:
        ours = parse_proto_fields(f.read())
    with open(ref_proto_path) as f:
        ref = parse_proto_fields(f.read())
    for msg, fields in ref.items():
        if msg not in ours:
            problems.append(f"message {msg} missing from our clstm.proto")
            continue
        for name, num in fields.items():
            if name not in ours[msg]:
                problems.append(
                    f"{msg}.{name} (={num}) missing from our clstm.proto")
            elif ours[msg][name] != num:
                problems.append(
                    f"{msg}.{name}: reference number {num}, ours "
                    f"{ours[msg][name]}")
    for msg in ours:
        if msg not in ref:
            problems.append(f"our message {msg} absent from reference proto")
    if problems:
        problems.append("FIX: clstm_tpu/io/clstm.proto (then regenerate "
                        "clstm_pb2.py with protoc and --regolden)")
    return problems


def check_weight_names(ref_dir: str) -> list:
    problems = []
    srcs = []
    for pat in ("*.cc", "*.h", "*.cpp"):
        srcs += glob.glob(os.path.join(ref_dir, "**", pat), recursive=True)
    blob = ""
    for s in srcs:
        try:
            with open(s, errors="replace") as f:
                blob += f.read()
        except OSError:
            pass
    if not blob:
        return ["no C++ sources found under reference tree to grep"]
    for g in OUR_GATES:
        if f'"{g}"' not in blob:
            problems.append(f'LSTM gate weight name "{g}" not found in '
                            "reference sources")
    affine_hits = {n: f'"{n}"' in blob for n in ("W1", "W", "w")}
    if not affine_hits[OUR_AFFINE_NAME]:
        found = [n for n, hit in affine_hits.items() if hit]
        problems.append(
            f'affine weight name "{OUR_AFFINE_NAME}" not in reference '
            f"sources; found {found} — FIX: AFFINE_WEIGHT_NAME in "
            "clstm_tpu/io/proto.py")
    for k in OUR_ATTR_KEYS:
        if f'"{k}"' not in blob:
            problems.append(f'attr key "{k}" not found in reference sources')
    return problems


def check_checkpoints(paths: list) -> list:
    problems = []
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from clstm_tpu.io.proto import load_net, save_net
    from clstm_tpu.models.spec import apply_net

    for p in paths:
        try:
            spec, params, codec, icodec = load_net(p)
            ninput = int(spec.get("ninput", "0") or 0)
            if ninput <= 0:
                # fall back: infer from the first LSTM weight
                leaves = jax.tree.leaves(params)
                ninput = max(1, int(leaves[0].shape[0]) - 1)
            x = np.random.RandomState(0).rand(1, 16, ninput).astype("float32")
            probs = np.asarray(apply_net(spec, params, x,
                                         np.array([16], "int32")))
            assert np.isfinite(probs).all()
            # round-trip: re-save must be byte-identical
            out = p + ".resaved"
            save_net(out, spec, params, codec=codec, icodec=icodec)
            with open(p, "rb") as f:
                a = f.read()
            with open(out, "rb") as f:
                b = f.read()
            os.unlink(out)
            rt = "byte-identical" if a == b else "NOT byte-identical"
            print(f"  loaded {p}: forward ok, resave {rt}")
            if a != b:
                problems.append(
                    f"{p}: resave not byte-identical (field ordering or "
                    "layout drift) — diff the two files")
        except Exception as e:  # noqa: BLE001 - checklist tool, report all
            problems.append(f"{p}: load failed: {type(e).__name__}: {e}")
    return problems


def regolden() -> None:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clstm_tpu.io.proto import save_net
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.prefab import make_net_init

    golden = os.path.join(REPO, "tests", "golden")
    os.makedirs(golden, exist_ok=True)
    spec, params = make_net_init(
        "bidi", {"ninput": 6, "nhidden": 5, "noutput": 4},
        jax.random.PRNGKey(42))
    save_net(os.path.join(golden, "bidi_tiny.clstm"), spec, params,
             codec=Codec.build(["abc"]))
    spec2, params2 = make_net_init(
        "lstm1", {"ninput": 4, "nhidden": 3, "noutput": 5},
        jax.random.PRNGKey(7))
    save_net(os.path.join(golden, "lstm1_tiny.clstm"), spec2, params2,
             codec=Codec.build(["abcd"]), icodec=Codec.build(["xy"]))
    print("regenerated golden fixtures; paste into tests/test_golden.py:")
    for name in ("bidi_tiny.clstm", "lstm1_tiny.clstm"):
        with open(os.path.join(golden, name), "rb") as f:
            print(f'    "{name}":\n        '
                  f'"{hashlib.sha256(f.read()).hexdigest()}",')


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--checkpoint", action="append", default=[],
                    help="extra .clstm files to load-test")
    ap.add_argument("--regolden", action="store_true")
    args = ap.parse_args()

    if args.regolden:
        regolden()
        return 0

    problems = []
    ref = args.reference
    populated = os.path.isdir(ref) and any(os.scandir(ref))
    if not populated:
        print(f"reference mount {ref} is EMPTY — nothing to verify yet. "
              "Re-run when populated.")
        if not args.checkpoint:
            return 0
    else:
        protos = glob.glob(os.path.join(ref, "**", "*.proto"), recursive=True)
        if protos:
            print(f"1. proto schema diff vs {protos[0]}")
            problems += check_proto_schema(protos[0])
        else:
            problems.append("no .proto found in reference tree")
        print("2-3. weight-name / attr-key grep")
        problems += check_weight_names(ref)

    ckpts = list(args.checkpoint)
    if populated:
        ckpts += glob.glob(os.path.join(ref, "**", "*.clstm"), recursive=True)
    if ckpts:
        print("4. checkpoint load tests")
        problems += check_checkpoints(ckpts)
    elif populated:
        print("4. no reference .clstm checkpoints found to load — build the "
              "reference and train one trial to produce one, then re-run "
              "with --checkpoint")

    if problems:
        print("\nDIVERGENCES:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print("\nall compat checks passed" if populated else "")
    return 0


if __name__ == "__main__":
    sys.exit(main())
