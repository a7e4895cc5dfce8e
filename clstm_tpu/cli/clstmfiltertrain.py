"""clstmfiltertrain — string-transduction training CLI.

Reference: clstmfiltertrain.cc (≈L1-200, unverified; SURVEY.md §3.4).
Usage:  clstmfiltertrain TRAIN.tsv [TEST.tsv]
where each line is ``input<TAB>output``. Env params mirror clstmocrtrain:
save_name, load, ntrain, lrate, momentum, nhidden, report_every,
save_every, test_every, randseed, net=bidi.

TPU-native additions: batch_size=N (bucketed batched training),
input_repeat=k, log_jsonl= (structured JSONL metrics, as clstmocrtrain),
and mesh=N data-parallel devices (0 = all chips; engages automatically on
the batched path when more than one device is present, same
shard_map+psum step as clstmocrtrain).

Pipeline (mirrors clstmocrtrain; round-4 verdict weak #2 — the round-3
CLI streamed host-built one-hot batches one dispatch each and rebuilt the
one-hot corpus on host EVERY epoch, measured flat at ~330 pairs/s on the
tunneled chip): the batched path keeps the encoded corpus DEVICE-RESIDENT
as int32 character ids (data.device_cache.TextDeviceDataset — one-hot
expansion happens on device inside the jitted step) and fuses K
gather+train batches into ONE dispatch (lax.scan over the on-device
epoch plan; shard_map K-scan with a mesh). Extra env params:
  compile_cache=         persistent XLA compile-cache dir (see
                         clstmocrtrain; off = disable)
  cache=auto             device|host|auto — host falls back to streaming
                         host-built batches (the pre-round-5 path)
  steps_per_dispatch=0   K batches per dispatch (0 = auto K<=64, clamped
                         to the save/test cadence; 1 = one-step path)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from clstm_tpu.models.codec import Codec
from clstm_tpu.models.hl import CLSTMText
from clstm_tpu.train import unpack_report
from clstm_tpu.utils.config import getdenv, getienv, getsenv
from clstm_tpu.utils.metrics import levenshtein


def read_tsv(fname: str):
    pairs = []
    with open(fname, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if "\t" in line:
                a, b = line.split("\t", 1)
            else:
                a, b = line, line
            pairs.append((a, b))
    return pairs


def evaluate(model: CLSTMText, pairs, batch_size: int = 1) -> float:
    if batch_size > 1:
        from clstm_tpu.cli.clstmfilter import _predict_batched
        preds = _predict_batched(model, [a for a, _ in pairs], batch_size)
    else:
        preds = (model.predict(a) for a, _ in pairs)
    err = chars = 0
    for (a, b), pred in zip(pairs, preds):
        err += levenshtein(b, pred)
        chars += len(b)
    return err / max(chars, 1)


def train_batched(model: CLSTMText, train_pairs, test_pairs, *, ntrain,
                  batch_size, report_every, save_every, test_every,
                  save_name, rng, jsonl=None):
    """Bucketed batched training loop (the TPU throughput path)."""
    from clstm_tpu.data.dataset import make_text_batches, pad_batch_rows
    from clstm_tpu.ops.ctc import decode_frames

    trials = 0
    best_err = float("inf")
    next_report, next_save, next_test = report_every, save_every, test_every
    t0 = time.time()
    while trials < ntrain:
        for batch in make_text_batches(train_pairs, model.icodec, model.codec,
                                       batch_size, rng=rng,
                                       input_repeat=model.input_repeat):
            nreal = len(batch["texts"])
            m = model.train_batch(pad_batch_rows(batch, batch_size))
            trials += nreal
            if trials >= next_report:
                next_report += report_every
                L = batch["lengths"][0]
                # packed report (loss + row-0 ids/vals, pre-sliced inside
                # the jitted step): ONE host transfer (train.unpack_report)
                loss, ids, vals = unpack_report(m["report"], L)
                pred = model.codec.decode(decode_frames(ids, vals))
                rate = trials / (time.time() - t0)
                print(f"{trials} {loss:.4f} ({rate:.1f} pairs/s)")
                print(f"   TRU: {batch['texts'][0]!r}")
                print(f"   OUT: {pred!r}", flush=True)
                if jsonl:
                    jsonl.write(json.dumps({
                        "trial": trials, "loss": loss,
                        "pairs_per_sec": rate}) + "\n")
                    jsonl.flush()
            if test_pairs and trials >= next_test:
                next_test += test_every
                err = evaluate(model, test_pairs, batch_size)
                print(f"TESTERR {trials} {err:.4f}", flush=True)
                if jsonl:
                    jsonl.write(json.dumps(
                        {"trial": trials, "test_cer": err}) + "\n")
                    jsonl.flush()
                if err < best_err:
                    best_err = err
                    model.save(save_name + ".clstm")
                    print(f"# saved best ({err:.4f}) to {save_name}.clstm")
            if trials >= next_save:
                next_save += save_every
                model.save(save_name + "-last.clstm")
            if trials >= ntrain:
                break
    model.save(save_name + "-last.clstm")


def train_blocks(model: CLSTMText, dcache, test_pairs, *, ntrain,
                 batch_size, block_k, report_every, save_every, test_every,
                 save_name, rng, jsonl=None):
    """Fused K-step training loop over the device-resident text corpus
    (the TPU throughput path; structure mirrors clstmocrtrain's blocks
    loop — deferred report reads, trial-based cadences, ntrain clamp)."""
    from clstm_tpu.ops.ctc import decode_frames

    trials = 0
    best_err = float("inf")
    next_report = 0
    next_save, next_test = save_every, test_every
    t0 = time.time()
    pending = None  # (metrics, crossings, texts): read AFTER the next
    #                 dispatch is enqueued so the device->host RTT
    #                 overlaps the next block's compute.

    def flush_pending():
        nonlocal pending
        if pending is None:
            return
        m, crossings, btexts, bhls = pending
        pending = None
        rep = np.asarray(m["report_all"])
        for tr, s in crossings:
            L = int(bhls[s][0])
            loss, ids, vals = unpack_report(rep[s], L)
            pred = model.codec.decode(decode_frames(ids, vals))
            rate = trials / (time.time() - t0)
            print(f"{tr} {loss:.4f} ({rate:.1f} pairs/s)")
            print(f"   TRU: {btexts[s][0]!r}")
            print(f"   OUT: {pred!r}", flush=True)
            if jsonl:
                jsonl.write(json.dumps({
                    "trial": tr, "loss": loss, "pairs_per_sec": rate}) + "\n")
                jsonl.flush()

    while trials < ntrain:
        # epochs=block_k: multi-epoch plans keep every block at a full k
        # batches even when a bucket group holds 1-2 batches per epoch
        # (see DeviceDataset.epoch_blocks).
        for block in dcache.epoch_blocks(batch_size, block_k, rng=rng,
                                         epochs=block_k):
            nreal_per = block["nreal_per"]
            btexts, bhls = block["texts"], block["host_lengths"]
            if trials + block["nreal"] > ntrain:
                # ntrain budget clamp: run only enough batches of the
                # block to reach ntrain (overshoot <= one batch, like the
                # one-step path).
                nexec, acc = 0, 0
                while acc < ntrain - trials and nexec < len(nreal_per):
                    acc += nreal_per[nexec]
                    nexec += 1
                nexec = max(nexec, 1)
                nreal_per = nreal_per[:nexec]
                btexts, bhls = btexts[:nexec], bhls[:nexec]
                m = model.train_batch_block(block, k_max=block_k,
                                            nvalid=nexec)
            else:
                m = model.train_batch_block(block, k_max=block_k)
            flush_pending()
            crossings = []
            for s, n in enumerate(nreal_per):
                trials += n
                if trials >= next_report:
                    while next_report <= trials:
                        next_report += max(report_every, 1)
                    crossings.append((trials, s))
            if crossings:
                # Background D2H now, blocking read one block later (see
                # clstmocrtrain's note on the same line).
                m["report_all"].copy_to_host_async()
                pending = (m, crossings, btexts, bhls)
            if test_pairs and trials >= next_test:
                flush_pending()
                while next_test <= trials:
                    next_test += max(test_every, 1)
                err = evaluate(model, test_pairs, batch_size)
                print(f"TESTERR {trials} {err:.4f}", flush=True)
                if jsonl:
                    jsonl.write(json.dumps(
                        {"trial": trials, "test_cer": err}) + "\n")
                    jsonl.flush()
                if err < best_err:
                    best_err = err
                    model.save(save_name + ".clstm")
                    print(f"# saved best ({err:.4f}) to {save_name}.clstm")
            if trials >= next_save:
                while next_save <= trials:
                    next_save += max(save_every, 1)
                model.save(save_name + "-last.clstm")
            if trials >= ntrain:
                break
    flush_pending()
    model.save(save_name + "-last.clstm")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1
    from clstm_tpu.utils.config import enable_compile_cache
    enable_compile_cache(getsenv("compile_cache", ""))
    save_name = getsenv("save_name", "filter")
    load = getsenv("load", "")
    ntrain = getienv("ntrain", 1000000)
    lrate = getdenv("lrate", 1e-4)
    momentum = getdenv("momentum", 0.9)
    nhidden = getienv("nhidden", 100)
    report_every = getienv("report_every", 100)
    save_every = getienv("save_every", 1000)
    test_every = getienv("test_every", 10000)
    randseed = getienv("randseed", 0)
    net_kind = getsenv("net", "bidi")
    batch_size = getienv("batch_size", 1)
    input_repeat = getienv("input_repeat", 1)
    log_jsonl = getsenv("log_jsonl", "")
    cache_mode = getsenv("cache", "auto")
    steps_per_dispatch = getienv("steps_per_dispatch", 0)  # 0 = auto K

    train_pairs = read_tsv(argv[0])
    test_pairs = read_tsv(argv[1]) if len(argv) > 1 else None
    print(f"# {len(train_pairs)} training pairs"
          + (f", {len(test_pairs)} test pairs" if test_pairs else ""))

    model = CLSTMText(input_repeat=input_repeat)
    if load:
        model.load(load)
        print(f"# loaded {load}")
    else:
        icodec = Codec.build(a for a, _ in train_pairs)
        codec = Codec.build(b for _, b in train_pairs)
        model.createBidi(icodec, codec, nhidden, kind=net_kind, seed=randseed)
    model.setLearningRate(lrate, momentum)

    def report_drops():
        for name, c in (("codec", model.codec), ("icodec", model.icodec)):
            if c is not None and c.dropped:
                print(f"# WARNING [{name}]: {c.dropped_report()}")

    # Over-bucket truncation accounting (mirrors clstmocrtrain): inputs
    # longer than the largest text T bucket lose frames; outputs whose
    # blank-interleaved targets overflow S_BUCKETS train toward a
    # TRUNCATED string.
    from clstm_tpu.data.dataset import (S_BUCKETS, T_BUCKETS,
                                        TEXT_T_BUCKETS, truncation_report)
    k = model.input_repeat
    # The batched path buckets inputs with TEXT_T_BUCKETS (max 512); the
    # batch_size=1 path goes through CLSTMText._one_batch, which uses the
    # image-width T_BUCKETS (max 4096) — warn against the bucket list the
    # selected path actually truncates at.
    tb = TEXT_T_BUCKETS if batch_size > 1 else T_BUCKETS
    t_over = sum(len(model.icodec.encode(a)) * k > tb[-1]
                 for a, _ in train_pairs)
    s_over = sum(2 * len(model.codec.encode(b)) + 1 > S_BUCKETS[-1]
                 for _, b in train_pairs)
    if t_over or s_over:
        print("# WARNING: "
              + truncation_report(t_over, s_over, tb, S_BUCKETS),
              flush=True)

    # Multi-chip DP (mirrors clstmocrtrain's mesh= wiring): only on the
    # batched path, where batch rows can shard over the mesh.
    mesh_n = getienv("mesh", 0)
    if batch_size > 1:
        import jax
        n_mesh = min(mesh_n if mesh_n > 0 else jax.device_count(),
                     jax.device_count())
        if n_mesh > 1:
            from clstm_tpu.parallel.mesh import make_mesh
            if batch_size % n_mesh:
                batch_size = -(-batch_size // n_mesh) * n_mesh
                print(f"# batch_size -> {batch_size} (mesh {n_mesh})")
            model.set_mesh(make_mesh(n_mesh))
            print(f"# data-parallel over {n_mesh} devices", flush=True)

    rng = np.random.RandomState(randseed)
    jsonl = open(log_jsonl, "a") if log_jsonl else None
    if batch_size > 1:
        if cache_mode != "host":
            # Device-resident int-id corpus + fused K-step dispatch (the
            # throughput path; text corpora are tiny resident — 4
            # bytes/frame — so "auto" always caches).
            from clstm_tpu.data.device_cache import TextDeviceDataset
            dcache = TextDeviceDataset(
                train_pairs, model.icodec, model.codec,
                input_repeat=model.input_repeat, mesh=model.mesh)
            print(f"# device cache: {dcache.nbytes / 1e6:.1f} MB resident",
                  flush=True)
            if steps_per_dispatch > 0:
                block_k = steps_per_dispatch
            else:
                block_k = max(1, min(64, save_every // batch_size,
                                     (test_every // batch_size
                                      if test_pairs else 64)))
            train_blocks(model, dcache, test_pairs, ntrain=ntrain,
                         batch_size=batch_size, block_k=block_k,
                         report_every=report_every, save_every=save_every,
                         test_every=test_every, save_name=save_name,
                         rng=rng, jsonl=jsonl)
        else:
            train_batched(model, train_pairs, test_pairs, ntrain=ntrain,
                          batch_size=batch_size, report_every=report_every,
                          save_every=save_every, test_every=test_every,
                          save_name=save_name, rng=rng, jsonl=jsonl)
        report_drops()
        if jsonl:
            jsonl.close()
        return 0
    trials = 0
    best_err = float("inf")
    t0 = time.time()
    while trials < ntrain:
        a, b = train_pairs[rng.randint(len(train_pairs))]
        pred = model.train(a, b)
        trials += 1
        if trials % report_every == 0:
            rate = trials / (time.time() - t0)
            print(f"{trials} ({rate:.1f} pairs/s)")
            print(f"   INP: {a!r}")
            print(f"   TRU: {b!r}")
            print(f"   OUT: {pred!r}", flush=True)
        if test_pairs and trials % test_every == 0:
            err = evaluate(model, test_pairs)
            print(f"TESTERR {trials} {err:.4f}", flush=True)
            if jsonl:
                jsonl.write(json.dumps(
                    {"trial": trials, "test_cer": err}) + "\n")
                jsonl.flush()
            if err < best_err:
                best_err = err
                model.save(save_name + ".clstm")
                print(f"# saved best ({err:.4f}) to {save_name}.clstm")
        if trials % save_every == 0:
            model.save(save_name + "-last.clstm")
    model.save(save_name + "-last.clstm")
    report_drops()
    if jsonl:
        jsonl.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
