"""Device-resident dataset cache: upload the corpus once, gather batches
on device every epoch.

The reference trains one line at a time from host memory
(clstmocrtrain.cc ≈L100, SURVEY.md §3.1) — on TPU that pattern makes the
host->device link the bottleneck: at the UW3 bench shape one epoch moves
~200KB/line (~400MB for 2k lines) while the compute for the same epoch is
milliseconds. Round-2 measurement on the tunneled v5e: 31 MB/s H2D, so
the streaming CLI loop ran at 170 lines/s against a 15.2k lines/s device
step — 1.1% pipeline efficiency.

TPU-native answer: OCR corpora are small (UW3-500 is 500 lines; even
100k prepared lines ≈ 20GB > HBM, but typical sets fit easily), so stack
each (T_bucket, S_bucket) group into one resident device array set and
build every epoch's batches with an on-device gather over a permuted
index vector. Per batch the host then ships ONLY the [B] index vector
(~1KB). Epoch semantics (bucketed static shapes, right-padding, zero-row
padding of remainder batches) are identical to data/dataset.py
make_batches + pad_batch_rows — equivalence is tested in
tests/test_device_cache.py.

Each group carries one extra all-zero sentinel row (length 0, empty
targets); remainder batches pad with the sentinel index, and zero-length
rows are already masked out of loss, gradients and decode everywhere.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from clstm_tpu.data.dataset import (S_BUCKETS, T_BUCKETS, TEXT_T_BUCKETS,
                                    auto_t_cuts, bucket_for)
from clstm_tpu.models.codec import Codec
from clstm_tpu.ops.ctc import mktargets_ids


def measure_dispatch_penalty_rows(device=None, reps: int = 5) -> float:
    """Per-dispatch overhead of the current backend, in executed
    frame-rows (the auto_t_cuts cost unit): median round-trip of a tiny
    jitted op times the chip's measured ~22M frame-rows/s recurrence
    throughput (runs/r5/waste_ceiling.jsonl; env
    ``bucket_dp_rows_per_sec`` overrides, e.g. for a bigger model whose
    per-row cost is higher). Tunneled chip: ~20-40ms RTT -> ~0.5-0.9M
    rows per dispatch; PCIe host ~1ms -> ~22k; CPU tests ~us -> ~0."""
    import os
    import time
    rows_per_s = float(os.environ.get("bucket_dp_rows_per_sec", 22e6))
    try:
        f = jax.jit(lambda v: v + 1.0, device=device)
    except TypeError:  # newer jax: device= removed from jit
        f = jax.jit(lambda v: v + 1.0)
    a = jnp.zeros((8, 128), jnp.float32)
    if device is not None:
        a = jax.device_put(a, device)
    f(a).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f(a).block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * rows_per_s


def _resolve_t_buckets(t_buckets, lengths, auto_hints, device=None,
                       s_lengths=None):
    """``t_buckets="auto"`` -> corpus-adaptive DP cuts (auto_t_cuts) from
    the given per-line frame lengths (+ blank-interleaved target sizes
    for the CTC lattice term); anything else passes through."""
    if not (isinstance(t_buckets, str) and t_buckets == "auto"):
        return t_buckets
    hints = dict(auto_hints or {})
    if "dispatch_penalty_rows" not in hints:
        try:
            hints["dispatch_penalty_rows"] = measure_dispatch_penalty_rows(
                device)
        except Exception:
            hints["dispatch_penalty_rows"] = 0.0
    return auto_t_cuts(lengths, s_lengths=s_lengths, **hints)


@jax.jit
def _gather(x, targets, lengths, tlens, idx):
    return x[idx], targets[idx], lengths[idx], tlens[idx]


def _gather_at_impl(x, targets, lengths, tlens, idx_all, j):
    """Gather batch j of a device-resident epoch index plan [nb, B].

    The batch counter j lives ON DEVICE and the incremented counter is
    returned, so the per-batch call has no host->device operand at all —
    a pure async dispatch. (A fresh host index vector per batch costs a
    ~26ms tunnel round-trip; measured round 2.)"""
    idx = jax.lax.dynamic_index_in_dim(idx_all, j, axis=0, keepdims=False)
    return x[idx], targets[idx], lengths[idx], tlens[idx], j + 1


_gather_at = jax.jit(_gather_at_impl)


class DeviceDataset:
    """Bucket-grouped, device-resident prepared samples.

    samples: list of (x [T, H] float32, text) as produced by
    OcrDataset.load_all / prepare_line. Grouping and padding match
    make_batches exactly (same buckets, same truncation rules).
    """

    def __init__(self, samples: Sequence[Tuple[np.ndarray, str]],
                 codec: Codec,
                 t_buckets: Sequence[int] = T_BUCKETS,
                 s_buckets: Sequence[int] = S_BUCKETS,
                 device=None, mesh=None, axis: str = "data",
                 merge_sb: bool = False,
                 auto_hints: Optional[dict] = None):
        """``merge_sb=True`` groups by T bucket ONLY and pads every line
        in a group to the group's largest needed S bucket. Fewer, larger
        groups mean fewer partial batches (less zero-row padding compute)
        and fewer compiled shapes, at the cost of a wider CTC lattice for
        short-target lines — measured round 5 on the bench corpus the row
        waste drops 11%->3% while the extra lattice cost is noise, so the
        CLIs default to it on the cache path.

        ``t_buckets="auto"`` solves for corpus-adaptive cuts instead of a
        fixed grid (data/dataset.py auto_t_cuts); ``auto_hints`` passes
        the plan parameters the DP's cost model needs (batch_size,
        epochs, k — the CLI forwards its actual values) and optionally
        dispatch_penalty_rows (otherwise measured on the live backend)."""
        self._init_placement(device, mesh, axis)
        t_buckets = _resolve_t_buckets(
            t_buckets, [x.shape[0] for x, _ in samples], auto_hints, device,
            s_lengths=[2 * len(codec.encode(t)) + 1 for _, t in samples])
        groups: dict = {}
        self.t_truncated = self.s_truncated = 0  # over-bucket lines (see
        #                        dataset.count_truncations; CLIs warn)
        for x, text in samples:
            classes = codec.encode(text)
            tb = bucket_for(x.shape[0], t_buckets)
            sb = bucket_for(2 * len(classes) + 1, s_buckets)
            self.t_truncated += x.shape[0] > t_buckets[-1]
            self.s_truncated += 2 * len(classes) + 1 > s_buckets[-1]
            key = tb if merge_sb else (tb, sb)
            groups.setdefault(key, []).append((x, text, classes, sb))

        if merge_sb:
            groups = {(tb, max(it[3] for it in items)): items
                      for tb, items in groups.items()}

        self.groups = []
        self.nbytes = 0
        for (tb, sb), items in sorted(groups.items()):
            items = [it[:3] for it in items]
            N = len(items)
            H = items[0][0].shape[1]
            x = np.zeros((N + 1, tb, H), np.float32)     # +1 zero sentinel
            lengths = np.zeros(N + 1, np.int32)
            targets = np.zeros((N + 1, sb), np.int32)
            tlens = np.zeros(N + 1, np.int32)
            texts: List[str] = []
            for i, (xi, text, classes) in enumerate(items):
                T = min(xi.shape[0], tb)
                x[i, :T] = xi[:T]
                lengths[i] = T
                ids = mktargets_ids(classes)
                S = min(len(ids), sb)
                targets[i, :S] = ids[:S]
                tlens[i] = S
                texts.append(text)
            self.nbytes += x.nbytes + targets.nbytes
            put = self._put
            self.groups.append({
                "tb": tb, "sb": sb, "n": N, "texts": texts,
                "x": put(x), "targets": put(targets),
                "lengths": put(lengths), "tlens": put(tlens),
                "host_lengths": lengths,
            })

    def _init_placement(self, device=None, mesh=None, axis: str = "data"):
        # Sharded placement (multi-chip DP): the corpus groups are small,
        # so they are REPLICATED across the mesh and each per-batch gather
        # emits its outputs sharded along the batch dim — every device
        # gathers only its own rows locally (no collectives); the batch
        # lands already placed for parallel.dp.make_parallel_train_step.
        self.mesh = mesh
        self._repl = None
        self._device = device
        self._gather_at = _gather_at
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._repl = NamedSharding(mesh, P())
            row = NamedSharding(mesh, P(axis))
            self._gather_at = jax.jit(
                _gather_at_impl,
                out_shardings=(row, row, row, row, self._repl))

    def _put(self, a):
        if self._repl is not None:
            return jax.device_put(a, self._repl)
        if self._device is not None:
            return jax.device_put(a, self._device)
        return jax.device_put(a)

    @classmethod
    def from_files(cls, files: Sequence[str], texts: Sequence[str],
                   codec: Codec, *,
                   target_height: int = 48, dewarp: str = "center",
                   pad: int = 16,
                   t_buckets: Sequence[int] = T_BUCKETS,
                   s_buckets: Sequence[int] = S_BUCKETS,
                   chunk_size: int = 64,
                   device=None, mesh=None, axis: str = "data",
                   nthreads: int = 0,
                   merge_sb: bool = False,
                   auto_hints: Optional[dict] = None) -> "DeviceDataset":
        """Build the cache DIRECTLY from raw line images, with the whole
        normalization/transposition stage running ON DEVICE.

        The host only decodes PNGs (threaded) and packs raw pixel buffers;
        dewarping, rescaling, renormalization and time-major layout run as
        one jitted batch kernel per chunk (ops/preprocess.py
        prepare_batch_device — parity-tested against the host scipy path).
        This makes cold-start corpus preparation ~free and extends the
        north star's "normalization on device" to the TRAINING pipeline
        (reference per-line host loop: clstmocrtrain.cc ≈L100 +
        extras.cc CenterNormalizer, SURVEY.md §3.1).

        Grouping uses the host-side width ESTIMATE (estimate_out_T's upper
        bound) for T-bucket selection — the exact normalized width is only
        known on device — so a line near a bucket edge may land one bucket
        higher than the host-prepared path would put it; contents and
        lengths are identical either way.
        """
        from concurrent.futures import ThreadPoolExecutor

        import jax.numpy as jnp

        from clstm_tpu.io import native
        from clstm_tpu.io.png import read_png as py_read_png
        from clstm_tpu.models.hl import _canon_dewarp
        from clstm_tpu.ops.ctc import mktargets_ids as _mk
        from clstm_tpu.ops.preprocess import (
            estimate_out_T, prepare_batch_device)

        kind = _canon_dewarp(dewarp)

        self = cls.__new__(cls)
        self._init_placement(device, mesh, axis)
        self.groups = []
        self.nbytes = 0

        reader = native.read_png if native.available() else py_read_png
        nthreads = nthreads or min(16, max(4, (len(files) + 63) // 64))
        with ThreadPoolExecutor(nthreads) as pool:
            raws = list(pool.map(reader, files))

        est_Ts = [estimate_out_T([raw], target_height, pad) for raw in raws]
        t_buckets = _resolve_t_buckets(
            t_buckets, est_Ts, auto_hints, device,
            s_lengths=[2 * len(codec.encode(t)) + 1 for t in texts])

        groups: dict = {}
        self.t_truncated = self.s_truncated = 0
        for raw, text, est_T in zip(raws, texts, est_Ts):
            classes = codec.encode(text)
            tb = bucket_for(est_T, t_buckets)
            sb = bucket_for(2 * len(classes) + 1, s_buckets)
            self.t_truncated += est_T > t_buckets[-1]
            self.s_truncated += 2 * len(classes) + 1 > s_buckets[-1]
            key = tb if merge_sb else (tb, sb)
            groups.setdefault(key, []).append((raw, text, classes, sb))

        if merge_sb:  # group by T bucket only; sb = group max (see __init__)
            groups = {(tb, max(it[3] for it in items)): items
                      for tb, items in groups.items()}

        for (tb, sb), items in sorted(groups.items()):
            items = [it[:3] for it in items]
            N = len(items)
            dev_x, dev_len = [], []
            for lo in range(0, N, chunk_size):
                chunk = [it[0] for it in items[lo:lo + chunk_size]]
                n = len(chunk)
                # Fixed chunk B + bucketed raw buffer dims keep the jitted
                # prepare kernel at a bounded set of compilations. Short
                # chunks pad by repeating row 0 (an all-zero pad image can
                # produce degenerate normalizer measurements); padded rows
                # are sliced off below.
                chunk = chunk + [chunk[0]] * (chunk_size - n)
                hb = -(-max(im.shape[0] for im in chunk) // 16) * 16
                wb = 128
                while wb < max(im.shape[1] for im in chunk):
                    wb *= 2
                buf = np.zeros((chunk_size, hb, wb), np.float32)
                hs = np.zeros(chunk_size, np.int32)
                ws = np.zeros(chunk_size, np.int32)
                for i, im in enumerate(chunk):
                    h, w = im.shape
                    buf[i, :h, :w] = im
                    hs[i], ws[i] = h, w
                # 8-bit upload fast path (see pack_raw_images): PNG
                # sources are k/255-exact, so shipping uint8 and
                # converting on device is bit-identical at 1/4 the bytes.
                q = np.rint(buf * 255.0)
                if q.max(initial=0.0) <= 255.0 and np.array_equal(
                        q.astype(np.float32) / np.float32(255.0), buf):
                    buf = q.astype(np.uint8)
                x, lengths = prepare_batch_device(
                    jnp.asarray(buf), jnp.asarray(hs), jnp.asarray(ws),
                    kind=kind, target_height=target_height, out_T=tb,
                    pad=pad)
                dev_x.append(x[:n])
                dev_len.append(lengths[:n])
            th = target_height
            x_all = jnp.concatenate(
                dev_x + [jnp.zeros((1, tb, th), jnp.float32)])  # sentinel
            len_all = jnp.concatenate(
                dev_len + [jnp.zeros((1,), jnp.int32)])
            targets = np.zeros((N + 1, sb), np.int32)
            tlens = np.zeros(N + 1, np.int32)
            gtexts: List[str] = []
            for i, (_, text, classes) in enumerate(items):
                ids = _mk(classes)
                S = min(len(ids), sb)
                targets[i, :S] = ids[:S]
                tlens[i] = S
                gtexts.append(text)
            host_lengths = np.asarray(len_all)
            self.nbytes += x_all.size * 4 + targets.nbytes
            put = self._put
            self.groups.append({
                "tb": tb, "sb": sb, "n": N, "texts": gtexts,
                "x": put(x_all), "targets": put(targets),
                "lengths": put(len_all), "tlens": put(tlens),
                "host_lengths": host_lengths,
            })
        return self

    def __len__(self) -> int:
        return sum(g["n"] for g in self.groups)

    def epoch(self, batch_size: int,
              rng: Optional[np.random.RandomState] = None,
              drop_remainder: bool = False) -> Iterator[dict]:
        """Yield device batches covering every sample once.

        Each batch dict has device arrays x/lengths/targets/target_lengths
        (shapes [B, Tb, H]/[B]/[B, Sb]/[B]) plus host-side "texts" (real
        rows only) and "host_lengths" [B] for reporting/decode. Rows beyond
        len(texts) are zero-length sentinel padding.
        """
        for p in self._epoch_seq(batch_size, rng, drop_remainder):
            g = p[0]
            chunk = p[1][p[4]]        # host copy of this batch's indices
            p[4] += 1
            x, targets, lengths, tlens, p[3] = self._gather_at(
                g["x"], g["targets"], g["lengths"], g["tlens"], p[2], p[3])
            nreal = int(np.sum(chunk < g["n"]))
            yield {
                "x": x, "lengths": lengths, "targets": targets,
                "target_lengths": tlens,
                "texts": [g["texts"][i] for i in chunk[:nreal]],
                "host_lengths": g["host_lengths"][chunk],
            }

    def _epoch_plans(self, batch_size: int, rng, drop_remainder: bool,
                     epochs: int = 1):
        """Per-group epoch plans shared by epoch()/epoch_refs()/
        epoch_blocks().

        Builds each group's full epoch index plan host-side (``epochs``
        independently-shuffled epochs concatenated — multi-epoch plans
        let K-batch blocks span epoch boundaries, which is what makes
        blocks effective on real corpora whose groups hold only 1-2
        batches each), ships it to the device in ONE transfer per group,
        and walks it with an on-device batch counter — per-batch gathers
        are then pure async dispatches with zero host->device traffic
        (see _gather_at). Entries are mutable: [group, chunks [nb, B]
        host, idx_all dev, j dev, used]; consumers advance ``used`` and
        thread the returned device counter back into slot 3."""
        plans = []
        for g in self.groups:
            orders = []
            for _ in range(epochs):
                order = np.arange(g["n"])
                if rng is not None:
                    rng.shuffle(order)
                orders.append(order)
            # Chunk the CONCATENATED multi-epoch order: batches may span
            # epoch boundaries, so each group pays one partial
            # (sentinel-padded) batch per super-epoch instead of one per
            # epoch. On the round-4 bench corpus (6 groups, 1024 lines,
            # B=256) per-epoch chunking computed 2x the real rows —
            # sentinel rows cost full compute for zero gradient. Every
            # sample still appears exactly ``epochs`` times; a batch can
            # contain a sample twice (adjacent epochs), which if anything
            # is closer to the reference's sample-with-replacement trial
            # loop (clstmocrtrain.cc ≈L100). epochs=1 is unchanged.
            order = np.concatenate(orders)
            chunks = []
            for lo in range(0, len(order), batch_size):
                chunk = order[lo:lo + batch_size]
                if len(chunk) < batch_size:
                    if drop_remainder:
                        continue
                    pad = np.full(batch_size - len(chunk), g["n"],
                                  np.int64)
                    chunk = np.concatenate([chunk, pad])
                chunks.append(chunk)
            if chunks:
                idx_all = np.stack(chunks).astype(np.int32)
                if self._repl is not None:
                    dev_idx = jax.device_put(idx_all, self._repl)
                    j0 = jax.device_put(np.zeros((), np.int32), self._repl)
                else:
                    dev_idx = jnp.asarray(idx_all)
                    j0 = jnp.zeros((), jnp.int32)
                plans.append([g, idx_all, dev_idx, j0, 0])
        return plans

    def _epoch_seq(self, batch_size: int, rng, drop_remainder: bool):
        """Batch-granularity plan sequence (one entry per batch); each
        occurrence of a plan consumes its next chunk."""
        plans = self._epoch_plans(batch_size, rng, drop_remainder)
        seq = [p for p in plans for _ in range(len(p[1]))]
        if rng is not None:
            rng.shuffle(seq)
        return seq

    def epoch_refs(self, batch_size: int,
                   rng: Optional[np.random.RandomState] = None,
                   drop_remainder: bool = False) -> Iterator[dict]:
        """Like epoch(), but yields batch REFERENCES for the fused
        gather+train step (train.make_cached_train_step): the resident
        group dict, the epoch index plan and the on-device batch counter,
        plus the host-side texts/host_lengths for reporting. The consumer
        MUST write the step's returned counter back via
        ``batch["set_j"](new_j)`` before the plan's next batch — the
        counter lives on device so the whole batch costs one dispatch.
        Identical rng consumption to epoch(): the two paths produce the
        same batch sequence for the same seed."""
        for p in self._epoch_seq(batch_size, rng, drop_remainder):
            g = p[0]
            chunk = p[1][p[4]]
            p[4] += 1
            nreal = int(np.sum(chunk < g["n"]))

            def set_j(new_j, p=p):
                p[3] = new_j

            yield {
                "group": g, "idx_all": p[2], "j": p[3], "set_j": set_j,
                "texts": [g["texts"][i] for i in chunk[:nreal]],
                "host_lengths": g["host_lengths"][chunk],
            }

    def epoch_blocks(self, batch_size: int, k: int,
                     rng: Optional[np.random.RandomState] = None,
                     drop_remainder: bool = False,
                     epochs: int = 1) -> Iterator[dict]:
        """Like epoch_refs(), but yields K-batch BLOCK references for the
        multi-step fused dispatch (train.make_multi_train_step): each
        block covers ``k`` consecutive batches of one group's epoch plan
        (the trailing remainder of a group yields one short block), so an
        epoch costs ~nb/k dispatch enqueues instead of nb. Shuffling is at
        block granularity (each group's plan order is still a uniform
        per-epoch shuffle; only the interleaving ACROSS groups coarsens),
        so the k>1 trajectory is a different — equally valid — epoch order
        than k=1 for the same seed.

        ``epochs`` > 1 builds each group's plan over that many epochs so
        BOTH batches and blocks span epoch boundaries — essential on real
        corpora, whose bucket groups typically hold only 1-2 batches per
        epoch (the round-4 bench corpus: 6 groups, 8 batches/epoch total
        — k>1 never engaged at epochs=1, and per-epoch remainder padding
        computed 2x the real rows). Each group pays at most one partial
        batch and one short block per super-epoch.

        Block dict: group/idx_all/j/set_j as epoch_refs (the consumer must
        thread the returned counter back through set_j), plus
          k           batches in this block (== k except group remainders)
          nreal       total real (non-sentinel) rows across the block
          nreal_per   [k] real rows per batch (cumulative trials within
                      the block, for report_every crossings)
          texts       [k] lists — per-batch real-row transcripts
          host_lengths[k] arrays — per-batch host-side lengths
        """
        plans = self._epoch_plans(batch_size, rng, drop_remainder,
                                  epochs=epochs)
        seq = []
        for p in plans:
            nfull, rem = divmod(len(p[1]), k)
            seq += [(p, k)] * nfull
            if rem:
                seq.append((p, rem))
        if rng is not None:
            rng.shuffle(seq)
        for p, kk in seq:
            if p[4] >= len(p[1]):
                # Plan exhausted by a clamped (nvalid < k) block: the
                # device counter stopped mid-block, so the host plan
                # position no longer matches it — later blocks of this
                # plan would silently retrain/skip plan regions (round-4
                # advisor finding). train_batch_block calls ``exhaust``
                # on every clamped call; skip the plan's remaining blocks.
                continue
            g = p[0]
            chunks = p[1][p[4]:p[4] + kk]
            p[4] += kk
            nreal_per = [int(np.sum(c < g["n"])) for c in chunks]

            def set_j(new_j, p=p):
                p[3] = new_j

            def exhaust(p=p):
                p[4] = len(p[1])

            yield {
                "group": g, "idx_all": p[2], "j": p[3], "set_j": set_j,
                "exhaust": exhaust,
                "k": kk, "nreal": sum(nreal_per), "nreal_per": nreal_per,
                "texts": [[g["texts"][i] for i in c[:n]]
                          for c, n in zip(chunks, nreal_per)],
                "host_lengths": [g["host_lengths"][c] for c in chunks],
            }


class TextDeviceDataset(DeviceDataset):
    """Device-resident string-transduction corpus (clstmfiltertrain).

    The reference trains string->string one pair at a time from host
    memory (clstmfiltertrain.cc ≈L1-200, SURVEY.md §3.4); the round-3 CLI
    streamed host-built one-hot batches one dispatch each and REBUILT the
    one-hot corpus on host every epoch — measured flat at ~330 pairs/s on
    the tunneled chip (purely dispatch-bound; runs/r3/cmu-b16.jsonl).

    TPU-native answer: store each group's inputs as int32 CHARACTER IDS
    [N+1, Tb] (4 bytes/frame instead of 4*ni for the one-hot frame — the
    CMU-size corpus drops from ~1.5GB to ~12MB resident) and let the fused
    gather+train steps expand ids -> one-hot [B, T, ni] ON DEVICE inside
    the jit (``input_onehot`` in train.make_cached_train_step /
    make_multi_train_step / parallel.dp.make_parallel_multi_train_step —
    the group dict's ``onehot`` key routes models.hl.train_batch_refs /
    train_batch_block automatically). All epoch-plan machinery
    (multi-epoch plans, K-batch blocks, on-device batch counters) is
    inherited from DeviceDataset unchanged.

    Padding positions hold id -1: ``jax.nn.one_hot(-1) == 0``, which
    reproduces the host path's zero padding frames (make_text_batches)
    exactly; the sentinel row is all -1 with length 0.

    ``input_repeat`` replicates each input id k times along T (see
    CLSTMText: CTC needs alignment slack when outputs are nearly as long
    as inputs). Bucketing/truncation semantics match make_text_batches:
    inputs clamp at t_buckets[-1], blank-interleaved targets at
    s_buckets[-1] (both counted for the CLI truncation warning).

    NOTE: epoch()/epoch_refs()/epoch_blocks() batches carry int-id ``x``;
    they feed the onehot-aware fused train steps, not predict_batch.
    """

    def __init__(self, pairs: Sequence[Tuple[str, str]],
                 icodec: Codec, codec: Codec, *, input_repeat: int = 1,
                 t_buckets: Sequence[int] = TEXT_T_BUCKETS,
                 s_buckets: Sequence[int] = S_BUCKETS,
                 device=None, mesh=None, axis: str = "data"):
        self._init_placement(device, mesh, axis)
        k = max(1, int(input_repeat))
        ni = icodec.size()
        groups: dict = {}
        self.t_truncated = self.s_truncated = 0
        for a, b in pairs:
            ids = icodec.encode(a)
            classes = codec.encode(b)
            T = max(len(ids) * k, 1)        # empty input -> one zero frame
            tb = bucket_for(T, t_buckets)
            sb = bucket_for(2 * len(classes) + 1, s_buckets)
            self.t_truncated += T > t_buckets[-1]
            self.s_truncated += 2 * len(classes) + 1 > s_buckets[-1]
            groups.setdefault((tb, sb), []).append((ids, b, classes))

        self.groups = []
        self.nbytes = 0
        for (tb, sb), items in sorted(groups.items()):
            N = len(items)
            x = np.full((N + 1, tb), -1, np.int32)       # -1 = zero frame
            lengths = np.zeros(N + 1, np.int32)
            targets = np.zeros((N + 1, sb), np.int32)
            tlens = np.zeros(N + 1, np.int32)
            texts: List[str] = []
            for i, (ids, b, classes) in enumerate(items):
                T = min(max(len(ids) * k, 1), tb)
                for t, c in enumerate(ids):
                    x[i, t * k:min((t + 1) * k, tb)] = c
                lengths[i] = T
                tg = mktargets_ids(classes)
                S = min(len(tg), sb)
                targets[i, :S] = tg[:S]
                tlens[i] = S
                texts.append(b)
            self.nbytes += x.nbytes + targets.nbytes
            put = self._put
            self.groups.append({
                "tb": tb, "sb": sb, "n": N, "texts": texts,
                "onehot": ni,
                "x": put(x), "targets": put(targets),
                "lengths": put(lengths), "tlens": put(tlens),
                "host_lengths": lengths,
            })
