"""High-level task API: CLSTMOCR and CLSTMText.

Reference: clstmhl.h (≈L1-350, unverified; empty mount — SURVEY.md §0).
``CLSTMOCR`` wraps create/train/predict on line images (utf8 in/out, owns
the normalizer and the image->sequence transpose); ``CLSTMText`` does
string->string transduction with a separate input codec and one-hot input
encoding. Both preserve the reference's single-sample methods
(train_utf8 / predict_utf8) and add TPU-native batched entry points
(train_batch / predict_batch) — the batched paths are where the throughput
lives; the single-sample paths route through B=1 bucketed batches so they
reuse the same compiled steps.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from clstm_tpu.data.dataset import (
    S_BUCKETS, T_BUCKETS, bucket_for, prepare_line)
from clstm_tpu.io.normalize import make_normalizer
from clstm_tpu.io.proto import load_net, save_net
from clstm_tpu.models.codec import Codec
from clstm_tpu.models.prefab import make_net
from clstm_tpu.models.spec import NetSpec, init_net
from clstm_tpu.ops.ctc import decode_frames, mktargets_ids
from clstm_tpu.train import (
    TrainState, make_predict_step, make_train_step, unpack_report)


_clamp_warned = False


def _warn_inference_clamp(T: int, tb: int) -> None:
    """One-time warning when an inference input exceeds the largest
    T bucket and gets clamped (the reference processes arbitrary-length
    lines; silent truncation would quietly shorten transcriptions —
    round-4 advisor note; mirrors the training CLIs' truncation
    accounting convention)."""
    global _clamp_warned
    if T > tb and not _clamp_warned:
        _clamp_warned = True
        import warnings
        warnings.warn(
            f"inference input of {T} frames exceeds the largest bucket "
            f"({tb}); output is truncated to the first {tb} frames",
            stacklevel=3)


def _canon_dewarp(kind: str) -> str:
    """CLI dewarp spellings -> ops/preprocess kind (mirrors make_normalizer)."""
    k = (kind or "center").lower()
    if k in ("center", "dewarp"):
        return "center"
    if k in ("mean",):
        return "mean"
    if k in ("none", "no"):
        return "none"
    raise ValueError(f"unknown normalizer: {kind!r}")


@dataclasses.dataclass
class CharPrediction:
    """Aligned per-character prediction (reference CharPrediction {i,x,c,p})."""

    i: int      # character index in the output string
    x: int      # x position (frame index mapped back to image columns)
    c: str      # predicted character
    p: float    # probability at the peak frame


class _TrainableBase:
    """Shared train/predict machinery over (spec, state, codec)."""

    def __init__(self):
        self.spec: Optional[NetSpec] = None
        self.state: Optional[TrainState] = None
        self.codec: Optional[Codec] = None
        self.icodec: Optional[Codec] = None
        self.lr = 1e-4
        self.momentum = 0.9
        self.normalization = "none"
        self.gradient_clip = 0.0   # >0 enables global-norm clipping
        self.augment = 0.0         # >0 enables on-device augmentation
        self.mesh = None           # set_mesh() switches to multi-chip DP
        self._step = None
        self._cached_step = None
        self._multi_steps = {}
        self._predict = None

    # -- reference API --
    def setLearningRate(self, lr: float, momentum: float = 0.9) -> None:
        self.lr = float(lr)
        self.momentum = float(momentum)

    def set_mesh(self, mesh) -> None:
        """Enable data-parallel training/inference over ``mesh`` (a 1-D
        jax.sharding.Mesh, see parallel.mesh.make_mesh): the train step
        becomes the shard_map+psum step (numerically the single-device
        update on the full batch), predict shards rows over the mesh, and
        the TrainState is replicated. Batch rows must divide by the mesh
        size. ``set_mesh(None)`` reverts to single-device."""
        self.mesh = mesh
        self._step = None
        self._cached_step = None
        self._multi_steps = {}
        self._predict = None

    def _ensure_compiled(self):
        if self._step is None:
            if self.mesh is not None:
                from clstm_tpu.parallel.dp import make_parallel_train_step
                from clstm_tpu.parallel.mesh import replicate
                self._step = make_parallel_train_step(
                    self.spec, self.mesh, self.lr, self.momentum,
                    loss_kind="ctc", normalization=self.normalization,
                    gradient_clip=self.gradient_clip, augment=self.augment,
                    donate=False)
                self._predict = make_predict_step(self.spec, mesh=self.mesh)
                self.state = replicate(self.state, self.mesh)
            else:
                self._step = make_train_step(
                    self.spec, self.lr, self.momentum, loss_kind="ctc",
                    normalization=self.normalization,
                    gradient_clip=self.gradient_clip, augment=self.augment,
                    donate=False)
                self._predict = make_predict_step(self.spec)

    _BATCH_KEYS = ("x", "lengths", "targets", "target_lengths", "y")

    def train_batch(self, batch: dict) -> dict:
        """Batched CTC training on a prepared batch dict (data/dataset.py).
        Returns metrics {loss, frame_ids, frame_vals, report_ids/vals}."""
        self._ensure_compiled()
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k in self._BATCH_KEYS}
        self.state, metrics = self._step(self.state, jb, self.lr, self.momentum)
        return metrics

    def train_batch_refs(self, ref: dict) -> dict:
        """Fused gather+train on a DeviceDataset.epoch_refs batch: the
        batch rows are gathered from the resident cache INSIDE the jitted
        step, so each batch costs ONE executable dispatch (the separate
        gather dispatch is ~20ms of RPC enqueue on a tunneled chip).
        With a mesh set, routes through the k=1 parallel fused block step
        (parallel.dp.make_parallel_multi_train_step) — metrics then carry
        {loss, report, report_all} rather than the full per-frame arrays.
        Single-device metrics match train_batch."""
        if self.mesh is not None:
            ref = dict(ref, k=1)
            return self.train_batch_block(ref)
        self._ensure_compiled()
        onehot = ref["group"].get("onehot", 0)
        if self._cached_step is None:
            from clstm_tpu.train import make_cached_train_step
            self._cached_step = make_cached_train_step(
                self.spec, self.lr, self.momentum, loss_kind="ctc",
                normalization=self.normalization,
                gradient_clip=self.gradient_clip, augment=self.augment,
                input_onehot=onehot, donate=False)
        self.state, metrics, new_j = self._cached_step(
            self.state, ref["group"], ref["idx_all"], ref["j"],
            self.lr, self.momentum)
        ref["set_j"](new_j)
        return metrics

    def train_batch_block(self, block: dict, k_max: int = 0,
                          nvalid: Optional[int] = None) -> dict:
        """K batches in ONE dispatch on a DeviceDataset.epoch_blocks block:
        lax.scan of the fused gather+train body over ``block['k']``
        consecutive batches of the resident epoch plan
        (train.make_multi_train_step). On a tunneled chip each dispatch
        enqueue costs ~20-36ms of host RPC, so K batches per dispatch is
        the difference between an enqueue-bound and a compute-bound CLI
        (round-3: e2e ran at 26% of the device-step rate at K=1).

        ``k_max`` (the CLI's steps_per_dispatch) fixes the compiled scan
        length; shorter (remainder) blocks reuse the same executable via
        the traced ``nvalid`` skip — ONE compilation per (group shape,
        k_max). With k_max=0 the scan compiles at the block's own k.
        ``nvalid`` (optional) executes only the first min(nvalid, k)
        batches of the block — the CLI's ntrain budget clamp, so a fused
        block overshoots the trial budget by at most one batch like the
        single-step path (steps beyond nvalid never touch state or the
        plan counter). A clamped call marks the block's epoch plan
        EXHAUSTED (the device counter no longer matches the host plan
        position), so later blocks from the same plan are skipped by
        epoch_blocks rather than silently retraining plan regions.

        With a mesh set, the same block runs through the shard_map K-scan
        (parallel.dp.make_parallel_multi_train_step): one dispatch, each
        device gathers its own rows of every batch, grads psum — the
        full-batch update, so the trajectory matches single-device within
        f32 reduction order.
        Returns metrics {loss, report, report_all [k_max, 1+2T]} — see
        make_multi_train_step."""
        self._ensure_compiled()
        k = max(k_max, block["k"])
        onehot = block["group"].get("onehot", 0)
        step = self._multi_steps.get((k, onehot))
        if step is None:
            if self.mesh is not None:
                from clstm_tpu.parallel.dp import (
                    make_parallel_multi_train_step)
                step = make_parallel_multi_train_step(
                    self.spec, self.mesh, k, self.lr, self.momentum,
                    loss_kind="ctc", normalization=self.normalization,
                    gradient_clip=self.gradient_clip, augment=self.augment,
                    input_onehot=onehot, donate=False)
            else:
                from clstm_tpu.train import make_multi_train_step
                step = make_multi_train_step(
                    self.spec, k, self.lr, self.momentum, loss_kind="ctc",
                    normalization=self.normalization,
                    gradient_clip=self.gradient_clip, augment=self.augment,
                    input_onehot=onehot, donate=False)
            self._multi_steps[(k, onehot)] = step
        nv = block["k"] if nvalid is None else max(1, min(nvalid, block["k"]))
        self.state, metrics, new_j = step(
            self.state, block["group"], block["idx_all"], block["j"],
            nvalid=nv, lr_arg=self.lr, momentum_arg=self.momentum)
        block["set_j"](new_j)
        if nv < block["k"] and "exhaust" in block:
            block["exhaust"]()
        return metrics

    def predict_batch(self, x: np.ndarray, lengths: np.ndarray):
        """-> per-frame (ids [B,T], vals [B,T]) numpy arrays.

        Rows are padded up to a multiple of 8 (and of the mesh size when
        one is set) with zero-length rows — masked everywhere — and the
        padding sliced off, so callers keep arbitrary batch sizes. The
        8-row alignment keeps odd batches on the fused Pallas inference
        kernel (its sublane contract is B % 8 == 0; without it, clstmocr's
        width buckets of e.g. 22 or 65 pages fell back to the lax.scan
        path at ~10x lower throughput — measured round 5)."""
        self._ensure_compiled()
        B = x.shape[0]
        n = 8 if self.mesh is None else 8 * self.mesh.devices.size
        pad = (-B) % n
        if pad:
            x = np.concatenate(
                [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            lengths = np.concatenate(
                [np.asarray(lengths), np.zeros(pad, np.int32)])
        ids, vals = self._predict(self.state.params, jnp.asarray(x),
                                  jnp.asarray(lengths))
        return np.asarray(ids)[:B], np.asarray(vals)[:B]

    # -- checkpointing (reference save/load; .clstm proto format) --
    def save(self, fname: str, sidecar: bool = True) -> None:
        """Write the .clstm proto; with sidecar=True (default) also write
        ``fname + '.state.npz'`` carrying the full TrainState (velocity +
        step) so resume continues the exact trajectory — the reference's
        .clstm stores no optimizer state (SURVEY.md §5)."""
        save_net(fname, self.spec, self.state.params, codec=self.codec,
                 icodec=self.icodec)
        if sidecar:
            from clstm_tpu.io.checkpoint import save_state
            save_state(fname + ".state.npz", self.state)

    def load(self, fname: str) -> None:
        """Load a .clstm; if a matching ``.state.npz`` sidecar exists, also
        restore optimizer velocity and step (else start fresh, which is the
        reference's lossy-resume behavior)."""
        import os

        spec, params, codec, icodec = load_net(fname)
        self.spec = spec
        self.state = TrainState.create(params)
        sidecar = fname + ".state.npz"
        if os.path.exists(sidecar):
            from clstm_tpu.io.checkpoint import load_state
            try:
                self.state = load_state(sidecar, self.state)
            except (ValueError, KeyError) as e:
                print(f"# WARNING: ignoring stale state sidecar {sidecar}: {e}")
        if codec is not None:
            self.codec = codec
        if icodec is not None:
            self.icodec = icodec
        self._step = None
        self._cached_step = None
        self._multi_steps = {}
        self._predict = None


class CLSTMOCR(_TrainableBase):
    """Line-image OCR (reference CLSTMOCR, clstmhl.h ≈L60-250).

    Owns a normalizer; inputs are float [h, w] grayscale images in [0, 1]
    (ink black on white); the time axis is the image width.
    """

    def __init__(self, target_height: int = 48, dewarp: str = "center",
                 pad: int = 16):
        super().__init__()
        self.target_height = target_height
        self.dewarp = dewarp
        self.pad = pad
        self._scale = 1.0

    def createBidi(self, codec: Codec, nhidden: int, kind: str = "bidi",
                   seed: int = 0, **extra) -> None:
        """Build the standard bidi LSTM net: ninput=target_height,
        noutput=codec.size() (reference createBidi -> make_net("bidi"))."""
        self.codec = codec
        args = {"ninput": self.target_height, "nhidden": nhidden,
                "noutput": codec.size(), **extra}
        self.spec = make_net(kind, args)
        self.state = TrainState.create(
            init_net(self.spec, jax.random.PRNGKey(seed)))
        self._step = None
        self._cached_step = None
        self._multi_steps = {}

    # -- preprocessing --
    def prepare(self, image: np.ndarray) -> np.ndarray:
        norm = make_normalizer(self.dewarp, self.target_height)
        x = prepare_line(image, norm, self.pad)
        # Width scale of the last prepared line (normalized cols per source
        # col), for mapping frame positions back to image x coordinates.
        self._scale = float(getattr(norm, "scale", 1.0)) or 1.0
        return x

    def _one_line_batch(self, x: np.ndarray, classes: Sequence[int]) -> dict:
        tb = bucket_for(x.shape[0], T_BUCKETS)
        x = x[:tb]  # over-bucket lines clamp at the largest bucket, like
        #             the batched paths (counted/warned by the CLIs); the
        #             raw assignment below would raise on a >4096-frame line
        ids = mktargets_ids(classes)
        sb = bucket_for(len(ids), S_BUCKETS)
        xb = np.zeros((1, tb, x.shape[1]), np.float32)
        xb[0, : x.shape[0]] = x
        tg = np.zeros((1, sb), np.int32)
        tg[0, : len(ids)] = ids[:sb]
        return {"x": xb,
                "lengths": np.array([x.shape[0]], np.int32),
                "targets": tg,
                "target_lengths": np.array([min(len(ids), sb)], np.int32)}

    # -- reference single-line API --
    def train_utf8(self, image: np.ndarray, gt: str) -> str:
        """Train on one line; returns the (pre-update) prediction string."""
        x = self.prepare(image)
        classes = self.codec.encode(gt)
        batch = self._one_line_batch(x, classes)
        metrics = self.train_batch(batch)
        _, ids, vals = unpack_report(metrics["report"], x.shape[0])
        return self.codec.decode(decode_frames(ids, vals))

    def predict_utf8(self, image: np.ndarray) -> str:
        x = self.prepare(image)
        ids, vals = self._predict_one(x)
        return self.codec.decode(decode_frames(ids, vals))

    def predict(self, image: np.ndarray) -> List[CharPrediction]:
        """Aligned per-character predictions (reference aligned/charseg).

        ``x`` is reported in ORIGINAL image columns: the peak frame index is
        un-padded, then divided by the normalizer's width scale (the
        normalizer zooms both axes by target_height/strip_height)."""
        x = self.prepare(image)
        w = image.shape[1]
        ids, vals = self._predict_one(x)
        cls, pos = decode_frames(ids, vals, return_positions=True)
        out = []
        for i, (c, t) in enumerate(zip(cls, pos)):
            col = (int(t) - self.pad) / self._scale
            out.append(CharPrediction(
                i=i, x=int(np.clip(round(col), 0, max(w - 1, 0))),
                c=chr(self.codec.codec[c]), p=float(vals[t])))
        return out

    def _predict_one(self, x: np.ndarray):
        tb = bucket_for(x.shape[0], T_BUCKETS)
        _warn_inference_clamp(x.shape[0], tb)
        x = x[:tb]  # clamp over-bucket lines (see _one_line_batch)
        xb = np.zeros((1, tb, x.shape[1]), np.float32)
        xb[0, : x.shape[0]] = x
        ids, vals = self.predict_batch(xb, np.array([x.shape[0]], np.int32))
        return ids[0][: x.shape[0]], vals[0][: x.shape[0]]

    def predict_batch_images(self, images: Sequence[np.ndarray],
                             sync: bool = True):
        """Batched inference from RAW line images with the normalization/
        transposition stage running ON DEVICE (the north-star preprocessing
        stage; ops/preprocess.py): pack raw lines into one buffer, jit
        normalize+prepare, feed the jitted predict step — the pixels make a
        single host->device hop.

        -> (ids [B,T], vals [B,T], lengths [B]) numpy arrays; with
        ``sync=False``, device arrays are returned WITHOUT waiting — the
        dispatch is enqueued and the caller fetches with np.asarray when
        ready, so multiple bucket batches overlap their transfers and
        compute (clstmocr.predict_pages enqueues every width bucket
        before reading any result).
        """
        from clstm_tpu.ops.preprocess import (
            estimate_out_T, pack_raw_images, prepare_batch_device)

        self._ensure_compiled()
        kind = _canon_dewarp(self.dewarp)
        buf, hs, ws = pack_raw_images(images)
        est_T = estimate_out_T(images, self.target_height, self.pad)
        tb = bucket_for(est_T, T_BUCKETS)
        _warn_inference_clamp(est_T, tb)
        x, lengths = prepare_batch_device(
            jnp.asarray(buf), jnp.asarray(hs), jnp.asarray(ws), kind=kind,
            target_height=self.target_height, out_T=tb, pad=self.pad)
        # Pad rows to a multiple of 8 (zero-length, masked) so odd page
        # buckets stay on the fused Pallas kernel (see predict_batch).
        B = x.shape[0]
        rpad = (-B) % (8 if self.mesh is None else 8 * self.mesh.devices.size)
        if rpad:
            x = jnp.pad(x, ((0, rpad), (0, 0), (0, 0)))
            lengths = jnp.pad(lengths, (0, rpad))
        ids, vals = self._predict(self.state.params, x, lengths)
        if not sync:
            return ids[:B], vals[:B], lengths[:B]
        return (np.asarray(ids)[:B], np.asarray(vals)[:B],
                np.asarray(lengths)[:B])


class CLSTMText(_TrainableBase):
    """String->string transduction (reference CLSTMText, clstmhl.h ≈L250).

    Input strings are one-hot encoded with a separate input codec
    (``icodec``); outputs decode through ``codec``.

    ``input_repeat`` replicates each input frame k times (default 1 =
    reference behavior). For transduction tasks whose outputs are nearly
    as long as their inputs (e.g. grapheme->phoneme), CTC has no alignment
    slack at k=1 — every frame must emit — and training stalls; k>=2
    restores slack. This is a task-shaping option, not a semantic change.
    """

    def __init__(self, input_repeat: int = 1):
        super().__init__()
        self.input_repeat = max(1, int(input_repeat))

    def createBidi(self, icodec: Codec, codec: Codec, nhidden: int,
                   kind: str = "bidi", seed: int = 0, **extra) -> None:
        self.icodec = icodec
        self.codec = codec
        args = {"ninput": icodec.size(), "nhidden": nhidden,
                "noutput": codec.size(), **extra}
        self.spec = make_net(kind, args)
        if self.input_repeat != 1:
            # Persist in the net attrs so the .clstm checkpoint restores
            # the input encoding (a k=3-trained model decodes garbage at
            # k=1; caught driving clstmfilter against a saved model).
            self.spec = self.spec.with_attr(input_repeat=self.input_repeat)
        self.state = TrainState.create(
            init_net(self.spec, jax.random.PRNGKey(seed)))
        self._step = None
        self._cached_step = None
        self._multi_steps = {}

    def load(self, fname: str) -> None:
        super().load(fname)
        self.input_repeat = int(self.spec.get("input_repeat", "1"))

    def encode_input(self, s: str) -> np.ndarray:
        """One-hot [T, icodec.size()] encoding of the input string
        (each char repeated ``input_repeat`` times)."""
        ids = self.icodec.encode(s)
        k = self.input_repeat
        x = np.zeros((max(len(ids) * k, 1), self.icodec.size()), np.float32)
        for t, c in enumerate(ids):
            x[t * k:(t + 1) * k, c] = 1.0
        return x

    def _one_batch(self, x: np.ndarray, classes: Sequence[int]) -> dict:
        tb = bucket_for(x.shape[0], T_BUCKETS)
        x = x[:tb]  # clamp over-bucket inputs (see CLSTMOCR._one_line_batch)
        ids = mktargets_ids(classes)
        sb = bucket_for(len(ids), S_BUCKETS)
        xb = np.zeros((1, tb, x.shape[1]), np.float32)
        xb[0, : x.shape[0]] = x
        tg = np.zeros((1, sb), np.int32)
        tg[0, : len(ids)] = ids[:sb]
        return {"x": xb, "lengths": np.array([x.shape[0]], np.int32),
                "targets": tg,
                "target_lengths": np.array([min(len(ids), sb)], np.int32)}

    def train(self, inp: str, out: str) -> str:
        x = self.encode_input(inp)
        batch = self._one_batch(x, self.codec.encode(out))
        metrics = self.train_batch(batch)
        _, ids, vals = unpack_report(metrics["report"], x.shape[0])
        return self.codec.decode(decode_frames(ids, vals))

    def predict(self, inp: str) -> str:
        x = self.encode_input(inp)
        tb = bucket_for(x.shape[0], T_BUCKETS)
        _warn_inference_clamp(x.shape[0], tb)
        x = x[:tb]  # clamp over-bucket inputs (see CLSTMOCR._one_line_batch)
        xb = np.zeros((1, tb, x.shape[1]), np.float32)
        xb[0, : x.shape[0]] = x
        ids, vals = self.predict_batch(xb, np.array([x.shape[0]], np.int32))
        return self.codec.decode(
            decode_frames(ids[0][: x.shape[0]], vals[0][: x.shape[0]]))
