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
