"""Utils layer tests: env config, display, profiling, checkpoint, text."""

import os

import jax
import numpy as np
import pytest

from clstm_tpu.utils.config import getbenv, getdenv, getienv, getsenv
from clstm_tpu.utils.display import Display
from clstm_tpu.utils.profiling import Throughput, Timer
from clstm_tpu.utils.text import read_text, split


def test_env_getters(monkeypatch):
    monkeypatch.setenv("x_int", "42")
    monkeypatch.setenv("x_float", "2.5e-3")
    monkeypatch.setenv("x_str", "hello")
    monkeypatch.setenv("x_bool", "false")
    assert getienv("x_int", 0) == 42
    assert getienv("missing", 7) == 7
    assert getdenv("x_float", 0.0) == 2.5e-3
    assert getsenv("x_str") == "hello"
    assert getbenv("x_bool", True) is False
    assert getbenv("missing", True) is True


def test_read_text_strips_newline(tmp_path):
    f = tmp_path / "t.gt.txt"
    f.write_bytes("héllo wörld\n".encode("utf-8"))
    assert read_text(str(f)) == "héllo wörld"
    f.write_bytes(b"crlf\r\n")
    assert read_text(str(f)) == "crlf"
    assert split("a  b\tc") == ["a", "b", "c"]


def test_display_renders(tmp_path):
    d = Display(str(tmp_path / "dash.png"))
    for i in range(10):
        d.add_loss(i, 10.0 / (i + 1))
    d.add_test_err(5, 0.3)
    path = d.render(frame_probs=np.random.rand(50, 4),
                    image=np.random.rand(32, 100))
    assert path and os.path.exists(path)


def test_throughput_and_timer():
    t = Throughput()
    assert t.rate() == 0.0
    for _ in range(5):
        t.add(10)
    assert t.total == 50
    assert t.rate() >= 0.0
    assert Timer().elapsed() >= 0.0


def test_train_state_checkpoint(tmp_path):
    from clstm_tpu.io.checkpoint import load_state, save_state
    from clstm_tpu.models.prefab import make_net_init
    from clstm_tpu.train import TrainState

    spec, params = make_net_init(
        "lstm1", {"ninput": 3, "nhidden": 4, "noutput": 3},
        jax.random.PRNGKey(0))
    state = TrainState.create(params)
    state = state.replace(step=state.step + 5)
    f = str(tmp_path / "state.npz")
    save_state(f, state)
    template = TrainState.create(params)
    back = load_state(f, template)
    assert int(back.step) == 5
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(back.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # shape mismatch raises
    spec2, params2 = make_net_init(
        "lstm1", {"ninput": 3, "nhidden": 5, "noutput": 3},
        jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        load_state(f, TrainState.create(params2))
