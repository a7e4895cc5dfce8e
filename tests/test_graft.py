"""Driver entry points must keep working (compile-check + multichip dry run)."""

import subprocess
import sys
import os

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 512, 96)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_driver_env():
    """Run dryrun_multichip exactly the way the driver does: a FRESH process
    with the harness env intact (JAX_PLATFORMS=axon, no conftest CPU forcing).
    Round 1 only tested it under conftest, which masked an env-fragility bug
    (MULTICHIP_r01.json rc=1, libtpu mismatch on the axon backend)."""
    env = dict(os.environ)
    # Reproduce the driver env: the axon plugin present and selected, repo
    # importable.  Do NOT strip JAX_PLATFORMS/XLA_FLAGS — fragility against
    # whatever is pinned is exactly what this test exists to catch.
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = _REPO + (os.pathsep + pp if pp else "")
    env.pop("XLA_FLAGS", None)  # driver does not pre-set the device count
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "ok" in proc.stdout
