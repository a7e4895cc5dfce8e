"""Driver entry points must keep working (compile-check + multichip dry run)."""

import sys
import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 512, 96)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
