"""Driver entry points: single-chip step traces; 8-device sharded dryrun runs."""

import importlib.util
from pathlib import Path

import pytest


def _load():
    path = Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_traces():
    import jax

    m = _load()
    fn, args = m.entry()
    jax.jit(fn).lower(*args)  # trace + lower the full surface step


@pytest.mark.slow
def test_dryrun_multichip():
    m = _load()
    m.dryrun_multichip(8)
