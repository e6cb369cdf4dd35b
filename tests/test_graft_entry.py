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


def test_virtual_mesh_xla_flags():
    # the driver runs dryrun_multichip WITHOUT the test conftest, so the
    # entry module itself must force the device count and raise XLA:CPU's
    # 40 s collective watchdog (which aborts the phase-3 surface+rebalance
    # emulation on a loaded single-core host)
    m = _load()
    out = m._virtual_mesh_xla_flags("", 8)
    assert "--xla_force_host_platform_device_count=8" in out
    assert "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600" in out
    assert "--xla_cpu_collective_call_terminate_timeout_seconds=1200" in out
    # caller-set values win: nothing is duplicated or overridden
    pre = ("--xla_force_host_platform_device_count=4 "
           "--xla_cpu_collective_call_warn_stuck_timeout_seconds=50 "
           "--xla_cpu_collective_call_terminate_timeout_seconds=100")
    assert m._virtual_mesh_xla_flags(pre, 8) == pre


def test_entry_traces():
    import jax

    m = _load()
    fn, args = m.entry()
    jax.jit(fn).lower(*args)  # trace + lower the full surface step


@pytest.mark.slow
def test_dryrun_multichip():
    m = _load()
    m.dryrun_multichip(8)
