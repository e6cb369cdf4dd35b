"""Per-phase timed advance must match the fused step bit-for-bit (same phase
functions, different jit boundaries) and produce the reference-format table."""

import numpy as np
import pytest

from pbf_sph_tpu.core.scene import simple_config_with_2_cubes
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models.jax_solver import JaxSolver
from pbf_sph_tpu.models.timed import advance_timed


@pytest.mark.slow
def test_timed_matches_fused():
    mc, cfg, xs = simple_config_with_2_cubes(1000, 2, 500.0)
    solver = JaxSolver(h=cfg.h)
    r1, x1, watch = advance_timed(solver, cfg, Scene(), xs)
    r2, x2 = solver.advance(cfg, Scene(), xs)
    a, b = x1.order_by_id(), x2.order_by_id()
    np.testing.assert_array_equal(a.position, b.position)
    np.testing.assert_array_equal(a.velocity, b.velocity)
    np.testing.assert_array_equal(a.colour, b.colour)

    table = str(watch)
    assert "Stopwatch[ advance]:" in table
    for name in ("CPU sortz", "CPU gridtable", "sph-diffuse", "sph-lambda/delta*2",
                 "sph-finalise", "write back"):
        assert name in table


@pytest.mark.slow
def test_fp64_backend():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        mc, cfg, xs = simple_config_with_2_cubes(700, 2, 500.0)
        s64 = JaxSolver(h=cfg.h, dtype="float64")
        _, x64 = s64.advance(cfg, Scene(), xs)
        s32 = JaxSolver(h=cfg.h, dtype="float32")
        _, x32 = s32.advance(cfg, Scene(), xs)
        a, b = x64.order_by_id(), x32.order_by_id()
        assert a.position.dtype == np.float64
        np.testing.assert_allclose(a.position, b.position, atol=0.01, rtol=0)
    finally:
        jax.config.update("jax_enable_x64", False)
