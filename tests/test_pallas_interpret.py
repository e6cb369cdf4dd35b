"""Pallas kernels vs XLA path in interpreter mode (small shapes, CPU)."""

import numpy as np
import pytest

from pbf_sph_tpu.core.scene import simple_config_with_2_cubes
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models.jax_solver import JaxSolver


@pytest.mark.slow
def test_pallas_matches_xla_interpret():
    mc, cfg, xs = simple_config_with_2_cubes(700, 2, 500.0)
    js = JaxSolver(h=cfg.h)
    ps = JaxSolver(h=cfg.h, use_pallas=True)
    _, xj = js.advance(cfg, Scene(), xs)
    _, xp = ps.advance(cfg, Scene(), xs)
    xj, xp = xj.order_by_id(), xp.order_by_id()
    np.testing.assert_allclose(xp.position, xj.position, atol=1e-3, rtol=0)
    np.testing.assert_allclose(xp.velocity, xj.velocity, atol=1e-3, rtol=0)
    np.testing.assert_allclose(xp.colour, xj.colour, atol=1e-5, rtol=0)
