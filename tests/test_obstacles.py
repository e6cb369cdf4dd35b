"""Obstacle (boundary) particle support.

Obstacles follow the reference OCL backend semantics (pStar = position/scale,
lambda = 0, excluded from advection/finalise/diffusion targets, but present
as neighbours in the density sums — `src/ocl/oclsph.cpp:64-69`,
`src/ocl/oclsph_kernel.h:105-108`).
"""

import numpy as np
import pytest

from pbf_sph_tpu.core.scene import simple_config_with_2_cubes
from pbf_sph_tpu.core.types import OBSTACLE, ParticleSoA, Scene
from pbf_sph_tpu.models.jax_solver import JaxSolver
from pbf_sph_tpu.models.numpy_solver import NumpySolver


def with_obstacle_floor(particles, cfg):
    """A static plane of obstacle particles under the fluid."""
    f = np.float32
    n = 12
    g = np.linspace(100, 600, n).astype(f)
    gx, gz = np.meshgrid(g, g, indexing="ij")
    m = n * n
    floor = ParticleSoA(
        pid=np.arange(10_000, 10_000 + m, dtype=np.int32),
        ptype=np.full(m, OBSTACLE, np.int32),
        mass=np.ones(m, f),
        position=np.stack([gx.ravel(), np.full(m, 40.0, f), gz.ravel()], 1),
        velocity=np.zeros((m, 3), f),
        colour=np.ones((m, 4), f),
    )
    return ParticleSoA.concat([particles, floor])


@pytest.mark.slow
def test_obstacles_static_and_parity():
    mc, cfg, particles = simple_config_with_2_cubes(1000, 3, 500.0)
    xs0 = with_obstacle_floor(particles, cfg)

    ns, js = NumpySolver(h=cfg.h), JaxSolver(h=cfg.h)
    xs_n = xs_j = xs0
    for _ in range(2):
        _, xs_n = ns.advance(cfg, Scene(), xs_n)
        _, xs_j = js.advance(cfg, Scene(), xs_j)

    ref = xs0.order_by_id()
    for xs in (xs_n, xs_j):
        xs = xs.order_by_id()
        np.testing.assert_array_equal(xs.pid, ref.pid)
        obs = xs.ptype == OBSTACLE
        # obstacles never move and keep zero velocity
        np.testing.assert_array_equal(xs.position[obs], ref.position[obs])
        assert (xs.velocity[obs] == 0).all()
        # obstacle colours are not diffused
        np.testing.assert_array_equal(xs.colour[obs], 1.0)

    a, b = xs_n.order_by_id(), xs_j.order_by_id()
    np.testing.assert_allclose(a.position, b.position, atol=0.1, rtol=0)


def test_obstacles_affect_fluid_density():
    """Fluid resting right above an obstacle floor must feel its density
    (obstacles are neighbours in the lambda solve)."""
    mc, cfg, particles = simple_config_with_2_cubes(1000, 4, 500.0)
    cfg = cfg.replace(constant_force=(0.0, -9.8, 0.0))  # pull toward y=0 wall
    ns = NumpySolver(h=cfg.h)
    xs_with = with_obstacle_floor(particles, cfg)
    xs_wo = particles
    for _ in range(3):
        _, xs_with = ns.advance(cfg, Scene(), xs_with)
        _, xs_wo = ns.advance(cfg, Scene(), xs_wo)
    fl = xs_with.ptype != OBSTACLE
    # fluid interacting with the floor ends up measurably different from the
    # free-falling case
    a = xs_with.position[fl]
    b = xs_wo.position
    assert np.abs(np.sort(a[:, 1]) - np.sort(b[:, 1])).max() > 0.5
