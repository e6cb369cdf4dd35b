"""Workload preset sanity."""

import numpy as np

from pbf_sph_tpu.core.configs import WORKLOADS, dam_break
from pbf_sph_tpu.core.constants import DEFAULT_CONSTANTS as K
from pbf_sph_tpu.core.scene import simple_config_with_2_cubes
from pbf_sph_tpu.ops.grid import GridSpec


def test_bench20k_matches_reference_workload():
    """The reference benchmark workload constants (src/benchmark.cpp:23-29,
    src/sph.hpp:160-186)."""
    mc, cfg, xs = simple_config_with_2_cubes(20_000, 6, 500.0)
    assert len(xs) == 2 * 21**3  # cbrt(10000) -> 21-side cubes
    assert cfg.iteration == 6
    assert np.isclose(cfg.dt, 0.0083 * 1.5)
    assert cfg.constant_force == (0.0, 9.8, 0.0)
    assert cfg.max_bound == (1000.0, 1000.0, 1000.0)
    assert mc.resolution == 2.0 and mc.isolevel == 100.0
    grid = GridSpec.from_bounds(cfg.min_bound, cfg.max_bound, cfg.scale, cfg.h)
    assert grid.extent == (24, 24, 24)
    assert grid.maxz == 32256


def test_dam_break_rest_density():
    """The dam column must start near the PBF rest density so the constraint
    solver starts in a physical regime."""
    mc, cfg, xs = dam_break(50_000, solver_iter=3)
    n = len(xs)
    assert 0.9 * 50_000 <= n <= 1.1 * 50_000
    # number density in sim units ~ RHO
    pos = xs.position / np.float32(cfg.scale)
    vol = np.prod(pos.max(0) - pos.min(0))
    density = n / vol
    assert 0.7 * K.RHO < density < 1.3 * K.RHO
    # column inside the domain
    assert (xs.position >= 0).all() and (xs.position <= 1000).all()


def test_all_workloads_construct():
    for name in ("bench20k", "parity32k", "mc128k"):
        mc, cfg, xs = WORKLOADS[name]()
        assert len(xs) > 1000
