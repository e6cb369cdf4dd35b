"""C++/OpenMP oracle: build + parity with the NumPy oracle.

The two oracles are independent implementations of the same reference
semantics (vectorized fp64-accumulating NumPy vs loop-faithful fp32 C++);
their agreement validates both.
"""

import numpy as np
import pytest

from pbf_sph_tpu.core.scene import apply_motion_sin_x_cos_z, simple_config_with_2_cubes
from pbf_sph_tpu.core.types import Drain, Query, Scene, Source, Well


@pytest.fixture(scope="module")
def cpp_solver():
    from pbf_sph_tpu.models.cpp_solver import CppSolver

    return CppSolver()


def test_cpp_vs_numpy_frame(cpp_solver):
    from pbf_sph_tpu.models.numpy_solver import NumpySolver

    mc, cfg, particles = simple_config_with_2_cubes(2000, 3, 500.0)
    ns = NumpySolver()
    xs_c = xs_n = particles
    for frame in range(2):
        c = apply_motion_sin_x_cos_z(cfg, frame)
        _, xs_c = cpp_solver.advance(c, Scene(), xs_c)
        _, xs_n = ns.advance(c, Scene(), xs_n)
    xs_c, xs_n = xs_c.order_by_id(), xs_n.order_by_id()
    np.testing.assert_array_equal(xs_c.pid, xs_n.pid)
    np.testing.assert_allclose(xs_c.position, xs_n.position, atol=0.1, rtol=0)
    np.testing.assert_allclose(xs_c.velocity, xs_n.velocity, atol=0.2, rtol=0)
    np.testing.assert_allclose(xs_c.colour, xs_n.colour, atol=2e-3, rtol=0)


def test_cpp_vs_numpy_mesh_and_scene(cpp_solver):
    from pbf_sph_tpu.models.numpy_solver import NumpySolver

    mc, cfg, particles = simple_config_with_2_cubes(2000, 3, 500.0)
    cfg = cfg.replace(surface=mc)
    scene = Scene(
        wells=[Well(tag=0, centre=(150.0, 30.0, 150.0), force=100.0)],
        sources=[Source(tag=555, centre=(500, 400, 500), velocity=(0, 0, 0), colour=(1, 0, 0, 1), rate=9)],
        drains=[Drain(tag=0, centre=(650, 60, 650), width=60.0)],
        queries=[Query(id=1, point=(150, 30, 150))],
    )
    ns = NumpySolver()
    res_c, xs_c = cpp_solver.advance(cfg, scene, particles)
    res_n, xs_n = ns.advance(cfg, scene, particles)
    assert len(xs_c) == len(xs_n)
    tc, tn = len(res_c.mesh.vs) // 3, len(res_n.mesh.vs) // 3
    assert tc > 0
    assert abs(tc - tn) <= max(3, 0.01 * tn)
    assert set(res_c.queries[0].neighbours.tolist()) == set(res_n.queries[0].neighbours.tolist())


def test_cpp_fp64_vs_numpy_fp64():
    """The fp64 native entry (`pbf_advance_f64`) matches the NumPy oracle in
    fp64 — the reference OMP backend's --fp64 anchor
    (`src/benchmark.cpp:159-165`; round-2 missing #2).  fp64-vs-fp64 runs
    agree far tighter than the fp32 cross-oracle tolerance."""
    from pbf_sph_tpu.models.cpp_solver import CppSolver
    from pbf_sph_tpu.models.numpy_solver import NumpySolver

    mc, cfg, particles = simple_config_with_2_cubes(1200, 2, 500.0)
    cs = CppSolver(dtype="float64")
    ns = NumpySolver(dtype="float64")
    xs_c = xs_n = particles
    for frame in range(2):
        c = apply_motion_sin_x_cos_z(cfg, frame)
        _, xs_c = cs.advance(c, Scene(), xs_c)
        _, xs_n = ns.advance(c, Scene(), xs_n)
    xs_c, xs_n = xs_c.order_by_id(), xs_n.order_by_id()
    np.testing.assert_array_equal(xs_c.pid, xs_n.pid)
    np.testing.assert_allclose(xs_c.position, xs_n.position, atol=1e-4, rtol=0)
    np.testing.assert_allclose(xs_c.velocity, xs_n.velocity, atol=1e-4, rtol=0)
    np.testing.assert_allclose(xs_c.colour, xs_n.colour, atol=1e-6, rtol=0)
