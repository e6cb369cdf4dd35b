"""Multi-chip domain decomposition vs single-chip parity (virtual CPU mesh)."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from pbf_sph_tpu.core.configs import dam_break
from pbf_sph_tpu.core.scene import simple_config_with_2_cubes
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models.jax_solver import JaxSolver, dyn_params_of
from pbf_sph_tpu.parallel import sharded


def run_sharded(cfg, particles, n_dev, frames):
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (sharded.AXIS,))
    spec = sharded.ShardSpec.create(cfg, n_dev, len(particles), cfg.h)
    state = sharded.distribute_particles(particles, spec)
    state = sharded.shard_state(state, mesh)
    step = sharded.build_sharded_step(spec, mesh)
    dyn = dyn_params_of(cfg, np.float32)
    stats = None
    with mesh:
        for _ in range(frames):
            state, stats = step(state, dyn)
    return state.to_soa(), {k: np.asarray(v) for k, v in stats.items()}


def run_single(cfg, particles, frames):
    js = JaxSolver(h=cfg.h)
    xs = particles
    for _ in range(frames):
        _, xs = js.advance(cfg, Scene(), xs)
    return xs


@pytest.mark.parametrize("n_dev", [2, 4])
@pytest.mark.slow
def test_sharded_matches_single(n_dev):
    mc, cfg, particles = dam_break(1200, solver_iter=3)
    xs_m, stats = run_sharded(cfg, particles, n_dev, frames=2)
    xs_s = run_single(cfg, particles, frames=2)
    assert stats["migrate_dropped"].sum() == 0
    assert stats["ghost_dropped"].sum() == 0
    assert len(xs_m) == len(xs_s)
    a = xs_m.order_by_id()
    b = xs_s.order_by_id()
    np.testing.assert_array_equal(a.pid, b.pid)
    np.testing.assert_allclose(a.position, b.position, atol=0.1, rtol=0)
    np.testing.assert_allclose(a.velocity, b.velocity, atol=0.1, rtol=0)
    np.testing.assert_allclose(a.colour, b.colour, atol=2e-3, rtol=0)


@pytest.mark.slow
def test_sharded_conserves_particles_under_motion():
    from pbf_sph_tpu.core.scene import apply_motion_sin_x_cos_z

    mc, cfg, particles = dam_break(1500, solver_iter=2)
    mesh = Mesh(np.array(jax.devices()[:4]), (sharded.AXIS,))
    spec = sharded.ShardSpec.create(cfg, 4, len(particles), cfg.h)
    state = sharded.distribute_particles(particles, spec)
    state = sharded.shard_state(state, mesh)
    step = sharded.build_sharded_step(spec, mesh)
    with mesh:
        for f in range(4):
            c = apply_motion_sin_x_cos_z(cfg, f)
            state, stats = step(state, dyn_params_of(c, np.float32))
    assert int(np.asarray(stats["alive_count"]).sum()) == len(particles)
    out = state.to_soa()
    np.testing.assert_array_equal(np.sort(out.pid), np.sort(particles.pid))
