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


@pytest.mark.slow
def test_pallas_overlapping_windows_interpret():
    """Sparse particles on a tiny grid (scaling 2500 => a 9^3-cell grid,
    occupancy < 1): every 64-row sub-block spans many z-columns and whole
    x-planes, so the 9 stencil windows overlap heavily — the case the
    chunk-disjoint window scan must dedup exactly once (the pure-geometry
    kernels have no per-pair mask left to fall back on).

    Verified at PHASE level against a brute-force per-pair oracle using the
    kernels' own fp math: the diffuse neighbour COUNT must match exactly
    (integers — any double-count or miss shifts it by >= 1) and lambda must
    match to fp-accumulation noise.  An end-to-end advance comparison is NOT
    used here: in this ultra-compressed regime (spacing ~ h/10) the spiky
    gradient is ~1e5, so the sqrt-vs-rsqrt formulation difference between
    the XLA and Pallas paths amplifies chaotically through delta."""
    import jax.numpy as jnp
    import jax

    from pbf_sph_tpu.models.jax_solver import dyn_params_of, make_phase_objects
    from pbf_sph_tpu.ops.grid import build_cell_table
    from pbf_sph_tpu.ops.kernels import poly6_factor, spiky_kernel_factor

    mc, cfg, xs = simple_config_with_2_cubes(600, 2, 2500.0)
    ps = JaxSolver(h=cfg.h, use_pallas=True)
    spec, state, scn = ps.prepare(cfg, Scene(), xs)
    dyn = dyn_params_of(cfg, ps.dtype)
    phases, _ = make_phase_objects(spec, True)
    grid, h, C = spec.grid, spec.h, spec.capacity
    scale = cfg.scale

    n = len(xs)
    pos = jnp.asarray(np.pad(xs.position.T.astype(np.float32) / scale,
                             ((0, 0), (0, C - n))))
    member = jnp.arange(C) < n
    memberf = member.astype(jnp.float32)
    min_ext = jnp.asarray([dyn["min_bound"][a] / scale - 2 * h for a in range(3)])
    cells = jnp.stack([
        jnp.trunc(jnp.clip((pos[a] - min_ext[a]) / h, -2e9, 2e9)).astype(jnp.int32)
        for a in range(3)])
    nx, ny, nz = grid.dims
    key = jnp.where(member, (cells[0] * ny + cells[1]) * nz + cells[2],
                    grid.ncells).astype(jnp.int32)
    order = jnp.argsort(key)
    key_s, cells_s, pos_s = key[order], cells[:, order], pos[:, order]
    table = build_cell_table(key_s, grid)
    wins, ovf = jax.jit(
        lambda k, t: phases.plan_frame(k, t))(key_s, table)
    assert int(ovf) == 0

    ptype = jnp.zeros((C,), jnp.int32)
    lam_p = np.asarray(phases.lambda_phase(
        wins, pos_s, jnp.ones((C,), jnp.float32), memberf, ptype, member,
        cells_s))[:n]

    colour = jnp.full((4, C), 0.5, jnp.float32)
    outs = phases._diffuse(wins, jnp.stack([
        colour[0], colour[1], colour[2], colour[3], memberf,
        jnp.where(memberf > 0, cells_s[0].astype(jnp.float32), -1e9),
        cells_s[1].astype(jnp.float32), cells_s[2].astype(jnp.float32)]))
    cnt_p = np.asarray(outs[4])[:n]

    # brute force with the kernels' own fp32 math
    psn = np.asarray(pos_s)[:, :n]
    cln = np.asarray(cells_s)[:, :n]
    hh, hf = np.float32(h * h), np.float32(h)
    eps2 = np.float32(1e-16)
    p6f = np.float32(poly6_factor(h))
    skf = np.float32(spiky_kernel_factor(h))
    rr = np.float32(1.0 / 6378.0)
    lam_bf = np.zeros(n, np.float32)
    cnt_bf = np.zeros(n)
    for i in range(n):
        adj = (np.abs(cln - cln[:, i : i + 1]) <= 1).all(0)
        cnt_bf[i] = adj.sum()
        d = psn[:, i : i + 1] - psn[:, adj]
        r2 = (d * d).sum(0, dtype=np.float32)
        d2p = np.maximum(hh - r2, np.float32(0))
        p6 = d2p * d2p * d2p
        r2c = np.maximum(r2, eps2)
        u = (np.float32(1) / np.sqrt(r2c)).astype(np.float32)
        tt = np.maximum(hf - r2c * u, np.float32(0))
        sg = tt * tt * u
        g = (d * sg).sum(1, dtype=np.float32)
        rho = p6.sum(dtype=np.float32) * p6f
        c = skf * rr
        norm2 = (g[0] * c) ** 2 + (g[1] * c) ** 2 + (g[2] * c) ** 2
        lam_bf[i] = -(rho * rr - 1.0) / (norm2 + np.float32(600.0))
    np.testing.assert_array_equal(cnt_p, cnt_bf)
    np.testing.assert_allclose(lam_p, lam_bf, atol=1e-6, rtol=1e-5)
