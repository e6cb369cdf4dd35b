#!/usr/bin/env python
"""Per-phase TPU timings at scale: sort, table, plan, compaction, lambda,
delta, diffuse — v1 (strip windows) vs v2 (compacted candidates).

Run: python tools/bench_phases.py [count]
Env: PBF_PHASE_IMPL=v1|v2|both
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbf_sph_tpu.core.configs import dam_break
from pbf_sph_tpu.core.types import FLUID, FluidState, Scene
from pbf_sph_tpu.models.jax_solver import dyn_params_of
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, decode_key, sort_key


def sync(x):
    # slice on-device FIRST: np.asarray of a big leaf would pull the whole
    # array through the ~10 MB/s axon tunnel and dwarf the kernel time
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def timed(fn, *args, reps=10, label=""):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)
    out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {label:28s}: {dt:8.2f} ms")
    return out, dt


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    which = os.environ.get("PBF_PHASE_IMPL", "both")
    mc, cfg, xs = dam_break(count, solver_iter=6)
    solver = make_solver("pallas", h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    dyn = dyn_params_of(cfg, solver.dtype)
    print(f"count={count} capacity={spec.capacity} grid={spec.grid.dims} "
          f"ncells={spec.grid.ncells}")

    # settle a few frames so occupancy is realistic
    import dataclasses
    for _ in range(5):
        state, out = solver.step_device(spec, state, dyn, scn)
    print(f"occupancy={int(out['max_occupancy'])} wcap_ovf={int(out['wcap_overflow'])} "
          f"strip_ovf={int(out['strip_overflow'])}")

    dtype = jnp.float32
    h = spec.h
    scale = jnp.asarray(spec.scale, dtype)
    dt_ = dyn["dt"].astype(dtype)
    min_bound = dyn["min_bound"].astype(dtype)
    max_bound = dyn["max_bound"].astype(dtype)
    min_extent = min_bound / scale - jnp.asarray(h, dtype) * 2

    # build sorted frame inputs once
    @jax.jit
    def prep(state):
        from pbf_sph_tpu.ops import pbf

        vel, pstar = pbf.advect(
            state.position, state.velocity, state.mass, state.ptype, state.alive,
            scn["wells_centre"], scn["wells_force"], dyn["constant_force"].astype(dtype),
            dt_, scale,
        )
        cells = cell_coords(pstar, min_extent, h)
        key = sort_key(cells, state.alive, spec.grid)
        ops = jax.lax.sort(
            (key, state.mass, state.ptype.astype(jnp.int32),
             pstar[0], pstar[1], pstar[2], state.alive), num_keys=1)
        key = ops[0]
        mass = ops[1]
        ptype = ops[2]
        pstar = jnp.stack(ops[3:6])
        alive = ops[6]
        cells, member = decode_key(key, spec.grid)
        table = build_cell_table(key, spec.grid)
        return key, mass, ptype, pstar, alive, cells, member, table

    key, mass, ptype, pstar, alive, cells, member, table = jax.block_until_ready(prep(state))
    sync(key)

    # pieces
    @jax.jit
    def f_sort(key_in, pstar):
        return jax.lax.sort(
            (key_in, pstar[0], pstar[1], pstar[2],
             pstar[0] * 2, pstar[1] * 2, pstar[2] * 2,
             pstar[0] * 3, pstar[1] * 3, pstar[2] * 3,
             pstar[0] * 4, pstar[1] * 4, pstar[2] * 4,
             pstar[0] * 5, pstar[1] * 5, key_in.astype(jnp.float32)),
            num_keys=1, is_stable=True)[0]

    @jax.jit
    def f_table(key):
        return build_cell_table(key, spec.grid)

    print("== shared ==")
    timed(f_sort, key, pstar, label="16-operand sort")
    timed(f_table, key, label="cell table")

    if which in ("v2", "both"):
        # the v2 pipeline is retired from production (round 4); the module
        # lives in tools/ for ablation runs of this script only
        import pallas_pbf2 as p2

        smax = max(8192, -(-(spec.grid.dims[2] * 48 * 2) // 128) * 128)
        smax = min(-(-smax // 128) * 128, spec.capacity)
        wcap = p2.default_wcap()
        ph2 = p2.PallasPhases2(spec.capacity, spec.grid, h, smax, wcap)

        f_plan2 = jax.jit(lambda key, table: ph2.plan_frame(key, table))
        wins, ovf = jax.block_until_ready(f_plan2(key, table))
        print(f"== v2 (smax={smax} wcap={wcap}) ovf={[int(v) for v in ovf.values()]} ==")
        timed(f_plan2, key, table, label="plan_compact")

        f_c3 = jax.jit(lambda w, ps: ph2.compact_pstar(w, ps, member))
        cands = timed(f_c3, wins, pstar, label="compact pstar (F=3)")[0]
        f_lam = jax.jit(lambda w, c, ps: ph2.lambda_phase(w, c, ps, mass, member, ptype, alive))
        lam = timed(f_lam, wins, cands, pstar, label="lambda v2")[0]
        f_c1 = jax.jit(lambda w, l: ph2.compact_lam(w, l))
        lamc = timed(f_c1, wins, lam, label="compact lam (F=1)")[0]
        f_del = jax.jit(lambda w, c, lc, ps, l: ph2.delta_phase(
            w, c, lc, ps, l, member, ptype, alive, scale, min_bound, max_bound))
        timed(f_del, wins, cands, lamc, pstar, lam, label="delta v2")
        colour = jnp.broadcast_to(jnp.asarray([0.1, 0.3, 0.9, 1.0], dtype)[:, None],
                                  (4, spec.capacity)).copy()
        f_dif = jax.jit(lambda w, c: ph2.diffuse(w, c, cells, member, ptype, alive, dt_))
        timed(f_dif, wins, colour, label="diffuse v2")

    if which in ("v1", "both"):
        from pbf_sph_tpu.ops import pallas_pbf as p1

        nz = spec.grid.dims[2]
        smax = spec.strip_capacity or max(8192, -(-(nz * 48 * 2) // 128) * 128)
        smax = min(-(-smax // 128) * 128, spec.capacity)
        ph1 = p1.PallasPhases(spec.capacity, spec.grid, h, smax)
        f_plan1 = jax.jit(lambda key, table: ph1.plan_frame(key, table))
        wins1, ovf1 = jax.block_until_ready(f_plan1(key, table))
        print(f"== v1 (smax={smax}) strip_ovf={int(ovf1)} ==")
        timed(f_plan1, key, table, label="plan_windows v1")
        memberf = member.astype(dtype)
        f_lam1 = jax.jit(lambda w, ps: ph1.lambda_phase(w, ps, mass, memberf, ptype, alive, cells))
        lam1 = timed(f_lam1, wins1, pstar, label="lambda v1")[0]
        f_del1 = jax.jit(lambda w, ps, l: ph1.delta_phase(
            w, ps, l, memberf, ptype, alive, scale, min_bound, max_bound, cells))
        timed(f_del1, wins1, pstar, lam1, label="delta v1")


if __name__ == "__main__":
    main()
