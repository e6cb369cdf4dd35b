#!/usr/bin/env python
"""Sweep the round-4 lambda/delta kernel variants on real TPU:

  sub in {16, 32, 64} x mxu in {off, on}

against the production baseline (sub=64, mxu=off), reporting per-phase time
and max |diff| of lambda / delta outputs vs the baseline (VERDICT round-3
item #1: the centred-r2 MXU kernel, precision proven in
tools/precision_centered.py, built here).

Run: python tools/bench_kernel_variants.py [count] [reps]
"""
import sys
import time
import os

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbf_sph_tpu.core.configs import dam_break
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models.jax_solver import dyn_params_of
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, decode_key, sort_key
from pbf_sph_tpu.ops import pallas_pbf as p1


def sync(x):
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
    print(f"  {label:36s}: {dt:8.2f} ms")
    return out, dt


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mc, cfg, xs = dam_break(count, solver_iter=6)
    solver = make_solver("pallas", h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    dyn = dyn_params_of(cfg, solver.dtype)
    print(f"count={count} capacity={spec.capacity} grid={spec.grid.dims}")

    for _ in range(5):
        state, out = solver.step_device(spec, state, dyn, scn)
    print(f"occupancy={int(out['max_occupancy'])}")

    dtype = jnp.float32
    h = spec.h
    scale = jnp.asarray(spec.scale, dtype)
    dt_ = dyn["dt"].astype(dtype)
    min_bound = dyn["min_bound"].astype(dtype)
    max_bound = dyn["max_bound"].astype(dtype)
    min_extent = min_bound / scale - jnp.asarray(h, dtype) * 2

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
    memberf = member.astype(dtype)
    nz = spec.grid.dims[2]
    smax = spec.strip_capacity or max(8192, -(-(nz * 48 * 2) // 128) * 128)
    smax = min(-(-smax // 128) * 128, spec.capacity)

    ref_lam = None
    ref_ps = None
    results = {}
    for sub in (64, 32, 16):
        for mxu in (False, True):
            tag = f"sub={sub} mxu={int(mxu)}"
            ph = p1.PallasPhases(spec.capacity, spec.grid, h, smax, sub=sub, mxu=mxu)
            f_plan = jax.jit(lambda k, t, ph=ph: ph.plan_frame(k, t))
            wins, ovf = jax.block_until_ready(f_plan(key, table))
            print(f"== {tag} (smax={smax}) strip_ovf={int(ovf)} ==")
            _, t_plan = timed(f_plan, key, table, reps=reps, label=f"plan [{tag}]")
            f_lam = jax.jit(lambda w, ps, ph=ph: ph.lambda_phase(
                w, ps, mass, memberf, ptype, alive, cells))
            lam, t_lam = timed(f_lam, wins, pstar, reps=reps, label=f"lambda [{tag}]")
            f_del = jax.jit(lambda w, ps, l, ph=ph: ph.delta_phase(
                w, ps, l, memberf, ptype, alive, scale, min_bound, max_bound, cells))
            ps_out, t_del = timed(f_del, wins, pstar, lam, reps=reps, label=f"delta [{tag}]")
            if ref_lam is None:
                ref_lam, ref_ps = lam, ps_out
                print("  (baseline)")
            else:
                dl = float(jnp.max(jnp.abs(lam - ref_lam)))
                dp = float(jnp.max(jnp.abs(ps_out - ref_ps)))
                rl = float(jnp.max(jnp.abs(lam - ref_lam) /
                                   (jnp.abs(ref_lam) + 1e-6)))
                print(f"  parity vs baseline: max|dlam|={dl:.3e} (rel {rl:.3e}) "
                      f"max|dpstar|={dp:.3e}")
            results[tag] = (t_plan, t_lam, t_del)

    print("\nsummary (plan + 6x(lambda+delta) estimate):")
    for tag, (tp, tl, td) in results.items():
        print(f"  {tag:20s}: plan {tp:7.2f}  lam {tl:7.2f}  del {td:7.2f}  "
              f"solve6 {tp + 6 * (tl + td):8.2f} ms")


if __name__ == "__main__":
    main()
