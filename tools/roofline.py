#!/usr/bin/env python
"""Single-chip roofline for the neighbour phases (round-4 VERDICT #2).

Measures, on the REAL 1M settled state:
  1. the exact chunk census of the production window plan (chunks and
     pair-slots per row, mirrored in NumPy from plan_windows +
     disjoint_windows + the kernels' max(1, nchunk) unconditional chunk),
  2. the true neighbour count (brute-force on a particle sample),
  3. the achieved pair-slot rate of the production lambda/delta kernels,
  4. the same census under SUPERCELL sort coarsening ((2,2,1) and (2,2,2)
     cells of 2h — the formulation alternative named in round 3), without
     building the kernels: the census alone decides.

The punchline arithmetic (printed at the end): with 12 neighbour sweeps per
step (6 iterations x lambda+delta), the step time implied by ANY window
formulation is  12 * rows * slots_per_row / rate.  At the measured rate,
even the absolute floor of ONE 128-lane chunk per row per sweep (a perfect
neighbour list, unreachable with 9 disjoint stencil windows) caps the step
well above the 16.7 ms the 60 steps/s north star requires — the remaining
single-chip levers are rate (VPU-bound pair math) or fewer sweeps, not
tighter windows; multi-chip is the sanctioned scaling axis.

Run: python tools/roofline.py [count] [reps]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbf_sph_tpu.core.configs import dam_break
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.models.jax_solver import dyn_params_of
from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, decode_key, sort_key
from pbf_sph_tpu.ops import pallas_pbf as p1
from pbf_sph_tpu.ops import pbf

WCOL = p1.WCOL
SUB = p1.SUB


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
    print(f"  {label:34s}: {dt:8.2f} ms", flush=True)
    return out, dt


def census(lin_sorted, table, dims, member_count, sub=SUB, label=""):
    """NumPy mirror of plan_windows + disjoint_windows + the kernels'
    unconditional first chunk: per-sub-block chunk/slot counts."""
    nx, ny, nz = dims
    ncells = nx * ny * nz
    nynz = ny * nz
    C = lin_sorted.shape[0]
    nsub = C // sub
    lin = np.minimum(lin_sorted, ncells)
    last_valid = lin[max(member_count - 1, 0)]
    lin = np.minimum(lin, last_valid)
    cmin = lin[0::sub].astype(np.int64)
    cmax = lin[sub - 1::sub].astype(np.int64)
    lo = np.empty((nsub, 9), np.int64)
    hi = np.empty((nsub, 9), np.int64)
    s = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            off = dx * nynz + dy * nz
            lo[:, s] = table[np.clip(cmin + off - 1, 0, ncells)]
            hi[:, s] = table[np.clip(cmax + off + 2, 0, ncells)]
            s += 1
    # disjoint coverage scan (pallas_pbf.disjoint_windows)
    cover = np.zeros(nsub, np.int64)
    chunks = np.zeros(nsub, np.int64)
    real = np.zeros(nsub, np.int64)
    for s in range(9):
        start_c = np.maximum(lo[:, s] // WCOL, cover)
        end_c = np.maximum(-(-hi[:, s] // WCOL), start_c)
        cover = end_c
        # kernel cost: max(1, nchunk) — empty windows pay the sentinel chunk
        chunks += np.maximum(end_c - start_c, 1)
        real += end_c - start_c
    # only sub-blocks holding members do real work, but the kernel runs all
    rows = C
    total_chunks = int(chunks.sum())
    per_row = total_chunks * WCOL / nsub  # slots per row (rows share chunks)
    print(f"  census[{label}]: sub-blocks={nsub}  chunks={total_chunks}"
          f"  chunks/sub-block={total_chunks/nsub:.2f}"
          f"  pair-slots/row={per_row:.0f}"
          f"  total pair-slots={total_chunks * WCOL * sub / 1e9:.2f} G")
    print(f"  census[{label}]: REAL chunks (no sentinels)/sub-block: "
          f"mean={real.mean():.2f} p95={np.percentile(real, 95):.0f} "
          f"p99={np.percentile(real, 99):.0f} max={real.max()} "
          f"-> {real.mean()*WCOL:.0f} pair-slots/row "
          f"({(1 - real.sum()/max(total_chunks,1))*100:.0f}% of executed "
          f"chunks are sentinels)")
    return total_chunks * WCOL * sub  # total pair slots per sweep


def true_neighbours(pstar, member_count, h, nsample=2048, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.choice(member_count, size=nsample, replace=False)
    P = pstar[:, :member_count]
    q = pstar[:, idx]  # (3, S)
    cnt = np.zeros(nsample, np.int64)
    h2 = h * h
    B = 200_000
    for s0 in range(0, member_count, B):
        blk = P[:, s0:s0 + B]
        d2 = ((q[:, :, None] - blk[:, None, :]) ** 2).sum(0)
        cnt += (d2 <= h2).sum(1)
    return cnt


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mc, cfg, xs = dam_break(count, solver_iter=6)
    solver = make_solver("pallas", h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    dyn = dyn_params_of(cfg, solver.dtype)
    for _ in range(5):
        state, out = solver.step_device(spec, state, dyn, scn)
    sync(out["alive_count"])
    dtype = jnp.float32
    h = spec.h
    scale = jnp.asarray(spec.scale, dtype)
    min_bound = dyn["min_bound"].astype(dtype)
    max_bound = dyn["max_bound"].astype(dtype)
    min_extent = min_bound / scale - jnp.asarray(h, dtype) * 2

    @jax.jit
    def prep(state):
        vel, pstar = pbf.advect(
            state.position, state.velocity, state.mass, state.ptype,
            state.alive, scn["wells_centre"], scn["wells_force"],
            dyn["constant_force"].astype(dtype), dyn["dt"].astype(dtype),
            scale)
        cells = cell_coords(pstar, min_extent, h)
        key = sort_key(cells, state.alive, spec.grid)
        ops = jax.lax.sort(
            (key, state.mass, state.ptype.astype(jnp.int32),
             pstar[0], pstar[1], pstar[2], state.alive), num_keys=1)
        key, mass = ops[0], ops[1]
        ptype = ops[2]
        pstar = jnp.stack(ops[3:6])
        alive = ops[6]
        cells, member = decode_key(key, spec.grid)
        table = build_cell_table(key, spec.grid)
        return key, mass, ptype, pstar, alive, cells, member, table

    key, mass, ptype, pstar, alive, cells, member, table = \
        jax.block_until_ready(prep(state))
    memberf = member.astype(dtype)
    C = spec.capacity
    nz = spec.grid.dims[2]
    smax = spec.strip_capacity or max(8192, -(-(nz * 48 * 2) // 128) * 128)
    smax = min(-(-smax // 128) * 128, C)

    # --- measured kernel rate -------------------------------------------
    ph = p1.PallasPhases(C, spec.grid, h, smax)
    f_plan = jax.jit(lambda k, t: ph.plan_frame(k, t))
    wins, ovf = jax.block_until_ready(f_plan(key, table))
    f_lam = jax.jit(lambda w, ps: ph.lambda_phase(
        w, ps, mass, memberf, ptype, alive, cells))
    _, t_lam = timed(f_lam, wins, pstar, reps=reps, label="lambda (production)")
    lam = f_lam(wins, pstar)
    f_del = jax.jit(lambda w, ps, l: ph.delta_phase(
        w, ps, l, memberf, ptype, alive, scale, min_bound, max_bound, cells))
    _, t_del = timed(f_del, wins, pstar, lam, reps=reps, label="delta (production)")

    # --- host pulls -------------------------------------------------------
    key_h = np.asarray(key)
    table_h = np.asarray(table)
    pstar_h = np.asarray(pstar)
    member_count = int(table_h[spec.grid.ncells])
    print(f"count={count} capacity={C} members={member_count} "
          f"grid={spec.grid.dims}")

    slots = census(key_h, table_h, spec.grid.dims, member_count,
                   label="production (h,h,h)")
    rate = slots / (t_lam / 1e3)
    rate_d = slots / (t_del / 1e3)
    print(f"  achieved pair-slot rate: lambda {rate/1e9:.1f} G/s, "
          f"delta {rate_d/1e9:.1f} G/s")

    # --- true neighbour census --------------------------------------------
    cnt = true_neighbours(pstar_h, member_count, h)
    print(f"  true neighbours (r<=h): mean={cnt.mean():.1f} "
          f"p50={np.percentile(cnt, 50):.0f} p95={np.percentile(cnt, 95):.0f} "
          f"max={cnt.max()}")

    # --- supercell census ---------------------------------------------------
    # coarsen cells to (2h,2h,h) / (2h,2h,2h): ±1 coarse cell still covers
    # the h reach, so the same 9/3-window plan applies — only the census
    # decides.  Recompute cells from pstar on host.
    me = np.asarray(min_extent)
    for cz_div, tag in ((1, "supercell (2h,2h,h)"), (2, "supercell (2h,2h,2h)")):
        cc = []
        for a, div in zip(range(3), (2, 2, cz_div)):
            c = np.trunc((pstar_h[a] - me[a]) / np.float32(h)).astype(np.int64)
            cc.append(c // div)
        nx = spec.grid.dims[0] // 2 + 1
        ny = spec.grid.dims[1] // 2 + 1
        nzc = spec.grid.dims[2] // cz_div + 1
        ncells = nx * ny * nzc
        in_box = np.ones(C, bool)
        for c, n in zip(cc, (nx, ny, nzc)):
            in_box &= (c >= 0) & (c < n)
        alive_h = np.asarray(alive) > 0
        lin = (cc[0] * ny + cc[1]) * nzc + cc[2]
        k2 = np.where(alive_h & in_box, lin, ncells)
        k2 = np.where(alive_h, k2, ncells + 1)
        order = np.argsort(k2, kind="stable")
        k2s = k2[order]
        tbl = np.searchsorted(k2s, np.arange(ncells + 1))
        mc2 = int(tbl[ncells])
        census(k2s, tbl, (nx, ny, nzc), mc2, label=tag)

    # --- the arithmetic ------------------------------------------------------
    sweeps = 2 * 6
    print("\nnorth-star arithmetic (60 steps/s at 1M -> 16.7 ms/step):")
    step_now = sweeps * slots / rate * 1e3 / 2 + sweeps * slots / rate_d * 1e3 / 2
    print(f"  current formulation: 12 sweeps x {slots/1e9:.2f} G slots "
          f"-> {step_now:.0f} ms solve")
    for label, spr in (("9-window floor (1 chunk/window)", 9 * WCOL),
                       ("perfect-neighbour-list floor (1 chunk/row)", WCOL)):
        t = sweeps * (C / SUB * spr * SUB) / rate * 1e3
        print(f"  {label}: {spr} slots/row -> {t:.1f} ms solve at the "
              f"measured lambda rate")


if __name__ == "__main__":
    main()
