#!/usr/bin/env python
"""Multi-chip performance model + communication census (round-5 VERDICT #2).

Multi-chip is the sanctioned path to the 60 steps/s north star; this tool
turns that from a hope into checkable arithmetic, WITHOUT multi-chip
hardware, via three measurements:

  1. COLLECTIVE CENSUS — compile the real sharded step (parallel/sharded.py)
     on the virtual CPU mesh and count every collective-permute / all-reduce
     in the optimized HLO, with shapes.  This pins the per-frame collective
     COUNT (size-independent) and validates the analytic byte formulas.
  2. PER-SLAB SLOT CENSUS — partition the REAL settled 1M state (from the
     single chip) into N equal-count x-slabs and run the roofline's NumPy
     chunk census on each slab's local grid (own columns + 2 ghost columns),
     at N in {2,4,8,16,32,64}.  This gives each chip's solve work including
     the halo overhead and the residual imbalance.
  3. PROJECTION — step(N) = max-slab solve at the MEASURED single-chip pair
     rate + local sort/table/plan scaled 1/N + ICI bytes/bandwidth +
     collective dispatch latency.  States which N reaches 16.7 ms and which
     term breaks first.

ICI parameters are stated, not measured (no hardware): v5e one-way
per-neighbour link bandwidth ICI_BW = 4.5e10 B/s, per-collective dispatch
latency ICI_LAT = 2 us.  Both are knobs; the conclusion's sensitivity to
them is printed.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/multichip_model.py
     [--census-only]  (skip the TPU settled-state part)
"""
import os
import re
import sys
import time

import numpy as np

# ---------------------------------------------------------------------------
# measured constants (tools/roofline.py + tools/anchor_rate.py, round 5)
# ---------------------------------------------------------------------------
RATE_LAMBDA = 74.7e9   # pair-slots/s, production kernel, real chip
RATE_DELTA = 71.1e9
SWEEPS = 12            # 6 iterations x (lambda + delta)
T_LOCAL_1M = 14e-3     # sort+table+plan+advect residue at 1M (324 - 310 model)
ICI_BW = 4.5e10        # B/s one-way per neighbour link (v5e, stated)
ICI_LAT = 2e-6         # s per collective dispatch (stated)
TARGET = 1 / 60.0

WCOL = 128
SUB = 64


def census_slab(lin_sorted, table, dims, sub=SUB):
    """Executed-chunk census for one slab's local sorted array (the roofline
    census: disjoint windows + max(1, nchunk) sentinel accounting)."""
    nx, ny, nz = dims
    ncells = nx * ny * nz
    nynz = ny * nz
    C = lin_sorted.shape[0]
    if C % sub:
        pad = sub - C % sub
        lin_sorted = np.concatenate(
            [lin_sorted, np.full(pad, lin_sorted[-1] if C else 0, np.int64)])
        C += pad
    nsub = C // sub
    lin = np.minimum(lin_sorted, ncells - 1)
    cmin = lin[0::sub].astype(np.int64)
    cmax = lin[sub - 1::sub].astype(np.int64)
    cover = np.zeros(nsub, np.int64)
    chunks = np.zeros(nsub, np.int64)
    s = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            off = dx * nynz + dy * nz
            lo = table[np.clip(cmin + off - 1, 0, ncells)]
            hi = table[np.clip(cmax + off + 2, 0, ncells)]
            start_c = np.maximum(lo // WCOL, cover)
            end_c = np.maximum(-(-hi // WCOL), start_c)
            cover = end_c
            chunks += np.maximum(end_c - start_c, 1)
            s += 1
    return int(chunks.sum()) * WCOL * sub  # pair-slots per sweep


# ---------------------------------------------------------------------------
# 1. collective census from the compiled HLO (virtual mesh, small size)
# ---------------------------------------------------------------------------


def collective_census(n_dev=4, count=2000, iteration=6):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from pbf_sph_tpu.core.scene import simple_config_with_2_cubes
    from pbf_sph_tpu.core.types import Scene
    from pbf_sph_tpu.models.jax_solver import dyn_params_of, scene_arrays_of
    from pbf_sph_tpu.parallel import sharded

    mc, config, xs = simple_config_with_2_cubes(count, iteration, 500.0)
    config = config.replace(surface=None)
    spec = sharded.ShardSpec.create(config, n_dev, len(xs), config.h)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (sharded.AXIS,))
    state = sharded.shard_state(sharded.distribute_particles(xs, spec), mesh)
    dyn = dyn_params_of(config, np.float32)
    scn = scene_arrays_of(Scene(), spec.scene, np.dtype("float32"))
    step_fn = sharded.build_sharded_step(spec, mesh)

    with mesh:
        txt = jax.jit(lambda st, dy, sc: step_fn(st, dy, sc)).lower(
            state, dyn, scn).compile().as_text()
    # optimized-HLO shapes: `%x = f32[2048]{0} collective-permute(`
    nperm, nar, byte_total = _hlo_collectives(txt)
    print(f"collective census (optimized HLO; n_dev={n_dev}, count={count}, "
          f"{iteration} iterations, fixed slabs, no surface):")
    print(f"  collective-permute ops/frame : {nperm}")
    print(f"  all-reduce ops/frame         : {nar}")
    print(f"  permute payload bytes/frame  : {byte_total} "
          f"(at THIS size's capacities: migrate_cap={spec.migrate_cap}, "
          f"ghost_cap={spec.ghost_cap})")
    exp = spec.migrate_cap * 2 * (13 * 4 + 1) + spec.ghost_cap * 2 * (
        12 * 4 + 1) + iteration * 2 * (1 + 3) * 4 * spec.ghost_cap
    print(f"  analytic bytes/frame         : {exp} "
          f"(migration 2x14 fields, ghosts 2x13, refresh 2x(1+3)x{iteration})")
    print(f"  analytic permute count       : "
          f"{14 * 2 + 13 * 2 + (1 + 3) * 2 * iteration} "
          f"(XLA may fuse/split some)")
    return nperm, nar, byte_total, exp


def _hlo_collectives(txt):
    shapes = re.findall(r"= (\w+\[[0-9,]*\])[^ ]* collective-permute", txt)
    ar = re.findall(r" all-reduce\(| all-reduce-start\(", txt)
    byte_total = 0
    for s in shapes:
        nums = re.findall(r"\[([0-9,]*)\]", s)
        dt = 1 if s.startswith(("pred", "s8", "u8")) else 4
        n = 1
        for tok in (nums[0].split(",") if nums else []):
            if tok:
                n *= int(tok)
        byte_total += n * dt
    return len(shapes), len(ar), byte_total


def collective_census_2d(nx=2, ny=2, count=2000, iteration=6,
                         rebalance=False):
    """HLO collective census of the SHIPPED 2D tile step
    (parallel/sharded2d.py) on a virtual nx*ny mesh."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pbf_sph_tpu.core.scene import simple_config_with_2_cubes
    from pbf_sph_tpu.core.types import Scene
    from pbf_sph_tpu.models.jax_solver import dyn_params_of, scene_arrays_of
    from pbf_sph_tpu.parallel import sharded2d

    mc, config, xs = simple_config_with_2_cubes(count, iteration, 500.0)
    config = config.replace(surface=None)
    spec = sharded2d.Shard2DSpec.create(config, nx, ny, xs, config.h,
                                        rebalance=rebalance)
    mesh = sharded2d.make_mesh2d(nx, ny)
    state = sharded2d.shard_state_2d(
        sharded2d.distribute_particles_2d(xs, spec), mesh)
    dyn = dyn_params_of(config, np.float32)
    scn = scene_arrays_of(Scene(), spec.scene, np.dtype("float32"))
    step_fn = sharded2d.build_sharded2d_step(spec, mesh)
    b = (np.asarray(spec.xb, np.int32), np.asarray(spec.yb, np.int32))
    with mesh:
        if rebalance:
            txt = jax.jit(
                lambda st, dy, sc, xbv, ybv: step_fn(st, dy, sc, (xbv, ybv))
            ).lower(state, dyn, scn, b[0], b[1]).compile().as_text()
        else:
            txt = jax.jit(lambda st, dy, sc: step_fn(st, dy, sc)).lower(
                state, dyn, scn).compile().as_text()
    nperm, nar, byte_total = _hlo_collectives(txt)
    print(f"2D collective census (optimized HLO; {nx}x{ny} tiles, "
          f"count={count}, {iteration} iterations, "
          f"{'rebalancing' if rebalance else 'static'} cuts, no surface):")
    print(f"  collective-permute ops/frame : {nperm}")
    print(f"  all-reduce ops/frame         : {nar}")
    print(f"  permute payload bytes/frame  : {byte_total} "
          f"(migrate_cap={spec.migrate_cap}, ghost_x={spec.ghost_x}, "
          f"ghost_y={spec.ghost_y})")
    exp = (spec.migrate_cap * 2 * 2 * (13 * 4 + 1)
           + (spec.ghost_x + spec.ghost_y) * 2 * (12 * 4 + 1)
           + iteration * 2 * (1 + 3) * 4 * (spec.ghost_x + spec.ghost_y))
    print(f"  analytic bytes/frame         : {exp} "
          f"(migration 2 axes x 2 dirs x 14 fields, ghosts "
          f"(HX+HY) x 2 x 13, refresh 2 x (1+3) x {iteration} x (HX+HY))")
    print(f"  analytic permute count       : "
          f"{14 * 2 * 2 + 13 * 2 * 2 + (1 + 3) * 2 * 2 * iteration} "
          f"(= 2x the 1D step's; XLA may fuse/split some)")
    return nperm, nar, byte_total, exp


# ---------------------------------------------------------------------------
# analytic per-frame ICI bytes at scale (validated by the HLO census)
# ---------------------------------------------------------------------------


def ici_bytes(count, n_dev, gy, gz, iteration=6, rebalance=True):
    """Per-frame one-way bytes over the busiest neighbour link, from the
    sharded step's buffer sizes (parallel/sharded.py):
      migration: 13 f32/i32 fields + 1 bool, migrate_cap slots, per direction
      ghosts:    12 fields + 1 bool, ghost_cap slots, per direction
      per-iteration refresh: lambda (1) + pstar (3) f32, ghost_cap, per dir
      rebalance: one (gx,) i32 all-reduce (rides every link)
    """
    per = count / n_dev
    cap_local = int(-(-per * 2.5 // 128) * 128) if rebalance else count
    migrate_cap = cap_local if rebalance else max(128, min(cap_local, gy * gz * 8))
    ghost_cap = min(max(128, -(-(gy * gz * 8) // 128) * 128), cap_local)
    # per DIRECTION per frame (each neighbour link carries one direction of
    # each exchange): migration (13 fields + valid), ghosts (12 + valid),
    # per-iteration lambda + pstar refresh (1 + 3 f32)
    per_dir = (migrate_cap * (13 * 4 + 1) + ghost_cap * (12 * 4 + 1)
               + iteration * (1 + 3) * 4 * ghost_cap)
    return per_dir, dict(migrate_cap=migrate_cap, ghost_cap=ghost_cap,
                         cap_local=cap_local)


# ---------------------------------------------------------------------------
# 2+3. per-slab census on the real settled state + projection
# ---------------------------------------------------------------------------


def settled_state(count=1_000_000, slosh_frames=0):
    """Cell coords of the 1M dam after 5 settling steps; with
    `slosh_frames` > 0, additionally run that many frames of the
    oscillating-bounds benchmark motion (`src/sph.hpp:147-158`) so the
    census sees the sloshing steady state instead of the initial column
    (the round-5 BENCHMARKS caveat)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from pbf_sph_tpu.core.configs import dam_break
    from pbf_sph_tpu.core.scene import apply_motion_sin_x_cos_z
    from pbf_sph_tpu.core.types import Scene
    from pbf_sph_tpu.models import make_solver
    from pbf_sph_tpu.models.jax_solver import dyn_params_of
    from pbf_sph_tpu.ops import pbf
    from pbf_sph_tpu.ops.grid import cell_coords

    mc, cfg, xs = dam_break(count, solver_iter=6)
    solver = make_solver("pallas", h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    dyn = dyn_params_of(cfg, solver.dtype)
    for _ in range(5):
        state, out = solver.step_device(spec, state, dyn, scn)
    for f in range(slosh_frames):
        dyn = dyn_params_of(apply_motion_sin_x_cos_z(cfg, f), solver.dtype)
        state, out = solver.step_device(spec, state, dyn, scn)
    np.asarray(out["alive_count"])
    dtype = jnp.float32
    scale = jnp.asarray(spec.scale, dtype)
    # census cells relative to the FINAL frame's (possibly translated) bounds
    min_extent = dyn["min_bound"].astype(dtype) / scale - jnp.asarray(spec.h, dtype) * 2

    @jax.jit
    def cells_of(state):
        vel, pstar = pbf.advect(
            state.position, state.velocity, state.mass, state.ptype,
            state.alive, scn["wells_centre"], scn["wells_force"],
            dyn["constant_force"].astype(dtype), dyn["dt"].astype(dtype), scale)
        cc = cell_coords(pstar, min_extent, spec.h)
        return cc[0], cc[1], cc[2], state.alive

    cx, cy, cz, alive = jax.block_until_ready(cells_of(state))
    cx = np.asarray(cx)[np.asarray(alive)]
    cy = np.asarray(cy)[np.asarray(alive)]
    cz = np.asarray(cz)[np.asarray(alive)]
    return cx, cy, cz, spec.grid.dims


def project(cx, cy, cz, gdims, count):
    gx, gy, gz = gdims
    print(f"\nper-slab census on the settled {count} state "
          f"(grid {gdims}), equal-count x-slabs + 2 ghost columns:")
    print(f"{'N':>4} {'max-slab slots':>15} {'imbal':>6} {'solve':>8} "
          f"{'local':>7} {'comm':>7} {'lat':>6} {'step':>8} {'steps/s':>8}")
    hist = np.bincount(np.clip(cx, 0, gx - 1), minlength=gx)
    cdf = np.cumsum(hist)
    total = int(cdf[-1])
    results = {}
    # x-slab feasibility: N slabs of >= min_slab_w=3 columns need 3N <= gx —
    # the 1D decomposition caps at gx//3 devices on this grid (a 2D y-slab
    # extension would lift this; out of scope, stated in BENCHMARKS)
    n_list = [n for n in (1, 2, 4, 8, 16, 24) if n * 3 <= gx]
    n_list.append(gx // 3)
    for N in n_list:
        # equal-count boundaries (the rebalance criterion)
        bounds = [0]
        for d in range(1, N):
            v = int(np.searchsorted(cdf, total * d / N, side="left")) + 1
            bounds.append(min(max(v, bounds[-1] + 3), gx - 3 * (N - d)))
        bounds.append(gx)
        slots = []
        for d in range(N):
            b0, b1 = bounds[d], bounds[d + 1]
            # local slab: own columns [b0, b1) + one ghost column each side
            m = (cx >= b0 - 1) & (cx < b1 + 1)
            lcx = cx[m] - (b0 - 1)
            lny, lnz = gy, gz
            w = (b1 - b0) + 2
            lin = (lcx.astype(np.int64) * lny + cy[m]) * lnz + cz[m]
            order = np.argsort(lin, kind="stable")
            lin_s = lin[order]
            ncells = w * lny * lnz
            table = np.searchsorted(lin_s, np.arange(ncells + 1))
            slots.append(census_slab(lin_s, table, (w, lny, lnz)))
        mx = max(slots)
        imbal = mx / (sum(slots) / N)
        t_solve = SWEEPS / 2 * mx / RATE_LAMBDA + SWEEPS / 2 * mx / RATE_DELTA
        t_local = T_LOCAL_1M * (count / 1e6) / N
        per_dir, caps = ici_bytes(count, N, gy, gz)
        t_comm = per_dir / ICI_BW if N > 1 else 0.0
        # analytic collective count (validated by the HLO census, part 1):
        # migration 14x2 + ghosts 13x2 + refresh (1+3)x2x6 = 102
        ncoll = 102 if N > 1 else 0
        t_lat = ncoll * ICI_LAT
        t = t_solve + t_local + t_comm + t_lat
        results[N] = (t, t_solve, t_local, t_comm, t_lat)
        print(f"{N:>4} {mx/1e9:>13.3f}G {imbal:>6.2f} {t_solve*1e3:>7.1f}ms"
              f" {t_local*1e3:>6.1f}ms {t_comm*1e3:>6.2f}ms {t_lat*1e3:>5.2f}ms"
              f" {t*1e3:>7.1f}ms {1/t:>8.1f}")
    # which N reaches the north star, and which term dominates there
    for N, (t, ts, tl, tc, tlat) in results.items():
        if t <= TARGET:
            parts = dict(solve=ts, local=tl, comm=tc, latency=tlat)
            dom = max(parts, key=parts.get)
            print(f"\n60 steps/s at {count} is projected at N = {N} chips "
                  f"(step {t*1e3:.1f} ms); the dominant term there is "
                  f"'{dom}' ({parts[dom]*1e3:.1f} ms).")
            print("sensitivity: halving ICI_BW adds "
                  f"{ici_bytes(count, N, gy, gz)[0]/ICI_BW*1e3:.2f} ms; "
                  f"doubling ICI_LAT adds {102*ICI_LAT*1e3:.2f} ms — the "
                  "projection is solve/imbalance-bound, not comm-bound.")
            break
    else:
        print("\nno N in range reaches 60 steps/s — the per-slab window "
              "overhang floors the solve term.")
    occ = (hist > 0.01 * hist.max()).sum()
    print(f"(x-occupancy: {occ} of {gx} columns hold >1% of the peak column "
          f"— the 1D partition saturates near {occ // 3} useful slabs at "
          f"min_slab_w=3)")
    return results


def _equal_count_cuts_np(vals, g, n, min_w=3, capped=False):
    """THE ENGINE'S cut function (parallel/sharded2d.py) — the census must
    partition exactly the way the shipped code does.  capped=True applies
    the dynamic-rebalance width caps (~3x uniform, the default
    max_wx_cap/max_wy_cap policy); fixed-mode static cuts are uncapped."""
    from pbf_sph_tpu.parallel.sharded2d import _axis_cap, _equal_count_cuts

    max_w = _axis_cap(g, n, min_w) if capped else None
    return list(_equal_count_cuts(np.asarray(vals), 0, g, n, min_w, max_w))


def _census_tiles(cx, cy, cz, gz, xb, yb):
    """Executed-slot census of every (xb, yb) tile (own + ghost layers)."""
    slots = []
    for i in range(len(xb) - 1):
        for j in range(len(yb) - 1):
            m = ((cx >= xb[i] - 1) & (cx < xb[i + 1] + 1)
                 & (cy >= yb[j] - 1) & (cy < yb[j + 1] + 1))
            wx = xb[i + 1] - xb[i] + 2
            wy = yb[j + 1] - yb[j] + 2
            lin = (((cx[m] - xb[i] + 1).astype(np.int64) * wy
                    + (cy[m] - yb[j] + 1)) * gz + cz[m])
            order = np.argsort(lin, kind="stable")
            ncells = wx * wy * gz
            table = np.searchsorted(lin[order], np.arange(ncells + 1))
            slots.append(census_slab(lin[order], table, (wx, wy, gz)))
    return slots


def project_2d(cx, cy, cz, gdims, count):
    """2D (x,y)-tile projection for BOTH partition families:

      * TENSOR-PRODUCT cuts (global x-cuts x global y-cuts from the marginal
        CDFs) — what `parallel/sharded2d.py` SHIPS (the two-phase migration
        requires a one-axis hop never to change the other axis's owner, so
        y-cuts are shared across all x-bands; the dynamic rebalancer
        re-partitions the same marginals per frame, so this census IS the
        rebalanced steady state);
      * RECURSIVE cuts (per-x-band y-cuts) — the looser lower bound a
        non-tensor-product engine could reach (requires diagonal-capable
        migration; not shipped).

    Each tile's local grid is (wx+2, wy+2, gz) with ghost layers on four
    sides.  Comm doubles (4 neighbours) and stays negligible."""
    gx, gy, gz = gdims
    for mode in ("tensor-product, static cuts (shipped fixed mode)",
                 "tensor-product + rebalance width caps (shipped dynamic mode)",
                 "recursive (bound)"):
        capped = "caps" in mode
        print(f"\n2D (x,y)-tile projection — {mode}:")
        print(f"{'NxxNy':>7} {'max-tile slots':>15} {'imbal':>6} {'solve':>8} "
              f"{'step':>8} {'steps/s':>8}")
        for nx_, ny_ in ((4, 2), (4, 4), (8, 4), (8, 8), (16, 8)):
            N = nx_ * ny_
            if nx_ * 3 > gx or ny_ * 3 > gy:
                continue
            xb = _equal_count_cuts_np(cx, gx, nx_, capped=capped)
            if mode.startswith("tensor"):
                yb = _equal_count_cuts_np(cy, gy, ny_, capped=capped)
                slots = _census_tiles(cx, cy, cz, gz, xb, yb)
            else:
                slots = []
                for i in range(nx_):
                    mx_ = (cx >= xb[i]) & (cx < xb[i + 1])
                    yb = _equal_count_cuts_np(cy[mx_], gy, ny_)
                    slots += _census_tiles(
                        cx, cy, cz, gz, xb[i:i + 2], yb)
            mx = max(slots)
            imbal = mx / (sum(slots) / N)
            t_solve = (SWEEPS / 2 * mx / RATE_LAMBDA
                       + SWEEPS / 2 * mx / RATE_DELTA)
            t = (t_solve + T_LOCAL_1M * (count / 1e6) / N
                 + 2 * ici_bytes(count, N, gy, gz)[0] / ICI_BW + 204 * ICI_LAT)
            print(f"{nx_:>3}x{ny_:<3} {mx/1e9:>13.3f}G {imbal:>6.2f} "
                  f"{t_solve*1e3:>7.1f}ms {t*1e3:>7.1f}ms {1/t:>8.1f}")


def main():
    census_only = "--census-only" in sys.argv
    if census_only:
        # child process: CPU backend + forced virtual devices (the parent's
        # backend is the tunneled TPU and a process can't switch platforms)
        collective_census(n_dev=4)
        print()
        collective_census_2d(nx=2, ny=2, rebalance=True)
        return
    print("== 1. collective census (compiled HLO, virtual CPU mesh) ==")
    import subprocess

    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
    subprocess.run([sys.executable, os.path.abspath(__file__), "--census-only"],
                   env=env, check=True)
    slosh = 0
    if "--slosh" in sys.argv:
        slosh = int(sys.argv[sys.argv.index("--slosh") + 1])
    print(f"\n== 2. settled-state slab census + projection "
          f"({slosh} slosh frames) ==")
    cx, cy, cz, gdims = settled_state(slosh_frames=slosh)
    project(cx, cy, cz, gdims, count=len(cx))
    project_2d(cx, cy, cz, gdims, count=len(cx))


if __name__ == "__main__":
    main()
