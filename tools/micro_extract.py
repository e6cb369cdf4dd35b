#!/usr/bin/env python
"""MC emission strategies on the real chip (the round-3/4 extraction lever).

The production emission sorts 15*M vertex-slot rows (11 operands) even though
~90% are invalid padding (BENCHMARKS.md "MC extraction cost model").  This
tool measures, on a REAL workload state (default mc512k):

  1. a per-block live-row census (how small can a static per-block staging
     capacity be?  the worst block bounds it),
  2. the current global 11-operand sort,
  3. blocked two-stage compaction: one row-sort over (nblk, 15*B) blocks
     compacts each block's live rows to the front, a static [:, :smax] slice
     drops the bulk of the padding, and a short global sort over nblk*smax
     rows merges the blocks,
  4. an operand-count ablation (9-op global sort) to bound what payload
     packing could ever buy.

Run: python tools/micro_extract.py [workload] [B ...]
"""
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbf_sph_tpu.core.configs import WORKLOADS
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.models.jax_solver import dyn_params_of, make_phase_objects
from pbf_sph_tpu.ops import mc as mc_ops
from pbf_sph_tpu.ops import pbf
from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, decode_key, sort_key
from pbf_sph_tpu.ops import mc_tables as mct


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def timed(fn, *args, reps=8, label=""):
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


def lattice_inputs(name):
    """Run the production pipeline to a settled state; return the lattice
    field + the extraction params (mirrors tools/bench_mc_split.py)."""
    mcp, cfg, xs = WORKLOADS[name]()
    solver = make_solver("pallas", h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    dyn = dyn_params_of(cfg, solver.dtype)
    for _ in range(5):
        state, out = solver.step_device(spec, state, dyn, scn)
    sync(out["alive_count"])
    dtype = jnp.dtype(spec.dtype)
    _, mcf = make_phase_objects(spec, True)

    @jax.jit
    def field(state, dyn, scn):
        h = spec.h
        scale = jnp.asarray(spec.scale, dtype)
        dt = dyn["dt"].astype(dtype)
        min_extent = dyn["min_bound"].astype(dtype) / scale - jnp.asarray(h, dtype) * 2
        vel, pstar = pbf.advect(
            state.position, state.velocity, state.mass, state.ptype, state.alive,
            scn["wells_centre"], scn["wells_force"],
            dyn["constant_force"].astype(dtype), dt, scale)
        cells = cell_coords(pstar, min_extent, h)
        key = sort_key(cells, state.alive, spec.grid)
        sorted_ops = jax.lax.sort(
            (key, state.ptype, state.position[0], state.position[1],
             state.position[2], state.colour[0], state.colour[1],
             state.colour[2], state.colour[3], state.alive),
            num_keys=1, is_stable=True)
        key = sorted_ops[0]
        position = jnp.stack(sorted_ops[2:5])
        colour = jnp.stack(sorted_ops[5:9])
        ptype, alive = sorted_ops[1], sorted_ops[9]
        cells, member = decode_key(key, spec.grid)
        cell_table = build_cell_table(key, spec.grid)
        lat_v, lat_n, lat_c, ovf = mcf(
            cell_table, cells, position, colour, ptype, alive, member,
            min_extent, dyn["mc_particle_size"].astype(dtype), scale, dtype)
        return lat_v, lat_n, lat_c, min_extent

    lat_v, lat_n, lat_c, min_extent = jax.block_until_ready(field(state, dyn, scn))
    iso = dyn["mc_isolevel"].astype(dtype)
    return (lat_v, lat_n, lat_c, min_extent, spec.grid.extent, spec.surface,
            spec.h, jnp.asarray(spec.scale, dtype), iso)


def build_slots(arr, extent, spec, h):
    """(key (15,M) dest-slot keys, pay (10,15,M)) — cube index minor."""
    (lat_v, lat_n, lat_c, min_extent, scale, iso) = arr
    dtype = lat_v.dtype
    ntris, offs, total, tri15, payload = mc_ops._emission_inputs(
        lat_v, lat_n, lat_c, min_extent, extent, spec, h, scale, iso)
    M = ntris.shape[0]
    big = jnp.int32(1 << 30)
    keys, pays = [], []
    for k in range(3 * mct.MAX_TRIS_PER_CUBE):
        has = (k // 3) < ntris
        e = tri15[k]
        sel = jnp.zeros((10, M), dtype)
        for j in range(12):
            sel = sel + jnp.where(e == j, payload[:, j], 0.0)
        keys.append(jnp.where(has, (offs + k // 3) * 3 + (k % 3), big))
        pays.append(sel)
    return jnp.stack(keys), jnp.stack(pays, axis=1), ntris, offs, total


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mc512k"
    # pass a single `0` to skip the blocked variants (measured a wash/
    # regression in round 4; kept for re-measurement)
    blocks = [int(a) for a in sys.argv[2:]] or [512, 2048, 8192]
    blocks = [b for b in blocks if b > 0]
    args = lattice_inputs(name)
    (lat_v, lat_n, lat_c, min_extent, extent, spec, h, scale, iso) = args
    arr = (lat_v, lat_n, lat_c, min_extent, scale, iso)
    cap3 = spec.tri_capacity * 3
    slots = partial(build_slots, extent=extent, spec=spec, h=h)

    @jax.jit
    def census_arrays(arr):
        k15, p15, ntris, offs, total = slots(arr)
        return ntris, total

    ntris, total = census_arrays(arr)
    ntris, total = np.asarray(ntris), int(total)
    M = ntris.shape[0]
    print(f"{name}: M={M} cubes, 15M={15*M} slot rows, live={3*total} "
          f"({3*total/(15*M):.1%}), tri_cap3={cap3}")

    # --- census: per-block live rows ---------------------------------------
    csum = np.concatenate([[0], np.cumsum(ntris)])
    for B in blocks:
        nblk = -(-M // B)
        ends = np.minimum(np.arange(1, nblk + 1) * B, M)
        starts = np.arange(nblk) * B
        live = 3 * (csum[ends] - csum[starts])
        smax = -(-int(live.max()) // 128) * 128
        print(f"  B={B:6d}: nblk={nblk:6d} live max={live.max():6d} "
              f"mean={live.mean():8.1f} -> smax={smax} "
              f"stage2 rows={nblk*smax} ({nblk*smax/(15*M):.1%} of 15M)")

    # --- timings ------------------------------------------------------------
    @jax.jit
    def inputs_only(arr):
        (lat_v, lat_n, lat_c, min_extent, scale, iso) = arr
        return mc_ops._emission_inputs(
            lat_v, lat_n, lat_c, min_extent, extent, spec, h, scale, iso)

    @jax.jit
    def current(arr):
        (lat_v, lat_n, lat_c, min_extent, scale, iso) = arr
        return mc_ops.mc_extract(
            lat_v, lat_n, lat_c, min_extent, extent, spec, h, scale, iso)

    def blocked(arr, B, smax):
        # the PRODUCTION blocked path (ADVICE r3: benchmark what the product
        # runs, not a reimplementation that can drift)
        import dataclasses

        bspec = dataclasses.replace(spec, emit_block=B, emit_cap=smax)
        (lat_v, lat_n, lat_c, min_extent, scale, iso) = arr
        return mc_ops.mc_extract(
            lat_v, lat_n, lat_c, min_extent, extent, bspec, h, scale, iso)

    def nine_op(arr):
        k15, p15, ntris, offs, total = slots(arr)
        flat = [k15.reshape(-1)] + [p15[a].reshape(-1) for a in range(8)]
        s = jax.lax.sort(tuple(flat), num_keys=1, is_stable=False)
        return jnp.stack(s[1:9])[:, :cap3], total

    _, t_in = timed(inputs_only, arr, label="payload build only")
    ref, t_cur = timed(current, arr, label="current global 11-op sort")
    _, t9 = timed(jax.jit(nine_op), arr, label="9-operand global sort (ablation)")

    @jax.jit
    def maxdiff(a, b):
        return jnp.max(jnp.abs(jnp.nan_to_num(a) - jnp.nan_to_num(b)))

    for B in blocks:
        nblk = -(-M // B)
        ends = np.minimum(np.arange(1, nblk + 1) * B, M)
        live = 3 * (csum[ends] - csum[np.arange(nblk) * B])
        smax = max(128, -(-int(live.max()) // 128) * 128)
        got, t_b = timed(jax.jit(partial(blocked, B=B, smax=smax)), arr,
                         label=f"blocked B={B} smax={smax}")
        d = max(float(maxdiff(g, r)) for g, r in zip(got[:3], ref[:3]))
        print(f"    parity vs current: max|diff|={d:.3g} "
              f"emit_ovf={int(got[4])}")

    # --- cube-compaction emission (the PRODUCTION cube_cap path) -----------
    import dataclasses

    nlive_cubes = int((ntris > 0).sum())
    print(f"  live cubes: {nlive_cubes} of {M} ({nlive_cubes/M:.1%})")

    def compacted(arr, K):
        cspec = dataclasses.replace(spec, cube_cap=K)
        (lat_v, lat_n, lat_c, min_extent, scale, iso) = arr
        return mc_ops.mc_extract(
            lat_v, lat_n, lat_c, min_extent, extent, cspec, h, scale, iso)

    for K in sorted({-(-int(nlive_cubes * f) // 128) * 128 for f in (1.25, 2.0, 4.0)}):
        got, t_c = timed(jax.jit(partial(compacted, K=K)), arr,
                         label=f"compacted cube_cap={K}")
        d = max(float(maxdiff(g, r)) for g, r in zip(got[:3], ref[:3]))
        print(f"    parity vs current: max|diff|={d:.3g} "
              f"emit_ovf={int(got[4])}")


if __name__ == "__main__":
    main()
