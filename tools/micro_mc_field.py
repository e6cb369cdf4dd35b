#!/usr/bin/env python
"""Bisect the Pallas MC node-field kernel's time at a workload.

The static census (tools/analyze_mc_windows.py) predicts ~7 ms of chunk
compute at mc128k yet the kernel measures ~173 ms, invariant to the sub-block
size — so the cost is somewhere in the scaffolding.  This tool times variant
kernels sharing the production plan/inputs:

  noop   — DMA pipeline + grid + out-block init only (body does nothing)
  rows   — + per-sub-block row loads and output stores (no window loops)
  loops  — + the 9 window fori_loops with a trivial 1-accumulator chunk
  full   — the production body (pallas_mc.make_mc_field_call)

Run on the real chip:  python tools/micro_mc_field.py [workload]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbf_sph_tpu.core.configs import WORKLOADS
from pbf_sph_tpu.core.types import OBSTACLE, Scene
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.models.jax_solver import dyn_params_of, make_phase_objects
from pbf_sph_tpu.ops.pallas_mc import plan_mc_windows
from pbf_sph_tpu.ops.pallas_pbf import WCOL, _phase_pallas, _window_loop


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(fn, *args, reps=8, label=""):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {label:24s}: {dt:8.2f} ms", flush=True)
    return dt


def make_variant(mcf, mode):
    plan, cap, lpad = mcf.plan, mcf.capacity, mcf.static["lpad"]
    sub = mcf.sub

    if mode == "noop":
        def body(wins, rows, sbuf, slot, out, t):
            pass
    elif mode == "rows":
        def body(wins, rows, sbuf, slot, out, t):
            ax = rows[0, pl.ds(t * sub, sub)].reshape(sub, 1)
            ay = rows[1, pl.ds(t * sub, sub)].reshape(sub, 1)
            az = rows[2, pl.ds(t * sub, sub)].reshape(sub, 1)
            acl = rows[3, pl.ds(t * sub, sub)].reshape(sub, 1)
            acc = ax + ay + az + acl
            for j in range(9):
                out[j, pl.ds(t * sub, sub)] = jnp.sum(acc, axis=1)
    elif mode == "loops":
        def body(wins, rows, sbuf, slot, out, t):
            ax = rows[0, pl.ds(t * sub, sub)].reshape(sub, 1)

            def chunk(slot_, strip, o, lo, hi, carry):
                bx = sbuf[slot_, strip, 0, pl.ds(o, WCOL)].reshape(1, WCOL)
                return carry + bx * ax

            carry = jnp.zeros((sub, WCOL), jnp.float32)
            for s in range(9):
                carry = _window_loop(wins, sbuf, slot, t, s, chunk, carry)
            out[0, pl.ds(t * sub, sub)] = jnp.sum(carry, axis=1)
    else:
        raise ValueError(mode)

    return _phase_pallas(body, nfields=8, nout=16, plan=plan, capacity=cap,
                         rows_capacity=lpad, rows_nfields=4, init_out=True)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mc128k"
    mcp, cfg, xs = WORKLOADS[name]()
    solver = make_solver("pallas", h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    if len(sys.argv) > 2:  # force the MC strip capacity (smax sweep)
        import dataclasses
        spec = dataclasses.replace(spec, mc_strip_capacity=int(sys.argv[2]))
    dyn = dyn_params_of(cfg, solver.dtype)
    for _ in range(5):
        state, out = solver.step_device(spec, state, dyn, scn)
    sync(out["alive_count"])

    _, mcf = make_phase_objects(spec, True)
    dtype = jnp.dtype(spec.dtype)

    # production inputs from the settled state (mirror PallasMcField.__call__)
    from pbf_sph_tpu.ops import pbf
    from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, decode_key, sort_key

    @jax.jit
    def inputs(state, dyn, scn):
        h, scale = spec.h, jnp.asarray(spec.scale, dtype)
        dt = dyn["dt"].astype(dtype)
        min_extent = dyn["min_bound"].astype(dtype) / scale - jnp.asarray(h, dtype) * 2
        vel, pstar = pbf.advect(
            state.position, state.velocity, state.mass, state.ptype, state.alive,
            scn["wells_centre"], scn["wells_force"],
            dyn["constant_force"].astype(dtype), dt, scale)
        cells = cell_coords(pstar, min_extent, h)
        key = sort_key(cells, state.alive, spec.grid)
        ops = jax.lax.sort(
            (key, state.ptype, state.alive, pstar[0], pstar[1], pstar[2],
             state.colour[0], state.colour[1], state.colour[2], state.colour[3]),
            num_keys=1, is_stable=False)
        key = ops[0]
        table = build_cell_table(key, spec.grid)
        cells2, member = decode_key(key, spec.grid)
        st = mcf.static
        wins, _ = plan_mc_windows(table, st, spec.grid.ncells, mcf.capacity,
                                  mcf.smax, mcf.sub)
        nx, ny, nz = spec.grid.dims
        lin = (cells2[0] * ny + cells2[1]) * nz + cells2[2]
        clm = jnp.where((ops[1] != OBSTACLE) & ops[2] & member,
                        lin.astype(dtype), -1e9)
        packed = jnp.stack([ops[3], ops[4], ops[5], clm,
                            ops[6], ops[7], ops[8], ops[9]])
        res = jnp.asarray(mcf.mc.resolution, dtype)
        step = jnp.asarray(spec.h, dtype) / res
        nxyz = [jnp.asarray(st["node_xyz"][a], jnp.int32) for a in range(3)]
        aw = [(min_extent[a] + nxyz[a].astype(dtype) * step) * scale
              for a in range(3)]
        meta = jnp.asarray(st["meta_lin"], jnp.int32).astype(dtype)
        rows = jnp.stack([aw[0], aw[1], aw[2], meta])
        return wins, packed, rows

    wins, packed, rows = jax.block_until_ready(inputs(state, dyn, scn))
    sync((wins, packed, rows))
    print(f"{name}: nblocks={mcf.plan.nblocks} smax={mcf.smax} sub={mcf.sub}")

    for mode in ("noop", "rows", "loops"):
        call = make_variant(mcf, mode)
        fn = jax.jit(lambda w, p, r, c=call: c(w, p, r))
        timed(fn, wins, packed, rows, label=mode)
    full = jax.jit(lambda w, p, r: mcf._call(w, p, r))
    timed(full, wins, packed, rows, label="full (production)")
    out = jax.block_until_ready(full(wins, packed, rows))

    # --- wrapper bisection: the kernel measures ~8 ms yet the composed
    # field stage measures ~173 (tools/bench_mc_split.py) — time the
    # __call__ scaffolding pieces around the pallas_call
    st = mcf.static

    @jax.jit
    def plan_only(cell_table):
        wins, ovf = plan_mc_windows(cell_table, st, spec.grid.ncells,
                                    mcf.capacity, mcf.smax, mcf.sub)
        return wins, ovf

    @jax.jit
    def unpermute_gather(out):
        inv = jnp.asarray(st["inv_perm"], jnp.int32)
        s0, sx, sy, sz = out[0, inv], out[1, inv], out[2, inv], out[3, inv]
        csum = out[4:8, inv]
        cnt = out[8, inv]
        skip = jnp.asarray(st["skip"])[inv]
        lat_v = jnp.where(skip, 0.0, 0.5 * s0)
        n_norm = jnp.sqrt(sx * sx + sy * sy + sz * sz)
        lat_n = jnp.stack(
            [jnp.where(skip, 0.0, -sx / n_norm),
             jnp.where(skip, 0.0, -sy / n_norm),
             jnp.where(skip, 0.0, -sz / n_norm)])
        lat_c = jnp.stack([jnp.where(skip, 0.0, csum[a] / cnt) for a in range(4)])
        return lat_v, lat_n, lat_c

    @jax.jit
    def unpermute_sort(out):
        s0, sx, sy, sz = out[0], out[1], out[2], out[3]
        csum, cnt = out[4:8], out[8]
        skip = jnp.asarray(st["skip"])
        v = jnp.where(skip, 0.0, 0.5 * s0)
        n_norm = jnp.sqrt(sx * sx + sy * sy + sz * sz)
        n = [jnp.where(skip, 0.0, -sx / n_norm),
             jnp.where(skip, 0.0, -sy / n_norm),
             jnp.where(skip, 0.0, -sz / n_norm)]
        c = [jnp.where(skip, 0.0, csum[a] / cnt) for a in range(4)]
        key = jnp.asarray(st["row_lat"], jnp.int32)
        srt = jax.lax.sort((key, v, *n, *c), num_keys=1, is_stable=False)
        L = st["L"]
        return srt[1][:L], jnp.stack([srt[2 + a][:L] for a in range(3)]), \
            jnp.stack([srt[5 + a][:L] for a in range(4)])

    @jax.jit
    def table_only(state, dyn, scn):
        from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, sort_key
        from pbf_sph_tpu.ops import pbf as _pbf
        h, scale = spec.h, jnp.asarray(spec.scale, dtype)
        dt = dyn["dt"].astype(dtype)
        min_extent = dyn["min_bound"].astype(dtype) / scale - jnp.asarray(h, dtype) * 2
        vel, pstar = _pbf.advect(
            state.position, state.velocity, state.mass, state.ptype, state.alive,
            scn["wells_centre"], scn["wells_force"],
            dyn["constant_force"].astype(dtype), dt, scale)
        cells = cell_coords(pstar, min_extent, h)
        key = sort_key(cells, state.alive, spec.grid)
        key = jax.lax.sort((key,), num_keys=1, is_stable=False)[0]
        return build_cell_table(key, spec.grid)

    table = jax.block_until_ready(table_only(state, dyn, scn))
    sync(table)
    timed(plan_only, table, label="plan_mc_windows")
    timed(unpermute_gather, out, label="unpermute (inv gather)")
    timed(unpermute_sort, out, label="unpermute (lax.sort)")

    @jax.jit
    def call_full(cell_table, packed, rows):
        wins, ovf = plan_mc_windows(cell_table, st, spec.grid.ncells,
                                    mcf.capacity, mcf.smax, mcf.sub)
        out = mcf._call(wins, packed, rows)
        return unpermute_sort(out), ovf

    timed(call_full, table, packed, rows, label="plan+kernel+sort (new)")


if __name__ == "__main__":
    main()
