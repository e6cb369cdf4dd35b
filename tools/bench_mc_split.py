#!/usr/bin/env python
"""mc128k stage split on the real chip: full step vs solver-only step vs
sort+field vs sort+field+extract.  Run: python tools/bench_mc_split.py
[workload] (default mc128k).  Env: PBF_MC_SUB to override the node kernel
sub-block rows."""
import dataclasses
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbf_sph_tpu.core.configs import WORKLOADS
from pbf_sph_tpu.core.types import FLUID, FluidState, Scene
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.models.jax_solver import dyn_params_of, make_phase_objects
from pbf_sph_tpu.ops import mc as mc_ops
from pbf_sph_tpu.ops import pbf
from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, decode_key, sort_key


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
    print(f"  {label:26s}: {dt:8.2f} ms", flush=True)
    return out, dt


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mc128k"
    mcp, cfg, xs = WORKLOADS[name]()
    solver = make_solver("pallas", h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    dyn = dyn_params_of(cfg, solver.dtype)
    print(f"{name}: capacity={spec.capacity} grid={spec.grid.dims} "
          f"sample={spec.surface.sample} tri_cap={spec.surface.tri_capacity}")
    for _ in range(5):
        state, out = solver.step_device(spec, state, dyn, scn)
    sync(out["alive_count"])

    def timed_step(spec_, label, state):
        # the solver step DONATES the state buffers — thread the state
        # through the reps instead of reusing a deleted input
        step = solver.get_step(spec_)
        state = jax.tree.map(jnp.array, state)  # keep the caller's buffers
        s2, out = step(state, dyn, scn)
        sync(out["alive_count"])
        t0 = time.perf_counter()
        reps = 8
        for _ in range(reps):
            s2, out = step(s2, dyn, scn)
        sync(out["alive_count"])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {label:26s}: {dt:8.2f} ms", flush=True)
        return dt

    t_full = timed_step(spec, "full step", state)
    spec_ns = dataclasses.replace(spec, surface=None)
    t_ns = timed_step(spec_ns, "solver-only step", state)

    _, mcf = make_phase_objects(spec, True)
    dtype = jnp.dtype(spec.dtype)

    def sorted_inputs(state, dyn, scn):
        h = spec.h
        scale = jnp.asarray(spec.scale, dtype)
        dt = dyn["dt"].astype(dtype)
        min_bound = dyn["min_bound"].astype(dtype)
        padding = jnp.asarray(h, dtype) * 2
        min_extent = min_bound / scale - padding
        vel, pstar = pbf.advect(
            state.position, state.velocity, state.mass, state.ptype, state.alive,
            scn["wells_centre"], scn["wells_force"],
            dyn["constant_force"].astype(dtype), dt, scale,
        )
        cells = cell_coords(pstar, min_extent, h)
        key = sort_key(cells, state.alive, spec.grid)
        sorted_ops = jax.lax.sort(
            (key, state.ptype, state.position[0], state.position[1],
             state.position[2], state.colour[0], state.colour[1],
             state.colour[2], state.colour[3], state.alive),
            num_keys=1, is_stable=True,
        )
        key = sorted_ops[0]
        position = jnp.stack(sorted_ops[2:5])
        colour = jnp.stack(sorted_ops[5:9])
        ptype, alive = sorted_ops[1], sorted_ops[9]
        cells, member = decode_key(key, spec.grid)
        cell_table = build_cell_table(key, spec.grid)
        return (cell_table, cells, position, colour, ptype, alive, member,
                min_extent)

    @jax.jit
    def sort_part(state, dyn, scn):
        out = sorted_inputs(state, dyn, scn)
        return out[0]

    @jax.jit
    def field_part(state, dyn, scn):
        # return EVERYTHING: returning only lat_v lets XLA dead-code-eliminate
        # the normal/colour assembly and under-reports the stage (round-3
        # lesson: the "33 ms extract" of round 2 was a DCE artifact)
        (cell_table, cells, position, colour, ptype, alive, member,
         min_extent) = sorted_inputs(state, dyn, scn)
        scale = jnp.asarray(spec.scale, dtype)
        lat_v, lat_n, lat_c, ovf = mcf(
            cell_table, cells, position, colour, ptype, alive, member,
            min_extent, dyn["mc_particle_size"].astype(dtype), scale, dtype)
        return lat_v, lat_n, lat_c, ovf

    @jax.jit
    def extract_part(state, dyn, scn):
        (cell_table, cells, position, colour, ptype, alive, member,
         min_extent) = sorted_inputs(state, dyn, scn)
        scale = jnp.asarray(spec.scale, dtype)
        lat_v, lat_n, lat_c, ovf = mcf(
            cell_table, cells, position, colour, ptype, alive, member,
            min_extent, dyn["mc_particle_size"].astype(dtype), scale, dtype)
        vs, ns, cs, total, _eovf = mc_ops.mc_extract(
            lat_v, lat_n, lat_c, min_extent, spec.grid.extent, spec.surface,
            spec.h, scale, dyn["mc_isolevel"].astype(dtype))
        return vs, ns, cs, total

    _, t_sort = timed(sort_part, state, dyn, scn, label="advect+sort+table")
    _, t_field = timed(field_part, state, dyn, scn, label="  +mc field")
    _, t_ext = timed(extract_part, state, dyn, scn, label="  +mc extract")
    print(f"MC total (full-solver diff) : {t_full - t_ns:8.2f} ms")
    print(f"field kernel alone          : {t_field - t_sort:8.2f} ms")
    print(f"extract alone               : {t_ext - t_field:8.2f} ms")


if __name__ == "__main__":
    main()
