#!/usr/bin/env python
"""Break down plan_compact cost at 1M: which stage holds the remaining ms."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
import os
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pbf_sph_tpu.core.configs import dam_break
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.models.jax_solver import dyn_params_of
from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, decode_key, sort_key
import pallas_pbf2 as p2  # retired from production (round 4); lives in tools/

def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])

def timed(fn, *args, reps=10, label=""):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1): fn(*args)
    out = fn(*args); sync(out)
    print(f"  {label:28s}: {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")
    return out

count = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
mc, cfg, xs = dam_break(count, solver_iter=6)
solver = make_solver("pallas", h=cfg.h)
spec, state, scn = solver.prepare(cfg, Scene(), xs)
dyn = dyn_params_of(cfg, solver.dtype)
for _ in range(5):
    state, out = solver.step_device(spec, state, dyn, scn)

dtype = jnp.float32
h = spec.h
scale = jnp.asarray(spec.scale, dtype)
min_extent = dyn["min_bound"].astype(dtype) / scale - jnp.asarray(h, dtype) * 2

@jax.jit
def prep(state):
    from pbf_sph_tpu.ops import pbf
    vel, pstar = pbf.advect(state.position, state.velocity, state.mass,
                            state.ptype, state.alive, scn["wells_centre"],
                            scn["wells_force"], dyn["constant_force"].astype(dtype),
                            dyn["dt"].astype(dtype), scale)
    cells = cell_coords(pstar, min_extent, h)
    key = sort_key(cells, state.alive, spec.grid)
    key = jax.lax.sort((key,), num_keys=1)[0]
    table = build_cell_table(key, spec.grid)
    return key, table

key, table = jax.block_until_ready(prep(state))
grid = spec.grid
C = spec.capacity
smax, wcap = 8448, 2560
ncells = grid.ncells
nx, ny, nz = grid.dims
SUB, NIV, NPIECES, WCOL = p2.SUB, p2.NIV, p2.NPIECES, p2.WCOL
nsub = C // SUB

# stage 1: lin prep + gap top_k
@jax.jit
def s1(key, table):
    lin = jnp.minimum(key, ncells - 1)
    member_count = table[ncells]
    last_valid = lin[jnp.maximum(member_count - 1, 0)]
    lin = jnp.minimum(lin, last_valid)
    linr = lin[: nsub * SUB].reshape(nsub, SUB)
    gaps = linr[:, 1:] - linr[:, :-1]
    _, gidx = jax.lax.top_k(gaps, NPIECES - 1)
    gidx = jnp.sort(gidx, axis=1)
    starts = jnp.concatenate([jnp.zeros((nsub, 1), gidx.dtype), gidx + 1], axis=1)
    ends = jnp.concatenate([gidx, jnp.full((nsub, 1), SUB - 1, gidx.dtype)], axis=1)
    pmin = jnp.take_along_axis(linr, starts, axis=1)
    pmax = jnp.take_along_axis(linr, ends, axis=1)
    return pmin, pmax, lin

pmin, pmax, lin = timed(s1, key, table, label="s1 lin+topk+pieces")

# stage 2: bounds gather + lax.sort
offs = np.asarray([dx*(ny*nz)+dy*nz for dx in (-1,0,1) for dy in (-1,0,1)], np.int32)
strips_np = np.repeat(np.repeat(np.arange(3, dtype=np.int32), 3), NPIECES)
@jax.jit
def s2(pmin, pmax, table):
    lo_cell = jnp.clip(pmin[:, None, :] + offs[None, :, None] - 1, 0, ncells).reshape(nsub, NIV)
    hi_cell = jnp.clip(pmax[:, None, :] + offs[None, :, None] + 2, 0, ncells).reshape(nsub, NIV)
    bounds = table[jnp.concatenate([lo_cell, hi_cell], axis=1)]
    lo, hi = bounds[:, :NIV], bounds[:, NIV:]
    strip_of = jnp.broadcast_to(strips_np[None, :], lo.shape).astype(jnp.int32)
    return jax.lax.sort((lo, hi, strip_of), num_keys=1)

lo, hi, strip_of = timed(s2, pmin, pmax, table, label="s2 gather+sort")

@jax.jit
def s2a(pmin, pmax, table):
    lo_cell = jnp.clip(pmin[:, None, :] + offs[None, :, None] - 1, 0, ncells).reshape(nsub, NIV)
    hi_cell = jnp.clip(pmax[:, None, :] + offs[None, :, None] + 2, 0, ncells).reshape(nsub, NIV)
    return table[jnp.concatenate([lo_cell, hi_cell], axis=1)]
timed(s2a, pmin, pmax, table, label="s2a gather only")

# stage 3: the rest
@jax.jit
def s3(lo, hi, strip_of):
    rh_prev = jnp.concatenate([jnp.zeros((nsub,1), hi.dtype), jax.lax.cummax(hi, axis=1)[:, :-1]], axis=1)
    ilo = jnp.maximum(lo, rh_prev)
    ilen = jnp.maximum(hi - ilo, 0)
    a = ilo // WCOL
    bnd = jnp.where(ilen > 0, (ilo + ilen - 1) // WCOL + 1, a)
    pe_prev = jnp.concatenate([jnp.zeros((nsub,1), bnd.dtype),
                               jax.lax.cummax(jnp.where(ilen > 0, bnd, 0), axis=1)[:, :-1]], axis=1)
    srcc0_abs = jnp.maximum(a, pe_prev)
    k = jnp.where(ilen > 0, jnp.maximum(bnd - srcc0_abs, 0), 0)
    dstc0 = jnp.cumsum(k, axis=1) - k
    nchunk = (dstc0[:, -1] + k[:, -1]).astype(jnp.int32)
    cmax_chunks = wcap // WCOL
    PB = 2048
    rows = jnp.arange(nsub, dtype=jnp.int32)[:, None]
    dst_idx = jnp.minimum(dstc0, cmax_chunks - 1)
    ival = jnp.broadcast_to(jnp.arange(NIV, dtype=jnp.int32)[None, :], k.shape)
    payload = (ival * 4 + strip_of) * PB + (srcc0_abs - dstc0 + PB // 2)
    scat = jnp.full((nsub, cmax_chunks), -1, jnp.int32)
    scat = scat.at[rows, dst_idx].max(jnp.where(k > 0, payload, -1))
    e = jnp.maximum(jax.lax.cummax(scat, axis=1), 0)
    return e, nchunk

timed(s3, lo, hi, strip_of, label="s3 chains+scatter")

# full current plan for reference
ph2 = p2.PallasPhases2(C, grid, h, smax, wcap)
f_plan = jax.jit(lambda k, t: ph2.plan_frame(k, t))
timed(f_plan, key, table, label="full plan_compact")
