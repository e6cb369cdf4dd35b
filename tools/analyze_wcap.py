#!/usr/bin/env python
"""Analyze per-sub-block candidate-slab capacity (wcap) need at scale.

Compares the v2 plan's convex-hull window merge against gap-split variants
(split each stencil window at the sub-block's top-(G-1) cell gaps) on the 1M
dam-break frame-0 sorted state.  Pure numpy over the cell table — no Pallas.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from pbf_sph_tpu.core.configs import dam_break
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.models.jax_solver import dyn_params_of
from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, sort_key

SUB = 32
WCOL = 128


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mc, cfg, xs = dam_break(count, solver_iter=6)
    solver = make_solver("jax", h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    dyn = dyn_params_of(cfg, solver.dtype)
    grid = spec.grid
    nx, ny, nz = grid.dims
    nynz = ny * nz
    h = spec.h
    scale = float(spec.scale)
    min_extent = np.asarray(dyn["min_bound"]) / scale - h * 2

    pos = np.asarray(state.position)
    alive = np.asarray(state.alive)
    # frame-0 predicted positions ~ positions (no advect; fine for structure)
    cells = cell_coords(
        jnp.asarray(pos / scale, jnp.float32), jnp.asarray(min_extent, jnp.float32), h
    )
    key = np.asarray(sort_key(cells, jnp.asarray(alive), grid))
    order = np.argsort(key, kind="stable")
    key = key[order]
    table = np.asarray(build_cell_table(jnp.asarray(key), grid))
    ncells = grid.ncells
    C = key.shape[0]
    print(f"count={count} capacity={C} grid={grid.dims} ncells={ncells} "
          f"members={table[ncells]}")

    lin = np.minimum(key, ncells - 1)
    member_count = table[ncells]
    last_valid = lin[max(member_count - 1, 0)]
    lin = np.minimum(lin, last_valid).astype(np.int64)

    nsub = C // SUB
    linr = lin[: nsub * SUB].reshape(nsub, SUB)
    offs = np.array([dx * nynz + dy * nz for dx in (-1, 0, 1) for dy in (-1, 0, 1)])

    for G in (1, 2, 3, 4, 6):
        # split each sub-block's sorted cells at the top-(G-1) gaps
        d = np.diff(linr, axis=1)                      # (nsub, SUB-1)
        top = np.argsort(d, axis=1)[:, -(G - 1):] if G > 1 else np.zeros((nsub, 0), int)
        top = np.sort(top, axis=1)
        # piece boundaries: starts/ends in row index space
        starts = np.concatenate([np.zeros((nsub, 1), int), top + 1], axis=1)  # (nsub, G)
        ends = np.concatenate([top, np.full((nsub, 1), SUB - 1)], axis=1)
        pmin = np.take_along_axis(linr, starts, axis=1)   # (nsub, G)
        pmax = np.take_along_axis(linr, ends, axis=1)
        # drop degenerate pieces when gap split is at tied/zero gaps: keep all;
        # empty pieces (start>end can't happen; pmin<=pmax always)

        # intervals per (piece, offset): cells [pmin+off-1, pmax+off+2)
        lo_cell = np.clip(pmin[:, :, None] + offs[None, None, :] - 1, 0, ncells)
        hi_cell = np.clip(pmax[:, :, None] + offs[None, None, :] + 2, 0, ncells)
        ilo = table[lo_cell].astype(np.int64)             # (nsub, G, 9)
        ihi = table[hi_cell].astype(np.int64)
        ilo = ilo.reshape(nsub, -1)
        ihi = ihi.reshape(nsub, -1)
        # sort by lo, then disjoint-clip with running max
        o = np.argsort(ilo, axis=1, kind="stable")
        ilo = np.take_along_axis(ilo, o, axis=1)
        ihi = np.take_along_axis(ihi, o, axis=1)
        # chunk-level covering with dedup (running max of covered chunk end)
        a = ilo // WCOL
        b = np.where(ihi > ilo, (ihi - 1) // WCOL + 1, a)
        nch = np.zeros(nsub, np.int64)
        prev = np.full(nsub, -1, np.int64)
        for i in range(ilo.shape[1]):
            ai = np.maximum(a[:, i], prev)
            ki = np.where(ihi[:, i] > ilo[:, i], np.maximum(b[:, i] - ai, 0), 0)
            nch += ki
            prev = np.maximum(prev, np.where(ki > 0, b[:, i], prev))
        q = np.percentile(nch, [50, 90, 99, 99.9, 100])
        print(f"G={G}: chunks/subblock p50={q[0]:.0f} p90={q[1]:.0f} "
              f"p99={q[2]:.0f} p99.9={q[3]:.0f} max={q[4]:.0f} "
              f"(wcap={int(q[4]) * WCOL})")


if __name__ == "__main__":
    main()
