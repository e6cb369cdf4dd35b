#!/usr/bin/env python
"""Static cost model of the Pallas MC node-field kernel at a given workload.

Builds the frame-0 cell table on CPU (no solver step needed), replays the
node kernel's window plan (`pallas_mc._node_static_plan` + the per-frame
window computation in NumPy), and reports where the kernel's cycles go:
vacuum sub-block fraction, chunk counts for live sub-blocks, strip DMA
volume, and a predicted kernel time at the measured ~175 ns/chunk and
~800 GB/s VMEM bandwidth.  Pure CPU; run anywhere:

    JAX_PLATFORMS=cpu python tools/analyze_mc_windows.py [workload]
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from pbf_sph_tpu.core.configs import WORKLOADS
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.ops.pallas_mc import MC_SUB, MC_SMAX_CAP, _node_static_plan
from pbf_sph_tpu.ops.pallas_pbf import BLK, WCOL, STRIP_DXDY


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mc128k"
    sub = MC_SUB
    mcp, cfg, xs = WORKLOADS[name]()
    solver = make_solver("jax", h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    grid = spec.grid
    mc = spec.surface
    h, scale = spec.h, spec.scale

    # frame-0 cells from the initial positions (pStar == pos/scale at v=0
    # up to one dt of gravity — fine for a structural census)
    pos = np.asarray(state.position, np.float32) / np.float32(scale)
    alive = np.asarray(state.alive)
    min_extent = np.asarray(cfg.min_bound, np.float32) / scale - 2 * h
    cell = np.clip(
        ((pos - min_extent[:, None]) / h).astype(np.int64),
        0,
        np.array(grid.dims, np.int64)[:, None] - 1,
    )
    nx, ny, nz = grid.dims
    lin = (cell[0] * ny + cell[1]) * nz + cell[2]
    lin = lin[alive]
    table = np.zeros(grid.ncells + 1, np.int64)
    np.add.at(table, lin + 1, 1)
    table = np.cumsum(table)
    occupied = int((np.diff(table) > 0).sum())
    occ = np.diff(table)
    print(f"{name}: {lin.size} particles, grid {grid.dims} = {grid.ncells} cells, "
          f"{occupied} occupied ({100*occupied/grid.ncells:.1f}%), "
          f"occupancy mean {occ[occ>0].mean():.1f} max {occ.max()}")

    st = _node_static_plan(mc, grid, sub)
    lpad, L = st["lpad"], st["L"]
    nsub = lpad // sub
    nblocks = lpad // BLK
    print(f"nodes L={L} lpad={lpad} sub={sub} -> {nsub} sub-blocks, {nblocks} blocks")

    lo_c = np.clip(st["lo_cells"], 0, grid.ncells)
    hi_c = np.clip(st["hi_cells"] + 1, 0, grid.ncells)
    lo = table[lo_c]   # (nsub, 9) particle-index window bounds
    hi = table[hi_c]

    # block strip starts (per dx-strip), WCOL-aligned — as plan_mc_windows
    lo_b = lo.reshape(nblocks, BLK // sub, 9)
    hi_b = hi.reshape(nblocks, BLK // sub, 9)
    cap = lin.size
    smax = min(MC_SMAX_CAP, cap)
    sstart = np.stack(
        [lo_b[:, :, 3 * d : 3 * d + 3].min(axis=(1, 2)) for d in range(3)], axis=1
    )
    sstart = (sstart // WCOL) * WCOL
    strip_len = np.stack(
        [hi_b[:, :, 3 * d : 3 * d + 3].max(axis=(1, 2)) for d in range(3)], axis=1
    ) - sstart
    print(f"strip lengths: mean {strip_len.mean():.0f} max {strip_len.max()} "
          f"(smax cap {smax}); DMA vol "
          f"{strip_len.clip(0).sum() * 8 * 4 / 1e6:.1f} MB/frame "
          f"(full-smax would be {nblocks * 3 * smax * 8 * 4 / 1e6:.1f} MB)")

    # per-sub-block window chunk census (what the kernel actually loops over)
    win = hi - lo  # (nsub, 9) candidate counts
    total = win.sum(axis=1)
    vacuum = total == 0
    live = ~vacuum
    # chunk-rounded slots per window: lo aligned down to WCOL inside the strip
    base = np.repeat(
        np.stack([sstart[:, s // 3] for s in range(9)], axis=1), BLK // sub, axis=0
    )
    rel_lo = np.clip(lo - base, 0, smax)
    rel_hi = np.clip(hi - base, 0, smax)
    first = rel_lo // WCOL
    last = np.where(rel_hi > rel_lo, (rel_hi - 1) // WCOL, first - 1)
    chunks = np.clip(last - first + 1, 0, None)
    print(f"sub-blocks: {nsub}  vacuum {vacuum.sum()} ({100*vacuum.mean():.1f}%)  "
          f"live {live.sum()}")
    lc = chunks[live]
    print(f"live sub-block chunks/9-windows: mean {lc.sum(axis=1).mean():.1f} "
          f"p50 {np.percentile(lc.sum(axis=1), 50):.0f} "
          f"p99 {np.percentile(lc.sum(axis=1), 99):.0f} max {lc.sum(axis=1).max()}")
    total_chunks = int(chunks[live].sum())
    true_cands = int(win[live].sum())
    slots = total_chunks * WCOL
    print(f"total chunks {total_chunks} -> {slots/1e6:.2f} Mslot vs "
          f"{true_cands/1e6:.2f} M true candidates "
          f"({slots/max(true_cands,1):.1f}x rounding waste)")
    print(f"predicted kernel compute at 175 ns/chunk: {total_chunks*175e-9*1e3:.1f} ms")
    print(f"predicted DMA at 800 GB/s: {strip_len.clip(0).sum()*8*4/800e9*1e3:.2f} ms")
    # how much of the chunk total comes from sub-blocks whose windows span
    # few real candidates (pure rounding floor)?
    floor = (chunks[live] > 0).sum()
    print(f"nonempty windows among live: {floor} -> floor {floor*WCOL/1e6:.2f} Mslot")


if __name__ == "__main__":
    main()
