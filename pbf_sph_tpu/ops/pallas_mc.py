"""Pallas TPU kernel for the marching-cubes lattice field.

The MC field (reference mc_lattice, `src/ocl/oclsph_kernel.h:176-263`) is the
same gather shape as the PBF phases — per lattice node, accumulate over
particles in the 27 cells around the node's cell — so it reuses the strip/
window machinery from `pallas_pbf`: rows are lattice *nodes* (a regular grid,
so per-sub-block window cell bounds are static), candidates are the sorted
particles.

The kernel outputs raw sums; the XLA caller applies the particleSize /
particleInfluence factors, the normal normalization and the colour mean
(reference NaN conventions preserved).

`particle_influence` is compile-time static here (the len^infl power needs a
transcendental for arbitrary exponents; the default 0.5 becomes a sqrt) —
changing it from the GUI recompiles, like the reference's `-DSPH_H` bake
(`src/ocl/oclsph.cpp:20`).

Boundary note: the reference's *clamped* stencil double-counts edge cells for
nodes on the domain faces (`src/omp/ompsph.hpp:306-326` clamps both ±1 to the
same cell).  The adjacency-masked strips count each cell once; the affected
cells lie in the 2-cell padding band that the bounds clamp keeps empty.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pbf_sph_tpu.ops.grid import GridSpec
from pbf_sph_tpu.ops.mc import McSpec
from pbf_sph_tpu.ops.pallas_pbf import (
    BLK,
    NSUB,
    SUB,
    STRIP_DXDY,
    WCOL,
    PallasPlanSpec,
    _phase_pallas,
    _window_loop,
)

META_SKIP = np.float32(-2e9)
# VMEM-safe strip bound for the node kernel (res-1.0 node blocks in
# compressed regions span ~1200 cells at occupancy ~35 => ~42k-column strips;
# scratch 2*3*8*smax*4B = 9.4MB at this cap)
MC_SMAX_CAP = 49152
# Rows per node sub-block.  At res 1.0 cell-sorted nodes advance one CELL per
# row, so windows shared by a sub-block span ~(sub+3) cells; sub=64 (the
# particle-phase SUB) made every node pay ~9*67*occupancy candidate slots —
# the round-2 mc128k field-kernel bottleneck (173 of 327 ms).  sub=8 is the
# native f32 sublane tile and cuts slots/node ~6x.
MC_SUB = 8


def _node_static_plan(mc: McSpec, grid: GridSpec, sub: int = MC_SUB):
    """Static per-sub-block window cell bounds + node metadata (NumPy)."""
    nxn, nyn, nzn = mc.sample
    ex, ey, ez = grid.extent
    gnx, gny, gnz = grid.dims
    L = nxn * nyn * nzn
    lpad = -(-L // BLK) * BLK
    res = np.float32(mc.resolution)

    idx = np.arange(L, dtype=np.int64)
    x = idx // (nyn * nzn)
    rem = idx - x * (nyn * nzn)
    y = rem // nzn
    z = rem - y * nzn
    cx = np.trunc(x.astype(np.float32) / res).astype(np.int64)
    cy = np.trunc(y.astype(np.float32) / res).astype(np.int64)
    cz = np.trunc(z.astype(np.float32) / res).astype(np.int64)
    lin = (cx * gny + cy) * gnz + cz

    # Process nodes in CELL-SORTED order (static permutation): a block of BLK
    # consecutive rows then spans ~BLK/res^3 contiguous cells, which bounds
    # the dx-strip length to (block cells + 2nz)*occupancy — node-lex order
    # lets blocks straddle x-slabs, making strips arbitrarily long.
    order = np.lexsort((idx, lin))
    x, y, z = x[order], y[order], z[order]
    cx, cy, cz = cx[order], cy[order], cz[order]
    lin = lin[order]
    skip = (cx == ex) & (cy == ey) & (cz == ez)  # the far-corner node

    def pad(a, fill):
        return np.concatenate([a, np.full(lpad - L, fill, a.dtype)])

    node_xyz = (pad(x, 0), pad(y, 0), pad(z, 0))
    meta_lin = pad(np.where(skip, -1, lin), -1)  # -1 => skip/pad row

    # Per-sub-block window cell bounds.  Node (lex) order is NOT cell-lex
    # monotone across node-row boundaries (z resets while the cell row may
    # stay the same), so bounds are true min/max over each sub-block's nodes.
    nsub = lpad // sub

    def cl(v, lo, hi):
        return np.clip(v, lo, hi)

    def per_sub(vals, reduce_fn, fill):
        padded = np.concatenate([vals, np.full(lpad - L, fill, vals.dtype)])
        return reduce_fn(padded.reshape(nsub, sub), axis=1)

    lo_cells = np.zeros((nsub, 9), np.int64)
    hi_cells = np.zeros((nsub, 9), np.int64)
    big = np.int64(1) << 60
    for s, (dx, dy) in enumerate(STRIP_DXDY):
        def xc(c, d, e):
            if d == 0:
                return c  # raw center (may equal extent; reference parity)
            return cl(c + d, 0, e - 1)

        lo_lin = (
            (xc(cx, dx, ex) * gny + xc(cy, dy, ey)) * gnz + cl(cz - 1, 0, ez - 1)
        )
        hi_lin = (
            (xc(cx, dx, ex) * gny + xc(cy, dy, ey)) * gnz
            + np.maximum(cz, cl(cz + 1, 0, ez - 1))
        )
        lo_cells[:, s] = per_sub(lo_lin, np.min, big)
        hi_cells[:, s] = per_sub(hi_lin, np.max, -1)
    lo_cells = np.minimum(lo_cells, hi_cells + 1)
    # empty windows for fully-padded sub-blocks: lo at the END of the cell
    # range (NOT 0 — a zero lo drags the whole block's strip start to column
    # 0, making the last block's real windows span the entire particle array
    # and report a bogus ~capacity-sized strip overflow)
    full_pad = np.arange(nsub) * sub >= L
    lo_cells[full_pad] = gnx * gny * gnz
    hi_cells[full_pad] = -1

    inv = np.zeros(L, np.int64)
    inv[order] = np.arange(L)
    # row -> lattice index, pads keyed past the end so a single multi-operand
    # sort restores lattice order (an explicit out[:, inv] gather measured
    # 170 ms at mc128k — XLA lowers the minor-dim gather to a scalar loop;
    # lax.sort of the same rows is ~1 ms)
    row_lat = np.concatenate([order, np.arange(L, lpad, dtype=order.dtype)])
    return dict(
        L=L, lpad=lpad,
        node_xyz=node_xyz,
        meta_lin=meta_lin,
        lo_cells=lo_cells,
        hi_cells=hi_cells,
        skip=pad(skip, True),
        inv_perm=inv,  # lattice-order index -> kernel row
        row_lat=row_lat,  # kernel row -> lattice index (pads at the tail)
    )


def plan_mc_windows(cell_table, static_plan, ncells: int, capacity: int,
                    smax: int, sub: int = MC_SUB):
    """Per-frame window bounds for the node kernel (static cell indices,
    dynamic table)."""
    lpad = static_plan["lpad"]
    nblocks = lpad // BLK
    nsub_b = BLK // sub
    lo_cells = jnp.asarray(np.clip(static_plan["lo_cells"], 0, ncells), jnp.int32)
    hi_cells = jnp.asarray(np.clip(static_plan["hi_cells"] + 1, 0, ncells), jnp.int32)
    lo = cell_table[lo_cells]  # (nsub, 9)
    hi = cell_table[hi_cells]
    lo = lo.reshape(nblocks, nsub_b, 9)
    hi = hi.reshape(nblocks, nsub_b, 9)

    strip_of = [s // 3 for s in range(9)]
    # dx-strip start per block: min window start over the block's sub-blocks
    sstart = jnp.stack(
        [jnp.min(lo[:, :, 3 * d : 3 * d + 3], axis=(1, 2)) for d in range(3)], axis=1
    )  # (nblocks,3)
    sstart = (sstart // WCOL) * WCOL
    sstart = jnp.minimum(sstart, max(capacity - smax, 0)).astype(jnp.int32)
    base = jnp.take(sstart, jnp.asarray(strip_of, jnp.int32), axis=1)[:, None, :]
    rel_lo = jnp.clip(lo - base, 0, smax)
    rel_hi_raw = hi - base
    overflow = jnp.maximum(jnp.max(rel_hi_raw) - smax, 0).astype(jnp.int32)
    rel_hi = jnp.clip(rel_hi_raw, 0, smax)
    wins = jnp.stack([rel_lo, rel_hi], axis=-1).astype(jnp.int32)
    srow = jnp.take(sstart, jnp.asarray(strip_of, jnp.int32), axis=1)
    srow = jnp.stack([srow, jnp.zeros_like(srow)], axis=-1)[:, None, :, :]
    wins_ex = jnp.concatenate([wins, srow], axis=1)
    # flattened per-block scalar table (see pallas_pbf.plan_windows)
    return wins_ex.reshape(wins_ex.shape[0], 1, -1), overflow


def make_mc_field_call(plan: PallasPlanSpec, capacity: int, lpad: int,
                       grid: GridSpec, h: float, scale: float,
                       particle_influence: float, interpret=False):
    sub = plan.sub
    """Raw field sums per node.

    Candidate fields (8, C): [px, py, pz, clm, cr, cg, cb, ca] where clm is
    the linear cell id (−1e9 for obstacles/non-members).
    Row fields (4, LPAD): [awx, awy, awz, meta] (meta = node cell id, −2e9 for
    the skip node / padding).
    Output (16, LPAD): [S0, Sx, Sy, Sz, Cr, Cg, Cb, Ca, cnt, 0...] with
    S0 = sum 1/len^infl, S* = sum l_*/len^infl over neighbours within h*scale
    (reference accumulations, `src/omp/ompsph.hpp:335-346`, factors applied by
    the caller)."""
    nx, ny, nz = grid.dims
    offs = [np.float32(dx * ny * nz + dy * nz) for dx, dy in STRIP_DXDY]
    th2 = np.float32(h * scale) * np.float32(h * scale)
    pinfl = float(particle_influence)

    def winfl(d2):
        # 1/len^infl = d2^(-infl/2) in r2-space (round-3 restructure,
        # replacing the sqrt(sqrt) + divide chain)
        if pinfl == 0.5:
            return jnp.sqrt(jax.lax.rsqrt(d2))
        if pinfl == 1.0:
            return jax.lax.rsqrt(d2)
        return jnp.exp(np.float32(-0.5 * pinfl) * jnp.log(d2))

    def body(wins, rows, sbuf, slot, out, t):
        # vacuum fast path: at res 1.0 only ~2% of lattice cells hold
        # particles, so most sub-blocks have all-empty windows (cell_table
        # lo == hi) — skip the 9 window loops and the stores entirely (the
        # output block is pre-zeroed via init_out)
        total = wins[0, 0, t * 18 + 1] - wins[0, 0, t * 18]
        for s in range(1, 9):
            total += wins[0, 0, t * 18 + 2 * s + 1] - wins[0, 0, t * 18 + 2 * s]

        @pl.when(total > 0)
        def _compute():
            _body_compute(wins, rows, sbuf, slot, out, t)

    def _body_compute(wins, rows, sbuf, slot, out, t):
        ax = rows[0, pl.ds(t * sub, sub)].reshape(sub, 1)
        ay = rows[1, pl.ds(t * sub, sub)].reshape(sub, 1)
        az = rows[2, pl.ds(t * sub, sub)].reshape(sub, 1)
        acl = rows[3, pl.ds(t * sub, sub)].reshape(sub, 1)

        def make_chunk(off_s):
            def chunk(slot_, strip, o, lo, hi, carry):
                s0, sx, sy, sz, cr, cg, cb, ca, cnt = carry
                bx = sbuf[slot_, strip, 0, pl.ds(o, WCOL)].reshape(1, WCOL)
                by = sbuf[slot_, strip, 1, pl.ds(o, WCOL)].reshape(1, WCOL)
                bz = sbuf[slot_, strip, 2, pl.ds(o, WCOL)].reshape(1, WCOL)
                bcl = sbuf[slot_, strip, 3, pl.ds(o, WCOL)].reshape(1, WCOL)
                # cl-adjacency doubles as the lane-coverage mask (windows come
                # straight from cell_table so out-of-window lanes fail it; the
                # z/y-wrap aliases it admits are > h*scale away and fail the
                # distance test — same argument as the particle phases)
                m = jnp.abs(bcl - (acl + off_s)) <= 1.0
                lx = bx - ax
                ly = by - ay
                lz = bz - az
                d2 = lx * lx + ly * ly + lz * lz
                # d2 > 0 skips zero-distance (see ops/mc.py note)
                m = m & (d2 < th2) & (d2 > 0)
                w = jnp.where(m, winfl(d2), 0.0)
                mf = m.astype(jnp.float32)
                return (
                    s0 + w, sx + lx * w, sy + ly * w, sz + lz * w,
                    cr + sbuf[slot_, strip, 4, pl.ds(o, WCOL)].reshape(1, WCOL) * mf,
                    cg + sbuf[slot_, strip, 5, pl.ds(o, WCOL)].reshape(1, WCOL) * mf,
                    cb + sbuf[slot_, strip, 6, pl.ds(o, WCOL)].reshape(1, WCOL) * mf,
                    ca + sbuf[slot_, strip, 7, pl.ds(o, WCOL)].reshape(1, WCOL) * mf,
                    cnt + mf,
                )

            return chunk

        zero = jnp.zeros((sub, WCOL), jnp.float32)
        carry = (zero,) * 9
        for s in range(9):
            carry = _window_loop(wins, sbuf, slot, t, s, make_chunk(offs[s]), carry)
        for j, acc in enumerate(carry):
            out[j, pl.ds(t * sub, sub)] = jnp.sum(acc, axis=1)
        # rows 9..15 stay at the init_out zeros

    return _phase_pallas(body, nfields=8, nout=16, plan=plan, capacity=capacity,
                         interpret=interpret, rows_capacity=lpad, rows_nfields=4,
                         init_out=True)


class PallasMcField:
    """Per-spec factory (see PallasPhases)."""

    def __init__(self, capacity: int, grid: GridSpec, mc: McSpec, h: float,
                 scale: float, particle_influence: float, smax: int,
                 interpret: bool = False, sub: int = MC_SUB):
        self.grid = grid
        self.mc = mc
        self.h = h
        self.smax = smax
        self.sub = sub
        self.static = _node_static_plan(mc, grid, sub)
        self.plan = PallasPlanSpec(
            nblocks=self.static["lpad"] // BLK, smax=smax, sub=sub
        )
        self.capacity = capacity
        self._call = make_mc_field_call(
            self.plan, capacity, self.static["lpad"], grid, h, scale,
            particle_influence, interpret,
        )

    def __call__(self, cell_table, cells, position, colour, ptype, alive, member,
                 min_extent, particle_size, scale, dtype):
        st = self.static
        L = st["L"]
        wins, overflow = plan_mc_windows(
            cell_table, st, self.grid.ncells, self.capacity, self.smax, self.sub
        )

        # candidates: obstacles / non-members never contribute.  `cells` are
        # the sorted grid cells (from pStar at sort time — the reference's MC
        # gathers by the pre-solve grid but measures distance to the
        # post-finalise world positions, `src/omp/ompsph.hpp:335-337`)
        nx, ny, nz = self.grid.dims
        from pbf_sph_tpu.core.types import OBSTACLE

        lin = (cells[0] * ny + cells[1]) * nz + cells[2]
        clm = jnp.where(
            (ptype != OBSTACLE) & alive & member, lin.astype(dtype), -1e9
        )
        packed = jnp.stack(
            [position[0], position[1], position[2], clm,
             colour[0], colour[1], colour[2], colour[3]]
        )

        res = jnp.asarray(self.mc.resolution, dtype)
        step = jnp.asarray(self.h, dtype) / res
        nxyz = [jnp.asarray(st["node_xyz"][a], jnp.int32) for a in range(3)]
        aw = [
            (min_extent[a] + nxyz[a].astype(dtype) * step) * scale for a in range(3)
        ]
        meta = jnp.asarray(st["meta_lin"], jnp.int32).astype(dtype)
        meta = jnp.where(meta < 0, META_SKIP, meta)
        rows = jnp.stack([aw[0], aw[1], aw[2], meta])

        out = self._call(wins, packed, rows)  # (16, LPAD), cell-sorted rows
        s0, sx, sy, sz = out[0], out[1], out[2], out[3]
        csum = out[4:8]
        cnt = out[8]

        # assemble in kernel-row order (all elementwise), then restore
        # lattice order with ONE multi-operand sort on the static
        # row->lattice key — an out[:, inv_perm] gather here measured
        # 170 ms at mc128k (minor-dim gather = scalar loop on TPU)
        skip = jnp.asarray(st["skip"])
        v = jnp.where(skip, 0.0, particle_size * s0)
        n_norm = jnp.sqrt(sx * sx + sy * sy + sz * sz)
        # normal = normalize(-infl*size*S) = -S/|S| (raw divide: NaN when
        # empty, like the reference); skip nodes stay exactly 0
        n = [jnp.where(skip, 0.0, -sx / n_norm),
             jnp.where(skip, 0.0, -sy / n_norm),
             jnp.where(skip, 0.0, -sz / n_norm)]
        c = [jnp.where(skip, 0.0, csum[a] / cnt) for a in range(4)]
        key = jnp.asarray(st["row_lat"], jnp.int32)
        srt = jax.lax.sort((key, v, *n, *c), num_keys=1, is_stable=False)
        L = st["L"]
        lat_v = srt[1][:L]
        lat_n = jnp.stack([srt[2 + a][:L] for a in range(3)])
        lat_c = jnp.stack([srt[5 + a][:L] for a in range(4)])
        return lat_v, lat_n, lat_c, overflow
