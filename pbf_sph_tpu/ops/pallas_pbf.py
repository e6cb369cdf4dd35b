"""Pallas TPU kernels for the hot PBF phases (lambda / delta / diffuse).

Why these exist: XLA's arbitrary-index gather runs at ~7ns/element on TPU
(measured), which makes the 27-cell neighbour gathers of the XLA path
(`ops/pbf.py`) ~100x slower than the underlying VPU math.  These kernels
replace every gather with *contiguous-segment DMA*, exploiting the linear
cell sort (`ops/grid.py`):

  * particles sorted by linear cell id (z fastest) make each x-slab of the
    stencil — cells [c + dx*NY*NZ - NZ - 1, c + dx*NY*NZ + NZ + 1] — one
    contiguous range of the sorted array; a block of BLK consecutive
    particles therefore needs only THREE strip DMAs (dx = -1, 0, +1),
  * each 32-row sub-block reads its nine (dx,dy)-windows as cheap dynamic
    VMEM slices into those strips,
  * strips for block b+1 are DMA'd while block b computes (cross-block
    double buffering),
  * pair validity needs no per-pair adjacency test at all (round 3): the
    plan emits CHUNK-DISJOINT windows (a coverage scan over the 9 stencil
    windows in absolute chunk space), so every candidate is processed at
    most once per sub-block, and geometry does the rest — any candidate
    beyond +-1 cell is >= h away and poly6/spiky are exactly zero there
    (the kernels are exactly the reference math,
    `src/ocl/oclsph_kernel.h:95-162`); sentinel (non-member) lanes carry
    blanked positions (1e9) so they fail the same distance cutoff; empty
    windows point at a dedicated blanked chunk appended to each strip.
    Diffuse (no distance cutoff in the reference,
    `src/ocl/oclsph_kernel.h:67-93`) keeps an exact per-pair
    cell-coordinate adjacency test, in the symmetric |d|<=1 form that is
    valid under exactly-once processing.

Fidelity note: unlike the XLA path, these kernels do not reproduce the
reference's two boundary-cell quirks (the `offset >= gridTableN` Morton skip
and the never-gathered last table cell, `src/sph.hpp:207-208`) — both affect
only the far corner of the padded grid, which the bounds clamp keeps empty.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbf_sph_tpu.core.constants import DEFAULT_CONSTANTS as K
from pbf_sph_tpu.ops.grid import GridSpec
from pbf_sph_tpu.ops.kernels import poly6_factor, spiky_kernel_factor

# Block geometry.  BLK rows per grid step, SUB rows per inner sub-block.
BLK = 1024
SUB = 64
NSUB = BLK // SUB
# Window-chunk width: TPU lane count — windows are processed as 128-aligned
# lane chunks because Mosaic requires dynamic minor-dim offsets to be
# provably 128-aligned.
WCOL = 128

# The nine (dx,dy) strips; dy fastest within each dx so s // 3 = dx index.
STRIP_DXDY = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


@dataclass(frozen=True)
class PallasPlanSpec:
    nblocks: int
    smax: int  # per-dx-strip VMEM capacity (columns)
    # rows per sub-block (rows sharing one set of stencil windows).  The
    # particle phases use SUB=64 (windows span ~2 cells); the MC node kernel
    # uses 8 at res 1.0, where 64 cell-sorted nodes span ~64 CELLS and the
    # shared windows would be ~(sub+3)*occupancy columns wide (the round-2
    # mc128k field-kernel bottleneck).
    sub: int = SUB


def grown_strip_capacity(step_spec, overflow: int) -> int:
    """Next strip capacity after an overflow of `overflow` columns."""
    nz = step_spec.grid.dims[2]
    base = step_spec.strip_capacity or max(8192, -(-(nz * 48 * 2) // 128) * 128)
    need = base + overflow
    return min(-(-need // 2048) * 2048 + 2048, step_spec.capacity)


def disjoint_windows(lo, hi):
    """Coverage scan making the stencil windows chunk-disjoint.

    lo/hi are ABSOLUTE sorted-array offsets, shape (..., 9), with window
    starts monotone non-decreasing in the last axis (the stencil offsets
    strictly increase with s).  Each window's start is aligned down to a
    WCOL chunk boundary and advanced past chunks already covered by an
    earlier window; a window fully covered collapses to empty (hi == lo).
    Since the kernels always process whole 128-lane chunks, this makes
    every candidate LANE processed at most once per sub-block — across
    strips too (the three strips are WCOL-aligned views of one array)."""
    cover = jnp.zeros(lo.shape[:-1], jnp.int32)  # abs chunks covered so far
    los, his = [], []
    for s in range(9):
        start_c = jnp.maximum(lo[..., s] // WCOL, cover)
        end_c = jnp.maximum(-(-hi[..., s] // WCOL), start_c)
        cover = end_c
        lo_s = start_c * WCOL
        los.append(lo_s)
        his.append(jnp.maximum(hi[..., s], lo_s))
    return jnp.stack(los, axis=-1), jnp.stack(his, axis=-1)


def plan_windows(sorted_key, cell_table, grid: GridSpec, capacity: int, smax: int,
                 sub: int = SUB):
    """Per-block strip starts + per-sub-block window bounds (XLA precompute,
    once per frame, shared by all phases).

    Returns (sstart (nblocks,3) int32, wins (nblocks,nsub_b,9,2) int32, overflow).
    `wins[...,0/1]` are window [lo, hi) offsets *relative* to the dx-strip
    start; `overflow` > 0 means smax must grow (re-specialize).

    Round 3: windows are emitted CHUNK-DISJOINT — a sequential coverage scan
    over the 9 windows (whose absolute starts are monotone in s, since the
    stencil offsets dx*ny*nz + dy*nz strictly increase) aligns each window's
    start down to a WCOL chunk boundary and skips chunks already covered by
    an earlier window.  Every candidate chunk is then processed by at most
    one window, which is what lets the kernels drop the per-pair cl
    adjacency test and mask purely by geometry (module docstring).  Windows
    left empty by the scan (or genuinely empty) are pointed at the blanked
    sentinel chunk at column `smax`."""
    C = capacity
    assert C % BLK == 0
    nblocks = C // BLK
    nsub_b = BLK // sub
    nsub = C // sub
    ncells = grid.ncells
    nx, ny, nz = grid.dims
    nynz = ny * nz

    lin = jnp.minimum(sorted_key, ncells - 1)
    member_count = cell_table[ncells]
    last_valid = lin[jnp.maximum(member_count - 1, 0)]
    lin = jnp.minimum(lin, last_valid)
    cmin = lin[0::sub]  # (nsub,)
    cmax = lin[sub - 1 :: sub]

    # dx-strip extents per *block*
    cmin_b = cmin.reshape(nblocks, nsub_b)[:, 0]
    cmax_b = cmax.reshape(nblocks, nsub_b)[:, -1]
    sstarts = []
    for dx in (-1, 0, 1):
        lo_cell = jnp.clip(cmin_b + dx * nynz - nz - 1, 0, ncells)
        sstarts.append(cell_table[lo_cell])
    sstart = jnp.stack(sstarts, axis=1)  # (nblocks, 3)
    # align strip starts down to the TPU lane count (Mosaic DMA alignment);
    # windows are relative so coverage is unchanged
    sstart = (sstart // WCOL) * WCOL
    sstart = jnp.minimum(sstart, max(C - smax, 0)).astype(jnp.int32)

    # (dx,dy)-window bounds per sub-block
    los, his = [], []
    for dx, dy in STRIP_DXDY:
        off = dx * nynz + dy * nz
        lo_cell = jnp.clip(cmin + off - 1, 0, ncells)
        hi_cell = jnp.clip(cmax + off + 2, 0, ncells)
        los.append(cell_table[lo_cell])
        his.append(cell_table[hi_cell])
    lo = jnp.stack(los, axis=1).reshape(nblocks, nsub_b, 9)
    hi = jnp.stack(his, axis=1).reshape(nblocks, nsub_b, 9)
    lo, hi = disjoint_windows(lo, hi)
    strip_of = jnp.asarray([s // 3 for s in range(9)], jnp.int32)
    base = jnp.take(sstart, strip_of, axis=1)[:, None, :]  # (nblocks,1,9)
    rel_lo = lo - base
    rel_hi = hi - base
    overflow = jnp.maximum(jnp.max(rel_hi) - smax, 0).astype(jnp.int32)
    rel_lo = jnp.clip(rel_lo, 0, smax)
    rel_hi = jnp.clip(rel_hi, 0, smax)
    # empty windows (fully covered by an earlier one, or genuinely empty)
    # point at the blanked sentinel chunk at column smax so the kernels'
    # unconditional first chunk contributes exactly zero
    empty = rel_hi <= rel_lo
    rel_lo = jnp.where(empty, smax, rel_lo)
    rel_hi = jnp.where(empty, smax, rel_hi)
    wins = jnp.stack([rel_lo, rel_hi], axis=-1).astype(jnp.int32)
    # fold the per-block strip starts into an extra wins row (row NSUB) so a
    # single SMEM-blocked input carries all per-block scalars (Mosaic requires
    # SMEM block trailing dims to equal the array dims)
    srow = jnp.take(sstart, strip_of, axis=1)  # (nblocks, 9)
    srow = jnp.stack([srow, jnp.zeros_like(srow)], axis=-1)[:, None, :, :]
    wins_ex = jnp.concatenate([wins, srow], axis=1)  # (nblocks, NSUB+1, 9, 2)
    # FLATTENED per-block scalar table: SMEM windows pad every trailing dim,
    # so a (1, nsub+1, 9, 2) block blows the SMEM budget at small sub-blocks
    # (the MC node kernel's 129-row table measured 2MB padded); one flat
    # trailing dim keeps it at true size (the middle singleton satisfies the
    # Pallas trailing-dims block rule).  Layout: [t*18 + 2*s + {lo,hi}].
    return wins_ex.reshape(wins_ex.shape[0], 1, -1), overflow


# ---------------------------------------------------------------------------
# Kernel scaffolding
# ---------------------------------------------------------------------------


def _issue_strip_dmas(p_hbm, sbuf, sems, slot, wins_ref, smax, nsub_b=NSUB):
    for s in range(3):
        start = pl.multiple_of(wins_ref[0, 0, nsub_b * 18 + 6 * s], WCOL)
        pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(start, smax)],
            sbuf.at[slot, s, :, pl.ds(0, smax)],
            sems.at[slot, s],
        ).start()


def _wait_strip_dmas(p_hbm, sbuf, sems, slot, smax):
    for s in range(3):
        # reconstruct the copy descriptor for wait (src slice values irrelevant)
        pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(0, smax)], sbuf.at[slot, s, :, pl.ds(0, smax)],
            sems.at[slot, s],
        ).wait()


def _phase_pallas(body, nfields: int, nout: int, plan: PallasPlanSpec, capacity: int,
                  interpret: bool = False, rows_capacity: int = 0, rows_nfields: int = 0,
                  init_out: bool = False):
    """Assemble the common pallas_call for one phase.

    body(wins_smem, rows_vmem, strips_vmem_slot, out_ref, t) -> None is the
    per-sub-block compute; everything else (strip DMA pipelining, window
    bookkeeping, the blanked sentinel chunk at strip column smax) is shared.

    By default rows == the candidate array (particle phases).  Pass
    rows_capacity/rows_nfields for kernels whose rows are a different array
    (the MC lattice kernel: rows = nodes, candidates = particles).
    init_out=True zeroes the whole output block before the sub-block loop so
    a body may skip its stores entirely (the MC node kernel's vacuum
    sub-block fast path)."""
    smax = plan.smax
    nblocks = plan.nblocks
    nsub_b = BLK // plan.sub
    rows_capacity = rows_capacity or capacity
    rows_nfields = rows_nfields or nfields
    assert rows_capacity == nblocks * BLK
    assert smax % WCOL == 0, "strip capacity must be 128-aligned"

    def kernel(wins, wins_nxt, p_any, rows, out, sbuf, sems):
        b = pl.program_id(0)
        slot = jax.lax.rem(b, 2)

        @pl.when(b == 0)
        def _():
            # blanked sentinel chunk: empty windows point their unconditional
            # first chunk here; 1e9 coordinates fail every distance/adjacency
            # test, so the chunk contributes exactly zero
            for sl in range(2):
                for s in range(3):
                    sbuf[sl, s, :, pl.ds(smax, WCOL)] = jnp.full(
                        (nfields, WCOL), 1e9, jnp.float32
                    )
            _issue_strip_dmas(p_any, sbuf, sems, 0, wins, smax, nsub_b)

        @pl.when(b + 1 < nblocks)
        def _():
            _issue_strip_dmas(p_any, sbuf, sems, 1 - slot, wins_nxt, smax, nsub_b)

        _wait_strip_dmas(p_any, sbuf, sems, slot, smax)

        if init_out:
            out[...] = jnp.zeros((nout, BLK), jnp.float32)

        if interpret:
            # compile-time containment: a dynamic loop keeps the traced body
            # O(1) in nsub_b — the static unroll below makes the discharged
            # interpret-mode jaxpr O(nsub_b * 9) dynamic slices, which blew
            # XLA:CPU compiles of the sharded step past 30 min (the MC node
            # kernel has nsub_b = 128)
            jax.lax.fori_loop(
                0, nsub_b,
                lambda t, _: (body(wins, rows, sbuf, slot, out, t), 0)[1], 0,
            )
        else:
            for t in range(nsub_b):  # static: row offsets must be compile-time
                body(wins, rows, sbuf, slot, out, t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, (nsub_b + 1) * 18), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, (nsub_b + 1) * 18),
                         lambda b: (jnp.minimum(b + 1, nblocks - 1), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rows_nfields, BLK), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nout, BLK), lambda b: (0, b), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, nfields, smax + WCOL), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    def call(wins, packed, rows=None):
        rows = packed if rows is None else rows
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nout, rows_capacity), jnp.float32),
            interpret=interpret,
        )(wins, wins, packed, rows)

    return call


def _window_loop(wins, sbuf, slot, t, s, compute_chunk, carry,
                 uncond_smax: int = 0):
    """Run compute_chunk over 128-aligned chunks covering window (t, s).

    uncond_smax > 0 (particle phases): the first chunk runs UNCONDITIONALLY
    as straight-line code — the settled state has 1-2 chunks per window, so
    the dynamic fori mostly degenerates to empty and the hot path is fully
    unrolled.  Correct because the plan's windows are chunk-disjoint and
    empty windows point at the blanked sentinel chunk at column uncond_smax
    (= smax), which contributes exactly zero under the geometric masks.  The
    MC node kernel keeps the guarded loop (lattice nodes over vacuum have
    all-empty windows and would pay 9 wasted chunks)."""
    lo = wins[0, 0, t * 18 + 2 * s]
    hi = wins[0, 0, t * 18 + 2 * s + 1]
    c0 = lo // WCOL
    nchunk = jnp.where(hi > lo, pl.cdiv(hi - c0 * WCOL, WCOL), 0)
    strip = s // 3

    if uncond_smax:
        def chunk_body(wi, carry):
            o = pl.multiple_of(
                jnp.minimum((c0 + wi) * WCOL, uncond_smax), WCOL
            )
            return compute_chunk(slot, strip, o, lo, hi, carry)

        carry = chunk_body(0, carry)
        return jax.lax.fori_loop(1, nchunk, chunk_body, carry)

    def chunk_body(wi, carry):
        o = pl.multiple_of((c0 + wi) * WCOL, WCOL)
        return compute_chunk(slot, strip, o, lo, hi, carry)

    return jax.lax.fori_loop(0, nchunk, chunk_body, carry)


# ---------------------------------------------------------------------------
# Lambda
# ---------------------------------------------------------------------------


def _centred_r2_mxu(axc, ayc, azc, a2, bx, by, bz, cx, cy, cz, sub):
    """Centred-coordinate r2 for all (row, lane) pairs as ONE K=8 MXU matmul
    (round-3 precision study, tools/precision_centered.py variant B: the
    sub-block-centroid translation shrinks the |a||b| cancellation term
    ~700x, making the matmul r2 match per-pair fp32; the further-factored
    gradient loses 200x and stays rejected).

    MEASURED AND REJECTED for production (round 4,
    tools/bench_kernel_variants.py on the real chip, 1M settled state):
    mxu=1 lambda is 55.8 ms vs 25.3 ms for the per-pair VPU baseline at
    sub=64 (2.2x slower; same ratio at sub=32/16).  The K=8
    HIGHEST-precision matmul uses 8/256 of the systolic depth, and the
    post-r2 per-slot VPU work (relu/rsqrt/kernel polys) remains the real
    cost — r2 itself was never the bottleneck.  Kept (with the `mxu` flag)
    so the rejection stays reproducible; production runs mxu=False.

    Returns (r2, bxc, byc, bzc) — the centred candidate coords are reused by
    the per-pair gradient (axc - bxc == ax - bx exactly in fp32 only when
    both are materialized; they are)."""
    bxc = bx - cx
    byc = by - cy
    bzc = bz - cz
    b2 = bxc * bxc + byc * byc + bzc * bzc
    one = jnp.ones((1, WCOL), jnp.float32)
    zero = jnp.zeros((1, WCOL), jnp.float32)
    B = jnp.concatenate(
        [-2.0 * bxc, -2.0 * byc, -2.0 * bzc, one, b2, zero, zero, zero], axis=0
    )  # (8, WCOL)
    A = jnp.concatenate(
        [axc, ayc, azc, a2, jnp.ones((sub, 1), jnp.float32),
         jnp.zeros((sub, 3), jnp.float32)], axis=1
    )  # (sub, 8)
    r2 = jax.lax.dot_general(
        A, B, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return r2, bxc, byc, bzc


def make_lambda_call(plan: PallasPlanSpec, capacity: int, h: float, grid: GridSpec,
                     interpret=False, mxu: bool = False):
    """rho_i = m_i sum poly6; lambda_i = -(rho/RHO-1)/(|gradC/RHO|^2 + CFM)
    (reference `src/ocl/oclsph_kernel.h:95-123`).

    Candidate fields (4, C): [psx, psy, psz, pad], positions blanked to 1e9
    for non-member lanes (the pad row keeps the strip's sublane dim aligned
    to the Mosaic (4,128) f32 tiling — a 3-row slice fails to compile).
    Row fields (5, C): [psx, psy, psz, mass, memberf].

    PURE-GEOMETRY masking (round 3): the plan's chunk-disjoint windows
    guarantee every candidate lane is processed at most once per sub-block,
    so no per-pair test is needed at all — a candidate beyond +-1 cell in
    any axis is >= h away (cells are h-wide) and both kernel functions are
    exactly zero there; blanked lanes are ~1e9 away.  This drops the cl
    field load and the mask/select ops from the hot loop (was the round-2
    |cl_b - (cl_a + off_s)| <= 1 test).  Pair math is the r2-space/rsqrt
    restructure: (h-r)^2/r = relu(h - r2*u)^2 * u with u = rsqrt(max(r2,
    EPS^2)); the self pair contributes 0 to gradients via dx=dy=dz=0, and
    r <= h needs no test (relu).

    mxu=True computes the per-chunk r2 block on the MXU via the centred K=8
    matmul (precision proven equal to per-pair fp32); the gradient stays
    per-pair.

    Accumulation stays in (sub, WCOL) tiles across all strips/chunks and is
    reduced once per sub-block (cross-lane reductions are ~7 shuffle ops)."""
    p6f = np.float32(poly6_factor(h))
    skf = np.float32(spiky_kernel_factor(h))
    hh = np.float32(h * h)
    hf = np.float32(h)
    eps2 = np.float32(K.EPSILON) * np.float32(K.EPSILON)
    sub = plan.sub

    def body(wins, rows, sbuf, slot, out, t):
        ax = rows[0, pl.ds(t * sub, sub)].reshape(sub, 1)
        ay = rows[1, pl.ds(t * sub, sub)].reshape(sub, 1)
        az = rows[2, pl.ds(t * sub, sub)].reshape(sub, 1)
        if mxu:
            cx = jnp.mean(ax)
            cy = jnp.mean(ay)
            cz = jnp.mean(az)
            axc = ax - cx
            ayc = ay - cy
            azc = az - cz
            a2 = axc * axc + ayc * ayc + azc * azc

        def chunk(slot_, strip, o, lo, hi, carry):
            p6s, gx, gy, gz = carry
            bx = sbuf[slot_, strip, 0, pl.ds(o, WCOL)].reshape(1, WCOL)
            by = sbuf[slot_, strip, 1, pl.ds(o, WCOL)].reshape(1, WCOL)
            bz = sbuf[slot_, strip, 2, pl.ds(o, WCOL)].reshape(1, WCOL)
            if mxu:
                r2, bxc, byc, bzc = _centred_r2_mxu(
                    axc, ayc, azc, a2, bx, by, bz, cx, cy, cz, sub
                )
                dx = axc - bxc
                dy = ayc - byc
                dz = azc - bzc
            else:
                dx = ax - bx
                dy = ay - by
                dz = az - bz
                r2 = dx * dx + dy * dy + dz * dz
            d2p = jnp.maximum(hh - r2, 0.0)
            p6 = d2p * d2p * d2p
            r2c = jnp.maximum(r2, eps2)
            u = jax.lax.rsqrt(r2c)
            tt = jnp.maximum(hf - r2c * u, 0.0)
            sg = tt * tt * u
            return (p6s + p6, gx + dx * sg, gy + dy * sg, gz + dz * sg)

        zero = jnp.zeros((sub, WCOL), jnp.float32)
        carry = (zero, zero, zero, zero)
        for s in range(9):
            carry = _window_loop(wins, sbuf, slot, t, s, chunk,
                                 carry, uncond_smax=plan.smax)
        p6s = jnp.sum(carry[0], axis=1, keepdims=True)
        gx = jnp.sum(carry[1], axis=1, keepdims=True)
        gy = jnp.sum(carry[2], axis=1, keepdims=True)
        gz = jnp.sum(carry[3], axis=1, keepdims=True)
        mass = rows[3, pl.ds(t * sub, sub)].reshape(sub, 1)
        memberf = rows[4, pl.ds(t * sub, sub)].reshape(sub, 1)
        rho = mass * (p6s * p6f) * memberf
        rr = np.float32(K.RHO_RECIP)
        c = skf * rr * memberf
        norm2 = (gx * c) ** 2 + (gy * c) ** 2 + (gz * c) ** 2
        ci = rho * rr - 1.0
        lam = -ci / (norm2 + np.float32(K.CFM_EPSILON))
        out[0, pl.ds(t * sub, sub)] = lam.reshape(sub)

    return _phase_pallas(body, nfields=4, nout=1, plan=plan, capacity=capacity,
                         interpret=interpret, rows_nfields=5)


# ---------------------------------------------------------------------------
# Delta
# ---------------------------------------------------------------------------


def make_delta_call(plan: PallasPlanSpec, capacity: int, h: float, grid: GridSpec,
                    interpret=False, mxu: bool = False):
    """dp_i = sum spiky_grad * (lam_i + lam_j + s_corr)/RHO
    (reference `src/ocl/oclsph_kernel.h:125-151`; the bounds clamp is applied
    by the XLA caller).

    Candidate fields (4, C): [psx, psy, psz, lam], positions blanked to 1e9
    for non-member lanes (pure-geometry masking + tile accumulation like the
    lambda kernel; blam of a blanked lane is finite and multiplied by
    sg == 0).  mxu=True: centred-r2 MXU matmul as in the lambda kernel."""
    p6f = np.float32(poly6_factor(h))
    skf = np.float32(spiky_kernel_factor(h))
    hh = np.float32(h * h)
    hf = np.float32(h)
    eps2 = np.float32(K.EPSILON) * np.float32(K.EPSILON)
    cdq = np.float32(K.CORR_DELTA_Q * h)
    p6dq = np.float32(poly6_factor(h)) * (hh - cdq * cdq) ** 3
    xqf = np.float32(p6f / p6dq)
    corr_k = np.float32(-K.CORR_K)
    rr = np.float32(K.RHO_RECIP)
    sub = plan.sub

    def body(wins, rows, sbuf, slot, out, t):
        ax = rows[0, pl.ds(t * sub, sub)].reshape(sub, 1)
        ay = rows[1, pl.ds(t * sub, sub)].reshape(sub, 1)
        az = rows[2, pl.ds(t * sub, sub)].reshape(sub, 1)
        alam = rows[3, pl.ds(t * sub, sub)].reshape(sub, 1)
        if mxu:
            cx = jnp.mean(ax)
            cy = jnp.mean(ay)
            cz = jnp.mean(az)
            axc = ax - cx
            ayc = ay - cy
            azc = az - cz
            a2 = axc * axc + ayc * ayc + azc * azc

        def chunk(slot_, strip, o, lo, hi, carry):
            dxs, dys, dzs = carry
            bx = sbuf[slot_, strip, 0, pl.ds(o, WCOL)].reshape(1, WCOL)
            by = sbuf[slot_, strip, 1, pl.ds(o, WCOL)].reshape(1, WCOL)
            bz = sbuf[slot_, strip, 2, pl.ds(o, WCOL)].reshape(1, WCOL)
            blam = sbuf[slot_, strip, 3, pl.ds(o, WCOL)].reshape(1, WCOL)
            if mxu:
                r2, bxc, byc, bzc = _centred_r2_mxu(
                    axc, ayc, azc, a2, bx, by, bz, cx, cy, cz, sub
                )
                dx = axc - bxc
                dy = ayc - byc
                dz = azc - bzc
            else:
                dx = ax - bx
                dy = ay - by
                dz = az - bz
                r2 = dx * dx + dy * dy + dz * dz
            d2p = jnp.maximum(hh - r2, 0.0)
            xq = d2p * d2p * d2p * xqf
            x2 = xq * xq
            corr = corr_k * x2 * x2
            factor = (alam + blam + corr) * rr
            r2c = jnp.maximum(r2, eps2)
            u = jax.lax.rsqrt(r2c)
            tt = jnp.maximum(hf - r2c * u, 0.0)
            sg = (skf * (tt * tt) * u) * factor
            return (dxs + dx * sg, dys + dy * sg, dzs + dz * sg)

        zero = jnp.zeros((sub, WCOL), jnp.float32)
        carry = (zero, zero, zero)
        for s in range(9):
            carry = _window_loop(wins, sbuf, slot, t, s, chunk,
                                 carry, uncond_smax=plan.smax)
        memberf = rows[4, pl.ds(t * sub, sub)].reshape(sub, 1)
        dxs = jnp.sum(carry[0], axis=1, keepdims=True) * memberf
        dys = jnp.sum(carry[1], axis=1, keepdims=True) * memberf
        dzs = jnp.sum(carry[2], axis=1, keepdims=True) * memberf
        out[0, pl.ds(t * sub, sub)] = dxs.reshape(sub)
        out[1, pl.ds(t * sub, sub)] = dys.reshape(sub)
        out[2, pl.ds(t * sub, sub)] = dzs.reshape(sub)

    return _phase_pallas(body, nfields=4, nout=3, plan=plan, capacity=capacity,
                         interpret=interpret, rows_nfields=5)


# ---------------------------------------------------------------------------
# Diffuse
# ---------------------------------------------------------------------------


def make_diffuse_call(plan: PallasPlanSpec, capacity: int, grid: GridSpec,
                      interpret=False):
    """Neighbour colour sums + counts over the exact 27-cell stencil
    (reference `src/ocl/oclsph_kernel.h:67-93`; the mix/clamp runs in XLA).

    Diffusion has no distance cutoff, so pairs carry an exact cell-coordinate
    adjacency test (fields fx, fy, fz are the integer cell coords as f32) —
    in the symmetric |d| <= 1 per-axis form, which is valid because the
    plan's chunk-disjoint windows process each pair at most once (the
    round-2 form matched the window's own (dx, dy) offset, which would
    undercount when a pair's chunk is attributed to a neighbouring window).

    Packed fields (8, C): [cr, cg, cb, ca, nonobs, fx, fy, fz] with fx
    blanked to -1e9 for non-member lanes.
    Output (8, C): [sum_r, sum_g, sum_b, sum_a, count, pad x3]."""
    sub = plan.sub

    def body(wins, rows, sbuf, slot, out, t):
        afx = rows[5, pl.ds(t * sub, sub)].reshape(sub, 1)
        afy = rows[6, pl.ds(t * sub, sub)].reshape(sub, 1)
        afz = rows[7, pl.ds(t * sub, sub)].reshape(sub, 1)

        # accumulate in (sub, WCOL) tiles like the lambda/delta kernels —
        # cross-lane reductions are ~7 shuffle ops each and the old per-chunk
        # 5x jnp.sum dominated the chunk body; reduce once per sub-block
        zero = jnp.zeros((sub, WCOL), jnp.float32)
        carry = (zero, zero, zero, zero, zero)

        def chunk(slot_, strip, o, lo, hi, carry):
            sr, sg_, sb_, sa, cnt = carry
            cr = sbuf[slot_, strip, 0, pl.ds(o, WCOL)].reshape(1, WCOL)
            cg = sbuf[slot_, strip, 1, pl.ds(o, WCOL)].reshape(1, WCOL)
            cb = sbuf[slot_, strip, 2, pl.ds(o, WCOL)].reshape(1, WCOL)
            ca = sbuf[slot_, strip, 3, pl.ds(o, WCOL)].reshape(1, WCOL)
            nb = sbuf[slot_, strip, 4, pl.ds(o, WCOL)].reshape(1, WCOL)
            bfx = sbuf[slot_, strip, 5, pl.ds(o, WCOL)].reshape(1, WCOL)
            bfy = sbuf[slot_, strip, 6, pl.ds(o, WCOL)].reshape(1, WCOL)
            bfz = sbuf[slot_, strip, 7, pl.ds(o, WCOL)].reshape(1, WCOL)
            adj = (
                (jnp.abs(bfx - afx) <= 1.0)
                & (jnp.abs(bfy - afy) <= 1.0)
                & (jnp.abs(bfz - afz) <= 1.0)
            )
            w = jnp.where(adj & (nb > 0.5), 1.0, 0.0)
            return (
                sr + cr * w,
                sg_ + cg * w,
                sb_ + cb * w,
                sa + ca * w,
                cnt + w,
            )

        for s in range(9):
            carry = _window_loop(wins, sbuf, slot, t, s, chunk, carry,
                                 uncond_smax=plan.smax)
        for a, tile in enumerate(carry):
            out[a, pl.ds(t * sub, sub)] = jnp.sum(tile, axis=1)


    return _phase_pallas(body, nfields=8, nout=8, plan=plan, capacity=capacity,
                         interpret=interpret)


# ---------------------------------------------------------------------------
# XLA-side phase wrappers (same signatures/semantics as ops/pbf.py phases)
# ---------------------------------------------------------------------------


class PallasPhases:
    """Per-spec factory for the three Pallas phase callables.

    `sub` is the rows-per-sub-block granularity (rows sharing one set of
    stencil windows): smaller sub = tighter windows (fewer candidate chunks
    per row) but more sub-block loop/reduce overhead.  `mxu` routes the
    per-chunk r2 block of lambda/delta through the centred K=8 MXU matmul.

    Both knobs are measured on the real chip at the 1M settled state
    (tools/bench_kernel_variants.py, round 4): production sub=64/mxu=False
    is the optimum — sub=32 lambda 30.4 ms, sub=16 55.8 ms vs 25.3 ms at
    sub=64 (tile overhead beats the tighter windows), and every mxu=True
    variant is >= 2.2x slower (see _centred_r2_mxu)."""

    def __init__(self, capacity: int, grid: GridSpec, h: float, smax: int,
                 interpret: bool = False, sub: int = SUB, mxu: bool = False):
        assert capacity % BLK == 0, "capacity must be a multiple of BLK"
        assert BLK % sub == 0 and sub % 8 == 0, "sub must be a multiple of 8"
        self.plan = PallasPlanSpec(nblocks=capacity // BLK, smax=smax, sub=sub)
        self.capacity = capacity
        self.grid = grid
        self.h = h
        self.smax = smax
        self.sub = sub
        if grid.ncells >= (1 << 24):
            raise ValueError("pallas path requires < 2^24 grid cells (f32-exact ids)")
        self._lambda = make_lambda_call(self.plan, capacity, h, grid, interpret,
                                        mxu=mxu)
        self._delta = make_delta_call(self.plan, capacity, h, grid, interpret,
                                      mxu=mxu)
        self._diffuse = make_diffuse_call(self.plan, capacity, grid, interpret)

    def plan_frame(self, sorted_key, cell_table):
        wins, overflow = plan_windows(
            sorted_key, cell_table, self.grid, self.capacity, self.smax,
            sub=self.sub,
        )
        return wins, overflow

    def _blanked(self, pstar, memberf):
        # non-member lanes must fail the geometric distance cutoff (the only
        # candidate mask since the chunk-disjoint plan) — blank positions
        return [jnp.where(memberf > 0, pstar[a], 1e9) for a in range(3)]

    def lambda_phase(self, wins, pstar, mass, memberf, ptype, alive, cells):
        bl = self._blanked(pstar, memberf)
        cands = jnp.stack(bl + [jnp.zeros_like(bl[0])])
        rows = jnp.stack([pstar[0], pstar[1], pstar[2], mass, memberf])
        lam = self._lambda(wins, cands, rows)[0]
        from pbf_sph_tpu.core.types import FLUID

        return jnp.where((ptype == FLUID) & alive, lam, 0.0)

    def delta_phase(self, wins, pstar, lam, memberf, ptype, alive,
                    scale, min_bound, max_bound, cells):
        cands = jnp.stack(self._blanked(pstar, memberf) + [lam])
        rows_in = jnp.stack([pstar[0], pstar[1], pstar[2], lam, memberf])
        dp = self._delta(wins, cands, rows_in)
        from pbf_sph_tpu.core.types import FLUID

        fluid = (ptype == FLUID) & alive
        rows = []
        for a in range(3):
            moved = (
                jnp.clip((pstar[a] + dp[a]) * scale, min_bound[a], max_bound[a]) / scale
            )
            rows.append(jnp.where(fluid, moved, pstar[a]))
        return jnp.stack(rows)

    def diffuse(self, wins, colour, cells, memberf, ptype, alive, dt):
        from pbf_sph_tpu.core.types import FLUID, OBSTACLE

        dtype = colour.dtype
        nonobs = ((ptype != OBSTACLE) & alive).astype(dtype) * memberf
        # non-member rows must also not *gather* — blank their coords so the
        # adjacency test never fires (cells of sentinel rows are garbage)
        fx = jnp.where(memberf > 0, cells[0].astype(dtype), -1e9)
        packed = jnp.stack(
            [colour[0], colour[1], colour[2], colour[3], nonobs,
             fx, cells[1].astype(dtype), cells[2].astype(dtype)]
        )
        outs = self._diffuse(wins, packed)
        mixture = outs[:4]
        cnt = outs[4]
        cnt_safe = jnp.maximum(cnt, 1.0)
        upd = (ptype == FLUID) & alive & (cnt > 0.5)
        rows = []
        for a in range(4):
            target = (mixture[a] / cnt_safe) * jnp.asarray(1.33, dtype)
            mixed = colour[a] + (dt / jnp.asarray(750.0, dtype)) * (target - colour[a])
            rows.append(jnp.where(upd, jnp.clip(mixed, 0.03, 1.0), colour[a]))
        return jnp.stack(rows)
