"""RETIRED from production (round 4, VERDICT #7): the v2 compacted-candidate
pipeline is measured-slower end-to-end than the v1 strip-window kernels
(622 vs 482 ms/step at 1M; its durable finding — r2-space/rsqrt pair math —
is upstreamed into ops/pallas_pbf.py).  Kept under tools/ for ablation runs
via tools/bench_phases.py --which v2; no production path dispatches here.

Pallas TPU kernels v2: compacted-candidate diffuse/lambda/delta phases.

Round-1 profile (BENCHMARKS.md): the 13 neighbour-phase dispatches dominate
the frame (~420 of 482 ms/step at 1M) and are VPU-instruction-bound.  Two
structural costs in the v1 kernels (`ops/pallas_pbf.py`):
  * lane fill ~40%: each sub-block visits 9 scattered (dx,dy) windows, each
    padded to 128-lane aligned chunks (Mosaic requires 128-aligned dynamic
    minor-dim offsets), and
  * ~40 effective VPU ops per pair (sqrt + div + window/adjacency masks).

v2 factors the frame differently:

  1. `plan_compact` (XLA, once per frame): per SUB-row sub-block, the 9
     stencil windows are merged into <=9 *disjoint* source intervals (per
     dx-strip the three dy-intervals are clipped against each other, so the
     union is covered exactly once — no duplicate pairs by construction).
  2. A *compaction kernel* (once per field-group per solver iteration) DMAs
     the 3 dx-strips like v1, then copies each interval's covering
     128-aligned chunks verbatim into PRIVATE destination chunks of a dense
     (F, nsub*WCAP) HBM slab — an indexed chunk copy with no lane rotates
     (measured ~150 ns each on v5e — hopeless), no read-modify-writes and no
     masks.  The head/tail lanes spilled into a private chunk are real
     particles from cells just outside the interval, which the consuming
     kernels' own adjacency tests reject (below).
  3. Dense `lambda`/`delta`/`diffuse` kernels read the compacted candidates
     with plain BlockSpec pipelining — no manual DMA, no window masks.
     Validity of every slab lane is geometric: a slab lane is either (a) a
     true merged-stencil member, (b) a particle from a cell >= 2 cells away
     along the sort axis (interval head/tail spill) — strictly > h away
     since cells are h-sized, so the reference's own r <= h test (lambda/
     delta) or the exact cell-band test (diffuse) rejects it — or (c) a
     non-member slot, whose packed position is blanked to +1e9 by the XLA
     caller.

Pair math is restructured (same values up to fp rounding; reference
`src/ocl/oclsph_kernel.h:95-162`):
  * r2-space range tests; rsqrt instead of sqrt + divide:
    (h-r)^2/r = relu(h - r2*u)^2 * u  with u = rsqrt(r2),
  * r2 is clamped to EPSILON^2 from below instead of masking r < EPSILON:
    the self pair still contributes exactly 0 to gradients (dx=dy=dz=0) and
    the correct poly6(0) to the density; *distinct* coincident particles
    (r < 1e-8, physically excluded by the solver) would contribute O(h^2)
    instead of the reference's 0 — a documented divergence far below fp32
    test tolerance.

Fidelity: reference math `src/ocl/oclsph_kernel.h:67-162` (diffuse constants
1.33 / dt/750, lambda CFM, delta s-corr + in-iteration bounds clamp — clamp
applied by the XLA caller like v1).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbf_sph_tpu.core.constants import DEFAULT_CONSTANTS as K
from pbf_sph_tpu.ops.grid import GridSpec
from pbf_sph_tpu.ops.kernels import poly6_factor, spiky_kernel_factor

BLK = 1024          # rows per grid step (block)
SUB = 32            # rows per sub-block (one compacted candidate slab each)
NSUB = BLK // SUB
WCOL = 128          # lane count
UNROLL = 4          # chunks per dense-kernel loop iteration (statically
                    # unrolled; compaction pads to a multiple with SENTINEL)
NPIECES = 4         # gap-split pieces per sub-block (top NPIECES-1 cell gaps)
NIV = 9 * NPIECES   # stencil intervals per sub-block after gap splitting
# Only split at cell-id gaps larger than this: splitting at a small gap costs
# a whole extra 128-column chunk per stencil offset (chunk rounding) to skip
# a hole of only gap*occupancy columns.  At occupancy >= ~20 a 6-cell gap is
# the break-even (round-3 measurement: unconditional top-k splitting inflated
# the settled-state chunk count ~1.5x over the 9-interval floor).
GAP_MIN = 6
# Hard VMEM bounds: the compact/dense kernels' VMEM blocks scale with wcap
# (out block ~ 2 * nf * NSUB * wcap * 4B) and the compact scratch with the
# union-strip capacity (2 * nf_dma * smax * 4B), so growth beyond these must
# fall back to the v1 strip-window kernels instead of recompiling toward a
# scoped-vmem OOM.
WCAP_MAX = 5120
STRIP_MAX = 24576
SENTINEL = np.float32(1.0e9)


@dataclass(frozen=True)
class Plan2Spec:
    nblocks: int
    smax: int           # per-dx-strip VMEM capacity (columns)
    wcap: int           # compacted candidate capacity per sub-block


def default_wcap() -> int:
    # dam-break 1M frame-0 need is 12-19 chunks/sub-block (tools/analyze_wcap);
    # start above that so the common case avoids a growth recompile, growth
    # (capped at WCAP_MAX) handles compression spikes
    return 2560


def grown_wcap(wcap: int, overflow: int) -> int:
    g = UNROLL * WCOL
    need = wcap + int(overflow) + g
    return min(-(-need // g) * g, WCAP_MAX)


def grown_strip_capacity(step_spec, overflow: int) -> int:
    """Next per-dx-strip capacity after an overflow of `overflow` columns.
    Capped at the VMEM-safe STRIP_MAX; a capped value that still overflows
    triggers the v1 fallback in the callers."""
    nz = step_spec.grid.dims[2]
    base = step_spec.strip_capacity or max(
        8192, -(-(nz * 48 * 2) // 128) * 128
    )
    need = base + int(overflow)
    return min(-(-need // 2048) * 2048 + 2048, step_spec.capacity, STRIP_MAX)


def plan_compact(sorted_key, cell_table, grid: GridSpec, capacity: int,
                 smax: int, wcap: int):
    """Per-frame compaction plan (XLA).

    Returns (wins, overflows):
      wins = dict(
        meta   (nsub, wcap//128) int32: per dst chunk, the source chunk index
               relative to the block's union-strip start,
        nchunk (nsub,) int32: dst chunks per sub-block,
        sstart (nblocks,) int32: 128-aligned union-strip start columns)
      overflows = dict(strip_overflow, wcap_overflow) int32

    The per-block source windows are THREE per-dx strips (as in the v1
    design): a single union strip spanning all three was tried and measured
    9x the DMA traffic — at production occupancy the inter-strip gap holds
    ~38k particles per x-plane (tools note in BENCHMARKS.md).  Chunk dedup
    runs globally on ABSOLUTE chunk indices (strip starts are 128-aligned,
    so chunks from different strips are comparable); an emitted chunk can
    extend up to WCOL-1 columns past its strip's content, which the overflow
    check's one-chunk margin keeps inside the DMA window.
    """
    C = capacity
    assert C % BLK == 0
    nblocks = C // BLK
    ncells = grid.ncells
    nx, ny, nz = grid.dims
    nynz = ny * nz

    lin = jnp.minimum(sorted_key, ncells - 1)
    member_count = cell_table[ncells]
    last_valid = lin[jnp.maximum(member_count - 1, 0)]
    lin = jnp.minimum(lin, last_valid)
    cmin = lin[0::SUB]                      # (nsub,)
    cmax = lin[SUB - 1 :: SUB]

    # per-block per-dx strip starts (128-aligned) + content ranges
    cmin_b = cmin.reshape(nblocks, NSUB)[:, 0]
    cmax_b = cmax.reshape(nblocks, NSUB)[:, -1]
    nsub = cmin.shape[0]
    sstarts, sends = [], []
    for dx in (-1, 0, 1):
        lo_cell_b = jnp.clip(cmin_b + dx * nynz - nz - 1, 0, ncells)
        hi_cell_b = jnp.clip(cmax_b + dx * nynz + nz + 2, 0, ncells)
        sstarts.append(cell_table[lo_cell_b])
        sends.append(cell_table[hi_cell_b])
    sstart = jnp.stack(sstarts, axis=1).astype(jnp.int32)   # (nblocks, 3)
    send = jnp.stack(sends, axis=1).astype(jnp.int32)
    sstart_al = (sstart // WCOL) * WCOL
    sstart_al = jnp.minimum(sstart_al, max(C - smax, 0)).astype(jnp.int32)
    # emitted boundary chunks may extend past a strip's content up to the
    # next 128 boundary (cross-strip chunk dedup), so the strip must hold
    # whole covering chunks of its content range
    need = ((send - sstart_al + WCOL - 1) // WCOL) * WCOL
    strip_overflow = jnp.maximum(jnp.max(need) - smax, 0).astype(jnp.int32)

    # Gap-split each sub-block's sorted cell range into NPIECES pieces at its
    # top NPIECES-1 cell-id gaps.  The convex hull [cmin+off, cmax+off] alone
    # blows up when a sub-block straddles a z-row or x-plane boundary in the
    # settled (irregular-surface) state: the shifted hull then lands mid-row /
    # mid-plane and covers an entire dense row (~nz*occ columns) or plane
    # (~ny*nz*occ) of real particles per interval — the round-2 VMEM OOM.
    # Pieces track the straddle structure, so each shifted piece covers only
    # its own small image.  Dense sub-blocks have zero-gaps and degenerate
    # pieces, which the dedup chain below collapses for free.
    linr = lin[: nsub * SUB].reshape(nsub, SUB)
    gaps = linr[:, 1:] - linr[:, :-1]                        # (nsub, SUB-1)
    gval, gidx = jax.lax.top_k(gaps, NPIECES - 1)            # (nsub, NPIECES-1)
    # suppress splits at small gaps (see GAP_MIN): a suppressed boundary
    # degenerates to a [last, last] piece whose intervals the dedup chain
    # collapses into the preceding piece's coverage
    gidx = jnp.where(gval > GAP_MIN, gidx, SUB - 1)
    gidx = jnp.sort(gidx, axis=1)
    starts = jnp.concatenate(
        [jnp.zeros((nsub, 1), gidx.dtype), jnp.minimum(gidx + 1, SUB - 1)],
        axis=1,
    )                                                        # (nsub, NPIECES)
    ends = jnp.concatenate(
        [gidx, jnp.full((nsub, 1), SUB - 1, gidx.dtype)], axis=1
    )
    pmin = jnp.take_along_axis(linr, starts, axis=1)         # (nsub, NPIECES)
    pmax = jnp.take_along_axis(linr, ends, axis=1)

    # NIV raw intervals per sub-block (piece x stencil offset): one fused
    # cell_table gather for all lo/hi bounds
    offs = np.asarray(
        [dx * (ny * nz) + dy * nz for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        np.int32,
    )                                                        # (9,)
    lo_cell = jnp.clip(
        pmin[:, None, :] + offs[None, :, None] - 1, 0, ncells
    ).reshape(nsub, NIV)                                     # (nsub, 9*NPIECES)
    hi_cell = jnp.clip(
        pmax[:, None, :] + offs[None, :, None] + 2, 0, ncells
    ).reshape(nsub, NIV)
    bounds = cell_table[jnp.concatenate([lo_cell, hi_cell], axis=1)]
    lo = bounds[:, :NIV]                                     # absolute columns
    hi = bounds[:, NIV:]
    strips_np = np.repeat(np.repeat(np.arange(3, dtype=np.int32), 3), NPIECES)
    strip_of = jnp.broadcast_to(strips_np[None, :], lo.shape).astype(jnp.int32)

    # Sort intervals by lo per sub-block (multi-operand lax.sort — values
    # ride the sort network; argsort + take_alongs measured ~3x slower) so
    # the cummax clip below yields DISJOINT intervals covering the union
    # exactly once: for monotone los, anything clipped off interval i
    # ([lo_i, rh)) lies inside the earlier interval whose hi achieved rh.
    lo, hi, strip_of = jax.lax.sort((lo, hi, strip_of), num_keys=1)

    # running-max dedup as a vectorized scan: rh_i = max(hi_0..hi_{i-1})
    rh_prev = jnp.concatenate(
        [jnp.zeros((nsub, 1), hi.dtype), jax.lax.cummax(hi, axis=1)[:, :-1]],
        axis=1,
    )
    ilo = jnp.maximum(lo, rh_prev)                           # (nsub, NIV)
    ilen = jnp.maximum(hi - ilo, 0)

    # Private-chunk placement: each interval is copied as the 128-aligned
    # source chunks covering it, into that many PRIVATE destination chunks —
    # lane-phase-preserving copies, no rotates.  Covering chunks of adjacent
    # intervals can overlap (gap < 128 columns), which would duplicate true
    # candidates; dedup with the same cummax chain on chunk indices.
    a = ilo // WCOL                                          # (nsub, NIV)
    bnd = jnp.where(ilen > 0, (ilo + ilen - 1) // WCOL + 1, a)
    pe_prev = jnp.concatenate(
        [
            jnp.zeros((nsub, 1), bnd.dtype),
            jax.lax.cummax(jnp.where(ilen > 0, bnd, 0), axis=1)[:, :-1],
        ],
        axis=1,
    )
    srcc0_abs = jnp.maximum(a, pe_prev)                      # (nsub, NIV)
    k = jnp.where(ilen > 0, jnp.maximum(bnd - srcc0_abs, 0), 0)
    # per-interval strip-start chunk: a 3-way select, not a gather
    sb = jnp.repeat(sstart_al // WCOL, NSUB, axis=0)         # (nsub, 3)
    base = jnp.where(
        strip_of == 0, sb[:, 0:1], jnp.where(strip_of == 1, sb[:, 1:2], sb[:, 2:3])
    )
    srcc0 = srcc0_abs - base                                 # strip-relative

    dstc0 = jnp.cumsum(k, axis=1) - k                        # (nsub, NIV)
    nchunk = (dstc0[:, -1] + k[:, -1]).astype(jnp.int32)     # (nsub,)
    cmax_chunks = wcap // WCOL
    # the dense kernels run UNROLL chunks per loop iteration; the compaction
    # kernel pads [nchunk, nchunkp) with SENTINEL columns, so overflow is
    # judged on the padded count
    nchunkp = -(-nchunk // UNROLL) * UNROLL
    wcap_overflow = jnp.maximum(jnp.max(nchunkp) - cmax_chunks, 0).astype(jnp.int32) * WCOL
    nchunk = jnp.minimum(nchunk, cmax_chunks)
    nchunkp = jnp.minimum(nchunkp, cmax_chunks)

    # Flat per-dst-chunk source map via ONE packed scatter-max + cummax
    # (O(NIV + J) per sub-block): owner of dst chunk j is the LAST non-empty
    # interval with dstc0 <= j.  The payload packs (interval, strip, src-dst
    # chunk delta) with the interval index in the high bits, so the max picks
    # the last interval and the low bits decode directly — no take_alongs.
    PB = 2048  # delta field width; |srcc0 - dstc0| < smax/128 + wcap/128 << 1024
    rows = jnp.arange(nsub, dtype=jnp.int32)[:, None]
    dst_idx = jnp.minimum(dstc0, cmax_chunks - 1)
    ival = jnp.broadcast_to(jnp.arange(NIV, dtype=jnp.int32)[None, :], k.shape)
    payload = (ival * 4 + strip_of) * PB + (srcc0 - dstc0 + PB // 2)
    scat = jnp.full((nsub, cmax_chunks), -1, jnp.int32)
    scat = scat.at[rows, dst_idx].max(jnp.where(k > 0, payload, -1))
    e = jnp.maximum(jax.lax.cummax(scat, axis=1), 0)         # (nsub, J)
    strip_j = (e // PB) % 4
    delta_j = e % PB - PB // 2
    j_idx = jnp.arange(cmax_chunks, dtype=jnp.int32)[None, :]
    src_chunk = jnp.clip(delta_j + j_idx, 0, smax // WCOL - 1)
    chunkmeta = (strip_j * 8192 + src_chunk).astype(jnp.int32)  # (nsub, J)

    wins = dict(meta=chunkmeta, nchunk=nchunk, nchunkp=nchunkp, sstart=sstart_al)
    overflows = dict(
        strip_overflow=strip_overflow,
        wcap_overflow=wcap_overflow,
    )
    return wins, overflows


# ---------------------------------------------------------------------------
# Compaction kernel
# ---------------------------------------------------------------------------


def _issue_strips(p_hbm, sbuf, sems, slot, sstart_ref, b, smax):
    for st in range(3):
        start = pl.multiple_of(sstart_ref[b, st], WCOL)
        pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(start, smax)], sbuf.at[slot, st], sems.at[slot, st]
        ).start()


def _wait_strips(p_hbm, sbuf, sems, slot, smax):
    for st in range(3):
        pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(0, smax)], sbuf.at[slot, st], sems.at[slot, st]
        ).wait()


def make_compact_call(plan: Plan2Spec, capacity: int, nf: int, interpret=False):
    """Compact nf fields from the sorted particle array into dense per-sub-
    block candidate slabs: (nf, C) -> (nf, (C//SUB) * WCAP).

    Pure indexed chunk copy: slab chunk j of sub-block t is chunk
    `meta[t, j] % 8192` of strip `meta[t, j] // 8192`, verbatim — one
    (nf, 128) tile copy per chunk.  No rotates, no read-modify-writes, no
    masks (see module docstring for why spilled head/tail lanes are safe)."""
    smax = plan.smax
    wcap = plan.wcap
    nblocks = plan.nblocks
    cmax_chunks = wcap // WCOL
    assert wcap % WCOL == 0
    # pad the DMA'd field count to the f32 sublane tile
    nf_dma = -(-nf // 4) * 4

    def kernel(sstart, meta, nchunk, nchunkp, p_any, out, sbuf, sems):
        b = pl.program_id(0)
        slot = jax.lax.rem(b, 2)

        @pl.when(b == 0)
        def _():
            _issue_strips(p_any, sbuf, sems, 0, sstart, 0, smax)

        @pl.when(b + 1 < nblocks)
        def _():
            _issue_strips(p_any, sbuf, sems, 1 - slot, sstart,
                          jnp.minimum(b + 1, nblocks - 1), smax)

        _wait_strips(p_any, sbuf, sems, slot, smax)

        blank = jnp.full((nf, WCOL), SENTINEL, jnp.float32)
        for t in range(NSUB):  # static
            nck = nchunk[0, 0, t]

            # UNROLL chunks per loop iteration (the per-iteration scalar
            # overhead was the dominant cost of this kernel: ~40 ns/chunk
            # measured round 2); chunks past nchunk read a clipped-but-valid
            # src and are overwritten with SENTINEL columns branchlessly
            # (rejected by the dense kernels' own r / cell-band tests)
            def copy_group(g, _):
                j0 = g * UNROLL
                for u in range(UNROLL):
                    j = j0 + u
                    m = meta[0, 0, t, j]
                    st = m // 8192
                    sc = pl.multiple_of((m - st * 8192) * WCOL, WCOL)
                    d = pl.multiple_of(t * wcap + j * WCOL, WCOL)
                    data = sbuf[slot, st, 0:nf, pl.ds(sc, WCOL)]
                    out[:, pl.ds(d, WCOL)] = jnp.where(j < nck, data, blank)
                return 0

            jax.lax.fori_loop(0, nchunkp[0, 0, t] // UNROLL, copy_group, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                       # sstart
            pl.BlockSpec((1, 1, NSUB, cmax_chunks), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.SMEM),                        # meta
            pl.BlockSpec((1, 1, NSUB), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),                        # nchunk
            pl.BlockSpec((1, 1, NSUB), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),                        # nchunkp
            pl.BlockSpec(memory_space=pl.ANY),                           # packed
        ],
        out_specs=pl.BlockSpec((nf, NSUB * wcap), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, nf_dma, smax), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    nsub_total = capacity // SUB

    def call(sstart, meta, nchunk, nchunkp, packed):
        meta_b = meta.reshape(nblocks, 1, NSUB, cmax_chunks)
        nchunk_b = nchunk.reshape(nblocks, 1, NSUB)
        nchunkp_b = nchunkp.reshape(nblocks, 1, NSUB)
        if nf_dma != nf:
            pad = jnp.zeros((nf_dma - nf, packed.shape[1]), packed.dtype)
            packed = jnp.concatenate([packed, pad])
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nf, nsub_total * wcap), jnp.float32),
            interpret=interpret,
        )(sstart, meta_b, nchunk_b, nchunkp_b, packed)

    return call


# ---------------------------------------------------------------------------
# Dense phase kernels
# ---------------------------------------------------------------------------


def _dense_phase(plan: Plan2Spec, capacity: int, nrow: int, ncand_arrays,
                 nout: int, body_factory, interpret=False):
    """Shared scaffolding: grid over blocks; per sub-block loop over UNROLL-
    chunk groups of its compacted candidates; rows (nsub, SUB, nrow)."""
    wcap = plan.wcap
    nsub_total = capacity // SUB

    def kernel(*refs):
        nchunkp = refs[0]
        rows = refs[1]
        cands = refs[2 : 2 + len(ncand_arrays)]
        out = refs[2 + len(ncand_arrays)]
        body = body_factory()
        for t in range(NSUB):
            body(t, nchunkp, rows, cands, out, wcap)

    in_specs = [
        pl.BlockSpec((1, 1, NSUB), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((NSUB, SUB, nrow), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for ncf in ncand_arrays:
        in_specs.append(
            pl.BlockSpec((ncf, NSUB * wcap), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
        )

    def call(nchunkp, rows, *cands):
        nchunkp = nchunkp.reshape(plan.nblocks, 1, NSUB)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(plan.nblocks,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((NSUB, SUB, nout), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((nsub_total, SUB, nout), jnp.float32),
            interpret=interpret,
        )(nchunkp, rows, *cands)

    return call


def _nt_dot(x, y):
    """(SUB, n) . (k, n) -> (SUB, k), contracting the lane dim (MXU NT)."""
    return jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def make_lambda2_call(plan: Plan2Spec, capacity: int, h: float, interpret=False):
    """rows (nsub,SUB,8)=[psx,psy,psz,a2,mass,...]; cands (8,*) packed pstar
    [-2x,-2y,-2z,b2,one,x,y,z] -> lam.

    Inner-loop structure (micro-validated, tools/micro_dense.py): UNROLL
    chunks per loop iteration — the dominant win; the per-iteration loop
    overhead was ~40% of the kernel.  Two MXU factorizations were tried and
    rejected for precision: r2 = |a|^2+|b|^2-2ab as a K=5 matmul loses ~3
    digits to cancellation (r ~ 0.1 at |a| ~ 8, breaking the fp32-oracle
    density fidelity target), and the gradient factorization
    sum (a-b)*sg = a*sum(sg) - sum(b*sg) blows up on near-coincident pairs
    where sg ~ 1/r (the unit parity test catches it at 82% mismatch).  Pair
    math therefore stays exact per-pair on the VPU.  Reference math
    `src/ocl/oclsph_kernel.h:95-123` (restructured; module docstring
    documents the fp-divergence conventions)."""
    p6f = np.float32(poly6_factor(h))
    skf = np.float32(spiky_kernel_factor(h))
    hh = np.float32(h * h)
    hf = np.float32(h)
    eps2 = np.float32(K.EPSILON) ** 2
    rr = np.float32(K.RHO_RECIP)
    cfm = np.float32(K.CFM_EPSILON)
    GW = UNROLL * WCOL

    def body_factory():
        def body(t, nchunkp, rows, cands, out, wcap):
            (pc,) = cands
            ax = rows[t, :, 0:1]
            ay = rows[t, :, 1:2]
            az = rows[t, :, 2:3]

            def group(g, carry):
                p6s, gxa, gya, gza = carry
                o0 = pl.multiple_of(t * wcap + g * GW, WCOL)
                for u_ in range(UNROLL):
                    o = pl.multiple_of(o0 + u_ * WCOL, WCOL)
                    bx = pc[1, pl.ds(o, WCOL)].reshape(1, WCOL)
                    by = pc[2, pl.ds(o, WCOL)].reshape(1, WCOL)
                    bz = pc[3, pl.ds(o, WCOL)].reshape(1, WCOL)
                    dx = ax - bx
                    dy = ay - by
                    dz = az - bz
                    r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, eps2)
                    u = jax.lax.rsqrt(r2)
                    tt = jnp.maximum(hh - r2, 0.0)
                    p6s = p6s + tt * tt * tt
                    t2 = jnp.maximum(hf - r2 * u, 0.0)
                    sg = t2 * t2 * u
                    gxa = gxa + dx * sg
                    gya = gya + dy * sg
                    gza = gza + dz * sg
                return (p6s, gxa, gya, gza)

            zero = jnp.zeros((SUB, WCOL), jnp.float32)
            p6s, gxa, gya, gza = jax.lax.fori_loop(
                0, nchunkp[0, 0, t] // UNROLL, group, (zero, zero, zero, zero)
            )
            p6sum = jnp.sum(p6s, axis=1, keepdims=True)
            gx = jnp.sum(gxa, axis=1, keepdims=True)
            gy = jnp.sum(gya, axis=1, keepdims=True)
            gz = jnp.sum(gza, axis=1, keepdims=True)
            mass = rows[t, :, 3:4]
            rho = mass * (p6sum * p6f)
            c1 = skf * rr
            norm2 = (gx * c1) ** 2 + (gy * c1) ** 2 + (gz * c1) ** 2
            ci = rho * rr - 1.0
            out[t, :, 0:1] = -ci / (norm2 + cfm)

        return body

    return _dense_phase(plan, capacity, 4, (4,), 1, body_factory, interpret)


def make_delta2_call(plan: Plan2Spec, capacity: int, h: float, interpret=False):
    """rows (nsub,SUB,4)=[psx,psy,psz,lam_i]; cands packed pstar (4,*),
    lam (1,*) -> dp (nsub,SUB,4) (col 3 zero).  Reference
    `oclsph_kernel.h:125-151`; the per-iteration bounds clamp runs in the XLA
    caller.  Same unroll + NT-reduce structure as lambda (see its
    docstring)."""
    p6f = np.float32(poly6_factor(h))
    skf = np.float32(spiky_kernel_factor(h))
    hh = np.float32(h * h)
    hf = np.float32(h)
    eps2 = np.float32(K.EPSILON) ** 2
    cdq = np.float32(K.CORR_DELTA_Q * h)
    p6dq = np.float32(poly6_factor(h)) * (hh - cdq * cdq) ** 3
    inv_p6dq = np.float32(p6f / p6dq)
    corr_k = np.float32(-K.CORR_K)
    rr = np.float32(K.RHO_RECIP)
    GW = UNROLL * WCOL

    def body_factory():
        def body(t, nchunkp, rows, cands, out, wcap):
            pc, lc = cands
            ax = rows[t, :, 0:1]
            ay = rows[t, :, 1:2]
            az = rows[t, :, 2:3]
            alam = rows[t, :, 3:4]

            def group(g, carry):
                dxs, dys, dzs = carry
                o0 = pl.multiple_of(t * wcap + g * GW, WCOL)
                for u_ in range(UNROLL):
                    o = pl.multiple_of(o0 + u_ * WCOL, WCOL)
                    bx = pc[1, pl.ds(o, WCOL)].reshape(1, WCOL)
                    by = pc[2, pl.ds(o, WCOL)].reshape(1, WCOL)
                    bz = pc[3, pl.ds(o, WCOL)].reshape(1, WCOL)
                    blam = lc[0, pl.ds(o, WCOL)].reshape(1, WCOL)
                    dx = ax - bx
                    dy = ay - by
                    dz = az - bz
                    r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, eps2)
                    u = jax.lax.rsqrt(r2)
                    tt = jnp.maximum(hh - r2, 0.0)
                    xq = (tt * tt * tt) * inv_p6dq
                    x2 = xq * xq
                    factor = (alam + blam + corr_k * (x2 * x2)) * rr
                    t2 = jnp.maximum(hf - r2 * u, 0.0)
                    sg = (t2 * t2 * u) * skf * factor
                    dxs = dxs + dx * sg
                    dys = dys + dy * sg
                    dzs = dzs + dz * sg
                return (dxs, dys, dzs)

            zero = jnp.zeros((SUB, WCOL), jnp.float32)
            dxs, dys, dzs = jax.lax.fori_loop(
                0, nchunkp[0, 0, t] // UNROLL, group, (zero, zero, zero)
            )
            out[t, :, 0:1] = jnp.sum(dxs, axis=1, keepdims=True)
            out[t, :, 1:2] = jnp.sum(dys, axis=1, keepdims=True)
            out[t, :, 2:3] = jnp.sum(dzs, axis=1, keepdims=True)
            out[t, :, 3:4] = jnp.zeros((SUB, 1), jnp.float32)

        return body

    return _dense_phase(plan, capacity, 4, (4, 1), 4, body_factory, interpret)


def make_diffuse2_call(plan: Plan2Spec, capacity: int, grid: GridSpec,
                       interpret=False):
    """rows (nsub,SUB,4)=[acl,0,0,0]; cands (4,*)=[cr,cg,cb,ca] and
    (4,*)=[w,bcl,0,0] -> (nsub,SUB,8)=[sum_r,g,b,a,count,0,0,0].

    Exact 27-cell adjacency via a two-level band test on the linear cell id
    (reference `oclsph_kernel.h:67-93`): e = bcl - acl is accepted iff
    min(||e|-nynz|, |e|) collapses into a band <= nz+1 whose residual
    min(|g1-nz|, g1) <= 1.  The test is alias-free for all reachable states:
    a false accept needs a pair spanning nearly a full grid axis inside one
    stencil window, which the 2h bounds padding makes unpopulated.
    `w` carries the reference's non-obstacle weight.  The weighted colour
    sums reduce per UNROLL-chunk group with one NT matmul against the
    [cr,cg,cb,ca,w] slab rows."""
    nx, ny, nz = grid.dims
    nynz = np.float32(ny * nz)
    nzf = np.float32(nz)
    GW = UNROLL * WCOL

    def body_factory():
        def body(t, nchunkp, rows, cands, out, wcap):
            cc, wc = cands
            acl = rows[t, :, 0:1]

            def group(g, carry):
                red, cnt = carry
                o0 = pl.multiple_of(t * wcap + g * GW, WCOL)
                wws = []
                for u_ in range(UNROLL):
                    o = pl.multiple_of(o0 + u_ * WCOL, WCOL)
                    w = wc[0, pl.ds(o, WCOL)].reshape(1, WCOL)
                    bcl = wc[1, pl.ds(o, WCOL)].reshape(1, WCOL)
                    e = jnp.abs(bcl - acl)
                    g1 = jnp.minimum(jnp.abs(e - nynz), e)
                    g2 = jnp.minimum(jnp.abs(g1 - nzf), g1)
                    ww = jnp.where(g2 <= 1.0, w, 0.0)
                    cnt = cnt + ww
                    wws.append(ww)
                ww4 = jnp.concatenate(wws, axis=1)               # (SUB, GW)
                B4 = cc[0:4, pl.ds(o0, GW)]                      # (4, GW)
                return (red + _nt_dot(ww4, B4), cnt)

            zred = jnp.zeros((SUB, 4), jnp.float32)
            zero = jnp.zeros((SUB, WCOL), jnp.float32)
            red, cnt = jax.lax.fori_loop(
                0, nchunkp[0, 0, t] // UNROLL, group, (zred, zero)
            )
            for a in range(4):
                out[t, :, a : a + 1] = red[:, a : a + 1]
            out[t, :, 4:5] = jnp.sum(cnt, axis=1, keepdims=True)
            for a in range(5, 8):
                out[t, :, a : a + 1] = jnp.zeros((SUB, 1), jnp.float32)

        return body

    return _dense_phase(plan, capacity, 4, (4, 4), 8, body_factory, interpret)


# ---------------------------------------------------------------------------
# XLA-side phase wrappers
# ---------------------------------------------------------------------------


class PallasPhases2:
    """Compacted-candidate phase pipeline for one static spec.

    Per frame:
        wins, ovf = phases.plan_frame(key, cell_table)
        colour = phases.diffuse(wins, colour, cells, member, ptype, alive, dt)
        for each iteration:
            cands = phases.compact_pstar(wins, pstar)
            lam   = phases.lambda_phase(wins, cands, pstar, mass, member, ...)
            lamc  = phases.compact_lam(wins, lam)
            pstar = phases.delta_phase(wins, cands, lamc, pstar, lam, ...)
    """

    def __init__(self, capacity: int, grid: GridSpec, h: float, smax: int,
                 wcap: int, interpret: bool = False):
        assert capacity % BLK == 0
        assert wcap % (UNROLL * WCOL) == 0
        if grid.ncells >= (1 << 24):
            raise ValueError("pallas path requires < 2^24 grid cells (f32-exact ids)")
        self.capacity = capacity
        self.grid = grid
        self.h = h
        self.smax = smax
        self.wcap = wcap
        self.plan = Plan2Spec(nblocks=capacity // BLK, smax=smax, wcap=wcap)
        self._compact1 = make_compact_call(self.plan, capacity, 1, interpret)
        self._compact4 = make_compact_call(self.plan, capacity, 4, interpret)
        self._lambda = make_lambda2_call(self.plan, capacity, h, interpret)
        self._delta = make_delta2_call(self.plan, capacity, h, interpret)
        self._diffuse = make_diffuse2_call(self.plan, capacity, grid, interpret)

    # -- plan -----------------------------------------------------------------

    def plan_frame(self, sorted_key, cell_table):
        return plan_compact(
            sorted_key, cell_table, self.grid, self.capacity, self.smax, self.wcap
        )

    # -- helpers ---------------------------------------------------------------

    def _rows4(self, f0, f1, f2, f3):
        r = jnp.stack([f0, f1, f2, f3], axis=-1)      # (C, 4)
        return r.reshape(self.capacity // SUB, SUB, 4)

    def _linear_id(self, cells, dtype):
        nx, ny, nz = self.grid.dims
        return ((cells[0] * ny + cells[1]) * nz + cells[2]).astype(dtype)

    # -- phases ----------------------------------------------------------------

    def compact_pstar(self, wins, pstar, member):
        # blank non-member slots (sorted tail): dead slots sit at the origin,
        # which maps to a real interior cell — without blanking they would
        # pass the r-test for rows near the domain corner.  Packed slab rows
        # [one, x, y, z]: rows 1:4 feed the pair differences, rows 0:4 are
        # the NT-reduce matrix for sum(sg) / sum(b*sg).
        bx = jnp.where(member, pstar[0], SENTINEL)
        one = jnp.ones_like(bx)
        packed = jnp.stack([one, bx, pstar[1], pstar[2]])
        return self._compact4(wins["sstart"], wins["meta"], wins["nchunk"],
                              wins["nchunkp"], packed)

    def compact_lam(self, wins, lam):
        return self._compact1(wins["sstart"], wins["meta"], wins["nchunk"],
                              wins["nchunkp"], lam[None, :])

    def lambda_phase(self, wins, cands, pstar, mass, member, ptype, alive):
        from pbf_sph_tpu.core.types import FLUID

        rows = self._rows4(pstar[0], pstar[1], pstar[2], mass)
        lam = self._lambda(wins["nchunkp"], rows, cands).reshape(self.capacity)
        return jnp.where((ptype == FLUID) & alive & member, lam, 0.0)

    def delta_phase(self, wins, cands, lamc, pstar, lam, member, ptype, alive,
                    scale, min_bound, max_bound):
        from pbf_sph_tpu.core.types import FLUID

        rows = self._rows4(pstar[0], pstar[1], pstar[2], lam)
        dp = self._delta(wins["nchunkp"], rows, cands, lamc)
        dp = dp.reshape(self.capacity, 4)
        fluid = (ptype == FLUID) & alive & member
        out = []
        for a in range(3):
            moved = (
                jnp.clip((pstar[a] + dp[:, a]) * scale, min_bound[a], max_bound[a])
                / scale
            )
            out.append(jnp.where(fluid, moved, pstar[a]))
        return jnp.stack(out)

    def diffuse(self, wins, colour, cells, member, ptype, alive, dt):
        from pbf_sph_tpu.core.types import FLUID, OBSTACLE

        dtype = colour.dtype
        cl = self._linear_id(cells, dtype)
        # blank non-member candidate ids so stale tail rows in the strips and
        # the sentinel fill can never pass the band test
        clb = jnp.where(member, cl, SENTINEL)
        w = ((ptype != OBSTACLE) & alive & member).astype(dtype)
        z = jnp.zeros_like(w)
        packed_c = jnp.stack([colour[0], colour[1], colour[2], colour[3]])
        packed_w = jnp.stack([w, clb, z, z])
        cands_c = self._compact4(wins["sstart"], wins["meta"], wins["nchunk"],
                                 wins["nchunkp"], packed_c)
        cands_w = self._compact4(wins["sstart"], wins["meta"], wins["nchunk"],
                                 wins["nchunkp"], packed_w)
        rows = self._rows4(cl, z, z, z)
        outs = self._diffuse(wins["nchunkp"], rows, cands_c, cands_w)
        outs = outs.reshape(self.capacity, 8)
        mixture = outs[:, :4]
        cnt = outs[:, 4]
        cnt_safe = jnp.maximum(cnt, 1.0)
        upd = (ptype == FLUID) & alive & member & (cnt > 0.5)
        rows_out = []
        for a in range(4):
            target = (mixture[:, a] / cnt_safe) * jnp.asarray(1.33, dtype)
            mixed = colour[a] + (dt / jnp.asarray(750.0, dtype)) * (target - colour[a])
            rows_out.append(jnp.where(upd, jnp.clip(mixed, 0.03, 1.0), colour[a]))
        return jnp.stack(rows_out)
