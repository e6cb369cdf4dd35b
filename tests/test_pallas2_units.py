"""Unit tests for the v2 compacted-candidate Pallas kernels (interpret mode).

Contract tested from first principles (not against the plan's own code):
  * compaction: for every row, every true 27-cell stencil candidate appears
    EXACTLY once in the row's sub-block slab; no real column appears twice;
    tail lanes are sentinel.
  * lambda/delta/diffuse: match the XLA reference phases (`ops/pbf.py`) on a
    multi-block random scene, including a block that straddles an x-slab
    boundary (the strip-overlap regime).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pbf_sph_tpu.core.types import FLUID, OBSTACLE
from pbf_sph_tpu.ops import pbf
from pbf_sph_tpu.ops import pallas_pbf2 as p2
from pbf_sph_tpu.ops.grid import (
    GridSpec, build_cell_table, cell_coords, decode_key, sort_key,
    stencil_ranges,
)

H = 0.1
CAP = 32  # cell capacity for the XLA reference phases


def make_scene(seed, capacity=2048, alive_n=1900, extent=(9, 11, 13)):
    """Random particles across the whole grid (forces slab-straddling blocks)."""
    rng = np.random.default_rng(seed)
    grid = GridSpec(extent=extent, maxz=GridSpec.from_bounds(
        (0, 0, 0), (1, 1, 1), 1.0, H).maxz, quirks=False)
    # rebuild maxz properly for this extent
    from pbf_sph_tpu.ops.curves import morton_encode3
    grid = GridSpec(extent=extent,
                    maxz=int(morton_encode3(extent[0], extent[1], extent[2])),
                    quirks=False)
    nx, ny, nz = grid.dims
    min_extent = np.zeros(3, np.float32)
    pos = rng.uniform(0.004, 0.996, size=(3, capacity)).astype(np.float32)
    pos[0] *= nx * H * 0.999
    pos[1] *= ny * H * 0.999
    pos[2] *= nz * H * 0.999
    alive = np.zeros(capacity, bool)
    alive[:alive_n] = True
    ptype = np.where(rng.uniform(size=capacity) < 0.1, OBSTACLE, FLUID).astype(np.int32)
    mass = np.ones(capacity, np.float32)

    pstar = jnp.asarray(pos)
    cells = cell_coords(pstar, jnp.asarray(min_extent), H)
    key = sort_key(cells, jnp.asarray(alive), grid)
    order = jnp.argsort(key, stable=True)
    key = key[order]
    pstar = pstar[:, order]
    alive = jnp.asarray(alive)[order]
    ptype = jnp.asarray(ptype)[order]
    mass = jnp.asarray(mass)[order]
    cells, member = decode_key(key, grid)
    table = build_cell_table(key, grid)
    return grid, key, pstar, alive, ptype, mass, cells, member, table


@pytest.mark.slow
def test_compaction_contract():
    grid, key, pstar, alive, ptype, mass, cells, member, table = make_scene(0)
    C = key.shape[0]
    smax = 2048
    wcap = 2048
    wins, ovf = p2.plan_compact(key, table, grid, C, smax, wcap)
    assert int(ovf["strip_overflow"]) == 0
    assert int(ovf["wcap_overflow"]) == 0

    # pack the source-column index as the field value
    colid = jnp.arange(C, dtype=jnp.float32)
    packed = jnp.stack([colid, colid, colid])
    compact = p2.make_compact_call(
        p2.Plan2Spec(nblocks=C // p2.BLK, smax=smax, wcap=wcap), C, 3,
        interpret=True,
    )
    slabs = np.asarray(compact(wins["sstart"], wins["meta"], wins["nchunk"],
                               wins["nchunkp"], packed)[0])
    slabs = slabs.reshape(C // p2.SUB, wcap)
    nchunk = np.asarray(wins["nchunk"])

    key_np = np.asarray(key)
    cells_np = np.stack([np.asarray(c) for c in cells])
    member_np = np.asarray(member)
    nx, ny, nz = grid.dims

    for t in range(C // p2.SUB):
        slab = slabs[t][: nchunk[t] * 128]   # chunks beyond nchunk are unwritten
        real = slab[slab < C]                 # blanked slots are sentinel
        # no real column twice
        assert len(np.unique(real)) == len(real), f"duplicate in slab {t}"
        realset = set(int(v) for v in real)
        # every true stencil candidate of every member row present
        rows = range(t * p2.SUB, (t + 1) * p2.SUB)
        for i in rows:
            if not member_np[i]:
                continue
            ci = cells_np[:, i]
            d = np.abs(cells_np.T - ci)  # (C, 3)
            cand = np.nonzero(member_np & (d <= 1).all(axis=1))[0]
            missing = [int(j) for j in cand if int(j) not in realset]
            assert not missing, f"row {i} misses candidates {missing[:5]}"


def _reference_phases(grid, pstar, mass, ptype, alive, cells, member, table, iters=2):
    ranges = stencil_ranges(cells, member, table, grid)
    scale = jnp.float32(1000.0)
    min_b = jnp.zeros(3, jnp.float32)
    max_b = jnp.full((3,), 1e9, jnp.float32)
    lam = None
    ps = pstar
    for _ in range(iters):
        lam = pbf.lambda_phase(ps, mass, ptype, alive, ranges, CAP, H)
        ps = pbf.delta_phase(ps, lam, ptype, alive, ranges, CAP, H, scale, min_b, max_b)
    return lam, ps


@pytest.mark.slow
def test_lambda_delta_parity():
    grid, key, pstar, alive, ptype, mass, cells, member, table = make_scene(1)
    C = key.shape[0]
    smax, wcap = 2048, 2048
    phases = p2.PallasPhases2(C, grid, H, smax, wcap, interpret=True)
    wins, ovf = phases.plan_frame(key, table)
    assert int(ovf["strip_overflow"]) == 0 and int(ovf["wcap_overflow"]) == 0

    scale = jnp.float32(1000.0)
    min_b = jnp.zeros(3, jnp.float32)
    max_b = jnp.full((3,), 1e9, jnp.float32)

    ps = pstar
    lam = None
    for _ in range(2):
        cands = phases.compact_pstar(wins, ps, member)
        lam = phases.lambda_phase(wins, cands, ps, mass, member, ptype, alive)
        lamc = phases.compact_lam(wins, lam)
        ps = phases.delta_phase(
            wins, cands, lamc, ps, lam, member, ptype, alive, scale, min_b, max_b
        )

    lam_ref, ps_ref = _reference_phases(
        grid, pstar, mass, ptype, alive, cells, member, table, iters=2
    )
    np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(ps_ref), rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_diffuse_parity():
    grid, key, pstar, alive, ptype, mass, cells, member, table = make_scene(2)
    C = key.shape[0]
    phases = p2.PallasPhases2(C, grid, H, 2048, 2048, interpret=True)
    wins, _ = phases.plan_frame(key, table)

    rng = np.random.default_rng(3)
    colour = jnp.asarray(rng.uniform(0.05, 1.0, size=(4, C)).astype(np.float32))
    dt = jnp.float32(0.0124)

    got = phases.diffuse(wins, colour, cells, member, ptype, alive, dt)

    ranges = stencil_ranges(cells, member, table, grid)
    want = pbf.diffuse(colour, ptype, alive, ranges, CAP, dt)
    # summation order differs (compacted vs stencil order): fp32 noise only
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_plan_straddle_bounded():
    """Regression for the round-2 VMEM OOM: on a settled-like scene with an
    irregular free surface, sub-blocks straddle z-row / x-plane boundaries at
    mismatched fill heights; the convex-hull window merge then covered entire
    dense rows (~170 chunks/sub-block at 1M) and wcap growth blew past the
    VMEM budget.  The gap-split plan must stay within a modest wcap AND keep
    full stencil coverage (sampled rows, first-principles check)."""
    from pbf_sph_tpu.ops.curves import morton_encode3

    rng = np.random.default_rng(7)
    extent = (5, 23, 23)
    grid = GridSpec(
        extent=extent,
        maxz=int(morton_encode3(extent[0], extent[1], extent[2])),
        quirks=False,
    )
    nx, ny, nz = grid.dims
    # tall dense walls next to shallow puddles (alternating with x): plane
    # boundaries with large fill-height mismatch, the collapsing-dam shape
    # that made the hull plan cover whole planes (hull needs 55 chunks here;
    # gap-split needs 20)
    pts = []
    for cx in range(nx):
        for cz in range(nz):
            base = 18 if cx % 2 == 0 else 3
            hgt = base + int(rng.integers(0, 3))
            for cy in range(min(hgt, ny)):
                occ = 8 if cy < hgt - 1 else rng.integers(1, 4)
                p = rng.uniform(0.02, 0.98, size=(occ, 3))
                p = (p + np.array([cx, cy, cz])) * H
                pts.append(p)
    pos = np.concatenate(pts).astype(np.float32).T       # (3, N)
    N = pos.shape[1]
    C = -(-N // p2.BLK) * p2.BLK
    pad = np.zeros((3, C - N), np.float32)
    pos = np.concatenate([pos, pad], axis=1)
    alive = np.zeros(C, bool)
    alive[:N] = True

    pstar = jnp.asarray(pos)
    cells = cell_coords(pstar, jnp.zeros(3, jnp.float32), H)
    key = sort_key(cells, jnp.asarray(alive), grid)
    key = jnp.sort(key)
    table = build_cell_table(key, grid)
    cells, member = decode_key(key, grid)

    smax = C
    wcap = 2560
    wins, ovf = p2.plan_compact(key, table, grid, C, smax, wcap)
    assert int(ovf["strip_overflow"]) == 0
    # the hull plan needs 7040 columns here; gap-split must fit 2560
    assert int(ovf["wcap_overflow"]) == 0

    # sampled first-principles coverage (uses the same checker as
    # test_plan_intervals_fast but on random member rows)
    meta = np.asarray(wins["meta"])
    nchunk = np.asarray(wins["nchunk"])
    sstart = np.asarray(wins["sstart"])
    cells_np = np.stack([np.asarray(c) for c in cells])
    member_np = np.asarray(member)
    rows = rng.choice(np.nonzero(member_np)[0], size=64, replace=False)
    for r in rows:
        t = r // p2.SUB
        b = t // p2.NSUB
        covered = np.zeros(C + 65536, bool)
        abs_chunks = set()
        for j in range(nchunk[t]):
            strip, sc = meta[t, j] // 8192, meta[t, j] % 8192
            ac = sstart[b, strip] // 128 + sc
            assert ac not in abs_chunks, f"dup chunk for sub-block {t}"
            abs_chunks.add(ac)
            covered[ac * 128 : ac * 128 + 128] = True
        d = np.abs(cells_np.T - cells_np[:, r])
        cand = np.nonzero(member_np & (d <= 1).all(axis=1))[0]
        assert covered[cand].all(), f"row {r}: uncovered candidates"


def test_plan_intervals_fast():
    """Fast (XLA-only) invariants of plan_compact's chunk map: source chunks
    are unique per sub-block (no duplicate candidates), within the strip DMA
    range, and cover every row's true stencil columns."""
    grid, key, pstar, alive, ptype, mass, cells, member, table = make_scene(4)
    C = key.shape[0]
    smax, wcap = 2048, 2048
    wins, ovf = p2.plan_compact(key, table, grid, C, smax, wcap)
    assert int(ovf["strip_overflow"]) == 0 and int(ovf["wcap_overflow"]) == 0
    meta = np.asarray(wins["meta"])          # (nsub, wcap//128)
    nchunk = np.asarray(wins["nchunk"])
    sstart = np.asarray(wins["sstart"])      # (nblocks, 3)
    cells_np = np.stack([np.asarray(c) for c in cells])
    member_np = np.asarray(member)
    nsub = C // p2.SUB

    for t in range(nsub):
        b = t // p2.NSUB
        abs_chunks = []
        for j in range(nchunk[t]):
            strip, sc = meta[t, j] // 8192, meta[t, j] % 8192
            assert 0 <= sc < smax // 128
            abs_chunks.append(sstart[b, strip] // 128 + sc)
        # absolute source chunks unique -> no duplicated candidates
        assert len(set(abs_chunks)) == len(abs_chunks), f"dup chunk in {t}"
        covered = np.zeros(C + 4096, bool)
        for ac in abs_chunks:
            covered[ac * 128 : ac * 128 + 128] = True
        for r in range(t * p2.SUB, (t + 1) * p2.SUB):
            if not member_np[r]:
                continue
            d = np.abs(cells_np.T - cells_np[:, r])
            cand = np.nonzero(member_np & (d <= 1).all(axis=1))[0]
            assert covered[cand].all(), f"row {r}: uncovered candidates"
