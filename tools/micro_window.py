#!/usr/bin/env python
"""Localize the ~12 ms/sweep gap between the lambda body's math ceiling and
the production kernel (round 5; companion to tools/anchor_rate.py).

anchor_rate measured: body math at static offsets = 156 G pair-slots/s, but
production = 74 G — the census-modeled sweep is ~13 ms vs 25.3 measured.
The suspects are (a) the per-window bookkeeping in `_window_loop` (SMEM
lo/hi reads, nchunk computation, per-window fori setup x9), (b) DYNAMIC
minor-dim chunk offsets vs static ones, (c) per-field loads (3-4 dynamic
slices per chunk) vs one (4, WCOL) slice, (d) strip-DMA waits.

Variants, all running the EXACT lambda chunk math at ~14.6 chunks/sub-block
over 16-sub-block blocks (the production shape at the 1M census):

  prod-structure : verbatim `_window_loop` structure — 9 windows, lo/hi
                   from an SMEM table, unconditional first chunk + fori,
                   sentinel for empties.  Expect ~production rate.
  flat-list      : ONE fori over a per-sub-block flat chunk-offset list in
                   SMEM — no window bookkeeping, no sentinels; offsets still
                   dynamic.  The candidate kernel restructure.
  flat-fused     : flat-list + one (4, WCOL) dynamic load per chunk with
                   static row extracts, instead of 3 separate field loads.
  static-fused   : fused load at STATIC offsets (upper bound; = anchor_rate
                   body but with the fused load).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/micro_window.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbf_sph_tpu.core.constants import DEFAULT_CONSTANTS as K
from pbf_sph_tpu.ops.kernels import poly6_factor, spiky_kernel_factor

SUB = 64
WCOL = 128
NSUB = 16
H = 0.1
SMAX = 8448  # production smax at the 1M grid (88^3)

p6f = np.float32(poly6_factor(H))
skf = np.float32(spiky_kernel_factor(H))
hh = np.float32(H * H)
hf = np.float32(H)
eps2 = np.float32(K.EPSILON) ** 2


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(fn, reps=5, label=""):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn()
    out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:44s}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def marginal(build, n_lo, n_hi, chunks_per_blockrow, label=""):
    t_lo = timed(build(n_lo), label=f"{label} nblocks={n_lo}")
    t_hi = timed(build(n_hi), label=f"{label} nblocks={n_hi}")
    nchunks = (n_hi - n_lo) * NSUB * chunks_per_blockrow
    dt = max(t_hi - t_lo, 1e-9)
    slots = nchunks * SUB * WCOL
    print(f"  {label:44s}: marginal {dt/nchunks*1e9:7.1f} ns/chunk "
          f"-> {slots/dt/1e9:6.1f} G pair-slots/s", flush=True)
    return dt / nchunks


def lam_math(ax, ay, az, bx, by, bz, carry):
    p6s, gx, gy, gz = carry
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


def epilogue(rows_ref, o_ref, t, carry):
    p6s = jnp.sum(carry[0], axis=1, keepdims=True)
    gx = jnp.sum(carry[1], axis=1, keepdims=True)
    gy = jnp.sum(carry[2], axis=1, keepdims=True)
    gz = jnp.sum(carry[3], axis=1, keepdims=True)
    mass = rows_ref[3, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
    memberf = rows_ref[4, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
    rho = mass * (p6s * p6f) * memberf
    rr = np.float32(K.RHO_RECIP)
    c = skf * rr * memberf
    norm2 = (gx * c) ** 2 + (gy * c) ** 2 + (gz * c) ** 2
    ci = rho * rr - 1.0
    lam = -ci / (norm2 + np.float32(K.CFM_EPSILON))
    o_ref[0, pl.ds(t * SUB, SUB)] = lam.reshape(SUB)


# Window scenario matching the 1M census: per sub-block, 9 windows; windows
# 0..4 have real chunk counts [2,2,2,2,2] at distinct offsets, 4 empty (->
# sentinel at SMAX), plus the 5 unconditional first chunks of the real
# windows are part of their counts: total real chunks = 10, sentinels = 4,
# census-equivalent 14/sub-block (production census: 14.59).
REAL_WINS = 5
CH_PER_WIN = 2
CHUNKS_CENSUS = REAL_WINS * CH_PER_WIN + (9 - REAL_WINS)  # 14


def make_wins_table():
    """Production wins layout: flat [t*18 + 2*s + {lo,hi}] (one shared row —
    the SMEM budget holds ~1MB, so the micro tools reuse one block row)."""
    wins = np.zeros((1, 1, (NSUB + 1) * 18), np.int32)
    for t in range(NSUB):
        for s in range(9):
            if s < REAL_WINS:
                lo = (s * 7 + t) % 40 * WCOL
                hi = lo + CH_PER_WIN * WCOL - 13  # ragged hi, as in production
            else:
                lo = hi = SMAX
            wins[:, 0, t * 18 + 2 * s] = lo
            wins[:, 0, t * 18 + 2 * s + 1] = hi
    return jnp.asarray(wins)


def build_prod_structure(nblocks):
    wins = make_wins_table()
    rows = jnp.ones((5, NSUB * SUB), jnp.float32) * 0.05
    strip = jnp.ones((4, SMAX + WCOL), jnp.float32) * 0.055

    def kernel(wins_ref, rows_ref, strip_ref, o_ref):
        def block(b, _):
            for t in range(NSUB):
                ax = rows_ref[0, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                ay = rows_ref[1, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                az = rows_ref[2, pl.ds(t * SUB, SUB)].reshape(SUB, 1)

                def chunk(o, carry):
                    bx = strip_ref[0, pl.ds(o, WCOL)].reshape(1, WCOL)
                    by = strip_ref[1, pl.ds(o, WCOL)].reshape(1, WCOL)
                    bz = strip_ref[2, pl.ds(o, WCOL)].reshape(1, WCOL)
                    return lam_math(ax, ay, az, bx, by, bz, carry)

                zero = jnp.zeros((SUB, WCOL), jnp.float32)
                carry = (zero, zero, zero, zero)
                for s in range(9):
                    lo = wins_ref[0, 0, t * 18 + 2 * s]
                    hi = wins_ref[0, 0, t * 18 + 2 * s + 1]
                    c0 = lo // WCOL
                    nchunk = jnp.where(hi > lo, pl.cdiv(hi - c0 * WCOL, WCOL), 0)

                    def chunk_body(wi, carry):
                        o = pl.multiple_of(
                            jnp.minimum((c0 + wi) * WCOL, SMAX), WCOL)
                        return chunk(o, carry)

                    carry = chunk_body(0, carry)
                    carry = jax.lax.fori_loop(1, nchunk, chunk_body, carry)
                epilogue(rows_ref, o_ref, t, carry)
            return 0

        jax.lax.fori_loop(0, nblocks, block, 0)

    g = jax.jit(lambda w, r, s: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, NSUB * SUB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, r, s))
    return lambda: g(wins, rows, strip)


def build_guarded(nblocks):
    """prod-structure minus the unconditional first chunk: every window runs
    a plain fori(0, nchunk) — empty windows pay only the fori setup."""
    wins = make_wins_table()
    rows = jnp.ones((5, NSUB * SUB), jnp.float32) * 0.05
    strip = jnp.ones((4, SMAX + WCOL), jnp.float32) * 0.055

    def kernel(wins_ref, rows_ref, strip_ref, o_ref):
        def block(b, _):
            for t in range(NSUB):
                ax = rows_ref[0, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                ay = rows_ref[1, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                az = rows_ref[2, pl.ds(t * SUB, SUB)].reshape(SUB, 1)

                def chunk(o, carry):
                    bx = strip_ref[0, pl.ds(o, WCOL)].reshape(1, WCOL)
                    by = strip_ref[1, pl.ds(o, WCOL)].reshape(1, WCOL)
                    bz = strip_ref[2, pl.ds(o, WCOL)].reshape(1, WCOL)
                    return lam_math(ax, ay, az, bx, by, bz, carry)

                zero = jnp.zeros((SUB, WCOL), jnp.float32)
                carry = (zero, zero, zero, zero)
                for s in range(9):
                    lo = wins_ref[0, 0, t * 18 + 2 * s]
                    hi = wins_ref[0, 0, t * 18 + 2 * s + 1]
                    c0 = lo // WCOL
                    nchunk = jnp.where(hi > lo, pl.cdiv(hi - c0 * WCOL, WCOL), 0)

                    def chunk_body(wi, carry):
                        o = pl.multiple_of(
                            jnp.minimum((c0 + wi) * WCOL, SMAX), WCOL)
                        return chunk(o, carry)

                    carry = jax.lax.fori_loop(0, nchunk, chunk_body, carry)
                epilogue(rows_ref, o_ref, t, carry)
            return 0

        jax.lax.fori_loop(0, nblocks, block, 0)

    g = jax.jit(lambda w, r, s: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, NSUB * SUB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, r, s))
    return lambda: g(wins, rows, strip)


MAXC = 16  # flat-list capacity per sub-block


def make_flat_table():
    """Flat chunk-offset list: [t*(MAXC+1)] = count, then offsets."""
    tbl = np.zeros((1, 1, NSUB * (MAXC + 1)), np.int32)
    for t in range(NSUB):
        offs = []
        for s in range(REAL_WINS):
            lo = (s * 7 + t) % 40 * WCOL
            for k in range(CH_PER_WIN):
                offs.append(lo + k * WCOL)
        tbl[:, 0, t * (MAXC + 1)] = len(offs)
        for i, o in enumerate(offs):
            tbl[:, 0, t * (MAXC + 1) + 1 + i] = o
    return jnp.asarray(tbl)


def build_flat(nblocks, fused):
    tbl = make_flat_table()
    rows = jnp.ones((5, NSUB * SUB), jnp.float32) * 0.05
    strip = jnp.ones((4, SMAX + WCOL), jnp.float32) * 0.055

    def kernel(tbl_ref, rows_ref, strip_ref, o_ref):
        def block(b, _):
            for t in range(NSUB):
                ax = rows_ref[0, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                ay = rows_ref[1, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                az = rows_ref[2, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                cnt = tbl_ref[0, 0, t * (MAXC + 1)]

                def chunk_body(i, carry):
                    o = pl.multiple_of(
                        tbl_ref[0, 0, t * (MAXC + 1) + 1 + i], WCOL)
                    if fused:
                        tile = strip_ref[:, pl.ds(o, WCOL)]  # (4, WCOL)
                        bx = tile[0:1, :]
                        by = tile[1:2, :]
                        bz = tile[2:3, :]
                    else:
                        bx = strip_ref[0, pl.ds(o, WCOL)].reshape(1, WCOL)
                        by = strip_ref[1, pl.ds(o, WCOL)].reshape(1, WCOL)
                        bz = strip_ref[2, pl.ds(o, WCOL)].reshape(1, WCOL)
                    return lam_math(ax, ay, az, bx, by, bz, carry)

                zero = jnp.zeros((SUB, WCOL), jnp.float32)
                carry = jax.lax.fori_loop(
                    0, cnt, chunk_body, (zero, zero, zero, zero))
                epilogue(rows_ref, o_ref, t, carry)
            return 0

        jax.lax.fori_loop(0, nblocks, block, 0)

    g = jax.jit(lambda w, r, s: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, NSUB * SUB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, r, s))
    return lambda: g(tbl, rows, strip)


def build_static_fused(nblocks):
    rows = jnp.ones((5, NSUB * SUB), jnp.float32) * 0.05
    strip = jnp.ones((4, SMAX + WCOL), jnp.float32) * 0.055
    NCH = REAL_WINS * CH_PER_WIN

    def kernel(rows_ref, strip_ref, o_ref):
        def block(b, _):
            for t in range(NSUB):
                ax = rows_ref[0, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                ay = rows_ref[1, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                az = rows_ref[2, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                zero = jnp.zeros((SUB, WCOL), jnp.float32)
                carry = (zero, zero, zero, zero)
                for i in range(NCH):
                    o = pl.multiple_of(((i * 7 + t) % 40) * WCOL, WCOL)
                    tile = strip_ref[:, pl.ds(o, WCOL)]
                    carry = lam_math(ax, ay, az, tile[0:1, :], tile[1:2, :],
                                     tile[2:3, :], carry)
                epilogue(rows_ref, o_ref, t, carry)
            return 0

        jax.lax.fori_loop(0, nblocks, block, 0)

    g = jax.jit(lambda r, s: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, NSUB * SUB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(rows, strip))
    return lambda: g(rows, strip)


def main():
    print(f"devices: {jax.devices()}")
    print(f"scenario: {REAL_WINS} real windows x {CH_PER_WIN} chunks + "
          f"{9-REAL_WINS} sentinels = {CHUNKS_CENSUS} chunks/sub-block "
          f"(production census: 14.59)")
    # census chunks include sentinels for prod-structure; flat pays only 10
    t_prod = marginal(build_prod_structure, 256, 1024, CHUNKS_CENSUS,
                      label="prod-structure (9 windows, sentinel)")
    t_grd = marginal(build_guarded, 256, 1024, REAL_WINS * CH_PER_WIN,
                     label="guarded-fori (no sentinel)")
    t_flat = marginal(lambda n: build_flat(n, False), 256, 1024,
                      REAL_WINS * CH_PER_WIN, label="flat-list (dyn offsets)")
    t_fuse = marginal(lambda n: build_flat(n, True), 256, 1024,
                      REAL_WINS * CH_PER_WIN, label="flat-fused ((4,128) load)")
    t_stat = marginal(build_static_fused, 256, 1024, REAL_WINS * CH_PER_WIN,
                      label="static-fused (upper bound)")
    print("\nper-SUB-BLOCK time (the production unit of work):")
    for name, t, ch in (("prod-structure", t_prod, CHUNKS_CENSUS),
                        ("guarded-fori", t_grd, 10),
                        ("flat-list", t_flat, 10), ("flat-fused", t_fuse, 10),
                        ("static-fused", t_stat, 10)):
        print(f"  {name:20s}: {t*ch*1e9:7.0f} ns/sub-block ({ch} chunks)")
    nsub_1m = 1007616 // SUB
    print(f"\nimplied lambda sweep at 1M ({nsub_1m} sub-blocks):")
    for name, t, ch in (("prod-structure", t_prod, 14.59),
                        ("guarded-fori", t_grd, 10.6),
                        ("flat-list", t_flat, 10.6),
                        ("flat-fused", t_fuse, 10.6)):
        print(f"  {name:20s}: {t*ch*nsub_1m*1e3:6.1f} ms "
              f"(production measured 25.3)")


if __name__ == "__main__":
    main()
