#!/usr/bin/env python
"""Dense-lambda inner-loop variants on real TPU: find where the 92
cycles/chunk go (bench_phases: lambda v2 = 61.8 ms at 630k chunks).

One grid-step's worth of work per pallas call, repeated REP times inside the
kernel: NSUB=32 sub-blocks, rows (NSUB, 32, 8), cands (3, NSUB*WCAP) resident
in VMEM.  Variants:
  a) production structure: per-sub-block fori with DYNAMIC trip (SMEM)
  b) static-trip fori (NCH constant)
  c) fully unrolled python loop
  d) MXU r2: dot((32,8),(8,128)) per chunk + reduce-dot per sub-block
  e) dynamic fori, 2 chunks per iteration
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128
SUB = 32
NSUB = 32
NCH = 20               # chunks per sub-block
WCAP = NCH * W
REP = 64

hh = np.float32(0.01)
hf = np.float32(0.1)
eps2 = np.float32(1e-16)


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timed(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)
    out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def run(kernel_fn, out_shape, *inputs, smem_idx=()):
    in_specs = []
    for i, x in enumerate(inputs):
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM if i in smem_idx else pltpu.VMEM)
        )
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*a))
    return timed(f, *inputs)


def chunk_math(ax, ay, az, bx, by, bz, carry):
    p6s, gx, gy, gz = carry
    dx = ax - bx
    dy = ay - by
    dz = az - bz
    r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, eps2)
    u = jax.lax.rsqrt(r2)
    tt = jnp.maximum(hh - r2, 0.0)
    p6 = tt * tt * tt
    t2 = jnp.maximum(hf - r2 * u, 0.0)
    sg = t2 * t2 * u
    return (p6s + p6, gx + dx * sg, gy + dy * sg, gz + dz * sg)


def report(label, dt):
    nchunks = REP * NSUB * NCH
    ns = dt / nchunks * 1e9
    cyc = ns * 0.94
    print(f"{label}: {dt*1e3/REP:7.3f} ms/gridstep-eq  {ns:6.1f} ns/chunk "
          f"(~{cyc:5.0f} cyc)  [{NSUB*NCH*W*SUB*REP/dt/1e9:6.1f} Gpair/s]")


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.uniform(0, 1, (NSUB, SUB, 8)).astype(np.float32))
    cands = jnp.asarray(rng.uniform(0, 1, (3, NSUB * WCAP)).astype(np.float32))
    nchunk = jnp.full((1, NSUB), NCH, jnp.int32)

    def finish(out, t, carry):
        p6s, gx, gy, gz = carry
        out[t, :, 0:1] = jnp.sum(p6s, axis=1, keepdims=True)
        out[t, :, 1:2] = jnp.sum(gx, axis=1, keepdims=True)
        out[t, :, 2:3] = jnp.sum(gy, axis=1, keepdims=True)
        out[t, :, 3:4] = jnp.sum(gz, axis=1, keepdims=True)

    # a) production: dynamic-trip fori
    def k_dyn(nch_ref, rows_ref, cands_ref, out_ref):
        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]

                def chunk(c, carry):
                    o = pl.multiple_of(t * WCAP + c * W, W)
                    bx = cands_ref[0, pl.ds(o, W)].reshape(1, W)
                    by = cands_ref[1, pl.ds(o, W)].reshape(1, W)
                    bz = cands_ref[2, pl.ds(o, W)].reshape(1, W)
                    return chunk_math(ax, ay, az, bx, by, bz, carry)

                zero = jnp.zeros((SUB, W), jnp.float32)
                carry = jax.lax.fori_loop(0, nch_ref[0, t], chunk,
                                          (zero, zero, zero, zero))
                finish(out_ref, t, carry)
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    dt = run(k_dyn, (NSUB, SUB, 4), nchunk, rows, cands, smem_idx=(0,))
    report("a) dynamic fori      ", dt)

    # b) static-trip fori
    def k_sta(rows_ref, cands_ref, out_ref):
        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]

                def chunk(c, carry):
                    o = pl.multiple_of(t * WCAP + c * W, W)
                    bx = cands_ref[0, pl.ds(o, W)].reshape(1, W)
                    by = cands_ref[1, pl.ds(o, W)].reshape(1, W)
                    bz = cands_ref[2, pl.ds(o, W)].reshape(1, W)
                    return chunk_math(ax, ay, az, bx, by, bz, carry)

                zero = jnp.zeros((SUB, W), jnp.float32)
                carry = jax.lax.fori_loop(0, NCH, chunk, (zero, zero, zero, zero))
                finish(out_ref, t, carry)
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    dt = run(k_sta, (NSUB, SUB, 4), rows, cands)
    report("b) static fori       ", dt)

    # c) fully unrolled chunks
    def k_unr(rows_ref, cands_ref, out_ref):
        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]
                zero = jnp.zeros((SUB, W), jnp.float32)
                carry = (zero, zero, zero, zero)
                for c in range(NCH):
                    o = t * WCAP + c * W
                    bx = cands_ref[0, pl.ds(o, W)].reshape(1, W)
                    by = cands_ref[1, pl.ds(o, W)].reshape(1, W)
                    bz = cands_ref[2, pl.ds(o, W)].reshape(1, W)
                    carry = chunk_math(ax, ay, az, bx, by, bz, carry)
                finish(out_ref, t, carry)
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    dt = run(k_unr, (NSUB, SUB, 4), rows, cands)
    report("c) unrolled          ", dt)

    # d) MXU r2 + reduce-dot.  B2 slab precomputed: (8, NSUB*WCAP) with rows
    # [-2bx, -2by, -2bz, b2, 1, bx, by, bz]; A2 per sub-block (SUB, 8) =
    # [ax, ay, az, 1, a2, 0, 0, 0].  r2 = A2 @ B2[0:5].  After the VPU
    # middle (u, p6, sg), accumulate p6 rowsum on VPU and reduce sg against
    # [1; bx; by; bz] with one NT dot per sub-block.
    b2s = jnp.concatenate([
        -2.0 * cands,
        jnp.sum(cands * cands, axis=0, keepdims=True),
        jnp.ones((1, NSUB * WCAP), jnp.float32),
        cands,
    ])  # (8, NSUB*WCAP)

    def k_mxu(rows_ref, b2_ref, out_ref, sg_scr):
        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]
                a2 = ax * ax + ay * ay + az * az
                one = jnp.ones((SUB, 1), jnp.float32)
                A2 = jnp.concatenate([ax, ay, az, a2, one], axis=1)  # (SUB,5)
                p6s = jnp.zeros((SUB, W), jnp.float32)
                for c in range(NCH):
                    o = t * WCAP + c * W
                    B2 = b2_ref[0:5, pl.ds(o, W)]                    # (5,W)
                    r2 = jnp.maximum(
                        jax.lax.dot_general(
                            A2, B2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
                        eps2)
                    u = jax.lax.rsqrt(r2)
                    tt = jnp.maximum(hh - r2, 0.0)
                    p6s = p6s + tt * tt * tt
                    t2 = jnp.maximum(hf - r2 * u, 0.0)
                    sg_scr[:, pl.ds(c * W, W)] = t2 * t2 * u
                # reduce: [sum sg; sum bx*sg; ...] = sg (SUB,WCAP) @ B4t
                B4 = b2_ref[4:8, pl.ds(t * WCAP, WCAP)]              # (4,WCAP)
                red = jax.lax.dot_general(
                    sg_scr[...], B4, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (SUB,4)
                gsum = red[:, 0:1]
                out_ref[t, :, 0:1] = jnp.sum(p6s, axis=1, keepdims=True)
                out_ref[t, :, 1:2] = ax * gsum - red[:, 1:2]
                out_ref[t, :, 2:3] = ay * gsum - red[:, 2:3]
                out_ref[t, :, 3:4] = az * gsum - red[:, 3:4]
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    f = jax.jit(lambda *a: pl.pallas_call(
        k_mxu,
        out_shape=jax.ShapeDtypeStruct((NSUB, SUB, 4), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUB, WCAP), jnp.float32)],
    )(*a))
    dt = timed(f, rows, b2s)
    report("d) MXU r2+reduce     ", dt)

    # e) dynamic fori, 2 chunks/iter
    def k_dyn2(nch_ref, rows_ref, cands_ref, out_ref):
        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]

                def chunk(c, carry):
                    for q in range(2):
                        o = pl.multiple_of(t * WCAP + (2 * c + q) * W, W)
                        bx = cands_ref[0, pl.ds(o, W)].reshape(1, W)
                        by = cands_ref[1, pl.ds(o, W)].reshape(1, W)
                        bz = cands_ref[2, pl.ds(o, W)].reshape(1, W)
                        carry = chunk_math(ax, ay, az, bx, by, bz, carry)
                    return carry

                zero = jnp.zeros((SUB, W), jnp.float32)
                carry = jax.lax.fori_loop(0, nch_ref[0, t] // 2, chunk,
                                          (zero, zero, zero, zero))
                finish(out_ref, t, carry)
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    dt = run(k_dyn2, (NSUB, SUB, 4), nchunk, rows, cands, smem_idx=(0,))
    report("e) dynamic fori x2   ", dt)

    # f) WIDE chunks: 512 lanes per fori iteration (dynamic trip)
    WIDE = 512

    def k_wide(nch_ref, rows_ref, cands_ref, out_ref):
        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]

                def chunk(c, carry):
                    o = pl.multiple_of(t * WCAP + c * WIDE, W)
                    bx = cands_ref[0, pl.ds(o, WIDE)].reshape(1, WIDE)
                    by = cands_ref[1, pl.ds(o, WIDE)].reshape(1, WIDE)
                    bz = cands_ref[2, pl.ds(o, WIDE)].reshape(1, WIDE)
                    return chunk_math(ax, ay, az, bx, by, bz, carry)

                zero = jnp.zeros((SUB, WIDE), jnp.float32)
                carry = jax.lax.fori_loop(0, nch_ref[0, t] * W // WIDE, chunk,
                                          (zero, zero, zero, zero))
                finish(out_ref, t, carry)
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    dt = run(k_wide, (NSUB, SUB, 4), nchunk, rows, cands, smem_idx=(0,))
    report("f) dynamic wide-512  ", dt)

    # g) wide-512 + MXU r2 + reduce-dot
    b2s = jnp.concatenate([
        -2.0 * cands,
        jnp.sum(cands * cands, axis=0, keepdims=True),
        jnp.ones((1, NSUB * WCAP), jnp.float32),
        cands,
    ])

    def k_wmxu(rows_ref, b2_ref, out_ref, sg_scr):
        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]
                a2 = ax * ax + ay * ay + az * az
                one = jnp.ones((SUB, 1), jnp.float32)
                A2 = jnp.concatenate([ax, ay, az, a2, one], axis=1)
                p6s = jnp.zeros((SUB, WIDE), jnp.float32)
                for c in range(WCAP // WIDE):
                    o = t * WCAP + c * WIDE
                    B2 = b2_ref[0:5, pl.ds(o, WIDE)]
                    r2 = jnp.maximum(
                        jax.lax.dot_general(
                            A2, B2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
                        eps2)
                    u = jax.lax.rsqrt(r2)
                    tt = jnp.maximum(hh - r2, 0.0)
                    p6s = p6s + tt * tt * tt
                    t2 = jnp.maximum(hf - r2 * u, 0.0)
                    sg_scr[:, pl.ds(c * WIDE, WIDE)] = t2 * t2 * u
                B4 = b2_ref[4:8, pl.ds(t * WCAP, WCAP)]
                red = jax.lax.dot_general(
                    sg_scr[...], B4, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                gsum = red[:, 0:1]
                out_ref[t, :, 0:1] = jnp.sum(p6s, axis=1, keepdims=True)
                out_ref[t, :, 1:2] = ax * gsum - red[:, 1:2]
                out_ref[t, :, 2:3] = ay * gsum - red[:, 2:3]
                out_ref[t, :, 3:4] = az * gsum - red[:, 3:4]
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    f = jax.jit(lambda *a: pl.pallas_call(
        k_wmxu,
        out_shape=jax.ShapeDtypeStruct((NSUB, SUB, 4), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUB, WCAP), jnp.float32)],
    )(*a))
    dt = timed(f, rows, b2s)
    report("g) wide-512 MXU      ", dt)

    # h) full-slab single shot: (32, WCAP) ops, no chunk loop at all
    def k_slab(rows_ref, cands_ref, out_ref):
        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]
                o = t * WCAP
                bx = cands_ref[0, pl.ds(o, WCAP)].reshape(1, WCAP)
                by = cands_ref[1, pl.ds(o, WCAP)].reshape(1, WCAP)
                bz = cands_ref[2, pl.ds(o, WCAP)].reshape(1, WCAP)
                zero = jnp.zeros((SUB, WCAP), jnp.float32)
                carry = chunk_math(ax, ay, az, bx, by, bz, (zero, zero, zero, zero))
                finish(out_ref, t, carry)
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    dt = run(k_slab, (NSUB, SUB, 4), rows, cands)
    report("h) full-slab one shot", dt)

    # i) TWO sub-blocks interleaved per fori iteration: independent dependency
    # chains double the ILP the scheduler can exploit
    def k_il2(nch_ref, rows_ref, cands_ref, out_ref):
        def step(r, c0):
            for t in range(0, NSUB, 2):
                axs, ays, azs = [], [], []
                for q in range(2):
                    axs.append(rows_ref[t + q, :, 0:1])
                    ays.append(rows_ref[t + q, :, 1:2])
                    azs.append(rows_ref[t + q, :, 2:3])

                def chunk(c, carry):
                    ca, cb = carry
                    outc = []
                    for q, cq in enumerate((ca, cb)):
                        o = pl.multiple_of((t + q) * WCAP + c * W, W)
                        bx = cands_ref[0, pl.ds(o, W)].reshape(1, W)
                        by = cands_ref[1, pl.ds(o, W)].reshape(1, W)
                        bz = cands_ref[2, pl.ds(o, W)].reshape(1, W)
                        outc.append(chunk_math(axs[q], ays[q], azs[q], bx, by, bz, cq))
                    return tuple(outc)

                zero = jnp.zeros((SUB, W), jnp.float32)
                z4 = (zero, zero, zero, zero)
                carry = jax.lax.fori_loop(0, nch_ref[0, t], chunk, (z4, z4))
                finish(out_ref, t, carry[0])
                finish(out_ref, t + 1, carry[1])
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    dt = run(k_il2, (NSUB, SUB, 4), nchunk, rows, cands, smem_idx=(0,))
    report("i) interleave x2     ", dt)

    # j) interleave x2, unrolled x2 chunks (4 independent chunk bodies/iter)
    def k_il2u2(nch_ref, rows_ref, cands_ref, out_ref):
        def step(r, c0):
            for t in range(0, NSUB, 2):
                axs = [rows_ref[t + q, :, 0:1] for q in range(2)]
                ays = [rows_ref[t + q, :, 1:2] for q in range(2)]
                azs = [rows_ref[t + q, :, 2:3] for q in range(2)]

                def chunk(c, carry):
                    ca, cb = carry
                    news = []
                    for q, cq in enumerate((ca, cb)):
                        for u in range(2):
                            o = pl.multiple_of(
                                (t + q) * WCAP + (2 * c + u) * W, W)
                            bx = cands_ref[0, pl.ds(o, W)].reshape(1, W)
                            by = cands_ref[1, pl.ds(o, W)].reshape(1, W)
                            bz = cands_ref[2, pl.ds(o, W)].reshape(1, W)
                            cq = chunk_math(axs[q], ays[q], azs[q], bx, by, bz, cq)
                        news.append(cq)
                    return tuple(news)

                zero = jnp.zeros((SUB, W), jnp.float32)
                z4 = (zero, zero, zero, zero)
                carry = jax.lax.fori_loop(0, nch_ref[0, t] // 2, chunk, (z4, z4))
                finish(out_ref, t, carry[0])
                finish(out_ref, t + 1, carry[1])
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    dt = run(k_il2u2, (NSUB, SUB, 4), nchunk, rows, cands, smem_idx=(0,))
    report("j) interleave2 unrol2", dt)

    # k) candidates in manually-DMA'd SCRATCH (v1's structure) + unrolled —
    # isolates pipelined-input-block loads vs scratch loads
    def k_scr(rows_ref, cands_any, out_ref, cbuf, sem):
        pltpu.make_async_copy(cands_any, cbuf, sem).start()
        pltpu.make_async_copy(cands_any, cbuf, sem).wait()

        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]
                zero = jnp.zeros((SUB, W), jnp.float32)
                carry = (zero, zero, zero, zero)
                for c in range(NCH):
                    o = t * WCAP + c * W
                    bx = cbuf[0, pl.ds(o, W)].reshape(1, W)
                    by = cbuf[1, pl.ds(o, W)].reshape(1, W)
                    bz = cbuf[2, pl.ds(o, W)].reshape(1, W)
                    carry = chunk_math(ax, ay, az, bx, by, bz, carry)
                finish(out_ref, t, carry)
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    f = jax.jit(lambda *a: pl.pallas_call(
        k_scr,
        out_shape=jax.ShapeDtypeStruct((NSUB, SUB, 4), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, NSUB * WCAP), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(*a))
    dt = timed(f, rows, cands)
    report("k) scratch cands unrl", dt)

    # l) v1-style full mask math (sqrt + where masks, ~40 ops) unrolled, from
    # the pipelined input block — calibrates v1's per-slot rate in this rig
    acl_rows = jnp.asarray(rng.uniform(0, 1000, (NSUB, SUB, 8)).astype(np.float32))

    def k_v1m(rows_ref, cands_ref, out_ref):
        eps = np.float32(1e-8)

        def step(r, c0):
            for t in range(NSUB):
                ax = rows_ref[t, :, 0:1]
                ay = rows_ref[t, :, 1:2]
                az = rows_ref[t, :, 2:3]
                acl = rows_ref[t, :, 3:4]
                zero = jnp.zeros((SUB, W), jnp.float32)
                p6s, gx, gy, gz = zero, zero, zero, zero
                for c in range(NCH):
                    o = t * WCAP + c * W
                    bx = cands_ref[0, pl.ds(o, W)].reshape(1, W)
                    by = cands_ref[1, pl.ds(o, W)].reshape(1, W)
                    bz = cands_ref[2, pl.ds(o, W)].reshape(1, W)
                    bcl = bx + by
                    m = jnp.abs(bcl - acl) <= 1.0
                    dx = ax - bx
                    dy = ay - by
                    dz = az - bz
                    r2 = dx * dx + dy * dy + dz * dz
                    p6 = jnp.where(m & (r2 <= hh), (hh - r2) ** 3, 0.0)
                    rr_ = jnp.sqrt(r2)
                    ok = m & (rr_ >= eps) & (rr_ <= hf)
                    rs = jnp.where(ok, rr_, 1.0)
                    sg = jnp.where(ok, (hf - rs) ** 2 / rs, 0.0)
                    p6s, gx, gy, gz = p6s + p6, gx + dx * sg, gy + dy * sg, gz + dz * sg
                finish(out_ref, t, (p6s, gx, gy, gz))
            return c0 + 1
        jax.lax.fori_loop(0, REP, step, 0)

    dt = run(k_v1m, (NSUB, SUB, 4), acl_rows, cands)
    report("l) v1-mask math unrl ", dt)


if __name__ == "__main__":
    main()
