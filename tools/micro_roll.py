#!/usr/bin/env python
"""Cost of the compaction kernel's building blocks on real TPU.

 a) dynamic-shift pltpu.roll throughput (independent streams)
 b) static-shift roll throughput
 c) full compact part body (loads+rolls+select+RMW) static x16 per iteration
 d) same but wrapped in fori(16)
 e) nested fori(9) x fori(2) with the part body  (round-1 v2 structure)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128
N = 8192


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


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
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM if i in smem_idx else pltpu.VMEM))
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*a))
    return timed(f, *inputs)


def main():
    x = jnp.arange(8 * W, dtype=jnp.float32).reshape(8, W)
    sh = jnp.arange(64, dtype=jnp.int32) % 127 + 1

    # a) dynamic roll, 8 independent streams
    def k_dyn(x_ref, s_ref, o_ref):
        xs = [x_ref[i:i+1, :] for i in range(8)]
        def body(i, c):
            s = s_ref[jax.lax.rem(i, 64)]
            return tuple(pltpu.roll(ci, s, 1) + 0.0 for ci in c)
        c = jax.lax.fori_loop(0, N, body, tuple(xs))
        acc = c[0]
        for ci in c[1:]:
            acc = acc + ci
        o_ref[:] = jnp.broadcast_to(acc, (8, W))
    dt = run(k_dyn, (8, W), x, sh, smem_idx=(1,))
    print(f"a) dynamic roll x8/iter: {dt/N*1e9:8.1f} ns/iter -> {dt/N/8*1e9:6.1f} ns/roll")

    # b) static roll
    def k_sta(x_ref, o_ref):
        xs = [x_ref[i:i+1, :] for i in range(8)]
        def body(i, c):
            return tuple(pltpu.roll(ci, 37, 1) + 0.0 for ci in c)
        c = jax.lax.fori_loop(0, N, body, tuple(xs))
        acc = c[0]
        for ci in c[1:]:
            acc = acc + ci
        o_ref[:] = jnp.broadcast_to(acc, (8, W))
    dt = run(k_sta, (8, W), x)
    print(f"b) static  roll x8/iter: {dt/N*1e9:8.1f} ns/iter -> {dt/N/8*1e9:6.1f} ns/roll")

    # c/d/e) compact part body against scratch
    SM = 4096
    NPART = 16
    strips = jnp.arange(4 * SM, dtype=jnp.float32).reshape(4, SM)
    meta = jnp.stack([
        (jnp.arange(NPART, dtype=jnp.int32) * 517) % (SM - 256),   # s0
        (jnp.arange(NPART, dtype=jnp.int32) * 97) % 384,           # dst
        jnp.full((NPART,), 90, jnp.int32),                          # len
    ], 1)

    def part_body(strips_ref, meta_ref, out_ref, p, c_hint=None):
        s0 = meta_ref[p, 0]
        dst = meta_ref[p, 1]
        ln = meta_ref[p, 2]
        c = dst // W
        r = jax.lax.rem(s0, W)
        ba = pl.multiple_of(s0 - r, W)
        shv = jax.lax.rem(W - r, W)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        dcol = c * W + lane
        valid = (dcol >= dst) & (dcol < dst + ln)
        sel = lane < (W - r)
        for f in range(4):
            A = strips_ref[f, pl.ds(ba, W)].reshape(1, W)
            bb = pl.multiple_of(jnp.minimum(ba + W, SM - W), W)
            B = strips_ref[f, pl.ds(bb, W)].reshape(1, W)
            rolled = jnp.where(sel, pltpu.roll(A, shv, 1), pltpu.roll(B, shv, 1))
            cur = out_ref[f, pl.ds(c * W, W)].reshape(1, W)
            out_ref[f, pl.ds(c * W, W)] = jnp.where(valid, rolled, cur).reshape(W)

    REP = 512

    def k_static(strips_ref, meta_ref, o_ref):
        def rep(i, carry):
            for p in range(NPART):
                part_body(strips_ref, meta_ref, o_ref, p)
            return carry + 1
        jax.lax.fori_loop(0, REP, rep, 0)
    dt = run(k_static, (4, 512), strips, meta, smem_idx=(1,))
    print(f"c) static x{NPART} parts (F=4): {dt/REP*1e9:8.0f} ns/subblock -> {dt/REP/NPART*1e9:6.1f} ns/part")

    def k_fori(strips_ref, meta_ref, o_ref):
        def rep(i, carry):
            def pb(p, c2):
                part_body(strips_ref, meta_ref, o_ref, p)
                return c2
            jax.lax.fori_loop(0, NPART, pb, 0)
            return carry + 1
        jax.lax.fori_loop(0, REP, rep, 0)
    dt = run(k_fori, (4, 512), strips, meta, smem_idx=(1,))
    print(f"d) fori   x{NPART} parts (F=4): {dt/REP*1e9:8.0f} ns/subblock -> {dt/REP/NPART*1e9:6.1f} ns/part")

    # e) nested fori(9 intervals) x fori(nch<=2)
    def k_nested(strips_ref, meta_ref, o_ref):
        def rep(i, carry):
            def iv(iv_i, c2):
                def pb(ci, c3):
                    part_body(strips_ref, meta_ref, o_ref,
                              jax.lax.rem(iv_i + ci, NPART))
                    return c3
                jax.lax.fori_loop(0, 2, pb, 0)
                return c2
            jax.lax.fori_loop(0, 9, iv, 0)
            return carry + 1
        jax.lax.fori_loop(0, REP, rep, 0)
    dt = run(k_nested, (4, 512), strips, meta, smem_idx=(1,))
    print(f"e) nested fori 9x2 parts:  {dt/REP*1e9:8.0f} ns/subblock ({dt/REP/18*1e9:5.1f} ns/part)")

    # f) planned dense-lambda inner: 4 static chunks of (32,128) math
    SUBR = 32
    rows = jnp.ones((SUBR, 8), jnp.float32) * 0.03
    cands = jnp.ones((4, 512), jnp.float32) * 0.05

    def k_lam(rows_ref, cands_ref, o_ref):
        hh = np.float32(0.01); hf = np.float32(0.1); e2 = np.float32(1e-16)
        def rep(i, acc):
            ax = rows_ref[:, 0:1]
            ay = rows_ref[:, 1:2]
            az = rows_ref[:, 2:3]
            p6s = jnp.zeros((SUBR, W), jnp.float32)
            gx = p6s; gy = p6s; gz = p6s
            for c in range(4):
                bx = cands_ref[0, pl.ds(c * W, W)].reshape(1, W)
                by = cands_ref[1, pl.ds(c * W, W)].reshape(1, W)
                bz = cands_ref[2, pl.ds(c * W, W)].reshape(1, W)
                dx = ax - bx; dy = ay - by; dz = az - bz
                r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, e2)
                u = jax.lax.rsqrt(r2)
                tt = jnp.maximum(hh - r2, 0.0)
                p6s = p6s + tt * tt * tt
                t2 = jnp.maximum(hf - r2 * u, 0.0)
                sg = t2 * t2 * u
                gx = gx + dx * sg; gy = gy + dy * sg; gz = gz + dz * sg
            v = (jnp.sum(p6s, 1, keepdims=True) + jnp.sum(gx, 1, keepdims=True)
                 + jnp.sum(gy, 1, keepdims=True) + jnp.sum(gz, 1, keepdims=True))
            return acc + v
        o_ref[:] = jax.lax.fori_loop(0, REP, rep, jnp.zeros((SUBR, 1), jnp.float32))
    dt = run(k_lam, (SUBR, 1), rows, cands)
    print(f"f) dense lambda 4 chunks:  {dt/REP*1e9:8.0f} ns/subblock")


if __name__ == "__main__":
    main()
