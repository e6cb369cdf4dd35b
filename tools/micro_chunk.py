#!/usr/bin/env python
"""Measure achievable per-chunk cost for lambda-like pair math on the VPU.

Simulates the inner loop of the Pallas lambda phase over synthetic VMEM data
with large internal iteration counts (so tunnel dispatch noise is <1%), and
compares: (a) round-1 math (sqrt + div + separate masks), (b) optimized math
(rsqrt-form spiky, r2-space tests, fused masks), (c) optimized + 2-way
chunk interleave (ILP probe), (d) pure fma ceiling.

Run: python tools/micro_chunk.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 64
WCOL = 128
CHUNKS = 4096  # total chunks processed per kernel call


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


HH = np.float32(0.01)
HF = np.float32(0.1)
EPS = np.float32(1e-8)


def chunk_old(ax, ay, az, acl, bx, by, bz, bcl, off, lo, hi, o, carry):
    """Round-1 lambda chunk body (ops as in ops/pallas_pbf.py)."""
    p6s, gx, gy, gz = carry
    g = o + jax.lax.broadcasted_iota(jnp.int32, (1, WCOL), 1)
    m = (g >= lo) & (g < hi)
    m = m & (jnp.abs(bcl - (acl + off)) <= 1.0)
    dx = ax - bx
    dy = ay - by
    dz = az - bz
    r2 = dx * dx + dy * dy + dz * dz
    p6 = jnp.where(m & (r2 <= HH), (HH - r2) ** 3, 0.0)
    r = jnp.sqrt(r2)
    ok = m & (r >= EPS) & (r <= HF)
    rs = jnp.where(ok, r, 1.0)
    sg = jnp.where(ok, (HF - rs) ** 2 / rs, 0.0)
    return (p6s + p6, gx + dx * sg, gy + dy * sg, gz + dz * sg)


def chunk_new(ax, ay, az, acl, bx, by, bz, bcl, off, lo, hi, o, carry):
    """Optimized chunk body: r2-space tests, rsqrt spiky, fused masks."""
    p6s, gx, gy, gz = carry
    g = o + jax.lax.broadcasted_iota(jnp.int32, (1, WCOL), 1)
    win = (g >= lo) & (g < hi)
    adj = jnp.abs(bcl - (acl + off)) <= 1.0   # (SUB,WCOL) from (1,W)&(S,1)
    dx = ax - bx
    dy = ay - by
    dz = az - bz
    r2 = dx * dx + dy * dy + dz * dz
    q = win & adj & (r2 <= HH)
    t = jnp.where(q, HH - r2, 0.0)
    p6 = t * t * t
    ok = q & (r2 >= EPS * EPS)
    u = jax.lax.rsqrt(jnp.where(ok, r2, 1.0))
    # (h-r)^2/r = u*(h^2 + r2) - 2h  with u = 1/r
    sg = jnp.where(ok, u * (HF * HF + r2) - 2.0 * HF, 0.0)
    return (p6s + p6, gx + dx * sg, gy + dy * sg, gz + dz * sg)


def make_bench(body, interleave=1):
    def kernel(s_ref, rows_ref, out_ref):
        ax = rows_ref[0, :].reshape(SUB, 1)
        ay = rows_ref[1, :].reshape(SUB, 1)
        az = rows_ref[2, :].reshape(SUB, 1)
        acl = rows_ref[3, :].reshape(SUB, 1)
        off = np.float32(3.0)
        lo = 13
        hi = 1000000

        def loop(i, carrys):
            outs = []
            for k in range(interleave):
                carry = carrys[k]
                o = ((i * interleave + k) % 32) * WCOL
                bx = s_ref[0, pl.ds(o, WCOL)].reshape(1, WCOL)
                by = s_ref[1, pl.ds(o, WCOL)].reshape(1, WCOL)
                bz = s_ref[2, pl.ds(o, WCOL)].reshape(1, WCOL)
                bcl = s_ref[3, pl.ds(o, WCOL)].reshape(1, WCOL)
                outs.append(body(ax, ay, az, acl, bx, by, bz, bcl, off, lo, hi, o, carry))
            return tuple(outs)

        zero = jnp.zeros((SUB, WCOL), jnp.float32)
        carrys = tuple((zero, zero, zero, zero) for _ in range(interleave))
        carrys = jax.lax.fori_loop(0, CHUNKS // interleave, loop, carrys)
        acc = carrys[0][0] + carrys[0][1] + carrys[0][2] + carrys[0][3]
        for k in range(1, interleave):
            acc = acc + carrys[k][0] + carrys[k][1]
        out_ref[:] = acc

    s = jnp.ones((4, 32 * WCOL), jnp.float32) * 0.05
    rows = jnp.ones((4, SUB), jnp.float32) * 0.04
    f = jax.jit(lambda s, rows: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, WCOL), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, rows))
    return f, s, rows


def fma_ceiling(streams):
    N = 16384

    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(i, carry):
            return tuple(c * 1.000001 + x for c in carry)

        carry = tuple(x + float(s) for s in range(streams))
        carry = jax.lax.fori_loop(0, N, body, carry)
        acc = carry[0]
        for c in carry[1:]:
            acc = acc + c
        o_ref[:] = acc

    x = jnp.ones((SUB, WCOL), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, WCOL), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    dt = timed(f, x)
    nops = N * streams * (SUB // 8)  # (8,128) slots
    return dt, dt / (N * streams) * 1e9, nops / dt / 1e9


def main():
    print(f"devices: {jax.devices()}")
    print(f"== fma ceiling ((64,128) op = 8 slots) ==")
    for s in (1, 2, 4, 8):
        dt, ns_op, gsl = fma_ceiling(s)
        print(f"  streams={s}: {ns_op:7.2f} ns per (64,128) fma, {gsl:6.1f} G(8,128)slots/s")

    print(f"== lambda chunk bodies ({CHUNKS} chunks of (64,128)) ==")
    for name, body, il in (("old", chunk_old, 1), ("new", chunk_new, 1),
                           ("new x2", chunk_new, 2), ("new x4", chunk_new, 4),
                           ("old x2", chunk_old, 2)):
        f, s, rows = make_bench(body, il)
        dt = timed(f, s, rows)
        ns_chunk = dt / CHUNKS * 1e9
        print(f"  {name:7s}: {dt*1e3:7.2f} ms -> {ns_chunk:7.1f} ns/chunk "
              f"({ns_chunk/128/64*1e3:.2f} ps/pairslot)")


if __name__ == "__main__":
    main()
