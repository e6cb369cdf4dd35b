#!/usr/bin/env python
"""Microbenchmarks for the Pallas phase-kernel rewrite (round 2).

Questions answered on real hardware:
  1. VPU issue rate: how many independent (8,128)-f32 op streams per cycle?
  2. Per-op relative cost: fma / mul / cmp / where / rsqrt / sqrt / div.
  3. Is a dynamic (traced) lane-rotate available (pltpu.roll / lax rotate)?
  4. Are unaligned dynamic minor-dim VMEM slices allowed?
  5. Can MXU dots overlap VPU work inside one kernel?

Run: python tools/micro_vpu.py
"""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512          # rows per tile
C = 128
NITER = 2048     # fori iterations inside kernel


def sync(out):
    # axon tunnel: block_until_ready does not block; pull a value instead
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


_RTT = None


def tunnel_rtt():
    global _RTT
    if _RTT is None:
        x = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda x: x + 1)
        sync(f(x))
        t0 = time.perf_counter()
        for _ in range(5):
            sync(f(x))
        _RTT = (time.perf_counter() - t0) / 5
    return _RTT


def timed(fn, *args, reps=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)
    out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    return max(dt - tunnel_rtt() / reps, 1e-9)


def bench_streams(nstreams, op):
    """NITER serial iterations, each doing `nstreams` independent (R,C) ops."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(i, carry):
            outs = []
            for s in range(nstreams):
                c = carry[s]
                if op == "fma":
                    outs.append(c * 1.000001 + x)
                elif op == "mul":
                    outs.append(c * 1.000001)
                elif op == "cmp_where":
                    outs.append(jnp.where(c > x, c * 1.000001, x))
                elif op == "rsqrt":
                    outs.append(jax.lax.rsqrt(c))
                elif op == "sqrt":
                    outs.append(jnp.sqrt(c) + x)
                elif op == "div":
                    outs.append(x / c)
            return tuple(outs)

        carry = tuple(x + float(s) for s in range(nstreams))
        carry = jax.lax.fori_loop(0, NITER, body, carry)
        acc = carry[0]
        for s in range(1, nstreams):
            acc = acc + carry[s]
        o_ref[:] = acc

    x = jnp.ones((R, C), jnp.float32) * 1.0000001
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    dt = timed(f, x)
    total_ops = NITER * nstreams * (R // 8)  # number of (8,128) op-slots
    return dt, total_ops / dt / 1e9  # G-slots/s


def main():
    print(f"devices: {jax.devices()}")
    print(f"== VPU issue rate (G (8,128)-slots/s; R={R}, NITER={NITER}) ==")
    for op in ("fma", "mul", "cmp_where", "rsqrt", "sqrt", "div"):
        for ns in (1, 2, 4, 8):
            try:
                dt, rate = bench_streams(ns, op)
                print(f"  {op:10s} streams={ns}: {rate:8.1f} Gslots/s  ({dt*1e3:.2f} ms)")
            except Exception as e:
                print(f"  {op:10s} streams={ns}: FAIL {type(e).__name__}: {str(e)[:100]}")

    # 3. dynamic lane rotate
    print("== dynamic lane rotate ==")
    def rot_kernel(x_ref, s_ref, o_ref):
        sh = s_ref[0]
        o_ref[:] = pltpu.roll(x_ref[:], sh, 1)
    try:
        x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        s = jnp.array([5], jnp.int32)
        f = jax.jit(lambda x, s: pl.pallas_call(
            rot_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s))
        out = f(x, s)
        expect = np.roll(np.asarray(x), 5, 1)
        print(f"  pltpu.roll dynamic shift: OK, correct={np.array_equal(np.asarray(out), expect)}")
    except Exception as e:
        print(f"  pltpu.roll dynamic shift: FAIL {type(e).__name__}: {str(e)[:200]}")

    # 4. unaligned dynamic minor-dim load
    print("== unaligned dynamic minor-dim VMEM slice ==")
    def unal_kernel(x_ref, s_ref, o_ref):
        o = s_ref[0]
        o_ref[:] = x_ref[:, pl.ds(o, 128)]
    try:
        x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
        s = jnp.array([37], jnp.int32)
        f = jax.jit(lambda x, s: pl.pallas_call(
            unal_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s))
        out = f(x, s)
        expect = np.asarray(x)[:, 37:37 + 128]
        print(f"  unaligned load: OK, correct={np.array_equal(np.asarray(out), expect)}")
    except Exception as e:
        print(f"  unaligned load: FAIL {type(e).__name__}: {str(e)[:200]}")

    # 4b. unaligned dynamic minor-dim VMEM->VMEM DMA
    print("== unaligned VMEM->VMEM DMA ==")
    def dma_kernel(x_ref, s_ref, o_ref):
        def inner(scratch, sem):
            o = s_ref[0]
            cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(o, 128)], scratch, sem)
            cp.start()
            cp.wait()
            o_ref[:] = scratch[:]
        pl.run_scoped(inner, scratch=pltpu.VMEM((8, 128), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA(()))
    try:
        x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
        s = jnp.array([37], jnp.int32)
        f = jax.jit(lambda x, s: pl.pallas_call(
            dma_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s))
        out = f(x, s)
        expect = np.asarray(x)[:, 37:37 + 128]
        print(f"  unaligned DMA: OK, correct={np.array_equal(np.asarray(out), expect)}")
    except Exception as e:
        print(f"  unaligned DMA: FAIL {type(e).__name__}: {str(e)[:200]}")

    # 5. MXU dot inside kernel: (64,128)@(128,8) contracting lanes
    print("== MXU accumulation dot (64,128)x(4,128)^T ==")
    def dot_kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            d = jax.lax.dot_general(
                a_ref[:] * (1.0 + 1e-9 * i), b_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + d
        o_ref[:] = jax.lax.fori_loop(0, NITER, body, jnp.zeros((64, 8), jnp.float32))
    try:
        a = jnp.ones((64, 128), jnp.float32)
        b = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda a, b: pl.pallas_call(
            dot_kernel,
            out_shape=jax.ShapeDtypeStruct((64, 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b))
        dt = timed(f, a, b)
        print(f"  dot (64,128)@(8,128)^T x{NITER}: {dt*1e6:.1f} us -> {dt/NITER*1e9:.1f} ns/dot")
    except Exception as e:
        print(f"  FAIL {type(e).__name__}: {str(e)[:200]}")

    # 6. small-K dot: (64,8)@(8,128) -> r2 matmul shape
    print("== MXU r2 dot (64,8)x(8,128) ==")
    def dot2_kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            d = jnp.dot(a_ref[:] * (1.0 + 1e-9 * i), b_ref[:],
                        preferred_element_type=jnp.float32)
            return acc + d
        o_ref[:] = jax.lax.fori_loop(0, NITER, body, jnp.zeros((64, 128), jnp.float32))
    try:
        a = jnp.ones((64, 8), jnp.float32)
        b = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda a, b: pl.pallas_call(
            dot2_kernel,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b))
        dt = timed(f, a, b)
        print(f"  dot (64,8)@(8,128) x{NITER}: {dt*1e6:.1f} us -> {dt/NITER*1e9:.1f} ns/dot")
    except Exception as e:
        print(f"  FAIL {type(e).__name__}: {str(e)[:200]}")

    # 7. lane-dim transpose cost: (1,64) -> (64,1) reshape as used per sub-block
    print("== lane->sublane reshape (64,) -> (64,1) ==")
    def tr_kernel(x_ref, o_ref):
        def body(i, acc):
            v = x_ref[0, pl.ds(0, 64)].reshape(64, 1)
            return acc + v * (1.0 + 1e-9 * i)
        o_ref[:] = jax.lax.fori_loop(0, NITER, body, jnp.zeros((64, 1), jnp.float32))
    try:
        x = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda x: pl.pallas_call(
            tr_kernel,
            out_shape=jax.ShapeDtypeStruct((64, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        dt = timed(f, x)
        print(f"  reshape x{NITER}: {dt*1e6:.1f} us -> {dt/NITER*1e9:.1f} ns/reshape")
    except Exception as e:
        print(f"  FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
