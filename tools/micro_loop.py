#!/usr/bin/env python
"""Isolate fori_loop overhead vs VPU fma throughput on TPU.

a) loop with tiny body (1 (8,128) fma)           -> per-iteration overhead
b) loop with k independent (8,128) fma streams    -> throughput vs ILP
c) loop with k fmas on one (64,128) stream        -> wide-op pipelining
d) static unroll (no loop) of M fmas              -> pure issue rate
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def run(kernel_fn, shape, *inputs):
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*a))
    return timed(f, *inputs)


def main():
    N = 65536
    x8 = jnp.ones((8, 128), jnp.float32) * 1.0000001

    # a) tiny body
    def k_tiny(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = jax.lax.fori_loop(0, N, lambda i, c: c * 1.000001 + x, x)
    dt = run(k_tiny, (8, 128), x8)
    print(f"a) fori 1x(8,128) fma:  {dt/N*1e9:7.2f} ns/iter")

    # b) k independent (8,128) streams
    for k in (2, 4, 8, 16, 32):
        def k_streams(x_ref, o_ref, k=k):
            x = x_ref[:]
            def body(i, c):
                return tuple(ci * 1.000001 + x for ci in c)
            c = jax.lax.fori_loop(0, N, body, tuple(x + s for s in range(k)))
            acc = c[0]
            for ci in c[1:]:
                acc = acc + ci
            o_ref[:] = acc
        dt = run(k_streams, (8, 128), x8)
        print(f"b) fori {k:2d}x(8,128) fma: {dt/N*1e9:7.2f} ns/iter -> {dt/N/k*1e9:6.2f} ns/fma")

    # c) serial chain of k fmas, 1 stream (latency)
    for k in (4, 16):
        def k_chain(x_ref, o_ref, k=k):
            x = x_ref[:]
            def body(i, c):
                for _ in range(k):
                    c = c * 1.000001 + x
                return c
            o_ref[:] = jax.lax.fori_loop(0, N // 8, body, x)
        dt = run(k_chain, (8, 128), x8)
        print(f"c) fori chain {k:2d} fma:  {dt/(N//8)*1e9:7.2f} ns/iter -> {dt/(N//8)/k*1e9:6.2f} ns/fma (latency)")

    # d) (64,128) streams: j independent
    for k in (1, 2, 4):
        x64 = jnp.ones((64, 128), jnp.float32)
        def k_wide(x_ref, o_ref, k=k):
            x = x_ref[:]
            def body(i, c):
                return tuple(ci * 1.000001 + x for ci in c)
            c = jax.lax.fori_loop(0, N // 4, body, tuple(x + s for s in range(k)))
            acc = c[0]
            for ci in c[1:]:
                acc = acc + ci
            o_ref[:] = acc
        dt = run(k_wide, (64, 128), x64)
        per = dt / (N // 4)
        print(f"d) fori {k}x(64,128) fma: {per*1e9:7.2f} ns/iter -> {per/k*1e9:6.2f} ns/op, {per/k/8*1e9:5.2f} ns/slot")

    # e) rsqrt / where / cmp throughput at high ILP (8 streams, (8,128))
    for opname in ("rsqrt", "where", "mul", "add", "sub_abs_cmp"):
        def k_op(x_ref, o_ref, opname=opname):
            x = x_ref[:]
            def body(i, c):
                if opname == "rsqrt":
                    return tuple(jax.lax.rsqrt(ci + x) for ci in c)
                if opname == "where":
                    return tuple(jnp.where(ci > x, ci, x) + 0.0000001 for ci in c)
                if opname == "mul":
                    return tuple(ci * 1.000001 for ci in c)
                if opname == "add":
                    return tuple(ci + x for ci in c)
                if opname == "sub_abs_cmp":
                    return tuple(jnp.where(jnp.abs(ci - x) <= 1.0, ci + x, x) for ci in c)
            c = jax.lax.fori_loop(0, N // 4, body, tuple(x + s for s in range(8)))
            acc = c[0]
            for ci in c[1:]:
                acc = acc + ci
            o_ref[:] = acc
        dt = run(k_op, (8, 128), x8)
        print(f"e) 8x(8,128) {opname:12s}: {dt/(N//4)/8*1e9:6.2f} ns/op")


if __name__ == "__main__":
    main()
