#!/usr/bin/env python
"""Anchor the roofline's pair-slot rate against the chip's VPU peak (round 5).

The round-4 roofline treats the measured ~74 G pair-slots/s of the
production lambda kernel as the rate ceiling without stating what fraction
of the VPU's fp32 issue rate it represents.  This tool closes that hole.

Vop accounting: 1 vop = one instruction on an (8,128) f32 tile.  The
production lambda body is 20 tile-ops per (64,128) chunk-slot tile = 160
vops/chunk; at the round-4 census (14.59 chunks/sub-block, 15,744
sub-blocks at 1M) a lambda sweep issues ~36.8M vops, so the measured
25.3 ms sweep implies 0.69 ns/vop — the anchor question is what the
floor is.

Measurement design (the first attempt failed two ways, kept here as a
warning): (a) kernels must run >= 20 ms of work or the axon tunnel's
~1-2 ms dispatch floor swamps them (tools/micro_vpu.py's stream rates are
garbage for this reason); (b) a bare fori_loop body is NOT pipelined by
Mosaic — a serial chain measures latency, not issue rate — and carries
bigger than a few vregs spill to VMEM and measure bandwidth instead.  So
every kernel below statically unrolls K independent ops per fori iteration
with vreg-sized carries.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/anchor_rate.py
"""
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
H = 0.1


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(fn, *args, reps=5, label="", units=0.0, unit_name=""):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)
    out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    extra = ""
    if units:
        extra = (f"  -> {units / dt / 1e9:8.2f} G {unit_name}/s"
                 f"  ({dt / units * 1e9:6.3f} ns/{unit_name})")
    print(f"  {label:46s}: {dt*1e3:8.2f} ms{extra}", flush=True)
    return dt


def marginal(build, n_lo, n_hi, work_per_iter, label="", unit="vop"):
    """Marginal rate between two kernel sizes — cancels the axon tunnel's
    per-dispatch host cost (~1.7 ms/call), which floors every small-kernel
    measurement (the first two designs of this tool fell for it)."""
    f_lo, f_hi = build(n_lo), build(n_hi)
    t_lo = timed(f_lo, label=f"{label} n={n_lo}")
    t_hi = timed(f_hi, label=f"{label} n={n_hi}")
    work = (n_hi - n_lo) * work_per_iter
    dt = max(t_hi - t_lo, 1e-9)
    rate = work / dt
    print(f"  {label:46s}: marginal {rate/1e9:8.2f} G {unit}/s "
          f"({dt/work*1e9:6.3f} ns/{unit})", flush=True)
    return rate


# ---------------------------------------------------------------------------
# A. VPU issue rate — statically unrolled independent op streams
# ---------------------------------------------------------------------------


def build_issue(op, nstreams=16, unroll=16):
    """nstreams independent (8,128) carries; each fori iteration applies
    `unroll` statically-unrolled rounds of one op per stream.  Vops per
    iteration = nstreams * unroll (x2 for two-instr ops).  Returns a
    builder(niter) -> nullary jitted fn for `marginal`."""
    def build(niter):
        def kernel(x_ref, o_ref):
            x = x_ref[:]

            def body(i, carry):
                for u in range(unroll):
                    if op == "fma":
                        carry = tuple(c * 1.000001 + x for c in carry)
                    elif op == "mul":
                        carry = tuple(c * 1.000001 for c in carry)
                    elif op == "max":
                        carry = tuple(jnp.maximum(c, x) for c in carry)
                    elif op == "sub_mul":  # alternating, like dx then dx*dx
                        carry = tuple(c - x if (u % 2) else c * x for c in carry)
                    elif op == "rsqrt":
                        carry = tuple(jax.lax.rsqrt(c + x) for c in carry)
                    else:
                        raise ValueError(op)
                return carry

            carry = tuple(x + float(s) for s in range(nstreams))
            carry = jax.lax.fori_loop(0, niter, body, carry)
            acc = carry[0]
            for c in carry[1:]:
                acc = acc + c
            o_ref[:] = acc

        x = jnp.full((8, WCOL), 1.0000001, jnp.float32)
        g = jax.jit(lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, WCOL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        return lambda: g(x)

    per_iter = nstreams * unroll * (2 if op == "rsqrt" else 1)
    return build, per_iter


# ---------------------------------------------------------------------------
# B. production chunk bodies — statically unrolled over independent chunks
# ---------------------------------------------------------------------------


LAMBDA_OPS = 20   # dx,dy,dz=3 r2=3 d2p=2 p6=2 r2c=1 rsqrt=1 tt=2 sg=2 accum=4
DELTA_OPS = 28


def build_body(which, nunroll=8, nch=8):
    """The exact production chunk body, `nunroll` independent chunks per
    fori iteration (static offsets over an nch-chunk VMEM strip), carries
    accumulated into one (SUB, WCOL) tile set like production.  Returns a
    builder(niter) for `marginal` (chunks/iter = nunroll)."""
    p6f = np.float32(poly6_factor(H))
    skf = np.float32(spiky_kernel_factor(H))
    hh = np.float32(H * H)
    hf = np.float32(H)
    eps2 = np.float32(K.EPSILON) ** 2
    cdq = np.float32(K.CORR_DELTA_Q * H)
    p6dq = p6f * (hh - cdq * cdq) ** 3
    xqf = np.float32(p6f / p6dq)
    corr_k = np.float32(-K.CORR_K)
    rr = np.float32(K.RHO_RECIP)

    def kernel_of(niter, rows_ref, strip_ref, o_ref):
        ax = rows_ref[0, pl.ds(0, SUB)].reshape(SUB, 1)
        ay = rows_ref[1, pl.ds(0, SUB)].reshape(SUB, 1)
        az = rows_ref[2, pl.ds(0, SUB)].reshape(SUB, 1)
        alam = rows_ref[3, pl.ds(0, SUB)].reshape(SUB, 1)

        def chunk(o, carry):
            bx = strip_ref[0, pl.ds(o, WCOL)].reshape(1, WCOL)
            by = strip_ref[1, pl.ds(o, WCOL)].reshape(1, WCOL)
            bz = strip_ref[2, pl.ds(o, WCOL)].reshape(1, WCOL)
            dx = ax - bx
            dy = ay - by
            dz = az - bz
            r2 = dx * dx + dy * dy + dz * dz
            d2p = jnp.maximum(hh - r2, 0.0)
            r2c = jnp.maximum(r2, eps2)
            u = jax.lax.rsqrt(r2c)
            tt = jnp.maximum(hf - r2c * u, 0.0)
            if which == "lambda":
                p6s, gx, gy, gz = carry
                p6 = d2p * d2p * d2p
                sg = tt * tt * u
                return (p6s + p6, gx + dx * sg, gy + dy * sg, gz + dz * sg)
            blam = strip_ref[3, pl.ds(o, WCOL)].reshape(1, WCOL)
            dxs, dys, dzs = carry
            xq = d2p * d2p * d2p * xqf
            x2 = xq * xq
            corr = corr_k * x2 * x2
            factor = (alam + blam + corr) * rr
            sg = (skf * (tt * tt) * u) * factor
            return (dxs + dx * sg, dys + dy * sg, dzs + dz * sg)

        def body(i, carry):
            for k in range(nunroll):
                carry = chunk(pl.multiple_of((k % nch) * WCOL, WCOL), carry)
            return carry

        zero = jnp.zeros((SUB, WCOL), jnp.float32)
        carry = (zero,) * (4 if which == "lambda" else 3)
        carry = jax.lax.fori_loop(0, niter, body, carry)
        acc = carry[0]
        for c in carry[1:]:
            acc = acc + c
        o_ref[:] = acc

    rows = jnp.ones((5, SUB), jnp.float32) * 0.05
    strip = jnp.ones((4, nch * WCOL), jnp.float32) * 0.055

    def build(niter):
        import functools

        g = jax.jit(lambda r, s: pl.pallas_call(
            functools.partial(kernel_of, niter),
            out_shape=jax.ShapeDtypeStruct((SUB, WCOL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(r, s))
        return lambda: g(rows, strip)

    return build


# ---------------------------------------------------------------------------
# C. per-sub-block fixed cost (all windows empty)
# ---------------------------------------------------------------------------


def build_subfix():
    """Production lambda sub-block structure with every window pointing at
    the sentinel chunk: row loads + reshapes + 9 unconditional chunks (each
    followed by an empty fori, as in production) + tile reduction + epilogue
    + store.  Returns a builder(nblocks) for `marginal` (16 sub-blocks per
    iteration)."""
    p6f = np.float32(poly6_factor(H))
    skf = np.float32(spiky_kernel_factor(H))
    hh = np.float32(H * H)
    hf = np.float32(H)
    eps2 = np.float32(K.EPSILON) ** 2
    NSUB = 16

    def kernel_of(nblocks, rows_ref, strip_ref, o_ref):
        def chunk(ax, ay, az, o, carry):
            p6s, gx, gy, gz = carry
            bx = strip_ref[0, pl.ds(o, WCOL)].reshape(1, WCOL)
            by = strip_ref[1, pl.ds(o, WCOL)].reshape(1, WCOL)
            bz = strip_ref[2, pl.ds(o, WCOL)].reshape(1, WCOL)
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

        def block(b, _):
            for t in range(NSUB):
                ax = rows_ref[0, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                ay = rows_ref[1, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                az = rows_ref[2, pl.ds(t * SUB, SUB)].reshape(SUB, 1)
                zero = jnp.zeros((SUB, WCOL), jnp.float32)
                carry = (zero, zero, zero, zero)
                for s in range(9):
                    carry = chunk(ax, ay, az, pl.multiple_of(0, WCOL), carry)
                    carry = jax.lax.fori_loop(
                        0, 0,
                        lambda wi, c: chunk(ax, ay, az, pl.multiple_of(0, WCOL), c),
                        carry)
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
            return 0

        jax.lax.fori_loop(0, nblocks, block, 0)

    rows = jnp.ones((5, NSUB * SUB), jnp.float32) * 0.05
    strip = jnp.full((4, 2 * WCOL), 1e9, jnp.float32)

    def build(nblocks):
        import functools

        g = jax.jit(lambda r, s: pl.pallas_call(
            functools.partial(kernel_of, nblocks),
            out_shape=jax.ShapeDtypeStruct((1, NSUB * SUB), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(r, s))
        return lambda: g(rows, strip)

    return build, NSUB


def main():
    print(f"devices: {jax.devices()}")
    print("== A. VPU fp32 issue rate (vop = one (8,128) instr; marginal "
          "between two sizes cancels dispatch) ==")
    peak = 0.0
    rates = {}
    for op in ("fma", "mul", "max", "sub_mul", "rsqrt"):
        build, per_iter = build_issue(op)
        n_hi = 65536 if op != "rsqrt" else 32768
        r = marginal(build, n_hi // 4, n_hi, per_iter, label=op, unit="vop")
        rates[op] = r
        if op in ("fma", "mul"):
            peak = max(peak, r)

    print("== B. production chunk bodies (VMEM-resident, no DMA) ==")
    lam_rate = marginal(build_body("lambda", nunroll=8), 16384, 65536,
                        8 * SUB * WCOL, label="lambda body u8", unit="pair-slot")
    del_rate = marginal(build_body("delta", nunroll=8), 16384, 65536,
                        8 * SUB * WCOL, label="delta body u8", unit="pair-slot")
    lam_rate1 = marginal(build_body("lambda", nunroll=1), 65536, 262144,
                         SUB * WCOL, label="lambda body u1 (serial fori)",
                         unit="pair-slot")
    lam_t = 8 * SUB * WCOL / lam_rate / 8
    del_t = 8 * SUB * WCOL / del_rate / 8
    lam_t1 = SUB * WCOL / lam_rate1
    print(f"  lambda: {LAMBDA_OPS} tile-ops/slot; delta: {DELTA_OPS}")

    print("== C. per-sub-block fixed cost ==")
    build, per_iter = build_subfix()
    sub_rate = marginal(build, 2048, 8192, per_iter, label="sub-block replica",
                        unit="sub-block")
    sub_t = 1.0 / sub_rate

    print("\n== decomposition at the round-4 1M census ==")
    C = 1007616
    nsub = C // SUB
    chunks_sub = 14.59
    nchunk_tot = nsub * chunks_sub
    slots = nchunk_tot * WCOL * SUB
    meas = {"lambda": 25.3e-3, "delta": 26.5e-3}  # round-4 sweeps (roofline.py)
    for which, rate, chunk_t, ops in (
        ("lambda", lam_rate, lam_t, LAMBDA_OPS),
        ("delta", del_rate, del_t, DELTA_OPS),
    ):
        vops_chunk = ops * SUB // 8
        body_vop_rate = vops_chunk / chunk_t
        prod_rate = slots / meas[which]
        prod_vops = nchunk_tot * vops_chunk / meas[which]
        print(f"  {which}:")
        print(f"    unrolled body ceiling : {rate/1e9:7.1f} G slots/s "
              f"({body_vop_rate/1e9:.2f} G vops/s = "
              f"{body_vop_rate/peak*100:.0f}% of the measured fma peak)")
        print(f"    production (round 4)  : {prod_rate/1e9:7.1f} G slots/s "
              f"({prod_vops/1e9:.2f} G vops/s = "
              f"{prod_vops/peak*100:.0f}% of fma peak, "
              f"{prod_rate/rate*100:.0f}% of the body ceiling)")
        # model: 9 unrolled chunks at body rate + extra chunks at serial rate
        # + fixed
        fix_only = max(sub_t - 9 * lam_t, 0.0)
        extra = chunks_sub - 9
        model = nsub * (fix_only + 9 * chunk_t + extra * lam_t1)
        print(f"    model {model*1e3:5.1f} ms = fix {nsub*fix_only*1e3:.1f} "
              f"+ 9 unrolled {nsub*9*chunk_t*1e3:.1f} "
              f"+ {extra:.1f} serial {nsub*extra*lam_t1*1e3:.1f} "
              f"(vs measured {meas[which]*1e3:.1f} ms; remainder = DMA + "
              f"window bookkeeping)")


if __name__ == "__main__":
    main()
