#!/usr/bin/env python
"""Precision study: centered-coordinate MXU factorization of the pair phases.

Round-2 rejected two MXU factorizations for precision (BENCHMARKS.md finding
#3, measured UNCENTERED at |a| ~ 8 sim units):
  * r2 = |a|^2 + |b|^2 - 2 a.b          (~3 digits lost to cancellation)
  * sum (a-b) sg = a sum(sg) - sum(b sg) (blows up on the self pair, sg ~ 1/r)

Hypothesis (round 3): both are rescued by (1) translating each sub-block to
its own centroid before the matmul — |a'| drops from ~8 to the window extent
(~0.3), shrinking the cancellation term eps*|a||b| by ~700x — and (2) zeroing
sg where r2 < EPSILON^2 (the reference's own r >= EPSILON test,
`src/omp/ompsph.hpp:341`), which removes the huge self-pair value that the
factored gradient sum otherwise has to cancel.

This script measures, against an fp64 per-pair oracle, on a settled-like
jittered-lattice scene in sim-space coordinates (|a| ~ 8, spacing h/2):
  A) fp32 per-pair VPU math (the production kernel structure)
  B) fp32 centered matmul r2 + per-pair gradient   (half-MXU)
  C) fp32 centered matmul r2 + factored gradient   (full-MXU)
  D) C but uncentered (the round-2 rejected form, for reference)
Errors are reported for rho (density) and grad (the lambda gradient sum).

Run on CPU: JAX_PLATFORMS=cpu python tools/precision_centered.py
(fp32 dots approximate MXU HIGHEST-precision accumulation).
"""
import os

import numpy as np
import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

H = 0.1
HH = np.float32(H * H)
HF = np.float32(H)
EPS = np.float32(1e-8)
EPS2 = np.float32(1e-16)
SUB = 64


def pair_oracle_f64(a, b):
    """Per-pair fp64: (rho_sum, grad) with the reference kernel functions."""
    d = a[:, None, :] - b[None, :, :]  # (SUB, NB, 3)
    r2 = (d * d).sum(-1)
    r = np.sqrt(r2)
    p6 = np.where(r2 <= H * H, (H * H - r2) ** 3, 0.0)
    ok = (r >= 1e-8) & (r <= H)
    sg = np.where(ok, (H - r) ** 2 / np.where(ok, r, 1.0), 0.0)
    grad = (d * sg[..., None]).sum(1)
    return p6.sum(1), grad


def variant_a(a, b):
    """fp32 per-pair (production v1 math: r2-space + rsqrt)."""
    a = a.astype(np.float32)
    b = b.astype(np.float32)
    d = a[:, None, :] - b[None, :, :]
    r2 = (d * d).sum(-1)
    tt = np.maximum(HH - r2, 0.0).astype(np.float32)
    p6 = tt * tt * tt
    r2c = np.maximum(r2, EPS2)
    u = (1.0 / np.sqrt(r2c)).astype(np.float32)
    t2 = np.maximum(HF - r2c * u, 0.0).astype(np.float32)
    sg = t2 * t2 * u
    grad = (d * sg[..., None]).sum(1, dtype=np.float32)
    return p6.sum(1, dtype=np.float32), grad


def _sg_p6(r2):
    r2 = jnp.maximum(r2, EPS2)
    tt = jnp.maximum(HH - r2, 0.0)
    p6 = tt * tt * tt
    u = jax.lax.rsqrt(r2)
    t2 = jnp.maximum(HF - r2 * u, 0.0)
    # self/coincident mask: the factored gradient cannot rely on d=0 to kill
    # the huge sg ~ 1/EPS self value, so zero it like the reference r>=EPS test
    sg = jnp.where(r2 > EPS2, t2 * t2 * u, 0.0)
    return p6, sg


def variant_bc(a, b, centred=True, factored=False):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if centred:
        c = a.mean(0)
        a = a - c
        b = b - c
    a2 = (a * a).sum(1)
    b2 = (b * b).sum(1)
    # r2 = |a|^2 - 2 a.b + |b|^2 as one K=5 fp32 matmul (MXU form)
    A = jnp.concatenate([a, a2[:, None], jnp.ones((a.shape[0], 1), jnp.float32)], 1)
    B = jnp.concatenate([-2.0 * b, jnp.ones((b.shape[0], 1), jnp.float32),
                         b2[:, None]], 1)
    r2 = jax.lax.dot_general(A, B, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    p6, sg = _sg_p6(r2)
    if factored:
        # grad = a * sum(sg) - sg @ b   (two MXU reduces)
        ssum = sg.sum(1)
        sb = jax.lax.dot_general(sg, b, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        grad = a * ssum[:, None] - sb
    else:
        d = a[:, None, :] - b[None, :, :]
        grad = (d * sg[..., None]).sum(1)
    return np.asarray(p6.sum(1)), np.asarray(grad)


def main():
    rng = np.random.default_rng(7)
    # settled-like jittered lattice in sim space: spacing h/2, block at ~8
    # sim units from the origin (the 1M dam-break's typical coordinate range)
    grid = np.stack(np.meshgrid(*[np.arange(12)] * 3, indexing="ij"), -1)
    pts = (grid.reshape(-1, 3) * (H / 2) + 8.0
           + rng.uniform(-0.01, 0.01, (grid.size // 3, 3)))
    rng.shuffle(pts)
    a = pts[:SUB]
    # candidate set: everything within 2h of the block (the strip windows),
    # plus the rows themselves (self pairs) — NB rounded to 128 lanes with
    # far-away padding (live lanes; the kernels blank them via the cl mask,
    # here they are simply > h away and self-mask)
    near = pts[(np.abs(pts - a.mean(0)) < 2.5 * H).all(1)]
    nb = -(-len(near) // 128) * 128
    pad = np.full((nb - len(near), 3), 1e3)
    b = np.concatenate([near, pad])
    print(f"rows={len(a)} cands={len(b)} (true {len(near)})")

    rho64, grad64 = pair_oracle_f64(a, b)
    gscale = np.abs(grad64).max()

    def rep(name, rho, grad):
        e_rho = np.abs(rho - rho64).max() / np.abs(rho64).max()
        e_grad = np.abs(grad - grad64).max() / gscale
        print(f"  {name:42s} rho relerr {e_rho:9.2e}   grad relerr {e_grad:9.2e}")

    rep("A per-pair fp32 (production)", *variant_a(a, b))
    rep("B centred MXU r2, per-pair grad", *variant_bc(a, b, True, False))
    rep("C centred MXU r2 + factored grad", *variant_bc(a, b, True, True))
    rep("D uncentred MXU r2 + factored grad (r2 rej.)", *variant_bc(a, b, False, True))

    # the same with a nearly-coincident (non-self) pair injected
    b2 = b.copy()
    b2[0] = a[0] + 3e-7
    rho64, grad64 = pair_oracle_f64(a, b2)
    gscale = np.abs(grad64).max()
    print("with a near-coincident pair (r = 5e-7):")
    rep("A per-pair fp32 (production)", *variant_a(a, b2))
    rep("B centred MXU r2, per-pair grad", *variant_bc(a, b2, True, False))
    rep("C centred MXU r2 + factored grad", *variant_bc(a, b2, True, True))


if __name__ == "__main__":
    main()
