"""PBF phase ops — XLA path.

Each phase mirrors one reference kernel over the 27-cell Morton stencil
(reference kernels: diffuse `src/ocl/oclsph_kernel.h:67-93`, lambda `:95-123`,
delta `:125-162`, finalise `:164-174`; host phases: sources/drains/advect
`src/omp/ompsph.hpp:93-155`).

The TPU re-design: neighbour iteration is a statically unrolled loop over the
27 stencil offsets; each offset contributes a dense (C, K) gather of cell
candidates (K = static per-cell capacity) that XLA fuses into the pairwise
math and a masked reduction.  No atomics, no host round-trips, static shapes.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from pbf_sph_tpu.core.constants import DEFAULT_CONSTANTS as K
from pbf_sph_tpu.core.types import FLUID, OBSTACLE
from pbf_sph_tpu.ops.kernels import poly6_factor, spiky_kernel_factor


def _candidates(start, end, cap: int):
    """(C, cap) candidate indices + mask from per-particle [start, end)."""
    idx = start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    mask = idx < end[:, None]
    return jnp.where(mask, idx, 0), mask


def _pair_geometry(pstar_a, pstar_b, mask, h: float, dtype):
    """Squared distance / distance / validity for a (C, K) candidate block."""
    d = pstar_a[:, None, :] - pstar_b  # (C,K,3)
    r2 = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(r2)
    return d, r2, r


def _poly6_block(r2, mask, h: float, factor):
    hh = h * h
    v = factor * (hh - r2) ** 3
    return jnp.where(mask & (r2 <= hh), v, 0.0)


def _spiky_scale_block(r, mask, h: float, factor, eps: float):
    """Scalar multiplier s such that spiky_grad = d * s (d = x - y)."""
    valid = mask & (r >= eps) & (r <= h)
    r_safe = jnp.where(valid, r, 1.0)
    s = factor * ((h - r_safe) ** 2 / r_safe)
    return jnp.where(valid, s, 0.0)


# ---------------------------------------------------------------------------
# Host-ish phases (still jitted): external forces + advection
# ---------------------------------------------------------------------------


def advect(position, velocity, mass, ptype, alive, wells_centre, wells_force,
           constant_force, dt, scale):
    """v += F*dt; pStar = v*dt + pos/scale for fluid particles
    (reference `src/omp/ompsph.hpp:137-151`); obstacles keep pStar = pos/scale
    (OCL semantics, `src/ocl/oclsph.cpp:64-69`)."""
    dtype = position.dtype
    fluid = (ptype == FLUID) & alive
    force = mass[:, None] * constant_force[None, :]
    n_wells = wells_centre.shape[0]
    for w in range(n_wells):  # static, tiny
        centre = wells_centre[w]
        diff = centre[None, :] - position
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        near = dist < jnp.asarray(75.0, dtype)
        dist_safe = jnp.where(dist > 0, dist, 1.0)
        rhat = diff / dist_safe[:, None]
        fw = rhat * wells_force[w] * mass[:, None] / (dist_safe * dist_safe)[:, None]
        fw = jnp.clip(fw, -10.0, 10.0)
        force = force + jnp.where(near[:, None], fw, 0.0)
    vel = jnp.where(fluid[:, None], velocity + force * dt, velocity)
    pstar = jnp.where(fluid[:, None], vel * dt + position / scale, position / scale)
    return vel, pstar


# ---------------------------------------------------------------------------
# Neighbour phases
# ---------------------------------------------------------------------------


def diffuse(colour, ptype, alive, ranges: List[Tuple], cap: int, dt):
    """Colour diffusion (reference `src/omp/ompsph.hpp:188-207`): neighbour
    colour mean * 1.33 mixed in with weight dt/750, clamped to [0.03, 1]."""
    dtype = colour.dtype
    n = colour.shape[0]
    mixture = jnp.zeros((n, 4), dtype)
    cnt = jnp.zeros((n,), jnp.int32)
    for start, end in ranges:
        idx, mask = _candidates(start, end, cap)
        nb_ok = mask & (ptype[idx] != OBSTACLE)
        cb = colour[idx]  # (C,K,4)
        mixture = mixture + jnp.sum(jnp.where(nb_ok[..., None], cb, 0.0), axis=1)
        cnt = cnt + jnp.sum(nb_ok, axis=1).astype(jnp.int32)
    cnt_safe = jnp.maximum(cnt, 1).astype(dtype)
    target = (mixture / cnt_safe[:, None]) * jnp.asarray(1.33, dtype)
    mixed = colour + (dt / jnp.asarray(750.0, dtype)) * (target - colour)
    mixed = jnp.clip(mixed, 0.03, 1.0)
    upd = (ptype == FLUID) & alive & (cnt > 0)
    return jnp.where(upd[:, None], mixed, colour)


def lambda_phase(pstar, mass, ptype, alive, ranges, cap: int, h: float):
    """Density-constraint multiplier (reference `src/ocl/oclsph_kernel.h:95-123`):
    rho_i = m_i * sum_j poly6(r); lambda = -(rho/RHO - 1)/(|grad C|^2 + CFM)."""
    dtype = pstar.dtype
    n = pstar.shape[0]
    p6f = jnp.asarray(poly6_factor(h), dtype)
    skf = jnp.asarray(spiky_kernel_factor(h), dtype)
    p6_sum = jnp.zeros((n,), dtype)
    grad = jnp.zeros((n, 3), dtype)
    for start, end in ranges:
        idx, mask = _candidates(start, end, cap)
        pb = pstar[idx]
        d, r2, r = _pair_geometry(pstar, pb, mask, h, dtype)
        p6_sum = p6_sum + jnp.sum(_poly6_block(r2, mask, h, p6f), axis=1)
        s = _spiky_scale_block(r, mask, h, skf, K.EPSILON)
        grad = grad + jnp.sum(d * s[..., None], axis=1)
    rho = mass * p6_sum
    grad = grad * jnp.asarray(K.RHO_RECIP, dtype)
    norm2 = jnp.sum(grad * grad, axis=-1)
    ci = rho / jnp.asarray(K.RHO, dtype) - 1.0
    lam = -ci / (norm2 + jnp.asarray(K.CFM_EPSILON, dtype))
    return jnp.where((ptype == FLUID) & alive, lam, 0.0)


def delta_phase(pstar, lam, ptype, alive, ranges, cap: int, h: float,
                scale, min_bound, max_bound):
    """Position correction + in-iteration bounds clamp
    (reference `src/ocl/oclsph_kernel.h:125-162`)."""
    dtype = pstar.dtype
    n = pstar.shape[0]
    p6f = jnp.asarray(poly6_factor(h), dtype)
    skf = jnp.asarray(spiky_kernel_factor(h), dtype)
    cdq = jnp.asarray(K.CORR_DELTA_Q * h, dtype)
    p6dq = p6f * (jnp.asarray(h * h, dtype) - cdq * cdq) ** 3
    dp = jnp.zeros((n, 3), dtype)
    for start, end in ranges:
        idx, mask = _candidates(start, end, cap)
        pb = pstar[idx]
        d, r2, r = _pair_geometry(pstar, pb, mask, h, dtype)
        p6 = _poly6_block(r2, mask, h, p6f)
        corr = jnp.asarray(-K.CORR_K, dtype) * (p6 / p6dq) ** 4
        factor = (lam[:, None] + lam[idx] + corr) * jnp.asarray(K.RHO_RECIP, dtype)
        s = _spiky_scale_block(r, mask, h, skf, K.EPSILON)
        dp = dp + jnp.sum(d * (s * factor)[..., None], axis=1)
    moved = jnp.clip((pstar + dp) * scale, min_bound[None, :], max_bound[None, :]) / scale
    fluid = (ptype == FLUID) & alive
    return jnp.where(fluid[:, None], moved, pstar)


def finalise(position, velocity, pstar, ptype, alive, dt, scale, dtype):
    """v = (dX/dt + v)*VD; pos = pStar*scale
    (reference `src/ocl/oclsph_kernel.h:164-174`)."""
    fluid = (ptype == FLUID) & alive
    delta_x = pstar - position / scale
    new_pos = jnp.where(fluid[:, None], pstar * scale, position)
    new_vel = jnp.where(
        fluid[:, None],
        (delta_x * (jnp.asarray(1.0, dtype) / dt) + velocity) * jnp.asarray(K.VD, dtype),
        velocity,
    )
    return new_pos, new_vel
