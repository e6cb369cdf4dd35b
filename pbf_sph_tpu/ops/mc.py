"""Marching cubes — XLA path.

TPU re-design of the reference's three MC kernels
(mc_lattice `src/ocl/oclsph_kernel.h:176-263`, mc_size `:272-318`,
mc_eval `:336-408`): the lattice field is a dense gather over the particle
grid, the triangle count is an exclusive cumsum (replacing the workgroup tree
reduction), and emission scatters into a fixed-capacity buffer at
cumsum-derived offsets (replacing the global atomic counter — deterministic,
atomics-free, static shapes).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from pbf_sph_tpu.core.types import OBSTACLE
from pbf_sph_tpu.ops import mc_tables as mct
from pbf_sph_tpu.ops.curves import morton_encode3


@dataclass(frozen=True)
class McSpec:
    """Static MC geometry derived from the grid extent and the (static)
    resolution: sampleSize = floor(extent*res)+1 (reference
    `src/omp/ompsph.hpp:283-284`)."""

    resolution: float
    sample: Tuple[int, int, int]
    tri_capacity: int

    @staticmethod
    def from_extent(extent, resolution: float, tri_capacity: int = 0) -> "McSpec":
        f = np.float32
        sample = (np.floor(np.asarray(extent, f) * f(resolution)) + 1).astype(np.int64)
        march = sample - 1
        vol = int(march[0] * march[1] * march[2])
        if tri_capacity <= 0:
            tri_capacity = max(1024, vol)  # ~1 triangle/cube on average
        return McSpec(
            resolution=float(resolution),
            sample=tuple(int(v) for v in sample),
            tri_capacity=int(tri_capacity),
        )


def _node_grid(spec: McSpec):
    nx, ny, nz = spec.sample
    L = nx * ny * nz
    idx = jnp.arange(L, dtype=jnp.int32)
    x = idx // (ny * nz)
    rem = idx - x * (ny * nz)
    y = rem // nz
    z = rem - y * nz
    return jnp.stack([x, y, z], axis=1)  # (L,3) int32


def mc_field(position, colour, ptype, alive, grid_table, maxz: int, min_extent,
             extent, spec: McSpec, cap: int, h: float, scale,
             particle_size, particle_influence):
    """Metaball lattice field (reference `src/omp/ompsph.hpp:288-356`).

    Per node: gather particles within h*scale from the 27 cells around the
    node's (clamped) grid cell; accumulate v += size/len^infl, the analytic
    normal, and the mean colour.  Division-by-zero conventions (0-normal
    normalize, 0-count colour mean) intentionally reproduce the reference's
    NaN behaviour; those lattice entries are never consumed by emission."""
    dtype = position.dtype
    node = _node_grid(spec)  # (L,3)
    L = node.shape[0]
    res = jnp.asarray(spec.resolution, dtype)
    step = jnp.asarray(h, dtype) / res
    a_world = (min_extent[None, :] + node.astype(dtype) * step) * scale  # (L,3)
    threshold = jnp.asarray(h, dtype) * scale

    ext = jnp.asarray(extent, jnp.int32)
    node_cell = jnp.trunc(node.astype(dtype) / res).astype(jnp.int32)  # (L,3)
    skip = (node_cell == ext[None, :]).all(axis=1)  # the single far-corner node

    clo = jnp.clip(node_cell - 1, 0, ext[None, :] - 1)
    chi = jnp.clip(node_cell + 1, 0, ext[None, :] - 1)
    choices = (clo, node_cell, chi)

    v_acc = jnp.zeros((L,), dtype)
    n_acc = jnp.zeros((L, 3), dtype)
    c_acc = jnp.zeros((L, 4), dtype)
    cnt = jnp.zeros((L,), jnp.int32)

    karange = jnp.arange(cap, dtype=jnp.int32)
    for ck in (0, 1, 2):  # z choice
        for cj in (0, 1, 2):  # y
            for ci_ in (0, 1, 2):  # x (fastest — reference offsets order)
                sc = jnp.stack(
                    [choices[ci_][:, 0], choices[cj][:, 1], choices[ck][:, 2]], axis=1
                )
                zc = morton_encode3(sc[:, 0], sc[:, 1], sc[:, 2])
                ok = (~skip) & (zc < maxz)
                zc_s = jnp.where(ok, zc, 0)
                start = jnp.where(ok, grid_table[zc_s], 0)
                end = jnp.where(
                    ok & (zc_s + 1 < maxz), grid_table[jnp.minimum(zc_s + 1, maxz)], start
                )
                idx = start[:, None] + karange[None, :]
                mask = idx < end[:, None]
                idx = jnp.where(mask, idx, 0)

                pb = position[idx]  # (L,K,3)
                lvec = pb - a_world[:, None, :]
                dist = jnp.sqrt(jnp.sum(lvec * lvec, axis=-1))
                use = mask & (ptype[idx] != OBSTACLE) & (dist < threshold)
                denom = dist**particle_influence
                denom_safe = jnp.where(use & (denom > 0), denom, 1.0)
                w = jnp.where(use, particle_size / denom_safe, 0.0)
                v_acc = v_acc + jnp.sum(w, axis=1)
                contrib = (-particle_influence) * particle_size * (
                    lvec / denom_safe[..., None]
                )
                n_acc = n_acc + jnp.sum(jnp.where(use[..., None], contrib, 0.0), axis=1)
                cb = colour[idx]
                c_acc = c_acc + jnp.sum(jnp.where(use[..., None], cb, 0.0), axis=1)
                cnt = cnt + jnp.sum(use, axis=1).astype(jnp.int32)

    n_norm = jnp.sqrt(jnp.sum(n_acc * n_acc, axis=-1))
    normals = n_acc / n_norm[:, None]  # NaN where no neighbours (reference parity)
    lat_c = c_acc / cnt[:, None].astype(dtype)  # NaN where cnt == 0 (parity)
    return v_acc, normals, lat_c


def mc_extract(lat_v, lat_n, lat_c, min_extent, extent, spec: McSpec,
               h: float, scale, isolevel):
    """Case classification + cumsum compaction + deterministic emission
    (reference mc_size `src/ocl/oclsph_kernel.h:272-318` and mc_eval
    `:336-408`, atomics replaced by exclusive-cumsum offsets)."""
    dtype = lat_v.dtype
    nx, ny, nz = spec.sample
    mx, my, mz = nx - 1, ny - 1, nz - 1
    M = mx * my * mz
    step = jnp.asarray(h, dtype) / jnp.asarray(spec.resolution, dtype)

    idx = jnp.arange(M, dtype=jnp.int32)
    cx = idx // (my * mz)
    rem = idx - cx * (my * mz)
    cy = rem // mz
    cz = rem - cy * mz
    cube = jnp.stack([cx, cy, cz], axis=1)  # (M,3)

    offsets8 = jnp.asarray(np.asarray(mct.CUBE_OFFSETS), jnp.int32)  # (8,3)
    corner = cube[:, None, :] + offsets8[None, :, :]  # (M,8,3)
    lin = corner[..., 0] * (ny * nz) + corner[..., 1] * nz + corner[..., 2]  # (M,8)
    vals = lat_v[lin]  # (M,8)

    below = (vals < isolevel).astype(jnp.int32)
    weights = jnp.asarray([1 << i for i in range(8)], jnp.int32)
    ci = jnp.sum(below * weights[None, :], axis=1)  # (M,)

    edge_t = jnp.asarray(mct.EDGE_TABLE, jnp.int32)
    nvert_t = jnp.asarray(mct.NUM_VERTS_TABLE, jnp.int32)
    tri_t = jnp.asarray(mct.TRI_TABLE, jnp.int32)  # (256,16)

    ntris = jnp.where(edge_t[ci] == 0, 0, nvert_t[ci] // 3)  # (M,)
    offs = jnp.cumsum(ntris) - ntris  # exclusive
    total = offs[-1] + ntris[-1]

    # 12 edge interpolants for every cube (uncrossed edges produce NaN via the
    # raw divide, exactly like the reference's unconditional `scale()`; they
    # are never selected by TRI_TABLE for the cube's case).
    e_from = jnp.asarray(mct.EDGE_CORNERS[:, 0], jnp.int32)
    e_to = jnp.asarray(mct.EDGE_CORNERS[:, 1], jnp.int32)
    corner_pos = (min_extent[None, None, :] + corner.astype(dtype) * step) * scale  # (M,8,3)
    corner_nrm = lat_n[lin]  # (M,8,3)
    corner_col = lat_c[lin]  # (M,8,4)
    v0 = vals[:, e_from]
    v1 = vals[:, e_to]
    t = ((isolevel - v0) / (v1 - v0)).astype(dtype)  # (M,12)

    def lerp(a, b):
        return a + t[..., None] * (b - a)

    ev = lerp(corner_pos[:, e_from], corner_pos[:, e_to])  # (M,12,3)
    en = lerp(corner_nrm[:, e_from], corner_nrm[:, e_to])  # (M,12,3)
    ec = lerp(corner_col[:, e_from], corner_col[:, e_to])  # (M,12,4)

    cap3 = spec.tri_capacity * 3
    vs = jnp.zeros((cap3, 3), dtype)
    ns = jnp.zeros((cap3, 3), dtype)
    cs = jnp.zeros((cap3, 4), dtype)
    rows = jnp.arange(M, dtype=jnp.int32)
    for ti in range(mct.MAX_TRIS_PER_CUBE):
        has = ti < ntris
        edges3 = tri_t[ci, 3 * ti : 3 * ti + 3]  # (M,3); -1 entries when !has
        base = (offs + ti) * 3
        for k in range(3):
            e = jnp.where(has, edges3[:, k], 0)
            dst = jnp.where(has, base + k, cap3)  # cap3 → dropped
            vs = vs.at[dst].set(ev[rows, e], mode="drop")
            ns = ns.at[dst].set(en[rows, e], mode="drop")
            cs = cs.at[dst].set(ec[rows, e], mode="drop")
    return vs, ns, cs, total
