"""On-device spatial index: Morton sort + dense CSR cell table.

TPU-native replacement for the reference's host-side sort + grid-table build
(host std::sort `src/omp/ompsph.hpp:158`, makeGridTable `src/sph.hpp:238-250`):
everything stays on device inside the jitted step.

Semantics preserved exactly:
  * cell coords = C-style trunc((pStar - minExtent)/h) (`src/sph.hpp:198-201`)
  * particles whose Morton code falls outside [0, maxz) are sorted to the end
    and belong to no cell (the reference's size_t-wrap + `offset >= gridTableN`
    skip, `src/sph.hpp:207`)
  * gridTable[z] = first sorted index with code >= z (searchsorted-left is
    exactly the reference's builder loop)
  * the last table cell (code maxz-1) is never gathered (end-rule quirk,
    `src/sph.hpp:208`)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from pbf_sph_tpu.ops.curves import morton_encode3

# 27-cell stencil, x fastest (reference `src/sph.hpp:220-234` order).
STENCIL27 = [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

# Sort keys above any valid Morton code (< 2^30): invalid-but-alive, then dead.
KEY_INVALID = np.int32(1 << 30)
KEY_DEAD = np.int32((1 << 30) + 1)


@dataclass(frozen=True)
class GridSpec:
    """Static grid geometry, fixed at trace time.

    The reference recomputes the extent from the (per-frame moving) bounds in
    fp32 every frame (`src/omp/ompsph.hpp:133-135`); under translation-only
    motion the span is constant up to 1 ulp, so we freeze the extent computed
    from the *initial* bounds and keep minExtent dynamic.
    """

    extent: Tuple[int, int, int]
    maxz: int

    @staticmethod
    def from_bounds(min_bound, max_bound, scale: float, h: float) -> "GridSpec":
        f = np.float32
        padding = f(h) * f(2)
        min_extent = np.asarray(min_bound, f) / f(scale) - padding
        max_extent = np.asarray(max_bound, f) / f(scale) + padding
        extent = np.trunc((max_extent - min_extent) / f(h)).astype(np.int64)
        maxz = int(morton_encode3(int(extent[0]), int(extent[1]), int(extent[2])))
        return GridSpec(extent=tuple(int(v) for v in extent), maxz=maxz)


def cell_coords(pstar, min_extent, h: float):
    """(C,3) int32 cell coords; may be negative / out of range."""
    coords = (pstar - min_extent) / jnp.asarray(h, pstar.dtype)
    coords = jnp.clip(coords, -2.0e9, 2.0e9)
    coords = jnp.where(jnp.isnan(coords), 2.0e9, coords)
    return jnp.trunc(coords).astype(jnp.int32)


def cell_codes(cells, alive, maxz: int):
    """Morton codes (int32) with invalid/dead mapped to sort-to-end sentinels.

    Returns (codes, key): `codes` has KEY_INVALID wherever coords are outside
    the 10-bit Morton domain; `key` additionally maps codes >= maxz and dead
    slots past every valid key.
    """
    in_range = ((cells >= 0) & (cells <= 1023)).all(axis=1)
    safe = jnp.where(in_range[:, None], cells, 0)
    z = morton_encode3(safe[:, 0], safe[:, 1], safe[:, 2])
    codes = jnp.where(in_range, z, KEY_INVALID)
    key = jnp.where(alive & in_range & (z < maxz), z, KEY_INVALID)
    key = jnp.where(alive, key, KEY_DEAD)
    return codes, key


def build_grid_table(sorted_key, maxz: int):
    """Dense CSR cell-start table over the full Morton code range
    (reference `makeGridTable`, `src/sph.hpp:238-250`)."""
    targets = jnp.arange(maxz + 1, dtype=jnp.int32)
    return jnp.searchsorted(sorted_key, targets, side="left").astype(jnp.int32)


def stencil_ranges(cells, codes, grid_table, maxz: int) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-particle [start, end) candidate ranges for each of the 27 stencil
    cells (reference `foreach_grid`, `src/sph.hpp:203-236`).  `cells`/`codes`
    must be in sorted order.  Returns a 27-element list of (start, end)."""
    out = []
    center_ok = codes < maxz
    for d in STENCIL27:
        nc = cells + jnp.asarray(d, jnp.int32)
        in_range = ((nc >= 0) & (nc <= 1023)).all(axis=1)
        safe = jnp.where(in_range[:, None], nc, 0)
        nz = morton_encode3(safe[:, 0], safe[:, 1], safe[:, 2])
        ok = center_ok & in_range & (nz < maxz)
        nz_s = jnp.where(ok, nz, 0)
        start = grid_table[nz_s]
        has_next = ok & (nz_s + 1 < maxz)
        end = jnp.where(has_next, grid_table[jnp.minimum(nz_s + 1, maxz)], start)
        start = jnp.where(ok, start, 0)
        end = jnp.where(ok, end, 0)
        out.append((start, end))
    return out


def max_cell_occupancy(grid_table):
    """Largest cell population — the neighbour-gather capacity check."""
    return jnp.max(grid_table[1:] - grid_table[:-1])
