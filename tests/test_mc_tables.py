"""Topological validation of the marching-cubes tables.

The tables are universal constants; these tests prove internal consistency
(any transcription typo breaks at least one of them):
  * every referenced edge must actually be crossed for its case
  * complementary cases cross identical edge sets
  * contours on shared faces of adjacent cubes must agree (no cracks)
  * a marched analytic sphere must be closed (every edge shared by 2 triangles)
"""

import itertools

import numpy as np
import pytest

from pbf_sph_tpu.ops.mc_tables import (
    CUBE_OFFSETS,
    EDGE_CORNERS,
    EDGE_TABLE,
    NUM_VERTS_TABLE,
    TRI_TABLE,
)


def crossed_edges(ci: int) -> int:
    """Bitmask of cube edges whose endpoints straddle the isolevel for case ci."""
    mask = 0
    for e, (a, b) in enumerate(EDGE_CORNERS):
        if ((ci >> a) & 1) != ((ci >> b) & 1):
            mask |= 1 << e
    return mask


def test_empty_cases():
    assert NUM_VERTS_TABLE[0] == 0
    assert NUM_VERTS_TABLE[255] == 0


def test_case_counts():
    # single-corner cases emit exactly one triangle
    for c in range(8):
        assert NUM_VERTS_TABLE[1 << c] == 3
    assert NUM_VERTS_TABLE.max() == 15


def test_edges_used_are_crossed():
    for ci in range(256):
        used = EDGE_TABLE[ci]
        crossed = crossed_edges(ci)
        # every edge the triangulation uses must be a crossed edge...
        assert used & ~crossed == 0, f"case {ci} uses non-crossed edge"
        # ...and for the canonical table every crossed edge is used
        if NUM_VERTS_TABLE[ci]:
            assert used == crossed, f"case {ci} misses crossed edges"


def test_complement_edge_sets_match():
    for ci in range(256):
        assert EDGE_TABLE[ci] == EDGE_TABLE[255 ^ ci]


# --- face consistency (crack-freedom between adjacent cubes) ---------------

# faces: (axis, side) -> the 4 corner ids on that face
def _face_corners(axis: int, side: int):
    return [c for c in range(8) if CUBE_OFFSETS[c][axis] == side]


def _face_edges(corners):
    cs = set(corners)
    return {e for e, (a, b) in enumerate(EDGE_CORNERS) if a in cs and b in cs}


def _boundary_segments_on_face(ci: int, face_edge_set):
    """Unordered vertex-pair segments of the case's triangulation that lie on
    the given face and are mesh-boundary (appear exactly once)."""
    row = TRI_TABLE[ci]
    counts = {}
    for t in range(0, 16, 3):
        if row[t] < 0:
            break
        tri = [int(row[t]), int(row[t + 1]), int(row[t + 2])]
        for i in range(3):
            a, b = tri[i], tri[(i + 1) % 3]
            key = (min(a, b), max(a, b))
            counts[key] = counts.get(key, 0) + 1
    return {k for k, v in counts.items() if v == 1 and k[0] in face_edge_set and k[1] in face_edge_set}


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_face_consistency(axis):
    hi_corners = _face_corners(axis, 1)  # +axis face of cube A
    lo_corners = _face_corners(axis, 0)  # -axis face of cube B
    hi_edges = _face_edges(hi_corners)
    lo_edges = _face_edges(lo_corners)

    # map corners of A's +face to corners of B's -face (same spatial point)
    def partner(c):
        off = CUBE_OFFSETS[c].copy()
        off[axis] = 0
        return next(k for k in range(8) if (CUBE_OFFSETS[k] == off).all())

    corner_map = {c: partner(c) for c in hi_corners}
    edge_map = {}
    for e in hi_edges:
        a, b = (int(v) for v in EDGE_CORNERS[e])
        ma, mb = corner_map[a], corner_map[b]
        edge_map[e] = next(
            k
            for k in lo_edges
            if {int(EDGE_CORNERS[k][0]), int(EDGE_CORNERS[k][1])} == {ma, mb}
        )

    other_hi = [c for c in range(8) if c not in hi_corners]
    other_lo = [c for c in range(8) if c not in lo_corners]

    # enumerate all sign patterns on the shared face x all completions
    for face_bits in range(16):
        ci_a_face = sum(((face_bits >> i) & 1) << c for i, c in enumerate(hi_corners))
        ci_b_face = sum(((face_bits >> i) & 1) << corner_map[c] for i, c in enumerate(hi_corners))
        segs_per_completion = set()
        for rest_a in range(16):
            ci_a = ci_a_face + sum(((rest_a >> i) & 1) << c for i, c in enumerate(other_hi))
            segs_a = _boundary_segments_on_face(ci_a, hi_edges)
            mapped = frozenset((min(edge_map[a], edge_map[b]), max(edge_map[a], edge_map[b])) for a, b in segs_a)
            segs_per_completion.add(mapped)
        # all completions of A must induce the same contour on the face
        assert len(segs_per_completion) == 1, f"axis {axis} face_bits {face_bits}: {segs_per_completion}"
        segs_b_all = set()
        for rest_b in range(16):
            ci_b = ci_b_face + sum(((rest_b >> i) & 1) << c for i, c in enumerate(other_lo))
            segs_b = frozenset(
                (min(a, b), max(a, b)) for a, b in _boundary_segments_on_face(ci_b, lo_edges)
            )
            segs_b_all.add(segs_b)
        assert len(segs_b_all) == 1
        assert segs_per_completion == segs_b_all, f"crack at axis {axis} face_bits {face_bits}"


# --- closed surface test ----------------------------------------------------


def _march_numpy(field: np.ndarray, isolevel: float):
    """Minimal direct marching-cubes over a dense field; returns (T,3,3) verts."""
    nx, ny, nz = field.shape
    tris = []
    for x in range(nx - 1):
        for y in range(ny - 1):
            for z in range(nz - 1):
                vals = [field[x + dx, y + dy, z + dz] for dx, dy, dz in CUBE_OFFSETS]
                ci = 0
                for i, v in enumerate(vals):
                    if v < isolevel:
                        ci |= 1 << i
                row = TRI_TABLE[ci]
                if row[0] < 0:
                    continue
                verts = {}
                for e in range(12):
                    if EDGE_TABLE[ci] & (1 << e):
                        a, b = EDGE_CORNERS[e]
                        pa = np.array([x, y, z]) + CUBE_OFFSETS[a]
                        pb = np.array([x, y, z]) + CUBE_OFFSETS[b]
                        t = (isolevel - vals[a]) / (vals[b] - vals[a])
                        verts[e] = pa + t * (pb - pa)
                for t0 in range(0, 16, 3):
                    if row[t0] < 0:
                        break
                    tris.append([verts[int(row[t0])], verts[int(row[t0 + 1])], verts[int(row[t0 + 2])]])
    return np.array(tris)


def test_sphere_is_watertight():
    n = 14
    g = np.arange(n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2.0 + 0.127  # break lattice symmetry
    field = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    tris = _march_numpy(field, isolevel=4.3)
    assert len(tris) > 50

    # quantize vertex coords and count directed edges: closed orientable surface
    # => every undirected edge appears exactly twice, once per direction.
    def key(v):
        return tuple(np.round(v * 1e6).astype(np.int64))

    directed = {}
    for tri in tris:
        k = [key(v) for v in tri]
        assert len(set(k)) == 3, "degenerate triangle"
        for i in range(3):
            e = (k[i], k[(i + 1) % 3])
            directed[e] = directed.get(e, 0) + 1
    for (a, b), cnt in directed.items():
        assert cnt == 1, "duplicated directed edge"
        assert directed.get((b, a), 0) == 1, "unmatched edge (crack!)"


def test_sphere_euler_characteristic():
    n = 12
    g = np.arange(n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2.0 + 0.217
    field = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    tris = _march_numpy(field, isolevel=3.4)

    def key(v):
        return tuple(np.round(v * 1e6).astype(np.int64))

    verts = set()
    edges = set()
    for tri in tris:
        k = [key(v) for v in tri]
        verts.update(k)
        for i in range(3):
            a, b = k[i], k[(i + 1) % 3]
            edges.add((min(a, b), max(a, b)))
    euler = len(verts) - len(edges) + len(tris)
    assert euler == 2  # topological sphere
