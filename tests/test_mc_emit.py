"""Blocked two-stage MC emission (McSpec.emit_block): parity with the
single global sort, overflow accounting, and the growth policy's
cap-then-fallback behavior.

The blocked path compacts each emit_block-cube block's live vertex slots
with one row-sort, then merges nblk*emit_cap staged rows with a short
global sort (ops/mc.py).  Emission order and float values must be
IDENTICAL to the global-sort path — both sort the same rows by the same
unique destination keys.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from pbf_sph_tpu.core.configs import dam_break
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models.growth import growth_changes
from pbf_sph_tpu.models.jax_solver import JaxSolver
from pbf_sph_tpu.ops import mc as mc_ops


def _sphere_lattice(n=17, iso=0.5):
    """Analytic metaball-ish lattice with non-trivial normals/colours."""
    g = np.arange(n, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2.0
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) + 1e-3
    v = (c * 0.7 / r).astype(np.float32).reshape(-1)
    nvec = np.stack([x - c, y - c, z - c]).reshape(3, -1).astype(np.float32)
    nrm = np.sqrt((nvec**2).sum(0)) + 1e-6
    nvec = nvec / nrm
    col = np.stack([
        0.5 + 0.5 * np.sin(x).reshape(-1),
        0.5 + 0.5 * np.cos(y).reshape(-1),
        0.5 + 0.5 * np.sin(z + 1).reshape(-1),
        np.ones(n**3, np.float32),
    ]).astype(np.float32)
    spec = mc_ops.McSpec(resolution=1.0, sample=(n, n, n), tri_capacity=8192)
    args = (jnp.asarray(v), jnp.asarray(nvec), jnp.asarray(col),
            jnp.zeros((3,), jnp.float32), (n - 1, n - 1, n - 1), spec,
            1.0, jnp.float32(1.0), jnp.float32(iso))
    return spec, args


def test_blocked_emission_matches_global():
    spec, args = _sphere_lattice()
    vs, ns, cs, total, ovf = mc_ops.mc_extract(*args)
    assert int(total) > 100 and int(ovf) == 0
    # any block's live rows <= 3*total, so this cap can never overflow
    cap = -(-3 * int(total) // 128) * 128
    for B in (64, 512, 4096):  # incl. B not dividing M and B == M
        bspec = dataclasses.replace(spec, emit_block=B, emit_cap=cap)
        bargs = (args[0], args[1], args[2], args[3], args[4], bspec,
                 args[6], args[7], args[8])
        bvs, bns, bcs, btotal, bovf = mc_ops.mc_extract(*bargs)
        assert int(btotal) == int(total)
        assert int(bovf) == 0, f"B={B}"
        np.testing.assert_array_equal(np.asarray(bvs), np.asarray(vs))
        np.testing.assert_array_equal(np.asarray(bns), np.asarray(ns))
        np.testing.assert_array_equal(np.asarray(bcs), np.asarray(cs))


def test_blocked_emission_overflow_signal():
    """A staging cap smaller than the densest block's live rows must report
    the shortfall (the mesh is truncated until growth re-runs)."""
    spec, args = _sphere_lattice()
    bspec = dataclasses.replace(spec, emit_block=4096, emit_cap=128)
    bargs = (args[0], args[1], args[2], args[3], args[4], bspec,
             args[6], args[7], args[8])
    _, _, _, total, ovf = mc_ops.mc_extract(*bargs)
    assert int(ovf) > 0


def test_growth_grows_emit_cap_then_falls_back():
    _, cfg, _ = dam_break(400, solver_iter=1, surface=True)
    solver = JaxSolver(h=cfg.h)
    spec = solver.make_spec(cfg, Scene(), capacity=512)
    assert spec.surface is not None
    base = dict(max_occupancy=0, tri_count=0)

    sp = dataclasses.replace(
        spec, surface=dataclasses.replace(spec.surface, emit_block=512,
                                          emit_cap=1280))
    ch = growth_changes(sp, dict(base, mc_emit_overflow=100))
    assert ch["surface"].emit_cap > 1280
    assert ch["surface"].emit_block == 512

    # overflow so large the staging cap would exceed 15*B: fall back to the
    # always-correct global sort
    ch = growth_changes(sp, dict(base, mc_emit_overflow=15 * 512))
    assert ch["surface"].emit_block == 0 and ch["surface"].emit_cap == 0


def test_compacted_emission_matches_global():
    """cube_cap compaction (the at-scale production path) is bit-identical
    to the global sort whenever the cap holds all live cubes: the stage-1
    sort keys are unique, the live prefix preserves global cube order, and
    the restricted triangle cumsum equals the global one."""
    spec, args = _sphere_lattice()
    vs, ns, cs, total, ovf = mc_ops.mc_extract(*args)
    assert int(total) > 100 and int(ovf) == 0
    M = int(np.prod([s - 1 for s in spec.sample]))
    for K in (M, 1024, 896):  # full, plenty, tight-ish
        cspec = dataclasses.replace(spec, cube_cap=K)
        cargs = (args[0], args[1], args[2], args[3], args[4], cspec,
                 args[6], args[7], args[8])
        cvs, cns, ccs, ctotal, covf = mc_ops.mc_extract(*cargs)
        assert int(ctotal) == int(total)
        assert int(covf) == 0, f"K={K}"
        np.testing.assert_array_equal(np.asarray(cvs), np.asarray(vs))
        np.testing.assert_array_equal(np.asarray(cns), np.asarray(ns))
        np.testing.assert_array_equal(np.asarray(ccs), np.asarray(cs))


def test_compacted_emission_overflow_signal_and_growth():
    """More live cubes than cube_cap: emit_overflow reports the shortfall
    (the mesh is INVALID) and the growth policy grows cube_cap, capped at
    the march volume."""
    spec, args = _sphere_lattice()
    cspec = dataclasses.replace(spec, cube_cap=128)
    cargs = (args[0], args[1], args[2], args[3], args[4], cspec,
             args[6], args[7], args[8])
    _, _, _, total, ovf = mc_ops.mc_extract(*cargs)
    assert int(ovf) > 0

    _, cfg, _ = dam_break(400, solver_iter=1, surface=True)
    solver = JaxSolver(h=cfg.h)
    sspec = solver.make_spec(cfg, Scene(), capacity=512)
    sp = dataclasses.replace(
        sspec, surface=dataclasses.replace(sspec.surface, cube_cap=128))
    base = dict(max_occupancy=0, tri_count=0)
    ch = growth_changes(sp, dict(base, mc_emit_overflow=int(ovf)))
    assert ch["surface"].cube_cap > 128
    vol = int(np.prod([s - 1 for s in sp.surface.sample]))
    ch = growth_changes(sp, dict(base, mc_emit_overflow=10 * vol))
    assert ch["surface"].cube_cap == vol


@pytest.mark.slow
def test_blocked_emission_end_to_end_growth():
    """advance() with a deliberately tiny emit_cap converges via the growth
    loop to the same mesh as the global-sort path."""
    mcp, cfg, xs = dam_break(400, solver_iter=1, surface=True)

    ref = JaxSolver(h=cfg.h)
    res_ref, _ = ref.advance(cfg, Scene(), xs)

    class TinyEmit(JaxSolver):
        def make_spec(self, *a, **kw):
            spec = super().make_spec(*a, **kw)
            return dataclasses.replace(
                spec, surface=dataclasses.replace(
                    spec.surface, emit_block=1024, emit_cap=128))

    tiny = TinyEmit(h=cfg.h)
    res_tiny, _ = tiny.advance(cfg, Scene(), xs)
    assert res_tiny.mesh is not None and res_ref.mesh is not None
    np.testing.assert_array_equal(res_tiny.mesh.vs, res_ref.mesh.vs)
    np.testing.assert_array_equal(res_tiny.mesh.ns, res_ref.mesh.ns)
    np.testing.assert_array_equal(res_tiny.mesh.cs, res_ref.mesh.cs)
