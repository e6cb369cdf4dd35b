"""Direct PallasMcField parity vs the XLA MC field (interpret mode).

VERDICT round-1 weak #3: the 300-line node kernel had zero direct coverage.
Also regression-guards the padded-tail-block bug: fully-padded sub-blocks
used lo_cells=0, dragging the last block's strip start to column 0 and
reporting a ~capacity-sized strip overflow (which silently forced the 12x
slower XLA-field fallback at mc128k).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pbf_sph_tpu.core.scene import simple_config_with_2_cubes
from pbf_sph_tpu.core.types import FluidState, Scene
from pbf_sph_tpu.models.jax_solver import JaxSolver, dyn_params_of
from pbf_sph_tpu.ops import mc as mc_ops
from pbf_sph_tpu.ops import pallas_mc
from pbf_sph_tpu.ops.grid import build_cell_table, cell_coords, decode_key, sort_key


def _sorted_frame(cfg, xs, capacity):
    solver = JaxSolver(h=cfg.h)
    spec = solver.make_spec(cfg, Scene(), capacity)
    state = FluidState.from_soa(xs, spec.capacity, np.float32)
    dyn = dyn_params_of(cfg, np.float32)
    scale = jnp.float32(spec.scale)
    min_extent = dyn["min_bound"].astype(jnp.float32) / scale - spec.h * 2
    pstar = jnp.asarray(state.position) / scale
    cells = cell_coords(pstar, min_extent, spec.h)
    key = sort_key(cells, state.alive, spec.grid)
    order = jnp.argsort(key, stable=True)
    key = key[order]
    state = jax.tree.map(lambda a: a[..., order], state)
    cells, member = decode_key(key, spec.grid)
    table = build_cell_table(key, spec.grid)
    return spec, state, dyn, cells, member, table, min_extent, scale


@pytest.mark.slow
def test_pallas_mc_field_matches_xla():
    mc, cfg, xs = simple_config_with_2_cubes(1500, 2, 500.0)
    cfg = cfg.replace(surface=mc)
    spec, state, dyn, cells, member, table, min_extent, scale = _sorted_frame(
        cfg, xs, capacity=2048
    )
    dtype = jnp.float32

    want = mc_ops.mc_field(
        state.position, state.colour, state.ptype, state.alive, table,
        spec.grid, min_extent, spec.grid.extent, spec.surface,
        spec.cell_capacity, spec.h, scale,
        dyn["mc_particle_size"].astype(dtype),
        dyn["mc_particle_influence"].astype(dtype),
    )

    field = pallas_mc.PallasMcField(
        spec.capacity, spec.grid, spec.surface, spec.h, spec.scale,
        spec.surface.influence_static, smax=2048, interpret=True,
    )
    lat_v, lat_n, lat_c, overflow = field(
        table, cells, state.position, state.colour, state.ptype, state.alive,
        member, min_extent, dyn["mc_particle_size"].astype(dtype), scale, dtype,
    )
    # the padded-tail regression: strips must not claim to span the array
    assert int(overflow) == 0

    v_ref = np.asarray(want[0])
    np.testing.assert_allclose(np.asarray(lat_v), v_ref, rtol=1e-4, atol=1e-3)
    # normals/colours are NaN where the field is empty (reference parity).
    # At near-zero-field nodes the two paths' fp noise can disagree on
    # NaN-vs-finite; require agreement on substantive nodes and bound the
    # borderline disagreement set
    active = v_ref > 1e-3
    for got_a, want_a in ((lat_n, want[1]), (lat_c, want[2])):
        w = np.asarray(want_a)
        g = np.asarray(got_a)
        m = np.isfinite(w) & active
        disagree = (np.isfinite(g) != np.isfinite(w)).mean()
        assert disagree < 0.01, disagree
        np.testing.assert_allclose(g[m], w[m], rtol=1e-3, atol=1e-3)


def test_mc_static_plan_padded_tail_fast():
    """The padded tail block's windows are empty and do not drag strip
    starts to column 0 (pure-numpy check of the static plan)."""
    from pbf_sph_tpu.ops.grid import GridSpec
    from pbf_sph_tpu.ops.curves import morton_encode3
    from pbf_sph_tpu.ops.mc import McSpec

    extent = (21, 21, 21)
    grid = GridSpec(extent=extent, maxz=int(morton_encode3(*extent)))
    mspec = McSpec.from_extent(extent, 1.0)
    sp = pallas_mc._node_static_plan(mspec, grid)
    L, lpad = sp["L"], sp["lpad"]
    assert lpad > L  # this geometry must actually have a padded tail
    nsub = lpad // pallas_mc.MC_SUB
    full_pad = np.arange(nsub) * pallas_mc.MC_SUB >= L
    assert full_pad.any()
    ncells = grid.ncells
    # padded sub-blocks: lo at the end marker, hi before it => empty windows
    assert (sp["lo_cells"][full_pad] >= ncells).all()
    assert (sp["hi_cells"][full_pad] < 0).all()
