#!/usr/bin/env python
"""Load-balance study under the sloshing workload (VERDICT round-1 #9).

Runs the single-chip solver on the benchmark's oscillating-bounds motion
(`apply_motion_sin_x_cos_z`, reference `src/sph.hpp:147-158`) and records the
per-x-slab particle fraction every frame for an n_dev-way decomposition.
The peak slab fraction over the run is the data the sharded `cap_local`
default must cover.

Run: python tools/load_balance.py [count] [n_dev] [frames]
Env: PBF_LB_REBALANCE=1 applies the sharded engine's dynamic-boundary
policy (equal-count x-CDF partition, movement clamped to 1 column/frame,
min_slab_w floor — `parallel/sharded.py` step 8) as an offline what-if on
the same single-chip run, and reports both fixed and rebalanced tables.
"""
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbf_sph_tpu.core.configs import dam_break
from pbf_sph_tpu.core.scene import apply_motion_sin_x_cos_z
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models import make_solver
from pbf_sph_tpu.models.jax_solver import dyn_params_of


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    impl = os.environ.get("PBF_LB_IMPL", "pallas")

    mc, cfg, xs = dam_break(count, solver_iter=6)
    solver = make_solver(impl, h=cfg.h)
    spec, state, scn = solver.prepare(cfg, Scene(), xs)
    grid = spec.grid
    slab_w = -(-grid.dims[0] // n_dev)
    h = spec.h
    scale = float(spec.scale)

    rebalance = os.environ.get("PBF_LB_REBALANCE", "") not in ("", "0")
    min_slab_w = 3
    gx = grid.dims[0]

    @jax.jit
    def col_hist(state, dyn):
        """Particle count per global x-column (the rebalance CDF input)."""
        min_ext_x = dyn["min_bound"][0] / scale - h * 2
        gcx = jnp.trunc(
            jnp.clip((state.position[0] / scale - min_ext_x) / h, -2e9, 2e9)
        ).astype(jnp.int32)
        gcx = jnp.clip(gcx, 0, gx - 1)
        return jnp.zeros((gx,), jnp.int32).at[gcx].add(
            state.alive.astype(jnp.int32)
        )

    def rebalance_bounds(bounds, hist):
        """Mirror of parallel/sharded.py step 8: equal-count targets from the
        x-CDF, movement clamped to 1 column/frame, widths >= min_slab_w."""
        cdf = np.cumsum(hist)
        total = int(cdf[-1])
        new = bounds.copy()
        for d in range(1, n_dev):
            target = (total * d) // n_dev
            raw = int(np.searchsorted(cdf, target, side="left")) + 1
            raw = int(np.clip(raw, bounds[d] - 1, bounds[d] + 1))
            lo = new[d - 1] + min_slab_w
            hi = gx - min_slab_w * (n_dev - d)
            new[d] = int(np.clip(raw, lo, hi))
        return new

    fracs = []
    import dataclasses

    dyn0 = dyn_params_of(cfg, solver.dtype)
    # settle + capacity growth (same protocol as bench.py, abbreviated)
    for _round in range(4):
        ovf = 0
        for _ in range(5):
            state, out = solver.step_device(spec, state, dyn0, scn)
            ovf = max(ovf, int(out["strip_overflow"]))
        changes = {}
        occ = int(out["max_occupancy"])
        if occ > spec.cell_capacity:
            changes["cell_capacity"] = -(-occ // 16) * 16 + 16
        if ovf > 0:
            from pbf_sph_tpu.ops.pallas_pbf import grown_strip_capacity

            changes["strip_capacity"] = grown_strip_capacity(spec, ovf)
        if not changes:
            break
        print(f"# growing {changes}", file=sys.stderr)
        spec = dataclasses.replace(spec, **changes)
        from pbf_sph_tpu.core.types import FluidState

        state = jax.device_put(FluidState.from_soa(xs, spec.capacity, solver.dtype))

    fixed_bounds = np.arange(n_dev + 1, dtype=np.int64) * slab_w
    fixed_bounds[-1] = gx
    dyn_bounds = None
    fracs_dyn = []
    for f in range(frames):
        c = apply_motion_sin_x_cos_z(cfg, f)
        dyn = dyn_params_of(c, solver.dtype)
        state, out = solver.step_device(spec, state, dyn, scn)
        hist = np.asarray(col_hist(state, dyn))
        cdf = np.cumsum(hist)

        def slab_fracs(bounds):
            ends = np.minimum(bounds[1:], gx)
            cum = cdf[ends - 1]  # inclusive prefix count at each boundary
            return np.diff(np.concatenate(([0], cum))) / max(cdf[-1], 1)

        fracs.append(slab_fracs(fixed_bounds))
        if rebalance:
            if dyn_bounds is None:
                # initial partition: unclamped equal-count boundaries
                # (ShardSpec.initial_bounds semantics)
                dyn_bounds = np.zeros(n_dev + 1, dtype=np.int64)
                dyn_bounds[-1] = gx
                for d in range(1, n_dev):
                    target = (int(cdf[-1]) * d) // n_dev
                    v = int(np.searchsorted(cdf, target, side="left")) + 1
                    lo = dyn_bounds[d - 1] + min_slab_w
                    hi = gx - min_slab_w * (n_dev - d)
                    dyn_bounds[d] = int(np.clip(v, lo, hi))
            fracs_dyn.append(slab_fracs(dyn_bounds))
            dyn_bounds = rebalance_bounds(dyn_bounds, hist)
    fracs = np.asarray(fracs)  # (frames, n_dev)

    def report(fr, label):
        peak_per_slab = fr.max(axis=0)
        peak = float(fr.max())
        print(f"[{label}] slabs={n_dev} frames={frames} count={count}")
        print("peak fraction per slab:", np.round(peak_per_slab, 4).tolist())
        print("mean fraction per slab:", np.round(fr.mean(axis=0), 4).tolist())
        print(f"peak slab fraction: {peak:.4f}  (uniform {1/n_dev:.4f}; "
              f"imbalance {peak*n_dev:.2f}x)")
        hist, edges = np.histogram(fr.max(axis=1), bins=10)
        print("per-frame max-slab-fraction histogram:")
        for i, hv in enumerate(hist):
            print(f"  [{edges[i]:.3f},{edges[i+1]:.3f}): {hv}")
        return peak, peak_per_slab

    peak, peak_per_slab = report(fracs, "fixed slab_w=%d" % slab_w)
    out = dict(count=count, n_dev=n_dev, frames=frames,
               peak_frac=peak, peak_per_slab=peak_per_slab.tolist(),
               mean_per_slab=fracs.mean(axis=0).tolist())
    if rebalance:
        fracs_dyn = np.asarray(fracs_dyn)
        pk, pps = report(fracs_dyn, "rebalanced (CDF, 1 col/frame)")
        out.update(peak_frac_rebalanced=pk, peak_per_slab_rebalanced=pps.tolist(),
                   mean_per_slab_rebalanced=fracs_dyn.mean(axis=0).tolist())
    with open("/tmp/load_balance.json", "w") as fh:
        json.dump(out, fh)
    print("# wrote /tmp/load_balance.json")


if __name__ == "__main__":
    main()
