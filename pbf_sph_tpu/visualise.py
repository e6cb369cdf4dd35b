"""Visualisation pipeline — headless frame export.

The reference's `visualise` binary drives a Polyscope GUI with ImGui sliders
(reference `src/visualise.cpp:29-197`).  On TPU pods there is no GL surface,
so the TPU-native equivalent is a render-export loop: the same workload
(20k particles, 3 solver iterations, reference `src/visualise.cpp:44-47`),
with the surface mesh + point cloud exported per frame for offline rendering.
The ImGui-adjustable parameters are exposed as CLI flags; they remain
per-frame dynamic in the engine exactly like the GUI mutates them live
(reference `src/visualise.cpp:89-94`).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from pbf_sph_tpu.core.scene import apply_motion_sin_x_cos_z, simple_config_with_2_cubes
from pbf_sph_tpu.core.types import McParams, Scene
from pbf_sph_tpu.models import BACKENDS, make_solver
from pbf_sph_tpu.utils.export import save_checkpoint, save_obj_mesh, save_ply_points


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pbf-sph-tpu-visualise")
    p.add_argument("--impl", choices=BACKENDS, default="jax")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--particles", type=int, default=20_000)
    p.add_argument("--out", default="./frames")
    p.add_argument("--every", type=int, default=1, help="export every k-th frame")
    p.add_argument("--no-motion", action="store_true")
    # the reference GUI's live-adjustable parameters (visualise.cpp:124-135)
    p.add_argument("--solver-iter", type=int, default=3)
    p.add_argument("--dt-scale", type=float, default=1.0)
    p.add_argument("--scale", type=float, default=500.0)
    p.add_argument("--mc-resolution", type=float, default=2.0)
    p.add_argument("--mc-isolevel", type=float, default=100.0)
    p.add_argument("--mc-particle-size", type=float, default=25.0)
    p.add_argument("--mc-particle-influence", type=float, default=0.5)
    p.add_argument("--no-surface", action="store_true")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="write a resumable state checkpoint every k frames")
    p.add_argument("--resume", default="", help="resume from a checkpoint file")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    mc, config, particles = simple_config_with_2_cubes(
        args.particles, args.solver_iter, args.scale
    )
    config = config.replace(dt=config.dt * args.dt_scale)
    if not args.no_surface:
        config = config.replace(
            surface=McParams(
                resolution=args.mc_resolution,
                isolevel=args.mc_isolevel,
                particle_size=args.mc_particle_size,
                particle_influence=args.mc_particle_influence,
            )
        )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    solver = make_solver(args.impl, h=config.h)

    xs = particles
    frame0 = 0
    if args.resume:
        from pbf_sph_tpu.utils.export import load_checkpoint

        xs, last_frame = load_checkpoint(args.resume)
        frame0 = last_frame + 1  # the checkpoint holds post-frame state
        print(f"resumed {len(xs)} particles after frame {last_frame}")

    for frame in range(frame0, frame0 + args.frames):
        cfg = config if args.no_motion else apply_motion_sin_x_cos_z(config, frame)
        result, xs = solver.advance(cfg, Scene(), xs)
        if frame % args.every == 0:
            save_ply_points(out_dir / f"cloud_{frame:05d}.ply", xs)
            if config.surface is not None:
                save_obj_mesh(out_dir / f"mesh_{frame:05d}.obj", result.mesh)
        if args.checkpoint_every and frame % args.checkpoint_every == 0:
            save_checkpoint(out_dir / f"ckpt_{frame:05d}.npz", xs, frame)
        print(
            f"frame {frame}: particles={len(xs)} mesh_verts={len(result.mesh.vs)}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
