"""Export + checkpoint/resume round-trips."""

import numpy as np

from pbf_sph_tpu.core.scene import simple_config_with_2_cubes
from pbf_sph_tpu.core.types import Scene
from pbf_sph_tpu.models.numpy_solver import NumpySolver
from pbf_sph_tpu.utils.export import (
    load_checkpoint,
    save,
    save_checkpoint,
)


def test_save_ply_obj(tmp_path):
    mc, cfg, xs = simple_config_with_2_cubes(1000, 2, 500.0)
    cfg = cfg.replace(surface=mc)
    res, xs = NumpySolver().advance(cfg, Scene(), xs)
    save(res, xs, tmp_path / "out")
    ply = (tmp_path / "out" / "cloud.ply").read_text().splitlines()
    assert ply[0] == "ply"
    assert any(l.startswith("element vertex") for l in ply)
    n_header = ply.index("end_header") + 1
    assert len(ply) - n_header == len(xs)
    obj = (tmp_path / "out" / "mesh.obj").read_text().splitlines()
    n_v = sum(1 for l in obj if l.startswith("v "))
    n_f = sum(1 for l in obj if l.startswith("f "))
    assert n_v == len(res.mesh.vs)
    assert n_f == len(res.mesh.vs) // 3


def test_checkpoint_roundtrip(tmp_path):
    mc, cfg, xs = simple_config_with_2_cubes(500, 2, 500.0)
    solver = NumpySolver()
    _, xs = solver.advance(cfg, Scene(), xs)
    save_checkpoint(tmp_path / "ck.npz", xs, frame=7)
    xs2, frame = load_checkpoint(tmp_path / "ck.npz")
    assert frame == 7
    np.testing.assert_array_equal(xs2.pid, xs.pid)
    np.testing.assert_array_equal(xs2.position, xs.position)
    np.testing.assert_array_equal(xs2.velocity, xs.velocity)

    # resumed simulation continues identically to an uninterrupted one
    _, a = solver.advance(cfg, Scene(), xs)
    _, b = solver.advance(cfg, Scene(), xs2)
    np.testing.assert_array_equal(a.position, b.position)
