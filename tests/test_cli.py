"""End-to-end CLI runs (small particle counts, CPU)."""

import numpy as np
import pytest

from pbf_sph_tpu import cli


def test_cli_list(capsys):
    assert cli.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "[0]" in out


def test_cli_numpy_backend(tmp_path, capsys):
    rc = cli.main([
        "--impl", "numpy", "--count", "1500", "--iter", "2", "--warmup", "1",
        "--no-surface", "--output", str(tmp_path / "o_{impl}_{type}_{iter}"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Benchmark completed after 2 frames" in out
    assert "Framerate" in out
    assert (tmp_path / "o_numpy_float_2" / "cloud.ply").exists()


@pytest.mark.slow
def test_cli_jax_backend_with_surface(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # the CLI always saves (reference behaviour)
    rc = cli.main(["--impl", "jax", "--count", "1200", "--iter", "1", "--warmup", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Final Vertex count" in out
    # surface on by default for the bench workload -> nonzero vertex count
    n = int(out.split("Final Vertex count   :")[1].splitlines()[0])
    assert n > 0


def test_cli_output_templating():
    assert cli.rendered_output_name("x_{impl}_{type}_{iter}", "jax", False, 7) == "x_jax_float_7"
    assert cli.rendered_output_name("x_{impl}_{type}_{iter}", "cpp", True, 3) == "x_cpp_double_3"


@pytest.mark.slow
def test_visualise_live_parameter_mutation(tmp_path, capsys):
    """Live per-frame parameter mutation (reference GUI sliders,
    `src/visualise.cpp:89-94,119-141`): iteration, scale, and MC resolution
    change MID-RUN; static-shape changes recompile via the per-spec step
    cache and the run keeps going."""
    from pbf_sph_tpu import visualise

    rc = visualise.main([
        "--impl", "jax", "--particles", "600", "--frames", "5",
        "--out", str(tmp_path), "--every", "2", "--solver-iter", "2",
        "--set", "2:iteration=1",
        "--set", "3:surface=0",
        "--set", "4:force=0,12,0",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "set iteration=1" in out
    assert "set surface=0" in out
    # meshes exported while the surface was on (frames 0, 2), none at 4
    assert (tmp_path / "mesh_00002.obj").exists()
    assert not (tmp_path / "mesh_00004.obj").exists()
    assert (tmp_path / "cloud_00004.ply").exists()


def test_apply_live_set_units():
    from pbf_sph_tpu.core.configs import dam_break
    from pbf_sph_tpu.visualise import apply_live_set, parse_live_sets

    _, cfg, _ = dam_break(100, surface=True)
    c = apply_live_set(cfg, "iteration", "5")
    assert c.iteration == 5
    c = apply_live_set(cfg, "mc_isolevel", "42.5")
    assert c.surface.isolevel == 42.5
    c = apply_live_set(cfg, "surface", "0")
    assert c.surface is None
    c2 = apply_live_set(c, "surface", "1")
    assert c2.surface is not None
    c = apply_live_set(cfg, "force", "1,2,3")
    assert c.constant_force == (1.0, 2.0, 3.0)
    sets = parse_live_sets(["3:iteration=2", "3:scale=450", "7:dt=0.01"])
    assert sets == {3: [("iteration", "2"), ("scale", "450")], 7: [("dt", "0.01")]}
