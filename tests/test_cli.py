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
