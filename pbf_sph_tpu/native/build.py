"""Build the C++/OpenMP oracle extension with g++ (no pybind11 — ctypes ABI).

The MC lookup tables are generated into a header from the Python single source
of truth (`pbf_sph_tpu/ops/mc_tables.py`) so both oracles share constants.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
from pathlib import Path

HERE = Path(__file__).resolve().parent
CSRC = HERE / "csrc"
BUILD = HERE / "_build"


def _tables_header() -> str:
    from pbf_sph_tpu.ops import mc_tables as m

    lines = [
        "// generated from pbf_sph_tpu/ops/mc_tables.py — do not edit",
        "#pragma once",
        "#include <cstdint>",
    ]

    def arr1(name, a):
        body = ",".join(str(int(v)) for v in a)
        lines.append(f"static const int32_t {name}[{len(a)}] = {{{body}}};")

    def arr2(name, a):
        rows = ",".join("{" + ",".join(str(int(v)) for v in row) + "}" for row in a)
        lines.append(
            f"static const int32_t {name}[{a.shape[0]}][{a.shape[1]}] = {{{rows}}};"
        )

    arr1("EDGE_TABLE", m.EDGE_TABLE)
    arr1("NUM_VERTS_TABLE", m.NUM_VERTS_TABLE)
    arr2("TRI_TABLE", m.TRI_TABLE)
    arr2("CUBE_OFFSETS", m.CUBE_OFFSETS)
    arr2("EDGE_CORNERS", m.EDGE_CORNERS)
    return "\n".join(lines) + "\n"


def build_oracle(force: bool = False) -> Path:
    """Compile (if needed) and return the shared-library path."""
    BUILD.mkdir(exist_ok=True)
    src = CSRC / "ompsph.cpp"
    header = _tables_header()
    tag = hashlib.sha256(src.read_bytes() + header.encode()).hexdigest()[:16]
    lib = BUILD / f"libompsph_{tag}.so"
    if lib.exists() and not force:
        return lib
    (BUILD / "mc_tables.h").write_text(header)
    # two objects from one source: fp32 `pbf_advance` + fp64 `pbf_advance_f64`
    # (the reference OMP backend's --fp64 switch, src/benchmark.cpp:159-165);
    # anonymous-namespace internals have internal linkage, so no clashes
    common = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-fopenmp",
        "-march=native", "-ffast-math", "-fno-finite-math-only", f"-I{BUILD}",
    ]
    o32 = BUILD / f"ompsph32_{tag}.o"
    o64 = BUILD / f"ompsph64_{tag}.o"
    subprocess.run(common + ["-c", str(src), "-o", str(o32)],
                   check=True, capture_output=True, text=True)
    subprocess.run(
        common + ["-DSPH_REAL=double", "-DPBF_ENTRY=pbf_advance_f64",
                  "-c", str(src), "-o", str(o64)],
        check=True, capture_output=True, text=True)
    subprocess.run(
        ["g++", "-shared", "-fopenmp", str(o32), str(o64), "-o", str(lib)],
        check=True, capture_output=True, text=True)
    return lib
