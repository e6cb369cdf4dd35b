"""Morton curve semantics (reference `src/curves.h`)."""

import numpy as np

from pbf_sph_tpu.ops.curves import (
    MORTON_MAX_COORD,
    index3d,
    morton_decode3,
    morton_encode3,
    to3d,
)


def test_roundtrip_exhaustive_small():
    g = np.arange(0, 33)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    code = morton_encode3(x, y, z)
    rx, ry, rz = morton_decode3(code)
    assert (rx == x).all() and (ry == y).all() and (rz == z).all()


def test_roundtrip_random_full_range():
    rng = np.random.default_rng(0)
    x = rng.integers(0, MORTON_MAX_COORD + 1, 10_000)
    y = rng.integers(0, MORTON_MAX_COORD + 1, 10_000)
    z = rng.integers(0, MORTON_MAX_COORD + 1, 10_000)
    code = morton_encode3(x, y, z)
    assert (code < (1 << 30)).all()
    rx, ry, rz = morton_decode3(code)
    np.testing.assert_array_equal(rx, x)
    np.testing.assert_array_equal(ry, y)
    np.testing.assert_array_equal(rz, z)


def test_known_values():
    # interleave pattern: x gets bit 0, y bit 1, z bit 2 (curves.h:87 `x | y<<1 | z<<2`)
    assert morton_encode3(1, 0, 0) == 1
    assert morton_encode3(0, 1, 0) == 2
    assert morton_encode3(0, 0, 1) == 4
    assert morton_encode3(2, 0, 0) == 8
    assert morton_encode3(1023, 1023, 1023) == (1 << 30) - 1
    # benchmark-domain extent: 24 cells/axis
    assert morton_encode3(24, 24, 24) == 32256


def test_monotone_per_axis():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1023, 1000)
    y = rng.integers(0, 1024, 1000)
    z = rng.integers(0, 1024, 1000)
    assert (morton_encode3(x + 1, y, z) > morton_encode3(x, y, z)).all()


def test_python_int_scalars():
    # must also fold on plain python ints (used for static maxZ computation)
    assert isinstance(morton_encode3(24, 24, 24), int)


def test_index3d_roundtrip():
    for idx in range(4 * 5 * 6):
        x, y, z = to3d(idx, 4, 5, 6)
        assert index3d(x, y, z, 4, 5, 6) == idx


def test_jax_parity():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    x = rng.integers(0, 1024, 4096).astype(np.int32)
    y = rng.integers(0, 1024, 4096).astype(np.int32)
    z = rng.integers(0, 1024, 4096).astype(np.int32)
    ref = morton_encode3(x.astype(np.int64), y.astype(np.int64), z.astype(np.int64))
    out = np.asarray(morton_encode3(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)))
    np.testing.assert_array_equal(out, ref.astype(np.int32))
    dx, dy, dz = morton_decode3(jnp.asarray(out))
    np.testing.assert_array_equal(np.asarray(dx), x)
    np.testing.assert_array_equal(np.asarray(dy), y)
    np.testing.assert_array_equal(np.asarray(dz), z)
