"""Unit tests for the v1 chunk-disjoint window plan (ops/pallas_pbf).

The pure-geometry kernels (round 3) have no per-pair mask left: correctness
rests entirely on the plan's two invariants, checked here directly on random
window sets —
  1. disjointness: no 128-lane chunk is covered by two emitted windows,
  2. coverage: every lane of every ORIGINAL window is covered by some
     emitted window (extra lanes are fine — geometry masks them).
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from pbf_sph_tpu.ops.pallas_pbf import WCOL, disjoint_windows


def emitted_chunks(lo, hi):
    """Chunk ranges [start_c, end_c) exactly as the kernel walks them."""
    c0 = lo // WCOL
    n = np.where(hi > lo, -(-(hi - c0 * WCOL) // WCOL), 0)
    return c0, c0 + n


def check(lo, hi):
    lo = np.asarray(lo)[None, None, :]
    hi = np.asarray(hi)[None, None, :]
    lo_d, hi_d = map(np.asarray, disjoint_windows(jnp.asarray(lo), jnp.asarray(hi)))
    s_c, e_c = emitted_chunks(lo_d[0, 0], hi_d[0, 0])
    # 1. chunk-disjoint
    covered = set()
    for s in range(9):
        for c in range(s_c[s], e_c[s]):
            assert c not in covered, f"chunk {c} covered twice (window {s})"
            covered.add(c)
    # 2. coverage of the original windows
    for s in range(9):
        for c in range(lo[0, 0, s] // WCOL, -(-hi[0, 0, s] // WCOL)):
            assert c in covered, f"lost chunk {c} of window {s}"
    # 3. emitted starts are chunk-aligned (Mosaic DMA requirement)
    assert (lo_d % WCOL == 0).all()


def test_disjoint_separated():
    # settled-state shape: far-apart small windows — emitted unchanged
    lo = np.arange(9) * 1000
    hi = lo + 70
    check(lo, hi)


def test_disjoint_overlapping():
    # compressed state: windows overlap pairwise and in longer chains
    lo = np.asarray([0, 50, 60, 300, 310, 320, 330, 2000, 2100])
    hi = np.asarray([100, 160, 400, 350, 500, 460, 340, 2300, 2200])
    # enforce the plan's monotone-lo precondition, keep the mess otherwise
    check(lo, np.maximum(hi, lo))


def test_disjoint_duplicates_and_empties():
    # duplicated windows (the MC edge-clamp case) + genuinely empty ones
    lo = np.asarray([0, 0, 128, 128, 128, 600, 600, 600, 900])
    hi = np.asarray([256, 256, 128, 512, 512, 600, 777, 777, 900])
    check(lo, hi)


def test_disjoint_random_monotone():
    rng = np.random.default_rng(0)
    for _ in range(200):
        lo = np.sort(rng.integers(0, 4000, 9))
        hi = lo + rng.integers(0, 900, 9)
        check(lo, hi)
