"""Native library (nbodycore.cpp) vs the pure-Python implementations."""

import numpy as np
import pytest

from nbodyax.native import binding
from nbodyax.rng import RefRandgen

pytestmark = pytest.mark.skipif(not binding.available(),
                                reason="no C++ toolchain / native lib")


def test_native_ival64_matches_python():
    for seed in (1024, 42, 0, 2**63 + 5):
        got = binding.ival64_sequence(seed, 64)
        g = RefRandgen(seed)
        want = np.array([g.ival64() for _ in range(64)], np.uint64)
        np.testing.assert_array_equal(got, want)


def test_native_scene_matches_python():
    import nbodyax.rng as rng_mod
    n = 500
    native = binding.scene_arrays(1024, n, 100000, 100000, 1e4, 1e17, 50, 200)
    # force the pure-Python path for the comparison
    g = RefRandgen(1024)
    pos = np.empty((n, 2), np.float32)
    mass = np.empty(n, np.float32)
    radius = np.empty(n, np.float32)
    lo_m, hi_m = float(np.float32(1e4)), float(np.float32(1e17))
    for i in range(n):
        pos[i, 0] = np.float32(g.fval_range(0, 200000) - 100000)
        pos[i, 1] = np.float32(g.fval_range(0, 200000) - 100000)
        mass[i] = np.float32(g.fval_range(lo_m, hi_m))
        radius[i] = np.float32(g.fval_range(50.0, 200.0))
    np.testing.assert_array_equal(native[0], pos)
    np.testing.assert_array_equal(native[2], mass)
    np.testing.assert_array_equal(native[3], radius)
    assert np.all(native[1] == 0)


def test_native_scene_golden_values():
    # same goldens as tests/test_rng.py (captured from the reference RNG)
    pos, vel, mass, radius = binding.scene_arrays(
        1024, 4, 100000, 100000, 1e4, 1e17, 50.0, 200.0)
    assert pos[0, 0] == np.float32(84755.8203)
    assert pos[0, 1] == np.float32(-9983.19141)
    assert mass[0] == np.float32(2.55396902e+15)
    assert radius[0] == np.float32(189.339737)


def test_native_pgm_writer(tmp_path):
    img = np.arange(20, dtype=np.uint8).reshape(4, 5)
    path = str(tmp_path / "native.ppm")
    assert binding.write_pgm(path, img)
    raw = open(path, "rb").read()
    assert raw == b"P5\n5 4\n255\n" + bytes(range(20))


def test_native_scene_large_is_fast():
    import time
    t0 = time.perf_counter()
    pos, vel, mass, radius = binding.scene_arrays(
        7, 1_000_000, 100000, 100000, 1e4, 1e17, 50.0, 200.0)
    dt = time.perf_counter() - t0
    assert dt < 5.0  # native: ~tens of ms; Python would take ~minutes
    assert np.isfinite(pos).all() and (mass > 0).all()
