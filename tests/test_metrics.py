"""Metrics: conservation scalars and pair potential energy."""

import numpy as np
import pytest

from nbodyax.metrics import conservation_scalars, potential_energy
from nbodyax.physics.step import GRAV_CONSTANT
from nbodyax.state import make_state

G = float(GRAV_CONSTANT)


def test_conservation_scalars_basic():
    st = make_state(np.array([[0, 0], [10, 0], [5, 5]], np.float32),
                    np.array([[1, 0], [0, 2], [0, 0]], np.float32),
                    np.array([2.0, 3.0, 0.0], np.float32),  # third dead
                    np.ones(3, np.float32))
    s = conservation_scalars(st)
    assert int(s["alive"]) == 2
    assert float(s["total_mass"]) == 5.0
    assert float(s["momentum_x"]) == pytest.approx(2.0)   # 2*1 + 3*0
    assert float(s["momentum_y"]) == pytest.approx(6.0)   # 3*2
    assert float(s["kinetic_energy"]) == pytest.approx(0.5 * 2 * 1 + 0.5 * 3 * 4)


def test_potential_energy_two_body():
    d, m1, m2 = 100.0, 1e6, 2e6
    st = make_state(np.array([[0, 0], [d, 0]], np.float32),
                    np.zeros((2, 2), np.float32),
                    np.array([m1, m2], np.float32),
                    np.ones(2, np.float32))
    pe = float(potential_energy(st))
    assert pe == pytest.approx(-G * m1 * m2 / d, rel=1e-6)


def test_potential_energy_ignores_dead_and_softens():
    st = make_state(np.array([[0, 0], [100, 0], [50, 0]], np.float32),
                    np.zeros((3, 2), np.float32),
                    np.array([1e6, 2e6, 0.0], np.float32),
                    np.ones(3, np.float32))
    pe = float(potential_energy(st))
    assert pe == pytest.approx(-G * 1e6 * 2e6 / 100.0, rel=1e-6)
    pe_soft = float(potential_energy(st, eps=100.0))
    assert abs(pe_soft) < abs(pe)


def test_energy_drift_bounded_leapfrog():
    """KE+PE drift stays small over an orbit with leapfrog (property test,
    SURVEY.md section 4.5)."""
    from nbodyax.physics.step import PhysicsParams, make_step
    M, r = 1e18, 1000.0
    v = np.sqrt(G * M / r)
    st = make_state(np.array([[0, 0], [r, 0]], np.float32),
                    np.array([[0, 0], [0, v]], np.float32),
                    np.array([M, 1.0], np.float32),
                    np.ones(2, np.float32))
    p = PhysicsParams(dt=0.5, field_width=1e9, field_height=1e9,
                      collision_mode="none", boundary_mode="none",
                      integrator="leapfrog")
    step = make_step(p)
    e0 = float(conservation_scalars(st)["kinetic_energy"]) + float(
        potential_energy(st))
    for _ in range(500):
        st = step(st)
    e1 = float(conservation_scalars(st)["kinetic_energy"]) + float(
        potential_energy(st))
    assert abs(e1 - e0) / abs(e0) < 1e-3
