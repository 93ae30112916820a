"""Integrator and boundary-mode tests (framework extensions over the
reference's fixed semi-implicit Euler + flip-only boundary)."""

import numpy as np
import pytest

from nbodyax.physics.step import GRAV_CONSTANT, PhysicsParams, make_step
from nbodyax.state import make_state

G = float(GRAV_CONSTANT)


def circular_orbit_state():
    """Light body in a circular orbit around a heavy one."""
    M = 1e18
    r = 1000.0
    v = np.sqrt(G * M / r)
    pos = np.array([[0, 0], [r, 0]], np.float32)
    vel = np.array([[0, 0], [0, v]], np.float32)
    mass = np.array([M, 1.0], np.float32)
    radius = np.array([1.0, 1.0], np.float32)
    return make_state(pos, vel, mass, radius), r


def orbit_radius_drift(integrator, steps=2000, dt=0.5):
    st, r0 = circular_orbit_state()
    p = PhysicsParams(dt=dt, field_width=1e9, field_height=1e9,
                      collision_mode="none", boundary_mode="none",
                      integrator=integrator)
    step = make_step(p)
    for _ in range(steps):
        st = step(st)
    pos = np.asarray(st.pos)
    r = np.hypot(pos[1, 0], pos[1, 1])
    return abs(r - r0) / r0


def test_leapfrog_beats_euler_on_orbit():
    drift_euler = orbit_radius_drift("euler")
    drift_leap = orbit_radius_drift("leapfrog")
    assert drift_leap < drift_euler
    assert drift_leap < 0.01  # symplectic: radius bounded


def test_leapfrog_supports_collisions():
    st = make_state(np.array([[0, 0], [5, 0]], np.float32),
                    np.zeros((2, 2), np.float32),
                    np.array([100.0, 10.0], np.float32),
                    np.array([4.0, 4.0], np.float32))
    p = PhysicsParams(dt=0.1, field_width=1e9, field_height=1e9,
                      integrator="leapfrog")
    out = make_step(p)(st)
    assert float(out.mass[0]) == pytest.approx(110.0)
    assert float(out.mass[1]) == 0.0


def test_clamp_boundary_contains_bodies():
    """clamp mode: fast bodies cannot escape the field (unlike reference Q6)."""
    field = 1000.0
    st = make_state(np.array([[field - 5, 0], [-field + 5, 200]], np.float32),
                    np.array([[1e5, 0], [-1e5, 0]], np.float32),
                    np.array([1.0, 1.0], np.float32),
                    np.array([1.0, 1.0], np.float32))
    p = PhysicsParams(dt=1.0, field_width=field, field_height=field,
                      boundary_mode="clamp", collision_mode="none")
    step = make_step(p)
    for _ in range(10):
        st = step(st)
        pos = np.asarray(st.pos)
        assert (np.abs(pos[:, 0]) <= field - 1.0 + 1e-3).all()
        assert (np.abs(pos[:, 1]) <= field - 1.0 + 1e-3).all()


def test_reference_boundary_reflects_slow_bodies():
    """A body drifting into the wall under self-consistent accel flips and
    stays bounded over many steps (the common, non-Q6-pathological case)."""
    field = 1000.0
    M = 1e15
    st = make_state(np.array([[field - 100, 0], [0, 0]], np.float32),
                    np.array([[10.0, 0], [0, 0]], np.float32),
                    np.array([1.0, M], np.float32),
                    np.array([1.0, 50.0], np.float32))
    p = PhysicsParams(dt=0.5, field_width=field, field_height=field)
    step = make_step(p)
    for _ in range(200):
        st = step(st)
    assert np.isfinite(np.asarray(st.pos)).all()


def orbit_energy_amp(integrator, dt, steps):
    """Max relative total-energy excursion over a circular-orbit run."""
    st, r0 = circular_orbit_state()
    p = PhysicsParams(dt=dt, field_width=1e9, field_height=1e9,
                      collision_mode="none", boundary_mode="none",
                      integrator=integrator)
    step = make_step(p)

    def energy(s):
        pos = np.asarray(s.pos, np.float64)
        vel = np.asarray(s.vel, np.float64)
        m = np.asarray(s.mass, np.float64)
        ke = 0.5 * (m * (vel ** 2).sum(1)).sum()
        return ke - G * m[0] * m[1] / np.linalg.norm(pos[0] - pos[1])

    e0 = energy(st)
    amp = 0.0
    for _ in range(steps):
        st = step(st)
        amp = max(amp, abs(energy(st) - e0) / abs(e0))
    return amp


def test_yoshida4_energy_beats_leapfrog():
    """4th-order composition: energy-error amplitude over ~2 orbits is >20x
    below leapfrog's at the same dt (measured ~136x; the halved-dt
    convergence-order check is NOT possible in f32 — yoshida4 is already at
    the ~1e-6 rounding floor at this dt)."""
    dt = 0.61  # ~T/40 for the fixture orbit
    leap = orbit_energy_amp("leapfrog", dt, 80)
    yosh = orbit_energy_amp("yoshida4", dt, 80)
    assert yosh < leap / 20
    assert yosh < 1e-5


def test_yoshida4_orbit_bounded():
    drift = orbit_radius_drift("yoshida4")
    assert drift < 1e-3  # symplectic: radius bounded, tighter than leapfrog


def test_yoshida4_supports_collisions():
    st = make_state(np.array([[0, 0], [5, 0]], np.float32),
                    np.zeros((2, 2), np.float32),
                    np.array([100.0, 10.0], np.float32),
                    np.array([4.0, 4.0], np.float32))
    p = PhysicsParams(dt=0.1, field_width=1e9, field_height=1e9,
                      integrator="yoshida4")
    out = make_step(p)(st)
    assert float(out.mass[0]) == pytest.approx(110.0)
    assert float(out.mass[1]) == 0.0


def test_yoshida4_rejected_on_split_path():
    from nbodyax.physics.step import make_split_step
    p = PhysicsParams(integrator="yoshida4")
    with pytest.raises(ValueError, match="yoshida4"):
        make_split_step(p, 2)


def test_wall_restitution_damps_clamp_bounce():
    """clamp + wallRestitution=0.5: the reflected component leaves at half
    speed; e_w=0 stops the body at the wall; reference mode ignores e_w."""
    field = 1000.0
    mk = lambda: make_state(np.array([[field - 10, 0]], np.float32),
                            np.array([[100.0, 0]], np.float32),
                            np.array([1.0], np.float32),
                            np.array([1.0], np.float32))
    common = dict(dt=1.0, field_width=field, field_height=field,
                  collision_mode="none")
    half = make_step(PhysicsParams(boundary_mode="clamp",
                                   wall_restitution=0.5, **common))(mk())
    assert float(half.vel[0, 0]) == pytest.approx(-50.0)
    dead = make_step(PhysicsParams(boundary_mode="clamp",
                                   wall_restitution=0.0, **common))(mk())
    assert float(dead.vel[0, 0]) == pytest.approx(0.0)
    assert abs(float(dead.pos[0, 0])) <= field - 1.0 + 1e-3
    # reference boundary mode: e_w is ignored, Q6 flip stays exact
    a = make_step(PhysicsParams(boundary_mode="reference",
                                wall_restitution=0.5, **common))(mk())
    b = make_step(PhysicsParams(boundary_mode="reference", **common))(mk())
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))
