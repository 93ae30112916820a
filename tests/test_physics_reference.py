"""Golden physics tests for the reference-semantics oracle.

Validates the jnp step against hand-integrated cases and the quirk catalog of
SURVEY.md section 3.5 (Q1 equal-mass double absorb, Q6 accel*dt boundary probe,
Q10 ad-hoc radius growth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbodyax.physics.pairwise import pair_accumulators
from nbodyax.physics.step import GRAV_CONSTANT, PhysicsParams, make_step
from nbodyax.state import make_state

G = float(GRAV_CONSTANT)


def make2(p0, p1, m0, m1, r0=1.0, r1=1.0, v0=(0, 0), v1=(0, 0)):
    return make_state(np.array([p0, p1], np.float32),
                      np.array([v0, v1], np.float32),
                      np.array([m0, m1], np.float32),
                      np.array([r0, r1], np.float32))


BIG_FIELD = dict(field_width=1e12, field_height=1e12)


def test_two_body_hand_computed_step():
    d, m2 = 1000.0, 1e12
    st = make2((0, 0), (d, 0), 1e3, m2)
    step = make_step(PhysicsParams(dt=0.5, **BIG_FIELD))
    out = step(st)
    # force on body0: (d,0) * m2 / d^3 -> accel_x = G*m2/d^2
    ax = G * m2 / d**2
    assert out.vel[0, 0] == pytest.approx(ax * 0.5, rel=1e-6)
    assert out.vel[0, 1] == 0
    assert out.pos[0, 0] == pytest.approx(ax * 0.5 * 0.5, rel=1e-6)
    # symmetric pull on body1 (scaled by m1)
    assert out.vel[1, 0] == pytest.approx(-G * 1e3 / d**2 * 0.5, rel=1e-6)
    # semi-implicit: position uses the *updated* velocity (nbody.cu:288)
    assert out.pos[1, 0] == pytest.approx(d + float(out.vel[1, 0]) * 0.5, rel=1e-7)


def test_overlap_heavier_absorbs_lighter():
    st = make2((0, 0), (5, 0), 100.0, 10.0, r0=4.0, r1=4.0)  # d=5 < r0+r1=8
    step = make_step(PhysicsParams(dt=0.1, growth_rate=0.25, **BIG_FIELD))
    out = step(st)
    assert float(out.mass[0]) == pytest.approx(110.0)       # nbody.cu:218
    assert float(out.radius[0]) == pytest.approx(4.0 + 4.0 * 0.25)  # Q10
    assert float(out.mass[1]) == 0.0                         # nbody.cu:245
    # overlapping pair exerts no gravity (continue at nbody.cu:221,226)
    assert float(out.vel[0, 0]) == 0.0 and float(out.vel[1, 0]) == 0.0


def test_equal_mass_double_absorb_quirk_q1():
    st = make2((0, 0), (5, 0), 50.0, 50.0, r0=4.0, r1=4.0)
    step = make_step(PhysicsParams(dt=0.1, **BIG_FIELD))
    out = step(st)
    # Both satisfy m_i >= m_j: both absorb, neither dies, mass duplicates.
    assert float(out.mass[0]) == pytest.approx(100.0)
    assert float(out.mass[1]) == pytest.approx(100.0)


def test_non_transactional_absorb_chain():
    # A(idx0, m=1) overlaps B(idx1, m=10) overlaps C(idx2, m=100); A-C apart.
    st = make_state(np.array([[0, 0], [6, 0], [12, 0]], np.float32),
                    np.zeros((3, 2), np.float32),
                    np.array([1.0, 10.0, 100.0], np.float32),
                    np.array([4.0, 4.0, 4.0], np.float32))
    step = make_step(PhysicsParams(dt=0.1, growth_rate=0.1, **BIG_FIELD))
    out = step(st)
    # B absorbs A (gains 1) but dies to C in the same pass; C gains B's
    # step-start mass only. A dies to B.
    assert float(out.mass[0]) == 0.0
    assert float(out.mass[1]) == 0.0
    assert float(out.mass[2]) == pytest.approx(110.0)


def test_boundary_flip_uses_accel_dt_probe_q6():
    # Body at rest near +x wall, with another body pulling it OUTWARD so that
    # pos + accel*dt crosses field - r. Velocity flips sign (from the *old*
    # velocity) before the kick is added (nbody.cu:256-264).
    field = 1000.0
    p = PhysicsParams(dt=1.0, field_width=field, field_height=field)
    d, m2 = 50.0, 1e15
    # body0 sits 1 unit inside the wall; body1 beyond the wall pulls it out
    st = make2((field - 2.0, 0), (field - 2.0 + d, 0), 1.0, m2, r0=1.0, r1=1.0,
               v0=(3.0, 0))
    ax = G * m2 / d**2
    assert ax * 1.0 > 2.0  # probe crosses the wall
    out = make_step(p)(st)
    # old vel flipped: 3 -> -3, then kick added
    assert float(out.vel[0, 0]) == pytest.approx(-3.0 + ax, rel=1e-5)


def test_boundary_probe_not_velocity():
    # Huge velocity toward the wall but zero accel probe => NO flip (Q6).
    field = 1000.0
    p = PhysicsParams(dt=1.0, field_width=field, field_height=field)
    st = make2((field - 5.0, 0), (0, 500.0), 1.0, 1.0, r0=1.0, r1=1.0,
               v0=(1e6, 0))
    out = make_step(p)(st)
    assert float(out.vel[0, 0]) > 0  # escaped un-flipped, reference-faithful


def test_softening_reduces_force():
    d, m2 = 10.0, 1e12
    st = make2((0, 0), (d, 0), 1.0, m2, r0=1.0, r1=1.0)
    hard = pair_accumulators(st.pos, st.vel, st.mass, st.radius, eps=0.0)
    soft = pair_accumulators(st.pos, st.vel, st.mass, st.radius, eps=10.0)
    expect = m2 * d / (d * d + 100.0) ** 1.5
    assert float(soft.force[0, 0]) == pytest.approx(expect, rel=1e-6)
    assert float(soft.force[0, 0]) < float(hard.force[0, 0])


def test_dead_bodies_inert():
    # A dead (mass 0) slot exerts no force, can't collide, isn't absorbed.
    st = make_state(np.array([[0, 0], [5, 0], [100, 0]], np.float32),
                    np.zeros((3, 2), np.float32),
                    np.array([10.0, 0.0, 1.0], np.float32),
                    np.array([4.0, 4.0, 1.0], np.float32))
    acc = pair_accumulators(st.pos, st.vel, st.mass, st.radius)
    assert float(acc.gained_mass[0]) == 0.0
    assert float(acc.gained_radius[0]) == 0.0
    assert not bool(acc.died[2])
    # force on body2 comes only from body0
    expect = 10.0 * 100.0 / 100.0**3
    assert float(acc.force[2, 0]) == pytest.approx(-expect, rel=1e-6)


def test_three_body_reference_fixture_runs():
    """The reference author's debug scenario (nbody.cu:418-429) stays finite
    and behaves sanely for 100 steps."""
    from nbodyax.config import SimConfig
    from nbodyax.scenes import three_body_scene
    cfg = SimConfig(scene="three_body")
    st = three_body_scene(cfg)
    step = make_step(PhysicsParams(dt=0.2, field_width=100000,
                                   field_height=100000))
    for _ in range(100):
        st = step(st)
    assert np.all(np.isfinite(np.asarray(st.pos)))
    assert np.all(np.isfinite(np.asarray(st.vel)))


@pytest.mark.slow
def test_chunking_invariance():
    """Accumulators are identical whatever the i-chunk size (incl. N not a
    multiple of the chunk)."""
    rng = np.random.RandomState(0)
    n = 37
    pos = rng.uniform(-100, 100, (n, 2)).astype(np.float32)
    vel = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    mass = rng.uniform(1, 100, n).astype(np.float32)
    mass[5] = 0.0  # a dead slot
    radius = rng.uniform(1, 12, n).astype(np.float32)
    ref = None
    for chunk in (37, 8, 16, 5):
        for mode in ("reference", "momentum", "elastic"):
            acc = pair_accumulators(pos, vel, mass, radius, mode=mode,
                                    chunk=chunk, growth_rate=0.1)
            if chunk == 37:
                key = mode
            np.testing.assert_allclose(
                np.asarray(acc.force),
                np.asarray(pair_accumulators(pos, vel, mass, radius, mode=mode,
                                             growth_rate=0.1, chunk=n).force),
                rtol=1e-5, atol=1e-6)
            if mode == "reference":
                base = pair_accumulators(pos, vel, mass, radius, mode=mode,
                                         growth_rate=0.1, chunk=n)
                np.testing.assert_array_equal(np.asarray(acc.died),
                                              np.asarray(base.died))
                np.testing.assert_allclose(np.asarray(acc.gained_mass),
                                           np.asarray(base.gained_mass),
                                           rtol=1e-6, atol=1e-6)
            if mode == "momentum":
                base = pair_accumulators(pos, vel, mass, radius, mode=mode,
                                         growth_rate=0.1, chunk=n)
                np.testing.assert_array_equal(np.asarray(acc.parent),
                                              np.asarray(base.parent))
