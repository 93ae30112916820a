"""Conservation tests for the physically-consistent collision modes
(BASELINE configs 2 and 3): momentum-conserving merges and elastic bounce."""

import numpy as np
import pytest

from nbodyax.physics.step import PhysicsParams, make_step
from nbodyax.state import make_state

BIG_FIELD = dict(field_width=1e12, field_height=1e12, boundary_mode="none")


def random_state(n, seed=0, overlap_heavy=True):
    rng = np.random.RandomState(seed)
    span = 50.0 if overlap_heavy else 1e6
    pos = rng.uniform(-span, span, (n, 2)).astype(np.float32)
    vel = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    mass = rng.uniform(1.0, 100.0, n).astype(np.float32)
    radius = rng.uniform(1.0, 8.0, n).astype(np.float32)
    return make_state(pos, vel, mass, radius)


def totals(st):
    m = np.asarray(st.mass, np.float64)
    v = np.asarray(st.vel, np.float64)
    return m.sum(), (m[:, None] * v).sum(0)


def test_momentum_mode_conserves_mass_and_momentum():
    st = random_state(64, seed=3)  # dense: many overlaps
    step = make_step(PhysicsParams(dt=0.0, collision_mode="momentum",
                                   **BIG_FIELD))
    m0, p0 = totals(st)
    out = step(st)
    m1, p1 = totals(out)
    assert m1 == pytest.approx(m0, rel=1e-6)
    np.testing.assert_allclose(p1, p0, rtol=1e-5, atol=1e-3)
    # merged slots die
    assert int((np.asarray(out.mass) > 0).sum()) < 64


def test_momentum_mode_chain_merges_to_root():
    # chain A(m=1) < B(m=10) < C(m=100), all overlapping pairwise neighbors
    st = make_state(np.array([[0, 0], [6, 0], [12, 0]], np.float32),
                    np.array([[1, 0], [0, 1], [-1, 0]], np.float32),
                    np.array([1.0, 10.0, 100.0], np.float32),
                    np.array([4.0, 4.0, 4.0], np.float32))
    step = make_step(PhysicsParams(dt=0.0, collision_mode="momentum",
                                   **BIG_FIELD))
    out = step(st)
    mass = np.asarray(out.mass)
    assert mass[0] == 0 and mass[1] == 0
    assert mass[2] == pytest.approx(111.0)
    # momentum: 1*(1,0) + 10*(0,1) + 100*(-1,0) = (-99, 10); v = /111
    np.testing.assert_allclose(np.asarray(out.vel)[2], [-99 / 111, 10 / 111],
                               rtol=1e-5)
    # COM position: (1*0 + 10*6 + 100*12) / 111 = 1260/111
    assert np.asarray(out.pos)[2, 0] == pytest.approx(1260 / 111, rel=1e-5)
    # area-conserving radius
    assert np.asarray(out.radius)[2] == pytest.approx(np.sqrt(48.0), rel=1e-5)


def test_momentum_mode_equal_masses_tiebreak():
    st = make_state(np.array([[0, 0], [5, 0]], np.float32),
                    np.zeros((2, 2), np.float32),
                    np.array([50.0, 50.0], np.float32),
                    np.array([4.0, 4.0], np.float32))
    step = make_step(PhysicsParams(dt=0.0, collision_mode="momentum",
                                   **BIG_FIELD))
    out = step(st)
    mass = np.asarray(out.mass)
    # lower index wins; no mass duplication (unlike reference Q1)
    assert mass[0] == pytest.approx(100.0) and mass[1] == 0.0


def test_elastic_two_body_head_on_equal_mass():
    # equal masses exchange velocities in a head-on elastic collision
    st = make_state(np.array([[0, 0], [3, 0]], np.float32),
                    np.array([[1, 0], [-1, 0]], np.float32),
                    np.array([10.0, 10.0], np.float32),
                    np.array([2.0, 2.0], np.float32))
    step = make_step(PhysicsParams(dt=0.0, collision_mode="elastic",
                                   eps=1e3, **BIG_FIELD))
    out = step(st)
    v = np.asarray(out.vel)
    assert v[0, 0] == pytest.approx(-1.0, rel=1e-5)
    assert v[1, 0] == pytest.approx(1.0, rel=1e-5)


def test_elastic_conserves_momentum_and_energy_pairwise():
    st = make_state(np.array([[0, 0], [3, 1]], np.float32),
                    np.array([[2, 0.5], [-1, -0.25]], np.float32),
                    np.array([7.0, 3.0], np.float32),
                    np.array([2.0, 2.0], np.float32))
    step = make_step(PhysicsParams(dt=0.0, collision_mode="elastic",
                                   eps=1e3, **BIG_FIELD))
    m = np.asarray(st.mass, np.float64)
    v0 = np.asarray(st.vel, np.float64)
    out = step(st)
    v1 = np.asarray(out.vel, np.float64)
    np.testing.assert_allclose((m[:, None] * v1).sum(0), (m[:, None] * v0).sum(0),
                               rtol=1e-6)
    ke0 = 0.5 * (m * (v0 ** 2).sum(1)).sum()
    ke1 = 0.5 * (m * (v1 ** 2).sum(1)).sum()
    assert ke1 == pytest.approx(ke0, rel=1e-5)


def test_elastic_separating_pair_untouched():
    # overlapping but receding bodies: no impulse (prevents sticking)
    st = make_state(np.array([[0, 0], [3, 0]], np.float32),
                    np.array([[-1, 0], [1, 0]], np.float32),
                    np.array([10.0, 10.0], np.float32),
                    np.array([2.0, 2.0], np.float32))
    step = make_step(PhysicsParams(dt=0.0, collision_mode="elastic",
                                   eps=1e3, **BIG_FIELD))
    out = step(st)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(st.vel))


def test_momentum_mode_long_run_mass_conserved():
    st = random_state(128, seed=5)
    step = make_step(PhysicsParams(dt=0.05, collision_mode="momentum",
                                   eps=1.0, **BIG_FIELD))
    m0, _ = totals(st)
    for _ in range(50):
        st = step(st)
    m1, _ = totals(st)
    assert m1 == pytest.approx(m0, rel=1e-5)
    assert np.all(np.isfinite(np.asarray(st.pos)))


# --- restitution (elastic-mode coefficient e: impulse scaled by (1+e)/2) ---

def _elastic_params(e):
    return PhysicsParams(dt=0.0, collision_mode="elastic", restitution=e,
                         eps=1e3, **BIG_FIELD)


def test_restitution_head_on_equal_mass():
    # 1-D two-body with restitution e: v' = ((1-e)v1 + (1+e)v2)/2 for equal
    # masses; head-on +-1 therefore leaves +-e
    st = make_state(np.array([[0, 0], [3, 0]], np.float32),
                    np.array([[1, 0], [-1, 0]], np.float32),
                    np.array([10.0, 10.0], np.float32),
                    np.array([2.0, 2.0], np.float32))
    out = make_step(_elastic_params(0.5))(st)
    v = np.asarray(out.vel)
    assert v[0, 0] == pytest.approx(-0.5, rel=1e-5)
    assert v[1, 0] == pytest.approx(0.5, rel=1e-5)


def test_restitution_zero_is_perfectly_inelastic():
    # e=0 kills the normal relative velocity (bodies move together) without
    # merging; head-on equal masses stop dead
    st = make_state(np.array([[0, 0], [3, 0]], np.float32),
                    np.array([[1, 0], [-1, 0]], np.float32),
                    np.array([10.0, 10.0], np.float32),
                    np.array([2.0, 2.0], np.float32))
    out = make_step(_elastic_params(0.0))(st)
    np.testing.assert_allclose(np.asarray(out.vel), 0.0, atol=1e-6)
    assert float(np.asarray(out.mass).sum()) == pytest.approx(20.0)


def test_restitution_conserves_momentum_dissipates_energy():
    st = make_state(np.array([[0, 0], [3, 1]], np.float32),
                    np.array([[2, 0.5], [-1, -0.25]], np.float32),
                    np.array([7.0, 3.0], np.float32),
                    np.array([2.0, 2.0], np.float32))
    m = np.asarray(st.mass, np.float64)
    v0 = np.asarray(st.vel, np.float64)
    out = make_step(_elastic_params(0.6))(st)
    v1 = np.asarray(out.vel, np.float64)
    np.testing.assert_allclose((m[:, None] * v1).sum(0),
                               (m[:, None] * v0).sum(0), rtol=1e-6)
    ke0 = 0.5 * (m * (v0 ** 2).sum(1)).sum()
    ke1 = 0.5 * (m * (v1 ** 2).sum(1)).sum()
    assert ke1 < ke0  # dissipative for e < 1
    # relative normal velocity reverses scaled by exactly e
    n = (np.asarray(st.pos, np.float64)[1] - np.asarray(st.pos, np.float64)[0])
    n /= np.linalg.norm(n)
    pre = np.dot(v0[1] - v0[0], n)
    post = np.dot(v1[1] - v1[0], n)
    assert post == pytest.approx(-0.6 * pre, rel=1e-5)


def test_restitution_one_is_bitwise_default():
    st = random_state(64, seed=11)
    out_def = make_step(_elastic_params(1.0))(st)
    out_e1 = make_step(PhysicsParams(dt=0.0, collision_mode="elastic",
                                     eps=1e3, **BIG_FIELD))(st)
    np.testing.assert_array_equal(np.asarray(out_def.vel),
                                  np.asarray(out_e1.vel))
