"""Degenerate-size and boundary-condition edge cases."""

import numpy as np
import pytest

from nbodyax.physics.pairwise import pair_accumulators
from nbodyax.physics.kernels import pallas_pair_accumulators
from nbodyax.physics.step import PhysicsParams, make_step
from nbodyax.state import make_state


def single_body():
    return make_state(np.array([[5.0, 5.0]], np.float32),
                      np.array([[1.0, 0.0]], np.float32),
                      np.array([3.0], np.float32),
                      np.array([1.0], np.float32))


def test_single_body_drifts_freely():
    st = single_body()
    p = PhysicsParams(dt=0.5, field_width=1e6, field_height=1e6)
    out = make_step(p)(st)
    np.testing.assert_allclose(np.asarray(out.pos), [[5.5, 5.0]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), [[1.0, 0.0]])
    assert float(out.mass[0]) == 3.0


def test_single_body_kernel_zero_force():
    st = single_body()
    acc = pallas_pair_accumulators(st.pos, st.vel, st.mass, st.radius,
                                   mode="reference", growth_rate=0.1,
                                   tile_i=8, tile_j=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(acc.force), 0.0)
    assert not bool(acc.died[0])


def test_all_dead_state_is_stable():
    st = make_state(np.zeros((4, 2), np.float32), np.zeros((4, 2), np.float32),
                    np.zeros(4, np.float32), np.ones(4, np.float32))
    p = PhysicsParams(dt=0.5, field_width=1e3, field_height=1e3)
    out = make_step(p)(st)
    assert np.isfinite(np.asarray(out.pos)).all()
    np.testing.assert_array_equal(np.asarray(out.mass), 0.0)


def test_two_coincident_bodies_merge_not_nan():
    # exactly coincident: d=0; reference semantics absorb, no NaN anywhere
    st = make_state(np.zeros((2, 2), np.float32), np.zeros((2, 2), np.float32),
                    np.array([5.0, 2.0], np.float32),
                    np.array([1.0, 1.0], np.float32))
    p = PhysicsParams(dt=0.5, field_width=1e3, field_height=1e3)
    out = make_step(p)(st)
    assert np.isfinite(np.asarray(out.pos)).all()
    assert float(out.mass[0]) == 7.0 and float(out.mass[1]) == 0.0


def test_momentum_parent_ids_exact_beyond_2pow24():
    """Parent ids ride a dedicated i32 kernel output, so momentum mode is
    exact at any i32-indexable N (the f32 channel used to cap it at 2^24).
    Exercised via tile offsets: a small tile whose *global* ids sit beyond
    2^24 — the id arithmetic is identical to a genuine 32M-body run's."""
    from nbodyax.physics.kernels import body_features, decode_raw, \
        tile_accumulators_raw
    base = (1 << 25) + 3  # > 2^24; (1<<25)+3 is not f32-representable
    n = 8
    pos = np.zeros((n, 2), np.float32)
    pos[:, 0] = np.arange(n) * 1000.0  # far apart except the pair below
    pos[1, 0] = pos[0, 0] + 5.0        # bodies 0 and 1 overlap
    vel = np.zeros((n, 2), np.float32)
    mass = np.arange(1, n + 1, dtype=np.float32)
    radius = np.full(n, 10.0, np.float32)
    feats = body_features(
        np.asarray(pos), np.asarray(vel), np.asarray(mass), np.asarray(radius))
    raw, par = tile_accumulators_raw(feats, feats.T, base, base,
                                     mode="momentum", eps=0.0,
                                     growth_rate=0.1, tile_i=8, tile_j=128,
                                     interpret=True)
    acc = decode_raw(raw, par, base, np.asarray(mass), "momentum")
    parent = np.asarray(acc.parent)
    assert parent[0] == base + 1          # 0 merges into heavier 1, exactly
    assert float(np.asarray(acc.best_mass)[0]) == 2.0
    # non-overlapping bodies stay self-parented at their exact global ids
    np.testing.assert_array_equal(parent[2:], base + np.arange(2, n))


@pytest.mark.parametrize("m,exact", [(1e20, True), (1e36, False)])
def test_elastic_kernel_huge_masses_no_nan(m, exact):
    """Masses near f32 extremes: the elastic impulse must stay finite
    (regression test for a fused-denominator overflow -> NaN). Beyond the
    1e37 denominator clamp the impulse degrades toward 0 by design."""
    st = make_state(np.array([[0, 0], [150, 0]], np.float32),
                    np.array([[1, 0], [-1, 0]], np.float32),
                    np.array([m, m], np.float32),
                    np.array([100.0, 100.0], np.float32))
    acc = pallas_pair_accumulators(st.pos, st.vel, st.mass, st.radius,
                                   mode="elastic", growth_rate=0.1,
                                   tile_i=8, tile_j=128, interpret=True)
    dv = np.asarray(acc.dv)
    assert np.isfinite(dv).all()
    if exact:
        # equal masses, head-on: each body's velocity change magnitude is 2
        np.testing.assert_allclose(dv[0], [-2.0, 0.0], rtol=1e-5)
