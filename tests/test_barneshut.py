"""Barnes-Hut/FMM force model vs the exact all-pairs oracle."""

import numpy as np
import pytest

from nbodyax.physics.barneshut import (auto_levels, bh_accumulators,
                                       overflow_count)
from nbodyax.physics.pairwise import pair_accumulators

# full-module slow tier: every case here compiles multi-engine
# bh/shard graphs (CLAUDE.md batch recipe); the fast tier keeps bh
# coverage via tests/test_giants.py smoke
pytestmark = pytest.mark.slow


def random_state(n, seed=0, field=10000.0, rmax=8.0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-field, field, (n, 2)).astype(np.float32)
    vel = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    mass = rng.uniform(1, 100, n).astype(np.float32)
    if n > 10:
        mass[5] = 0.0
    radius = rng.uniform(1, rmax, n).astype(np.float32)
    return pos, vel, mass, radius


def rel_force_err(a, b):
    fa, fb = np.asarray(a.force, np.float64), np.asarray(b.force, np.float64)
    scale = np.linalg.norm(fb, axis=1)
    denom = np.maximum(scale, np.percentile(scale, 50))
    return (np.linalg.norm(fa - fb, axis=1) / denom).max()


@pytest.mark.parametrize("near", ["rows", "slots"])
@pytest.mark.parametrize("ring,tol", [(1, 0.05), (2, 0.01)])
def test_far_field_accuracy(ring, tol, near):
    pos, vel, mass, radius = random_state(2048, seed=1)
    bh = bh_accumulators(pos, vel, mass, radius, eps=50.0, mode="none",
                         ring=ring, levels=4, neighbor_k=64, near=near)
    ex = pair_accumulators(pos, vel, mass, radius, eps=50.0, mode="none")
    assert rel_force_err(bh, ex) < tol


@pytest.mark.parametrize("near", ["rows", "slots"])
@pytest.mark.parametrize("mode", ["reference", "momentum", "elastic"])
def test_collision_channels_match_exact(mode, near):
    """With every body's neighborhood fully inside the near window (small
    radii vs cell size, K large enough), collision decisions are EXACT."""
    pos, vel, mass, radius = random_state(1024, seed=2, field=2000.0,
                                          rmax=15.0)
    bh = bh_accumulators(pos, vel, mass, radius, eps=10.0, growth_rate=0.1,
                         mode=mode, levels=4, neighbor_k=128, near=near)
    # cell size = 2*2000*1.0001/16 = 250 > 2*rmax -> all overlaps in-window
    ex = pair_accumulators(pos, vel, mass, radius, eps=10.0, growth_rate=0.1,
                           mode=mode)
    if mode == "reference":
        np.testing.assert_allclose(np.asarray(bh.gained_mass),
                                   np.asarray(ex.gained_mass), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(bh.died), np.asarray(ex.died))
    if mode == "momentum":
        np.testing.assert_array_equal(np.asarray(bh.parent),
                                      np.asarray(ex.parent))
    if mode == "elastic":
        da, de = np.asarray(bh.dv), np.asarray(ex.dv)
        scale = max(np.abs(de).max(), 1e-30)
        assert np.abs(da - de).max() / scale < 2e-5


def test_bh_step_trajectory_close_to_exact():
    from nbodyax.physics.step import PhysicsParams, make_step
    from nbodyax.state import make_state
    from functools import partial

    pos, vel, mass, radius = random_state(512, seed=3, field=2000.0)
    st = make_state(pos, vel, mass, radius)
    p = PhysicsParams(dt=0.2, field_width=2000, field_height=2000, eps=50.0)
    exact = make_step(p)
    bh = make_step(p, accum_fn=partial(
        bh_accumulators, eps=p.eps, growth_rate=p.growth_rate,
        mode=p.collision_mode, ring=2, levels=4, neighbor_k=128))
    a = b = st
    for _ in range(10):
        a = bh(a)
        b = exact(b)
    # merge decisions agree; positions drift only at the far-field error level
    np.testing.assert_array_equal(np.asarray(a.mass) > 0,
                                  np.asarray(b.mass) > 0)
    pa, pb = np.asarray(a.pos), np.asarray(b.pos)
    assert np.abs(pa - pb).max() / 4000.0 < 0.01


def test_overflow_count():
    # 99 coincident bodies land in corner cell (0,0).
    pos = np.zeros((100, 2), np.float32)
    mass = np.ones(100, np.float32)
    pos[0] = [100.0, 100.0]  # spread the extent so cells are well-defined
    # rows: windows are ROWS of 2*ring+1 cells capped at K. The hot cell is
    # inside 2 in-grid window positions (centers x=0 and x=1 on row y=0),
    # each overflowing by 99-K.
    n_over = int(overflow_count(pos, mass, levels=3, neighbor_k=32, ring=1,
                                near="rows"))
    assert n_over == 2 * (99 - 32)
    # slots: K caps the partner slots visible per CELL, so the hot cell
    # overflows by 99 - K — clustering costs less under per-cell caps
    n_over = int(overflow_count(pos, mass, levels=3, neighbor_k=32, ring=1,
                                near="slots"))
    assert n_over == 99 - 32
    # a big-enough cap clears both
    for near in ("rows", "slots"):
        assert int(overflow_count(pos, mass, levels=3, neighbor_k=128,
                                  near=near)) == 0
    # pinning K below the structural slot_cap floor must not report
    # overflow the slot grid actually covers: the grid exposes
    # max(K, slot_cap) partner slots per cell, and both the fast and the
    # completion pass see that effective cap
    assert int(overflow_count(pos, mass, levels=3, neighbor_k=8,
                              near="slots")) == \
        int(overflow_count(pos, mass, levels=3, neighbor_k=32,
                           near="slots"))


@pytest.mark.parametrize("near", ["rows", "slots"])
def test_dead_bodies_excluded(near):
    pos, vel, mass, radius = random_state(256, seed=4, field=1000.0)
    mass[::3] = 0.0
    bh = bh_accumulators(pos, vel, mass, radius, eps=10.0, mode="reference",
                         levels=3, neighbor_k=64, near=near)
    assert np.all(np.asarray(bh.force)[::3] == 0)
    assert not np.asarray(bh.died)[::3].any()
    ex = pair_accumulators(pos, vel, mass, radius, eps=10.0, mode="reference")
    np.testing.assert_array_equal(np.asarray(bh.died), np.asarray(ex.died))


def test_auto_levels():
    # target occupancy 16 (v5e-tuned: near field is cap-bound, far field
    # pays per level — see auto_levels docstring)
    assert auto_levels(1024) == 3
    assert auto_levels(1_000_000) == 8
    assert auto_levels(100_000_000) == 10  # capped


def test_slot_cap_density_aware():
    """2x average occupancy, multiple of 8, floored at 32: coarse grids get
    proportionally more fast-pass slots instead of flooding the completion
    budget (the failure that blocked occupancy-64 grids in round 2)."""
    from nbodyax.physics.barneshut import slot_cap
    assert slot_cap(1 << 20, 1 << 16) == 32        # occupancy 16 (2-D auto)
    assert slot_cap(1 << 20, 1 << 18) == 32        # occupancy 4 (3-D ceil)
    assert slot_cap(1 << 20, 1 << 15) == 64        # occupancy 32
    assert slot_cap(1 << 20, 1 << 14) == 128       # occupancy 64
    assert slot_cap(100, 64) == 32                 # tiny: floor
    assert slot_cap(1 << 24, 16) == 1024           # ceiling
    # always sublane-aligned and >= 2x occupancy (until the ceiling)
    for n, c in [(1000, 30), (5000, 12), (12345, 67)]:
        cap = slot_cap(n, c)
        assert cap % 8 == 0 and (cap >= 2 * (n // c) or cap == 1024)


def test_quadrupole_improves_far_field():
    """bhOrder=2 at ring=1 beats monopole by ~an order of magnitude on the
    gathered ("direct") engine, where the order applies to every far cell.
    On the hybrid FMM engine the exact-target annulus shell is always
    quadrupole, so order=1 is already much better there — assert the
    absolute bars instead, including that fmm beats direct at the same
    (ring, order)."""
    pos, vel, mass, radius = random_state(2048, seed=7)
    ex = pair_accumulators(pos, vel, mass, radius, eps=50.0, mode="none")
    kw = dict(eps=50.0, mode="none", ring=1, levels=4, neighbor_k=64)
    mono = bh_accumulators(pos, vel, mass, radius, order=1, far="direct",
                           **kw)
    quad = bh_accumulators(pos, vel, mass, radius, order=2, far="direct",
                           **kw)
    err_m = rel_force_err(mono, ex)
    err_q = rel_force_err(quad, ex)
    assert err_q < err_m / 3
    assert err_q < 0.01
    fmm_q = bh_accumulators(pos, vel, mass, radius, order=2, far="fmm", **kw)
    err_f = rel_force_err(fmm_q, ex)
    assert err_f < 0.01
    assert err_f < err_q * 1.25      # hybrid at least matches direct


def test_quadrupole_field_scale_no_overflow():
    """Regression: at reference field scale (1e5) with heavy masses the
    quadrupole pipeline used to overflow f32 three different ways (S1^2,
    d^T Q d, and inf*0 on masked cells). Must stay finite and beat monopole."""
    rng = np.random.RandomState(3)
    n = 2048
    pos = rng.uniform(-1e5, 1e5, (n, 2)).astype(np.float32)
    vel = np.zeros((n, 2), np.float32)
    mass = rng.uniform(1e4, 1e17, n).astype(np.float32)
    radius = rng.uniform(50, 200, n).astype(np.float32)
    ex = pair_accumulators(pos, vel, mass, radius, eps=100.0, mode="none")
    kw = dict(eps=100.0, mode="none", ring=1, levels=5, neighbor_k=64)
    mono = bh_accumulators(pos, vel, mass, radius, order=1, far="direct",
                           **kw)
    quad = bh_accumulators(pos, vel, mass, radius, order=2, far="direct",
                           **kw)
    assert np.isfinite(np.asarray(quad.force)).all()
    assert rel_force_err(quad, ex) < rel_force_err(mono, ex) / 2
    # the hybrid FMM normalizes its kernel tensors (ut = u * inv), so the
    # same field scale must stay finite and in the same accuracy class
    fmm = bh_accumulators(pos, vel, mass, radius, order=2, far="fmm", **kw)
    assert np.isfinite(np.asarray(fmm.force)).all()
    assert rel_force_err(fmm, ex) < 0.03


@pytest.mark.parametrize("dim", [2, 3])
def test_fmm_and_direct_far_engines_agree(dim):
    """The hybrid FMM far engine (dense local expansions + exact-target
    annulus) and the gathered direct engine approximate the SAME telescoped
    interaction lists: they must agree to the truncation class, and each
    must land within 1.5% of the exact force at ring=1/order=2."""
    rng = np.random.RandomState(11)
    n = 1024
    pos = rng.uniform(-8000, 8000, (n, dim)).astype(np.float32)
    vel = rng.uniform(-3, 3, (n, dim)).astype(np.float32)
    mass = rng.uniform(1, 100, n).astype(np.float32)
    mass[7] = 0.0
    radius = rng.uniform(1, 8, n).astype(np.float32)
    kw = dict(eps=50.0, mode="none", ring=1, levels=3, neighbor_k=128,
              order=2)
    fmm = bh_accumulators(pos, vel, mass, radius, far="fmm", **kw)
    direct = bh_accumulators(pos, vel, mass, radius, far="direct", **kw)
    ex = pair_accumulators(pos, vel, mass, radius, eps=50.0, mode="none")
    assert rel_force_err(fmm, ex) < 0.015
    assert rel_force_err(direct, ex) < 0.015
    assert rel_force_err(fmm, direct) < 0.02
    assert np.all(np.asarray(fmm.force)[7] == 0)       # dead body inert


def test_bh_momentum_drift_bounded_long_run():
    """The monopole/quadrupole far field is not exactly antisymmetric, so
    total momentum drifts — but it must stay at the far-field error level
    (documented approximation #3): over a 150-step collisionless run the
    accumulated drift is bounded by tol_ff x the gross impulse exchanged."""
    from functools import partial
    from nbodyax.physics.step import PhysicsParams, make_step
    from nbodyax.state import make_state

    rng = np.random.RandomState(9)
    n, field = 512, 5000.0
    pos = rng.uniform(-field, field, (n, 2)).astype(np.float32)
    vel = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    # heavy bodies (like real scenes): G * m / d^2 must be resolvable in f32
    mass = (10.0 ** rng.uniform(12, 15, n)).astype(np.float32)
    radius = rng.uniform(1, 2, n).astype(np.float32)
    big = 1e9  # no boundary flips: velocity flips change momentum legitimately
    p = PhysicsParams(dt=0.2, field_width=big, field_height=big,
                      eps=50.0, collision_mode="none")
    step = make_step(p, accum_fn=partial(
        bh_accumulators, eps=50.0, growth_rate=0.1, mode="none",
        levels=4, ring=2, neighbor_k=64))
    st = make_state(pos, vel, mass, radius)

    def momentum(s):
        return (np.asarray(s.mass, np.float64)[:, None]
                * np.asarray(s.vel, np.float64)).sum(axis=0)

    p0 = momentum(st)
    gross_impulse = 0.0
    prev_vel = np.asarray(st.vel, np.float64)
    for _ in range(150):
        st = step(st)
        v = np.asarray(st.vel, np.float64)
        gross_impulse += np.abs(
            np.asarray(st.mass, np.float64)[:, None] * (v - prev_vel)).sum()
        prev_vel = v
    drift = np.abs(momentum(st) - p0).sum()
    assert gross_impulse > 0
    # ring=2 + quadrupole far field: ~1e-3 relative force error; allow 3x
    assert drift <= 3e-3 * gross_impulse, (drift, gross_impulse)


@pytest.mark.parametrize("mode", ["reference", "momentum", "elastic"])
@pytest.mark.parametrize("ci_cap", [32, 64])
@pytest.mark.parametrize("near", ["rows", "slots"])
def test_percell_near_matches_perbody(mode, ci_cap, near):
    """The per-cell fast near pass (shared window gathers for rows, sliced
    slot grid for slots) must reproduce the per-body pass exactly — same
    windows, same effective caps, same pair math — at the floor slot cap
    and at a density-scaled (>32) one, including at overflow-inducing
    ci_caps (ADVICE r2: the slots engine's completion coverage was only
    checked indirectly before): a 90-body cluster in one finest cell
    exercises the completion pass at ci_cap=32. K=128 >= the densest cell,
    so the slots grid (S = max(k, ci_cap) partners per cell) and the
    per-body reference pass ((2*ring+1)*S per row in completion) see
    identical partner sets — with K below cell occupancy the two
    truncation shapes legitimately differ (documented in
    _near_field_cells)."""
    import jax.numpy as jnp
    from nbodyax.physics.barneshut import (_extent, _near_field,
                                           _near_field_cells)

    pos, vel, mass, radius = random_state(1024, seed=21, field=2000.0,
                                          rmax=15.0)
    # crowd one finest cell (levels=4 over +-2000: 250-unit cells) well
    # past both ci_caps so the completion pass actually runs
    pos[-320:] = np.random.RandomState(3).uniform(
        -2, 2, (320, 2)).astype(np.float32)
    levels, ring, k = 4, 1, 384
    from nbodyax.physics.barneshut import needed_neighbor_k
    max_cell_occ = int(needed_neighbor_k(pos, mass, levels=levels,
                                         near="slots")[0])
    assert 64 < max_cell_occ <= k    # completion fires; K covers everyone
    ext = _extent(jnp.asarray(pos), jnp.asarray(mass) > 0)
    ids = jnp.arange(1024, dtype=jnp.int32)
    args = (ext, levels, ring, jnp.float32(100.0), jnp.float32(0.1), mode, k)
    a = _near_field_cells(pos, vel, mass, radius, *args, ci_cap=ci_cap,
                          near=near)
    row_k = (2 * ring + 1) * max(k, ci_cap) if near == "slots" else k
    b = _near_field(pos, vel, mass, radius, ids,
                    pos, vel, mass, radius, *args[:-1], row_k, 1024)
    for name in ("force", "gained_mass", "gained_radius", "dv"):
        # same partner sets, different f32 accumulation order (the crowded
        # cell sums ~320 partner terms per lane) — hence rtol 1e-4, not 0
        np.testing.assert_allclose(np.asarray(getattr(a, name)),
                                   np.asarray(getattr(b, name)),
                                   rtol=1e-4, atol=1e-6, err_msg=name)
    np.testing.assert_array_equal(np.asarray(a.died), np.asarray(b.died))
    np.testing.assert_array_equal(np.asarray(a.parent), np.asarray(b.parent))


def test_percell_completion_pass_exact_in_crowded_cell():
    """A cell holding far more bodies than the fast pass's ci_cap slots: the
    completion pass must give the overflow bodies their exact near field
    (here: the whole state in two clusters, so near == the exact oracle)."""
    rng = np.random.RandomState(23)
    n = 200  # one tight cluster of 160 (>> ci_cap=32) + 40 spread
    pos = np.concatenate([
        rng.uniform(-30, 30, (160, 2)),
        rng.uniform(-4000, 4000, (40, 2))]).astype(np.float32)
    vel = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    mass = rng.uniform(1, 100, n).astype(np.float32)
    radius = rng.uniform(1, 10, n).astype(np.float32)
    bh = bh_accumulators(pos, vel, mass, radius, eps=10.0, mode="reference",
                         levels=2, neighbor_k=200)
    ex = pair_accumulators(pos, vel, mass, radius, eps=10.0, mode="reference")
    # levels=2 -> 16 cells over +-4000: every overlap is within one ring
    np.testing.assert_array_equal(np.asarray(bh.died), np.asarray(ex.died))
    np.testing.assert_allclose(np.asarray(bh.gained_mass),
                               np.asarray(ex.gained_mass), rtol=1e-5)


@pytest.mark.parametrize("mode,dim,ring", [
    ("reference", 2, 1), ("momentum", 2, 1), ("elastic", 2, 1),
    ("reference", 3, 1), ("momentum", 3, 1), ("elastic", 3, 1),
    ("reference", 2, 2),      # 5-cell windows: the generic koff/mask path
])
def test_pallas_near_matches_jnp_slots(mode, dim, ring):
    """The fused Pallas slots near kernel (physics/near_pallas.py, run in
    interpret mode on CPU) must reproduce the jnp slots engine: identical
    partner sets and per-pair semantics, float channels to accumulation-
    order tolerance, id/bool channels exactly — including a crowded cell
    (completion-pass interplay), a dead body, and out-of-grid window edges
    (the geometry masks are computed in-kernel from static g)."""
    import jax.numpy as jnp
    from nbodyax.physics.barneshut import _extent, _near_field_cells

    rng = np.random.RandomState(5)
    n = 2048
    pos = rng.uniform(-1000, 1000, (n, dim)).astype(np.float32)
    pos[-200:] = rng.uniform(-20, 20, (200, dim)).astype(np.float32)
    vel = rng.uniform(-3, 3, (n, dim)).astype(np.float32)
    mass = rng.uniform(1, 100, n).astype(np.float32)
    mass[7] = 0.0
    radius = rng.uniform(1, 12, n).astype(np.float32)
    ext = _extent(jnp.asarray(pos), jnp.asarray(mass) > 0)
    lv = 3 if dim == 3 else 4
    args = (ext, lv, ring, jnp.float32(50.0) ** 2, jnp.float32(0.1), mode,
            40)
    a = _near_field_cells(pos, vel, mass, radius, *args, ci_cap=32,
                          near="slots", pallas_near=False)
    b = _near_field_cells(pos, vel, mass, radius, *args, ci_cap=32,
                          near="slots", pallas_near=True)
    for name in {"reference": ["force", "gained_mass", "gained_radius"],
                 "momentum": ["force", "best_mass"],
                 "elastic": ["force", "dv"]}[mode]:
        x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        fin = np.isfinite(x)                     # -inf best_mass sentinels
        np.testing.assert_array_equal(fin, np.isfinite(y), err_msg=name)
        # mask BEFORE subtracting: -inf - -inf on the masked lanes would
        # emit an invalid-value RuntimeWarning (nan) even though discarded
        err = np.max(np.abs(np.where(fin, x, 0.0) - np.where(fin, y, 0.0)))
        assert err <= 2e-5 * max(1e-30, np.max(np.abs(np.where(fin, x, 0.0)))), \
            (name, err)
    np.testing.assert_array_equal(np.asarray(a.died), np.asarray(b.died))
    np.testing.assert_array_equal(np.asarray(a.parent), np.asarray(b.parent))


@pytest.mark.parametrize("mode", ["reference", "momentum", "elastic"])
def test_pallas_near_empty_blocks(mode):
    """Clustered scenes leave whole kernel cell blocks with no alive slot;
    the kernel skips their window DMAs and pair math (pl.when) and must
    write the exact dead-row outputs the full pair math would produce —
    zeros, and for momentum the no-candidate sentinel with the slots' own
    id lanes. lv=5 (1024 cells) against block_cells=256 gives 4 grid
    programs; everybody lives in the bottom rows except two extent-
    stretching outliers in the top row, so the middle programs are
    all-empty."""
    import jax.numpy as jnp
    from nbodyax.physics.barneshut import _extent, _near_field_cells
    from nbodyax.physics.near_pallas import block_cells

    rng = np.random.RandomState(11)
    n = 1024
    pos = np.empty((n, 2), np.float32)
    pos[:, 0] = rng.uniform(-1000, 1000, n)
    pos[:, 1] = rng.uniform(-1000, -850, n)       # bottom 2-3 cell rows
    pos[0] = (-990.0, 990.0)                       # extent stretchers
    pos[1] = (990.0, 995.0)
    vel = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    mass = rng.uniform(1, 100, n).astype(np.float32)
    mass[3] = 0.0
    radius = rng.uniform(1, 30, n).astype(np.float32)
    ext = _extent(jnp.asarray(pos), jnp.asarray(mass) > 0)
    assert block_cells(1 << 10, 32, 120) == 256    # 4 programs at lv=5
    args = (ext, 5, 1, jnp.float32(50.0) ** 2, jnp.float32(0.1), mode, 40)
    a = _near_field_cells(pos, vel, mass, radius, *args, ci_cap=32,
                          near="slots", pallas_near=False)
    b = _near_field_cells(pos, vel, mass, radius, *args, ci_cap=32,
                          near="slots", pallas_near=True)
    for name in {"reference": ["force", "gained_mass", "gained_radius"],
                 "momentum": ["force", "best_mass"],
                 "elastic": ["force", "dv"]}[mode]:
        x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        fin = np.isfinite(x)
        np.testing.assert_array_equal(fin, np.isfinite(y), err_msg=name)
        # zero the non-finite lanes BEFORE subtracting (-inf - -inf warns)
        err = np.max(np.abs(np.where(fin, x, 0.0) - np.where(fin, y, 0.0)))
        assert err <= 2e-5 * max(1e-30, np.max(np.abs(np.where(fin, x, 0.0)))), \
            (name, err)
    np.testing.assert_array_equal(np.asarray(a.died), np.asarray(b.died))
    np.testing.assert_array_equal(np.asarray(a.parent), np.asarray(b.parent))


@pytest.mark.parametrize("dim", [2, 3])
def test_l2p_slots_matches_per_body_l2p(dim):
    """The slot-side L2P (zero gathers; rides the near unsort) must evaluate
    the same local expansions at the same positions as the per-body _l2p —
    slot by slot, with pad slots ignored."""
    import jax.numpy as jnp
    from nbodyax.physics.barneshut import (_build_slot_grid, _extent,
                                           _fmm_local_table, _l2p,
                                           _l2p_slots, _partner_structure,
                                           slot_cap)

    rng = np.random.RandomState(9)
    n = 2048
    lv = 3
    pos = rng.uniform(-900, 900, (n, dim)).astype(np.float32)
    mass = rng.uniform(1, 100, n).astype(np.float32)
    mass[5] = 0.0
    vel = np.zeros((n, dim), np.float32)
    radius = np.ones(n, np.float32)
    ext = _extent(jnp.asarray(pos), jnp.asarray(mass) > 0)
    g = 1 << lv
    ncells = g ** dim
    order, s_cell, starts, ends, sf = _partner_structure(
        pos, vel, mass, radius, ext, g, False)
    ci = slot_cap(n, ncells)
    fslot = _build_slot_grid(sf, starts, ends, n, ncells, ci)
    local = _fmm_local_table(pos, mass, ext, lv, 2, jnp.float32(100.0) ** 2,
                             2)
    a = np.asarray(_l2p_slots(local, fslot[:, :ci, 0:dim], ext, lv, dim))
    b = np.asarray(_l2p(local, jnp.asarray(pos), ext, lv, dim))
    scale = max(np.abs(b).max(), 1e-20)
    pslots = np.asarray(starts)[:, None] + np.arange(ci)[None, :]
    ok = pslots < np.minimum(np.asarray(ends),
                             np.asarray(starts) + ci)[:, None]
    body = np.asarray(order)[np.clip(pslots, 0, n - 1)]
    err = np.abs(a - b[body]).max(where=ok[..., None], initial=0.0)
    assert err < 2e-5 * scale, err


def test_near_field_id_packing_exact_beyond_2pow24():
    """Body ids ride two f32 lanes (12-bit lo / hi) in the packed near-field
    rows — the round trip must be exact for any i32 id, removing the old
    2^24 ceiling."""
    import jax.numpy as jnp
    from nbodyax.physics.barneshut import _pack_id, _unpack_id
    ids = np.array([0, 1, 4095, 4096, (1 << 24) - 1, (1 << 24),
                    (1 << 24) + 1, (1 << 28) + 12345, (1 << 31) - 1],
                   np.int32)
    hi, lo = _pack_id(jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(_unpack_id(hi, lo)), ids)
    # the halves must be exactly f32-representable (integral and < 2^24)
    assert float(np.asarray(hi).max()) < 2 ** 24
    assert float(np.asarray(lo).max()) < 4096


def test_pick_levels_density_aware():
    """Uniform scenes keep the fast coarse default on the rows engine;
    clustered scenes first switch to the slots engine (per-cell partner
    caps absorb clustering without refining), and only then refine."""
    from nbodyax.config import SimConfig
    from nbodyax.physics.barneshut import pick_levels
    from nbodyax.scenes import init_scene

    n = 65536
    uni = init_scene(SimConfig(particle_count=n), parity=False)
    gal = init_scene(SimConfig(particle_count=n, scene="galaxy",
                               softening=100.0), parity=False)
    lv_uni, near_uni, k_uni, comp_uni = pick_levels(uni.pos, uni.mass)
    assert lv_uni == auto_levels(n)          # uniform: no refinement needed
    assert near_uni == "rows"                # ... on the cheap rows engine
    # the returned K is count-aware EXACT: zero partner-cap overflow (the
    # heuristic K alone leaves a Poisson-tail trickle truncated)
    assert k_uni % 8 == 0
    assert comp_uni == 0                     # default budget drops nothing
    assert int(overflow_count(uni.pos, uni.mass, levels=lv_uni,
                              neighbor_k=k_uni, near=near_uni)) == 0
    # the galaxy overflows rows at auto K; the slots engine covers it at
    # the SAME coarse level (no refinement cost)
    lv_gal, near_gal, k_gal, _ = pick_levels(gal.pos, gal.mass)
    assert near_gal == "slots"
    assert lv_gal == lv_uni
    assert int(overflow_count(gal.pos, gal.mass, levels=lv_gal,
                              neighbor_k=k_gal, near="slots")) == 0
    # pinning the cap below the slot grid's structural floor (slot_cap =
    # 2x mean occupancy) is a no-op for slots: the grid exposes slot_cap
    # partner slots per cell regardless, the fast pass covers them, and
    # overflow_count counts against that effective cap — so no spurious
    # refinement
    lv_tight, near_tight, k_tight, _ = pick_levels(gal.pos, gal.mass,
                                                   neighbor_k=8)
    assert near_tight == "slots"
    assert lv_tight == lv_uni
    assert k_tight == 8                      # pinned K passes through
    assert int(overflow_count(gal.pos, gal.mass, levels=lv_tight,
                              neighbor_k=8, near="slots")) <= n * 0.01
    # pinned engine: rows refines instead of switching
    lv_rows, near_rows, _, _ = pick_levels(gal.pos, gal.mass, near="rows")
    assert near_rows == "rows"
    assert lv_rows > lv_uni
    # pinned levels: only the engine/cap are chosen, grid untouched
    lv_pin, near_pin, _, _ = pick_levels(gal.pos, gal.mass, levels=lv_uni)
    assert (lv_pin, near_pin) == (lv_uni, "slots")


def test_auto_knobs_exact_on_crowded_scene():
    """VERDICT r2 #1: auto knobs must yield bh_overflow == 0 even on a
    scene with heavily crowded cells — near-field COLLISION truncation is a
    binary physics error (the reference runs the overlap test for every
    pair, nbody.cu:196-226), not a tolerable approximation. pick_levels'
    count-aware K must cover the densest cell exactly, without hand-pinning
    bhNeighborK — and where even the finest grid cannot spread the blob
    (a quarter of all bodies denser than any cell), the count-aware
    completion budget (bhCompCap) covers the residual exactly."""
    from nbodyax.physics.barneshut import pick_levels
    from nbodyax.state import make_state

    rng = np.random.RandomState(11)
    n = 8192
    # 3/4 uniform + 1/4 in a tight blob a single finest cell will hold
    pos = rng.uniform(-2000, 2000, (n, 2)).astype(np.float32)
    pos[: n // 4] = rng.normal(0.0, 3.0, (n // 4, 2)).astype(np.float32)
    st = make_state(pos, np.zeros((n, 2), np.float32),
                    rng.uniform(1, 10, n).astype(np.float32),
                    np.full(n, 0.5, np.float32))
    lv, near, k, comp = pick_levels(st.pos, st.mass)
    assert int(overflow_count(st.pos, st.mass, levels=lv, neighbor_k=k,
                              near=near, comp_cap=comp)) == 0


def test_pick_levels_rightsizes_completion_budget():
    """A completion population past the 1024 mid-tier but far below the
    default ~n/16 worst-case budget must get a comp_cap sized to the
    population (+12.5% slack, 1024-tiered): the default static list made
    the completion passes dominate clustered-scene steps (the 4M galaxy
    ran 262144 completion slots for 3166 real overflow bodies — 2.6 s of
    a 3.5 s step, bench/results_r3.json). Physics must be unchanged: the
    right-sized budget still covers every overflow body exactly."""
    from nbodyax.physics.barneshut import (_completion_cap, bh_accumulators,
                                           needed_neighbor_k, pick_levels)
    from nbodyax.state import make_state

    rng = np.random.RandomState(7)
    n = 65536
    # ~250 tight blobs of 40 bodies (one finest cell each at the auto
    # level's occupancy-16 grid) + a uniform background: per-cell overflow
    # past the ci-slot budget (32) lands ~2000 bodies in the completion
    # pass — past the mid-tier, far below the n/16 = 4096 default
    pos = rng.uniform(-2000, 2000, (n, 2)).astype(np.float32)
    nblob, per = 250, 40
    centers = rng.uniform(-1900, 1900, (nblob, 2))
    for b in range(nblob):
        pos[b * per:(b + 1) * per] = (
            centers[b] + rng.normal(0.0, 0.05, (per, 2))).astype(np.float32)
    st = make_state(pos, np.zeros((n, 2), np.float32),
                    rng.uniform(1, 10, n).astype(np.float32),
                    np.full(n, 0.01, np.float32))

    lv, near, k, comp = pick_levels(st.pos, st.mass)
    _, dropped, i_over = (int(v) for v in needed_neighbor_k(
        st.pos, st.mass, levels=lv, near=near))
    assert dropped == 0                      # default budget drops nothing
    assert i_over > 1024                     # past the mid-tier...
    assert 0 < comp < _completion_cap(n)     # ...so comp shrinks the budget
    assert comp >= i_over                    # but still covers everyone
    assert comp % 1024 == 0                  # on the tier grid
    assert int(overflow_count(st.pos, st.mass, levels=lv, neighbor_k=k,
                              near=near, comp_cap=comp)) == 0

    # identical physics with the right-sized budget
    kw = dict(eps=10.0, growth_rate=0.1, mode="reference", levels=lv,
              neighbor_k=k, near=near)
    a0 = bh_accumulators(st.pos, st.vel, st.mass, st.radius,
                         comp_cap=0, **kw)
    a1 = bh_accumulators(st.pos, st.vel, st.mass, st.radius,
                         comp_cap=comp, **kw)
    np.testing.assert_array_equal(np.asarray(a0.force), np.asarray(a1.force))
    np.testing.assert_array_equal(np.asarray(a0.gained_mass),
                                  np.asarray(a1.gained_mass))
    np.testing.assert_array_equal(np.asarray(a0.died), np.asarray(a1.died))


def test_needed_neighbor_k_is_minimal():
    """needed_neighbor_k reports the exact threshold: zero overflow at the
    reported cap, nonzero one below it (both engines)."""
    from nbodyax.physics.barneshut import needed_neighbor_k

    pos, vel, mass, radius = random_state(2048, seed=13, field=2000.0,
                                          rmax=10.0)
    for near in ("rows", "slots"):
        kn, dropped, i_over = (int(v) for v in needed_neighbor_k(
            pos, mass, levels=4, near=near))
        assert dropped == 0
        assert i_over >= 0
        assert int(overflow_count(pos, mass, levels=4, neighbor_k=kn,
                                  near=near)) == 0
        if near == "rows":   # slots' effective cap is floored at slot_cap
            assert int(overflow_count(pos, mass, levels=4,
                                      neighbor_k=kn - 1, near=near)) > 0


def test_pick_levels_size_preference(monkeypatch):
    """Above the measured rows/slots crossover (~1.5M bodies; A/B records in
    bench/results_r2_near.json) auto prefers the slots engine even when the
    rows engine would not overflow. Exercised at test scale by lowering the
    threshold constant."""
    from nbodyax.config import SimConfig
    from nbodyax.physics import barneshut
    from nbodyax.scenes import init_scene

    n = 65536
    uni = init_scene(SimConfig(particle_count=n), parity=False)
    assert barneshut.pick_levels(uni.pos, uni.mass)[1] == "rows"
    monkeypatch.setattr(barneshut, "_SLOTS_PREFERRED_N", n)
    lv, near, _, _ = barneshut.pick_levels(uni.pos, uni.mass)
    assert near == "slots"
    assert lv == auto_levels(n)  # preference flip alone must not refine


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("ring", [1, 2])
@pytest.mark.parametrize("order", [1, 2])
def test_m2l_conv_matches_scan(dim, ring, order):
    """The parent-folded conv M2L (_m2l_level_conv — one MXU conv per level
    instead of one padded-grid slice per offset) must reproduce the offset-
    scan M2L to f32 rounding. The parity-restriction rule at the extreme
    offsets is exactly what confines the folded kernel to parent offsets
    in [-ring, ring]; this test pins that mapping (every offset, both
    grid layouts, both moment orders, both dims)."""
    import jax.numpy as jnp
    from nbodyax.physics.barneshut import (_m2l_level, _m2l_level_conv,
                                           _moment_pairs)

    rng = np.random.RandomState(7)
    n_src = 1 + dim + len(_moment_pairs(dim))
    s = 16 if dim == 2 else 8
    packed = jnp.asarray(
        rng.normal(size=(s ** dim, n_src)).astype(np.float32) * 1e3)
    ext = (tuple(-1e5 for _ in range(dim)), tuple(2e5 for _ in range(dim)))
    a = np.asarray(_m2l_level(packed, s, ext, 100.0 ** 2, ring, dim,
                              order, 3))
    b = np.asarray(_m2l_level_conv(packed, s, ext, 100.0 ** 2, ring, dim,
                                   order, 3))
    scale = np.abs(a).max()
    assert np.abs(a - b).max() < 2e-6 * scale


@pytest.mark.parametrize("case", [
    (4096, 16, 8, False, 2, False),   # uniform 2-D
    (4096, 16, 8, True, 2, False),    # crowded cells (fallback or tight fit)
    (2048, 32, 6, False, 2, True),    # elastic feature layout (L = 2d+4)
    (4096, 8, 12, False, 3, False),   # 3-D octree grid
])
def test_slot_pack_kernel_matches_gather(case):
    """The Pallas slot-pack build (physics/slotpack_pallas.py: block DMA +
    VMEM re-spacing, emitting the near kernel's jrows layout directly) must
    reproduce gather + transpose + pad BITWISE — it is pure data movement,
    and the runtime lax.cond fallback must keep clustered states exact."""
    import jax.numpy as jnp
    from nbodyax.physics.barneshut import (_build_slot_grid, _extent,
                                           _partner_structure)
    from nbodyax.physics.slotpack_pallas import (SPAD, build_jrows_pallas,
                                                 slot_pack_plan)
    n, g, S, hot, dim, need_vel = case
    ncells = g ** dim
    rng = np.random.RandomState(7)
    pos = rng.uniform(-1000, 1000, (n, dim)).astype(np.float32)
    mass = rng.uniform(1, 10, n).astype(np.float32)
    mass[rng.rand(n) < 0.1] = 0.0                  # dead bodies
    if hot:
        pos[: n // 2] = rng.uniform(-10, 10, (n // 2, dim))
    vel = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    radius = rng.uniform(1, 2, n).astype(np.float32)
    ext = _extent(jnp.asarray(pos), jnp.asarray(mass) > 0)
    _, _, starts, ends, sf = _partner_structure(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
        jnp.asarray(radius), ext, g, need_vel)
    fslot = _build_slot_grid(sf, starts, ends, n, ncells, S)
    ref = jnp.pad(fslot.transpose(0, 2, 1),
                  ((0, 0), (0, 0), (0, SPAD - S)))
    plan = slot_pack_plan(n, ncells, S)
    assert plan is not None
    out = build_jrows_pallas(sf, starts, ends, n, ncells, S, plan,
                             interpret=True)
    assert jnp.array_equal(ref, out)


@pytest.mark.parametrize("case", [
    (4096, 16, 8, False, 2, False),   # uniform 2-D quadtree (kernel path)
    (4096, 8, 12, False, 3, False),   # uniform 3-D octree (kernel path)
    (4096, 16, 8, True, 2, False),    # crowded cell -> uncapped-span fallback
    (4096, 16, 8, "last", 2, False),  # block-LAST hot cell -> jrows keeps
                                      # the pack kernel, moments scatter
    (2048, 32, 6, False, 2, True),    # elastic feature layout (L = 2d+4)
])
def test_slot_pack_fused_moments_match_scatter(case):
    """The slot-pack kernel's second output — order-2 finest-level FMM
    moments reduced in VMEM via two HIGHEST-precision MXU matmuls against
    the block membership mask (_pack_mom_kernel) — must reproduce the
    N-row scatter `_finest_moments_scatter` it replaces, on BOTH cond
    branches, to f32 sum-order tolerance (the kernel path accumulates in
    sorted order vs the scatter's body-id order; the fallback IS the
    scatter, but XLA orders duplicate-index scatter-add accumulation per
    compilation, so even that branch is tolerance-comparable only).
    Exactness requires the FULL cell populations resident (jrows caps at
    S slots/cell; the moments must not), so the crowded case also pins
    the tightened uncapped-span fit predicate: a hot cell past the static
    capacity must select the fallback, not emit silently truncated
    moments."""
    import jax.numpy as jnp
    from nbodyax.physics.barneshut import (_build_slot_grid, _extent,
                                           _finest_moments_scatter,
                                           _partner_structure)
    from nbodyax.physics.slotpack_pallas import (SPAD, build_jrows_pallas,
                                                 slot_pack_plan)
    n, g, S, hot, dim, need_vel = case
    levels = g.bit_length() - 1
    ncells = g ** dim
    rng = np.random.RandomState(11)
    # field-scale coordinates: the bf16-MXU rounding regression this kernel
    # had (2^-9 * |center| ~ 400 swamping the ~cell-size offsets) only
    # shows at |pos| >> cell size, so keep the scale realistic
    pos = rng.uniform(-1e5, 1e5, (n, dim)).astype(np.float32)
    mass = rng.uniform(1e4, 1e17, n).astype(np.float32)
    mass[rng.rand(n) < 0.1] = 0.0                  # dead bodies
    if hot == "last":
        # 95% of bodies in the LAST finest cell (max corner -> highest flat
        # id -> last cell of the last 128-cell block): its own count breaks
        # only the moments' uncapped-span predicate — later cells' starts
        # are unaffected — so the nested cond must keep the pack kernel for
        # jrows while the moments take the scatter (the galaxy-core regime
        # ADVICE r3 item 4 flags)
        pos[: n - n // 16] = rng.uniform(
            9.5e4, 1e5, (n - n // 16, dim))
    elif hot:
        # 95% of bodies in one MID-BLOCK finest cell: the inflated starts
        # of every later cell in the block break the jrows predicate too —
        # the whole build takes the gather + scatter fallback
        pos[: n - n // 16] = rng.uniform(-10, 10, (n - n // 16, dim))
    vel = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    radius = rng.uniform(50, 200, n).astype(np.float32)
    ext = _extent(jnp.asarray(pos), jnp.asarray(mass) > 0)
    _, _, starts, ends, sf = _partner_structure(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
        jnp.asarray(radius), ext, g, need_vel)
    plan = slot_pack_plan(n, ncells, S, sf.shape[1])
    assert plan is not None
    # assert the INTENDED branch: the moments path's tightened fit
    # predicate (whole uncapped block span + one alignment tile resident)
    cb, cap = plan
    rel = np.asarray(starts).reshape(-1, cb)
    rel = rel - rel[:, :1]
    cnt = np.asarray(ends - starts).reshape(-1, cb)
    fits_j = rel[:, -1].max() + 3 * SPAD <= cap
    fits_m = fits_j and (rel[:, -1] + cnt[:, -1]).max() + SPAD <= cap
    assert (fits_j, fits_m) == {False: (True, True),
                                "last": (True, False),
                                True: (False, False)}[hot]
    jrows, finest = build_jrows_pallas(
        sf, starts, ends, n, ncells, S, plan,
        moments=(jnp.asarray(pos), jnp.asarray(mass), ext, levels),
        interpret=True)
    ref_mom = _finest_moments_scatter(jnp.asarray(pos), jnp.asarray(mass),
                                      ext, levels)
    assert finest.shape == ref_mom.shape
    scale = np.abs(np.asarray(ref_mom)).max(axis=0)   # per-channel scale
    err = np.abs(np.asarray(finest) - np.asarray(ref_mom)).max(axis=0)
    assert (err <= 2e-6 * np.maximum(scale, 1.0)).all()
    # the jrows output must stay bitwise-equal to the gather on both paths
    fslot = _build_slot_grid(sf, starts, ends, n, ncells, S)
    ref_rows = jnp.pad(fslot.transpose(0, 2, 1),
                       ((0, 0), (0, 0), (0, SPAD - S)))
    assert jnp.array_equal(ref_rows, jrows)


def test_slot_pack_declines_wide_feature_rows_3d_elastic():
    """3-D elastic packs 2*dim+4 = 10 feature lanes — more than the pack
    kernel's 8-sublane DMA buffer. slot_pack_plan must decline (gather
    fallback) instead of tracing a negative pad (regression: crashed with
    'index can't contain negative values'), and the full accumulator path
    must run."""
    import jax.numpy as jnp

    from nbodyax.physics.barneshut import bh_accumulators
    from nbodyax.physics.slotpack_pallas import slot_pack_plan
    assert slot_pack_plan(4096, 4096, 40, L=10) is None
    assert slot_pack_plan(4096, 4096, 40, L=8) is not None
    n = 2048
    rng = np.random.RandomState(3)
    pos = jnp.asarray(rng.uniform(-1e4, 1e4, (n, 3)).astype(np.float32))
    vel = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    mass = jnp.full((n,), 1e10, jnp.float32)
    radius = jnp.full((n,), 10.0, jnp.float32)
    acc = bh_accumulators(pos, vel, mass, radius, eps=50.0, growth_rate=0.1,
                          mode="elastic", levels=4, ring=1, neighbor_k=40,
                          order=2, near="slots", near_pallas="on")
    assert bool(jnp.all(jnp.isfinite(acc.force)))
    assert bool(jnp.all(jnp.isfinite(acc.dv)))


# (a second, near-duplicate moments-vs-scatter test once lived here; merged
# into test_slot_pack_fused_moments_match_scatter above — its one unique
# case, the elastic feature layout, rides that test's parametrization now)
