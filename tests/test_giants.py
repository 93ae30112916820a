"""Giant-body exact-collision pass (barneshut.giant_collision_accumulators).

The bh near window only covers overlaps with r_i + r_j <= ring * cell
(barneshut docstring, approximation 1); the reference evaluates every pair
unconditionally (/root/reference/src/nbody.cu:196-226). The giant pass gives
the top-``bhGiants`` bodies by radius exact any-distance collisions, so a
merged monster keeps eating across the whole field. These tests pin:
- bh WITH giants matches the exact oracle's collision channels on scenes
  where overlaps span beyond the near window;
- bh WITHOUT giants misses exactly those pairs (the documented gap the pass
  closes);
- the pass is an exact no-op when no body exceeds the coverage threshold.
"""

import numpy as np
import pytest

from nbodyax.physics.barneshut import bh_accumulators
from nbodyax.physics.pairwise import pair_accumulators

MODES = ["reference", "momentum", "elastic"]


def giant_scene(dim=2, seed=0):
    """A giant (radius far above the finest cell) overlapping a small body
    2+ cells away, plus uniform filler; corner pins fix the adaptive bbox."""
    rng = np.random.RandomState(seed)
    n = 256
    span = 1000.0
    pos = rng.uniform(100, 900, (n, dim)).astype(np.float32)
    pos[0] = 0.0                      # bbox pins
    pos[1] = span
    pos[2] = 500.0                    # the giant, field center
    pos[3] = 500.0
    pos[3, 0] = 680.0                 # small victim: 180 away (~3 cells at
    vel = rng.uniform(-1, 1, (n, dim)).astype(np.float32)   # levels=4)
    vel[3] = 0.0
    vel[3, 0] = -5.0                  # approaching (elastic-mode pair)
    mass = rng.uniform(1, 2, n).astype(np.float32)
    mass[2] = 1000.0
    mass[3] = 5.0                     # heavier than any filler: only the
    # giant can kill it, so its death isolates the uncovered pair
    radius = rng.uniform(1.0, 3.0, n).astype(np.float32)
    radius[2] = 200.0                 # giant: overlaps victim at d=180
    radius[3] = 5.0
    return pos, vel, mass, radius


@pytest.mark.slow
@pytest.mark.parametrize("mode", MODES)
def test_giant_pass_matches_oracle_collisions(mode):
    pos, vel, mass, radius = giant_scene()
    kw = dict(growth_rate=0.1, mode=mode)
    oracle = pair_accumulators(pos, vel, mass, radius, **kw)
    bh = bh_accumulators(pos, vel, mass, radius, levels=4, ring=1,
                         neighbor_k=256, n_giants=64, **kw)
    # collision channels must match the unconditional-pair oracle exactly
    np.testing.assert_array_equal(np.asarray(bh.died),
                                  np.asarray(oracle.died))
    np.testing.assert_allclose(np.asarray(bh.gained_mass),
                               np.asarray(oracle.gained_mass), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bh.gained_radius),
                               np.asarray(oracle.gained_radius), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(bh.parent),
                                  np.asarray(oracle.parent))
    np.testing.assert_allclose(np.asarray(bh.dv), np.asarray(oracle.dv),
                               rtol=1e-5, atol=1e-6)


def test_without_giants_the_distant_overlap_is_missed():
    """Documents the gap the pass closes: the victim 3 cells from the giant
    dies in the oracle but survives the window-only near field."""
    pos, vel, mass, radius = giant_scene()
    kw = dict(growth_rate=0.1, mode="reference")
    oracle = pair_accumulators(pos, vel, mass, radius, **kw)
    off = bh_accumulators(pos, vel, mass, radius, levels=4, ring=1,
                          neighbor_k=256, n_giants=0, **kw)
    assert bool(np.asarray(oracle.died)[3])
    assert not bool(np.asarray(off.died)[3])


@pytest.mark.slow
def test_giant_pass_noop_when_no_giants():
    """All radii below ring*cell/2: the giant list is empty and the pass
    contributes exact identity (bitwise-equal accumulators)."""
    rng = np.random.RandomState(3)
    n = 512
    pos = rng.uniform(0, 1000, (n, 2)).astype(np.float32)
    vel = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    mass = rng.uniform(1, 2, n).astype(np.float32)
    radius = rng.uniform(0.5, 2.0, n).astype(np.float32)  # << cell/2 ~ 31
    kw = dict(growth_rate=0.1, mode="reference", levels=4, ring=1,
              neighbor_k=128)
    a = bh_accumulators(pos, vel, mass, radius, n_giants=64, **kw)
    b = bh_accumulators(pos, vel, mass, radius, n_giants=0, **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_giant_pass_3d():
    pos, vel, mass, radius = giant_scene(dim=3, seed=5)
    kw = dict(growth_rate=0.1, mode="reference")
    oracle = pair_accumulators(pos, vel, mass, radius, **kw)
    bh = bh_accumulators(pos, vel, mass, radius, levels=3, ring=1,
                         neighbor_k=256, n_giants=64, **kw)
    np.testing.assert_array_equal(np.asarray(bh.died),
                                  np.asarray(oracle.died))
    np.testing.assert_allclose(np.asarray(bh.gained_mass),
                               np.asarray(oracle.gained_mass), rtol=1e-6)


@pytest.mark.slow
def test_giant_step_end_to_end():
    """A full bh step with giants: the distant victim is dead after one
    step; without giants it survives (and the giant's mass gain differs)."""
    from nbodyax.physics.step import PhysicsParams, make_step
    from nbodyax.backends import build_accum_fn
    from nbodyax.config import SimConfig
    from nbodyax.state import make_state
    import dataclasses

    pos, vel, mass, radius = giant_scene()
    st = make_state(pos, vel, mass, radius)
    cfg = SimConfig(particle_count=256, force_model="bh", bh_levels=4,
                    bh_neighbor_k=256, field_width=1000, field_height=1000,
                    save_images=False)
    p = PhysicsParams.from_config(cfg)
    on = make_step(p, accum_fn=build_accum_fn("auto", p, cfg))
    cfg0 = dataclasses.replace(cfg, bh_giants=0)
    off = make_step(p, accum_fn=build_accum_fn("auto", p, cfg0))
    s_on, s_off = on(st), off(st)
    assert float(np.asarray(s_on.mass)[3]) == 0.0      # eaten
    assert float(np.asarray(s_off.mass)[3]) > 0.0      # missed
    assert (float(np.asarray(s_on.mass)[2])
            > float(np.asarray(s_off.mass)[2]))


@pytest.mark.slow
@pytest.mark.sharded
def test_giant_cellrange_shards_disjoint_and_complete():
    """Sharded hook: per-shard cell-range accumulators (giant rows routed
    to each body's CELL-owner shard) sum to the full single-device
    accumulators on the giant scene — the invariant the psum_scatter
    merge relies on (sharding/bh.py)."""
    from nbodyax.physics.barneshut import bh_cellrange_accumulators
    pos, vel, mass, radius = giant_scene()
    kw = dict(growth_rate=0.1, mode="reference", levels=4, ring=1,
              neighbor_k=256)
    full = bh_accumulators(pos, vel, mass, radius, n_giants=64, **kw)
    nsh = 4
    parts = [bh_cellrange_accumulators(pos, vel, mass, radius, s, nsh,
                                       n_giants=64, **kw)
             for s in range(nsh)]
    gm = sum(np.asarray(p.gained_mass) for p in parts)
    np.testing.assert_allclose(gm, np.asarray(full.gained_mass), rtol=1e-6)
    gr = sum(np.asarray(p.gained_radius) for p in parts)
    np.testing.assert_allclose(gr, np.asarray(full.gained_radius),
                               rtol=1e-6)
    died = np.zeros(len(mass), bool)
    touched = np.zeros(len(mass), int)
    for p in parts:
        d = np.asarray(p.died)
        died |= d
        touched += d.astype(int)
    np.testing.assert_array_equal(died, np.asarray(full.died))
    assert touched.max() <= 1      # each death produced by exactly one shard


@pytest.mark.slow
@pytest.mark.sharded
def test_sharded_bh_step_carries_giant_pass():
    """End-to-end: the 8-shard bh step kills the distant victim exactly as
    the single-device step does (the giant set is a global top_k of the
    all-gathered state, identical on every shard)."""
    from functools import partial
    from nbodyax.config import SimConfig
    from nbodyax.physics.step import PhysicsParams, make_step
    from nbodyax.sharding.bh import make_sharded_bh_step
    from nbodyax.sharding.mesh import make_mesh, pad_to_shards, shard_state
    from nbodyax.state import make_state
    import jax

    n_dev = len(jax.devices())
    pos, vel, mass, radius = giant_scene()
    st = make_state(pos, vel, mass, radius)
    p = PhysicsParams(dt=0.1, field_width=1000, field_height=1000,
                      eps=10.0)
    cfg = SimConfig(shards=n_dev, force_model="bh", bh_levels=4,
                    bh_neighbor_k=256, softening=10.0)
    mesh = make_mesh(n_dev)
    sharded = make_sharded_bh_step(cfg, p, mesh=mesh)
    single = make_step(p, accum_fn=partial(
        bh_accumulators, eps=p.eps, growth_rate=p.growth_rate,
        mode="reference", levels=4, neighbor_k=256, n_giants=1024))
    a = sharded(shard_state(pad_to_shards(st, n_dev), mesh))
    b = single(st)
    assert float(np.asarray(b.mass)[3]) == 0.0        # victim eaten
    np.testing.assert_allclose(np.asarray(a.mass), np.asarray(b.mass),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               rtol=1e-5, atol=1e-3)
