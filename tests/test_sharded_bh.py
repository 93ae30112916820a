"""Sharded bh step on 8 virtual devices == single-device bh step."""

import numpy as np
import pytest

from nbodyax.config import SimConfig
from nbodyax.physics.step import PhysicsParams, make_step
from nbodyax.physics.barneshut import bh_accumulators
from nbodyax.sharding.bh import make_sharded_bh_step
from nbodyax.sharding.mesh import make_mesh, pad_to_shards, shard_state
from nbodyax.state import make_state
from functools import partial

N_DEV = 8


def random_state(n, seed=0, field=2000.0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-field, field, (n, 2)).astype(np.float32)
    vel = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    mass = rng.uniform(1, 100, n).astype(np.float32)
    mass[3] = 0.0
    radius = rng.uniform(1, 15, n).astype(np.float32)
    return make_state(pos, vel, mass, radius)


@pytest.mark.parametrize("mode", ["reference", "momentum", "elastic"])
def test_sharded_bh_matches_single_device(mode):
    n = 512
    st = random_state(n, seed=1)
    p = PhysicsParams(dt=0.1, field_width=2000, field_height=2000,
                      eps=10.0, collision_mode=mode)
    cfg = SimConfig(shards=N_DEV, force_model="bh", collision_mode=mode,
                    bh_levels=4, bh_neighbor_k=128, softening=10.0)
    mesh = make_mesh(N_DEV)
    sharded = make_sharded_bh_step(cfg, p, mesh=mesh)
    single = make_step(p, accum_fn=partial(
        bh_accumulators, eps=p.eps, growth_rate=p.growth_rate,
        mode=mode, levels=4, neighbor_k=128))
    a = sharded(shard_state(pad_to_shards(st, N_DEV), mesh))
    b = single(st)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.mass), np.asarray(b.mass),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel),
                               rtol=1e-5, atol=1e-3)


def test_sharded_bh_multi_step():
    n = 256
    st = random_state(n, seed=5)
    p = PhysicsParams(dt=0.05, field_width=2000, field_height=2000, eps=20.0)
    cfg = SimConfig(shards=N_DEV, force_model="bh", bh_levels=3,
                    bh_neighbor_k=128, softening=20.0)
    mesh = make_mesh(N_DEV)
    sharded = make_sharded_bh_step(cfg, p, mesh=mesh)
    single = make_step(p, accum_fn=partial(
        bh_accumulators, eps=p.eps, growth_rate=p.growth_rate,
        mode="reference", levels=3, neighbor_k=128))
    a = shard_state(pad_to_shards(st, N_DEV), mesh)
    b = st
    for _ in range(5):
        a = sharded(a)
        b = single(b)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               rtol=1e-4, atol=1e-2)
    assert int(np.asarray(a.step)) == 5


def test_driver_routes_sharded_bh():
    from nbodyax.driver import build_step
    cfg = SimConfig(shards=N_DEV, force_model="bh", particle_count=64,
                    backend="jnp", softening=10.0)
    step = build_step(cfg)  # must not raise
    st = shard_state(pad_to_shards(random_state(64, seed=2), N_DEV),
                     make_mesh(N_DEV))
    out = step(st)
    assert np.isfinite(np.asarray(out.pos)).all()


def test_sharded_bh_leapfrog_matches_single_device():
    n = 256
    st = random_state(n, seed=7)
    p = PhysicsParams(dt=0.05, field_width=2000, field_height=2000, eps=20.0,
                      integrator="leapfrog")
    cfg = SimConfig(shards=N_DEV, force_model="bh", bh_levels=3,
                    bh_neighbor_k=128, softening=20.0, integrator="leapfrog")
    mesh = make_mesh(N_DEV)
    sharded = make_sharded_bh_step(cfg, p, mesh=mesh)
    single = make_step(p, accum_fn=partial(
        bh_accumulators, eps=p.eps, growth_rate=p.growth_rate,
        mode="reference", levels=3, neighbor_k=128))
    a = shard_state(pad_to_shards(st, N_DEV), mesh)
    b = st
    for _ in range(3):
        a = sharded(a)
        b = single(b)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel),
                               rtol=1e-4, atol=1e-2)


def test_sharded_bh_scale_representative():
    """Denser, more representative scale on the virtual mesh (N=8192,
    levels=5): the compute-parallel design must stay exact-equal to the
    single-device bh step (memory/ICI accounting in sharding/bh.py)."""
    n = 8192
    st = random_state(n, seed=11, field=20000.0)
    p = PhysicsParams(dt=0.1, field_width=20000, field_height=20000, eps=20.0)
    cfg = SimConfig(shards=N_DEV, force_model="bh", bh_levels=5,
                    bh_neighbor_k=64, softening=20.0)
    mesh = make_mesh(N_DEV)
    sharded = make_sharded_bh_step(cfg, p, mesh=mesh)
    single = make_step(p, accum_fn=partial(
        bh_accumulators, eps=p.eps, growth_rate=p.growth_rate,
        mode="reference", levels=5, neighbor_k=64))
    a = sharded(shard_state(pad_to_shards(st, N_DEV), mesh))
    b = single(st)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(a.mass) > 0,
                                  np.asarray(b.mass) > 0)
