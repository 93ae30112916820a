"""adaptiveDt: global stability-bounded lockstep timestep (beyond-reference).

The reference integrates with one fixed dt forever (nbody.cu:264,288).
``adaptiveDt=1`` keeps the lockstep structure (one dt per step, every body)
but bounds it each step by the measured dynamics: dt = clip(min over alive
bodies of min(eta*sqrt(r/|a|), eta*r/|v|), dtMin, dtMax). The velocity term
caps per-step motion at a fraction of each body's own radius — the cheap
standard guard against fast bodies tunneling through collision partners
between overlap tests. ``SimState.sim_time`` carries the telescoped sum so
logs/checkpoints expose elapsed simulated time under a varying dt.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from nbodyax.config import ConfigError, SimConfig, parse_config_text
from nbodyax.physics.step import PhysicsParams, make_step, step_dt
from nbodyax.scenes import init_scene
from nbodyax.state import make_state


def _two_body_flyby(n=64, v=400.0):
    """A fast light body heading at a heavy one, plus quiet background
    bodies: the close approach drives |a| and |v| criteria hard."""
    rng = np.random.RandomState(3)
    pos = rng.uniform(-40000, 40000, (n, 2)).astype(np.float32)
    vel = np.zeros((n, 2), np.float32)
    mass = np.full(n, 1e4, np.float32)
    radius = np.full(n, 60.0, np.float32)
    pos[0] = (-3000.0, 0.0)
    vel[0] = (v, 0.0)
    mass[0], radius[0] = 1e5, 50.0
    pos[1] = (0.0, 0.0)
    mass[1], radius[1] = 1e17, 200.0
    return make_state(pos, vel, mass, radius)


def test_config_keys_parse_and_validate():
    cfg = parse_config_text(
        "adaptiveDt=1\ndtEta=0.5f\ndtMin=0.01f\ndtMax=0.1f\n")
    assert cfg.adaptive_dt and cfg.dt_eta == np.float32(0.5)
    assert cfg.dt_min == np.float32(0.01) and cfg.dt_max == np.float32(0.1)
    cfg.validate()
    with pytest.raises(ConfigError):
        SimConfig(adaptive_dt=True, dt_eta=0.0).validate()
    with pytest.raises(ConfigError):
        SimConfig(adaptive_dt=True, dt_min=0.5, dt_max=0.1).validate()
    with pytest.raises(ConfigError):
        # effective ceiling defaults to timestep
        SimConfig(adaptive_dt=True, timestep=0.2, dt_min=0.3).validate()


def test_fixed_dt_tracks_sim_time():
    """Off (the default): sim_time = step * dt exactly, no behavior change."""
    cfg = SimConfig(particle_count=256)
    st = init_scene(cfg, parity=False)
    step = make_step(PhysicsParams.from_config(cfg))
    for _ in range(7):
        st = step(st)
    assert int(st.step) == 7
    # telescoped f32 sum of the f32 dt — compare against the same telescoping
    want = np.float32(0.0)
    for _ in range(7):
        want = np.float32(want + np.float32(cfg.timestep))
    assert float(st.sim_time) == float(want)


def test_pinned_adaptive_matches_fixed_bitwise():
    """dtMin == dtMax == timestep: the adaptive path must produce the exact
    fixed-dt trajectories (the clip pins dt; integration math is shared)."""
    base = dict(particle_count=256, timestep=0.2)
    st0 = init_scene(SimConfig(**base), parity=False)
    fixed = make_step(PhysicsParams.from_config(SimConfig(**base)))
    pinned = make_step(PhysicsParams.from_config(
        SimConfig(**base, adaptive_dt=True, dt_min=0.2, dt_max=0.2)))
    a, b = st0, st0
    for _ in range(6):
        a, b = fixed(a), pinned(b)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))
    np.testing.assert_array_equal(np.asarray(a.mass), np.asarray(b.mass))


@pytest.mark.parametrize("integrator", ["euler", "leapfrog"])
def test_adaptive_dt_within_bounds_and_telescopes(integrator):
    cfg = SimConfig(particle_count=64, adaptive_dt=True, timestep=0.2,
                    integrator=integrator).validate()
    st = _two_body_flyby()
    step = make_step(PhysicsParams.from_config(cfg))
    lo, hi = 0.2 / 1024, 0.2
    ts = [float(st.sim_time)]
    for _ in range(10):
        st = step(st)
        ts.append(float(st.sim_time))
    dts = np.diff(ts)
    # f32 telescoping: each diff is within an ulp of the clipped dt
    assert np.all(dts >= lo * (1 - 1e-5)) and np.all(dts <= hi * (1 + 1e-5))
    assert int(st.step) == 10
    assert np.all(np.isfinite(np.asarray(st.pos)))


def test_adaptive_dt_shrinks_on_fast_encounter():
    """The fast flyby must force dt below the configured ceiling while a
    quiet scene stays at it — the point of the feature."""
    cfg = SimConfig(particle_count=64, adaptive_dt=True,
                    timestep=0.2).validate()
    p = PhysicsParams.from_config(cfg)
    step = make_step(p)
    hot = _two_body_flyby(v=4000.0)
    hot = step(hot)
    dt_hot = float(hot.sim_time)
    assert dt_hot < 0.2 * 0.5, dt_hot
    quiet = make_state(np.array([[-30000.0, 0], [30000.0, 0]], np.float32),
                       np.zeros((2, 2), np.float32),
                       np.full(2, 1e4, np.float32),
                       np.full(2, 60.0, np.float32))
    quiet = step(quiet)
    assert float(quiet.sim_time) == pytest.approx(0.2)


def test_step_dt_criteria_directly():
    """Unit-pin the bound: dt = eta*min(sqrt(r/|a|), r/|v|) over alive
    bodies, dead bodies excluded, clipped into [lo, hi]."""
    p = PhysicsParams(dt=1.0, adaptive_dt=True, dt_eta=0.5,
                      dt_min=1e-4, dt_max=1.0)
    vel = jnp.array([[3.0, 4.0], [1000.0, 0.0]])      # |v| = 5, 1000
    mass = jnp.array([1.0, 0.0])                      # body 1 dead
    radius = jnp.array([2.0, 0.1])
    force = jnp.array([[0.0, 0.0], [1e20, 0.0]])      # huge a on the DEAD one
    dt = float(step_dt(vel, mass, radius, force, p))
    # alive body 0: a = 0 -> accel criterion huge; v term = 0.5*2/5 = 0.2
    assert dt == pytest.approx(0.2, rel=1e-6)
    # all dead -> clips to the ceiling
    dt_dead = float(step_dt(vel, jnp.zeros(2), radius, force, p))
    assert dt_dead == pytest.approx(1.0)


def test_adaptive_prevents_tunneling_through_target():
    """A body fast enough to cross its collision partner in ONE fixed-dt
    step (tunneling: the overlap test never fires) must merge under
    adaptiveDt. Direct head-on: at v*dt = 6000 >> r1+r2 = 250 the fixed
    step skips the overlap entirely."""
    def scene():
        pos = np.array([[-3000.0, 0.0], [0.0, 0.0]], np.float32)
        vel = np.array([[30000.0, 0.0], [0.0, 0.0]], np.float32)
        mass = np.array([1e4, 1e17], np.float32)
        radius = np.array([50.0, 200.0], np.float32)
        return make_state(pos, vel, mass, radius)

    fixed = make_step(PhysicsParams(dt=0.2, collision_mode="reference"))
    st = scene()
    for _ in range(40):
        st = fixed(st)
    assert int(np.sum(np.asarray(st.mass) > 0)) == 2  # tunneled through

    adaptive = make_step(PhysicsParams(dt=0.2, collision_mode="reference",
                                       adaptive_dt=True))
    sa = scene()
    for _ in range(400):
        sa = adaptive(sa)
        if int(np.sum(np.asarray(sa.mass) > 0)) == 1:
            break
    assert int(np.sum(np.asarray(sa.mass) > 0)) == 1  # merged


def test_checkpoint_roundtrip_preserves_sim_time(tmp_path):
    from nbodyax.io.checkpoint import load_checkpoint, save_checkpoint
    st = _two_body_flyby()
    step = make_step(PhysicsParams.from_config(
        SimConfig(particle_count=64, adaptive_dt=True).validate()))
    for _ in range(3):
        st = step(st)
    path = save_checkpoint(str(tmp_path), st)
    back = load_checkpoint(path)
    assert float(back.sim_time) == float(st.sim_time) != 0.0

    # pre-sim_time snapshots (no key) load at t=0 instead of crashing
    legacy = dict(np.load(path))
    legacy.pop("sim_time")
    lp = tmp_path / "step_000000099.npz"
    np.savez(lp, **legacy)
    old = load_checkpoint(str(lp))
    assert float(old.sim_time) == 0.0


def test_driver_logs_sim_time_and_dt_mean(tmp_path):
    from nbodyax.driver import run_simulation
    log = tmp_path / "log.jsonl"
    cfg = SimConfig(particle_count=256, total_iterations=10, adaptive_dt=True,
                    log_every=5, log_path=str(log),
                    save_images=False).validate()
    run_simulation(cfg, quiet=True)
    lines = [json.loads(l) for l in open(log)]
    assert [l["step"] for l in lines] == [5, 10]
    t = 0.0
    for l in lines:
        assert l["sim_time"] > t          # strictly increasing
        assert 0.2 / 1024 * 0.99 <= l["dt_mean"] <= 0.2 * 1.01
        t = l["sim_time"]


def test_ring_sharded_adaptive_matches_single_device():
    """The ring step's pmin must give every shard the identical lockstep dt:
    4-shard trajectories track the single-device adaptive run."""
    from nbodyax.sharding.mesh import make_mesh, pad_to_shards, shard_state
    from nbodyax.sharding.ring import make_sharded_step
    cfg = SimConfig(particle_count=256, adaptive_dt=True,
                    collision_mode="momentum", shards=4).validate()
    p = PhysicsParams.from_config(cfg)
    st = init_scene(cfg, parity=False)
    single = make_step(p)
    a = st
    for _ in range(4):
        a = single(a)
    mesh = make_mesh(4)
    sh = shard_state(pad_to_shards(st, 4), mesh)
    rstep = make_sharded_step(cfg, p, mesh)
    for _ in range(4):
        sh = rstep(sh)
    assert float(sh.sim_time) == pytest.approx(float(a.sim_time), rel=1e-5)
    np.testing.assert_allclose(np.asarray(sh.pos)[:256], np.asarray(a.pos),
                               rtol=2e-5, atol=1e-2)


@pytest.mark.slow
def test_bh_sharded_adaptive_matches_single_device():
    """The bh-sharded step's pmin (sharding/bh.py step_dt call) must give
    every shard the identical lockstep dt: 4-shard cell-range trajectories
    track the single-device bh adaptive run, and sim_time telescopes the
    same varying dt on both sides."""
    from functools import partial

    from nbodyax.physics.barneshut import bh_accumulators
    from nbodyax.sharding.bh import make_sharded_bh_step
    from nbodyax.sharding.mesh import make_mesh, pad_to_shards, shard_state
    cfg = SimConfig(particle_count=256, adaptive_dt=True,
                    collision_mode="momentum", shards=4, force_model="bh",
                    bh_levels=3, bh_neighbor_k=128, softening=20.0,
                    field_width=2000, field_height=2000).validate()
    p = PhysicsParams.from_config(cfg)
    st = init_scene(cfg, parity=False)
    single = make_step(p, accum_fn=partial(
        bh_accumulators, eps=p.eps, growth_rate=p.growth_rate,
        mode=p.collision_mode, levels=cfg.bh_levels,
        neighbor_k=cfg.bh_neighbor_k))
    a = st
    for _ in range(4):
        a = single(a)
    assert float(a.sim_time) != pytest.approx(4 * p.dt)  # dt actually adapted
    mesh = make_mesh(4)
    sh = shard_state(pad_to_shards(st, 4), mesh)
    bstep = make_sharded_bh_step(cfg, p, mesh)
    for _ in range(4):
        sh = bstep(sh)
    assert float(sh.sim_time) == pytest.approx(float(a.sim_time), rel=1e-5)
    np.testing.assert_allclose(np.asarray(sh.pos)[:256], np.asarray(a.pos),
                               rtol=2e-5, atol=1e-2)
