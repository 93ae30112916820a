"""Golden-trajectory regression anchors.

Two layers of goldens:

1. **External oracle fixtures** (tests/golden/ref_n64_*.npz, regenerate with
   tests/golden/gen_ref_golden.py): produced by a serial C++ implementation of
   the reference's ComputeForces/MoveBodies semantics
   (tests/golden/ref_oracle.cpp), compiled with g++ — fully independent of the
   framework's compute path. Matching these is a genuine end-to-end parity
   check, not self-validation.
2. **Self-regression fixture** (tests/golden_traj_n64.npz, regenerate with
   tests/gen_golden.py): pins the jnp oracle's own output so unintended
   semantics drift is caught bitwise-tight.
"""

import os

import numpy as np
import pytest

from nbodyax.config import SimConfig
from nbodyax.physics.step import PhysicsParams, make_step
from nbodyax.scenes import init_scene

FIXTURE = os.path.join(os.path.dirname(__file__), "golden_traj_n64.npz")
EXT_DIR = os.path.join(os.path.dirname(__file__), "golden")


def run_traj(backend_accum=None):
    cfg = SimConfig(particle_count=64, field_width=5000, field_height=5000,
                    timestep=0.2, seed=1024)
    p = PhysicsParams.from_config(cfg)
    state = init_scene(cfg)
    step = make_step(p, accum_fn=backend_accum)
    pos, mass = [], []
    for _ in range(20):
        state = step(state)
        pos.append(np.asarray(state.pos))
        mass.append(np.asarray(state.mass))
    return np.stack(pos), np.stack(mass)


def test_oracle_matches_golden():
    with np.load(FIXTURE) as z:
        gpos, gmass = z["pos"], z["mass"]
    pos, mass = run_traj()
    np.testing.assert_allclose(pos, gpos, rtol=1e-6, atol=1e-3)
    np.testing.assert_array_equal(mass > 0, gmass > 0)
    np.testing.assert_allclose(mass, gmass, rtol=1e-6)


def test_pallas_matches_golden():
    from functools import partial
    from nbodyax.physics.kernels import pallas_pair_accumulators
    with np.load(FIXTURE) as z:
        gpos, gmass = z["pos"], z["mass"]
    accum = partial(pallas_pair_accumulators, eps=0.0, growth_rate=0.1,
                    mode="reference", tile_i=32, tile_j=128, interpret=True)
    pos, mass = run_traj(accum)
    # f32 summation-order noise only; merge decisions must agree exactly
    np.testing.assert_array_equal(mass > 0, gmass > 0)
    np.testing.assert_allclose(mass, gmass, rtol=1e-5)
    np.testing.assert_allclose(pos, gpos, rtol=1e-4, atol=0.5)


@pytest.mark.parametrize("name,n,steps,field", [
    ("ref_n64_dense", 64, 20, 5000),
    ("ref_n64_sparse", 64, 100, 100000),
    # BASELINE config 1 scale: N=1024, 200 steps, default-scene field.
    # Measured divergence of the jnp oracle vs this fixture (2026-08-20):
    # alive masks agree and masses are BIT-equal at every one of the 200
    # steps (135 merges); max alive-pos drift 7.8e-8 of field, max |dv|
    # 3.4e-3 (transient near-encounter at step ~140) — the 2e-4*field gate
    # below has >100x headroom. Runs in ~16 s: stays in the fast tier.
    ("ref_n1k", 1024, 200, 100000),
])
def test_jnp_oracle_matches_external_cpp_oracle(name, n, steps, field):
    """End-to-end parity against the independent C++ reference-semantics
    oracle (tests/golden/ref_oracle.cpp): scene init must match bit-exactly,
    trajectories to f32 summation-order noise, merge decisions exactly."""
    with np.load(os.path.join(EXT_DIR, name + ".npz")) as z:
        gpos, gvel = z["pos"], z["vel"]
        gmass, gradius = z["mass"], z["radius"]

    cfg = SimConfig(particle_count=n, field_width=field, field_height=field,
                    timestep=0.2, seed=1024)
    state = init_scene(cfg)
    # record 0: the RNG port and double->float narrowing must be bit-exact
    np.testing.assert_array_equal(np.asarray(state.pos), gpos[0])
    np.testing.assert_array_equal(np.asarray(state.mass), gmass[0])
    np.testing.assert_array_equal(np.asarray(state.radius), gradius[0])

    step = make_step(PhysicsParams.from_config(cfg))
    scale = float(field)  # positions span [-field, field]
    for s in range(1, steps + 1):
        state = step(state)
        mass = np.asarray(state.mass)
        np.testing.assert_array_equal(
            mass > 0, gmass[s] > 0,
            err_msg=f"alive mask diverged at step {s}")
        np.testing.assert_allclose(mass, gmass[s], rtol=1e-6,
                                   err_msg=f"mass at step {s}")
        np.testing.assert_allclose(np.asarray(state.radius), gradius[s],
                                   rtol=1e-6, err_msg=f"radius at step {s}")
        # Alive bodies only: a dying body's parked coordinates are don't-care
        # state (the reference moves it once more and then compacts it away,
        # nbody.cu:288,488-510; the framework freezes it pre-drift). Absolute
        # tolerance scaled to the field for f32 summation-order noise
        # amplified over `steps` steps.
        alive2 = (mass > 0)[:, None]
        np.testing.assert_allclose(np.where(alive2, np.asarray(state.pos), 0),
                                   np.where(alive2, gpos[s], 0),
                                   atol=2e-4 * scale, rtol=0,
                                   err_msg=f"pos at step {s}")
        np.testing.assert_allclose(np.where(alive2, np.asarray(state.vel), 0),
                                   np.where(alive2, gvel[s], 0),
                                   atol=2e-4 * scale, rtol=0,
                                   err_msg=f"vel at step {s}")
