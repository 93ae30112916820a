"""Golden-trajectory regression anchor.

The committed fixture (tests/golden_traj_n64.npz, regenerate with
tests/gen_golden.py) pins the reference-mode semantics: a seeded N=64 scene
stepped 20 times through merges and boundary events. Both backends must
reproduce it — the oracle tightly, the Pallas kernel to f32 summation noise.
"""

import os

import numpy as np
import pytest

from nbodyax.config import SimConfig
from nbodyax.physics.step import PhysicsParams, make_step
from nbodyax.scenes import init_scene

FIXTURE = os.path.join(os.path.dirname(__file__), "golden_traj_n64.npz")


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
