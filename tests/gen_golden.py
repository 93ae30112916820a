"""Regenerate the committed golden-trajectory fixture.

Run manually (CPU) after a *deliberate* semantics change:
    JAX_PLATFORMS=cpu python tests/gen_golden.py
The fixture pins the reference-mode physics (quirks and all) of the jnp
oracle: a 20-step, N=64 seeded run including merges and boundary flips.
Any unintended change to pairwise/collision/boundary/integration semantics
breaks tests/test_golden.py.
"""

import os

import numpy as np


def build():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from nbodyax.config import SimConfig
    from nbodyax.physics.step import PhysicsParams, make_step
    from nbodyax.scenes import init_scene

    cfg = SimConfig(particle_count=64, field_width=5000, field_height=5000,
                    timestep=0.2, seed=1024)
    p = PhysicsParams.from_config(cfg)
    state = init_scene(cfg)  # bit-exact reference RNG scene
    step = make_step(p)
    traj_pos, traj_mass = [], []
    for _ in range(20):
        state = step(state)
        traj_pos.append(np.asarray(state.pos))
        traj_mass.append(np.asarray(state.mass))
    return np.stack(traj_pos), np.stack(traj_mass)


if __name__ == "__main__":
    pos, mass = build()
    out = os.path.join(os.path.dirname(__file__), "golden_traj_n64.npz")
    np.savez_compressed(out, pos=pos, mass=mass)
    print(f"wrote {out}: pos {pos.shape}, alive at end "
          f"{(mass[-1] > 0).sum()}/{mass.shape[1]}")
