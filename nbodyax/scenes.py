"""Scene constructors.

- ``uniform``: the reference's random scene (nbody.cu:406-416), bit-exact via
  the ported jbutil RNG when ``parity=True``, or ``jax.random`` for large fast
  scenes.
- ``three_body``: the hand-checkable fixture the reference author used for
  debugging (commented out at /root/reference/src/nbody.cu:418-429).
- ``galaxy``: two rotating disks on a collision course — the BASELINE.json
  config-5 "galaxy collision" scenario (not present in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nbodyax.config import SimConfig
from nbodyax.rng import scene_arrays
from nbodyax.state import SimState, make_state

__all__ = ["init_scene"]

G = 6.67408e-11  # GRAV_CONSTANT, nbody.cu:37


def _field_extents(cfg: SimConfig):
    ext = [float(cfg.field_width), float(cfg.field_height)]
    if cfg.dimensions == 3:
        ext.append(float(cfg.field_depth or cfg.field_width))
    return ext


def uniform_scene(cfg: SimConfig, *, parity: bool = True) -> SimState:
    """Reference random scene: pos uniform over the field, vel 0, mass/radius
    uniform over their ranges (nbody.cu:406-416). Bit-exact parity with the
    reference RNG exists only in 2-D (the reference is 2-D); 3-D scenes always
    take the jax.random path."""
    n = cfg.particle_count
    if parity and cfg.dimensions == 2:
        pos, vel, mass, radius = scene_arrays(
            cfg.seed, n, cfg.field_width, cfg.field_height,
            cfg.min_body_mass, cfg.max_body_mass, cfg.min_radius, cfg.max_radius)
        return make_state(pos, vel, mass, radius)
    key = jax.random.PRNGKey(cfg.seed)
    kp, km, kr = jax.random.split(key, 3)
    ext = jnp.array(_field_extents(cfg))
    d = cfg.dimensions
    pos = jax.random.uniform(kp, (n, d), jnp.float32, minval=-ext, maxval=ext)
    mass = jax.random.uniform(km, (n,), jnp.float32,
                              minval=cfg.min_body_mass, maxval=cfg.max_body_mass)
    radius = jax.random.uniform(kr, (n,), jnp.float32,
                                minval=cfg.min_radius, maxval=cfg.max_radius)
    return make_state(pos, jnp.zeros((n, d), jnp.float32), mass, radius)


def three_body_scene(cfg: SimConfig) -> SimState:
    """The reference's commented-out 3-body debug fixture (nbody.cu:418-429).
    Planar; in a dimensions=3 run it gets z=0 (and stays planar exactly)."""
    pos = np.array([[-500.0, 0.0], [500.0, 0.0], [-600.0, -150.0]], np.float32)
    vel = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 0.0]], np.float32)
    mass = np.array([1e10, 1e14, 1e3], np.float32)
    radius = np.array([10.0, 20.0, 7.0], np.float32)
    if cfg.dimensions == 3:
        z = np.zeros((3, 1), np.float32)
        pos = np.concatenate([pos, z], axis=1)
        vel = np.concatenate([vel, z], axis=1)
    return make_state(pos, vel, mass, radius)


def galaxy_scene(cfg: SimConfig) -> SimState:
    """Two rotating disk 'galaxies' on a collision course (BASELINE config 5).

    Each disk: a heavy central body plus a disk of light bodies on near-circular
    orbits (v = sqrt(G*M_c/r) tangential). The disks approach each other along x.
    """
    n = cfg.particle_count
    if n < 4:
        raise ValueError("galaxy scene needs particleCount >= 4 "
                         "(two disks, each a central body plus orbiters)")
    n1 = n // 2
    n2 = n - n1
    key = jax.random.PRNGKey(cfg.seed)
    fw, fh = float(cfg.field_width), float(cfg.field_height)
    sep = 0.5 * fw
    disk_r = 0.25 * min(fw, fh)
    m_central = float(cfg.max_body_mass)
    approach_v = 0.25 * float(np.sqrt(G * m_central / sep))

    # Body radii are scaled so the disk isn't solid: the reference-scene
    # radius range (50-200 over a 1e5 field) would pack a 131k-body disk at
    # ~80% area density and everything would agglomerate within steps. Cap
    # total body area at ~1% of the disk area.
    mean_r2 = (cfg.min_radius ** 2 + cfg.min_radius * cfg.max_radius
               + cfg.max_radius ** 2) / 3.0
    packing = n * np.pi * mean_r2 / (np.pi * disk_r ** 2)
    r_scale = float(min(1.0, np.sqrt(0.01 / max(packing, 1e-30))))

    def disk(key, count, center, drift):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        # area-uniform radial distribution, small inner hole
        r = disk_r * jnp.sqrt(jax.random.uniform(k1, (count - 1,), minval=0.01))
        th = jax.random.uniform(k2, (count - 1,), maxval=2 * jnp.pi)
        pcols = [r * jnp.cos(th), r * jnp.sin(th)]
        vc = jnp.sqrt(G * m_central / r)
        vcols = [-vc * jnp.sin(th), vc * jnp.cos(th)]
        if cfg.dimensions == 3:
            # thin disk: ±2% of the disk radius of vertical scatter, vz = 0
            pcols.append(jax.random.uniform(k5, (count - 1,),
                                            minval=-0.02 * disk_r,
                                            maxval=0.02 * disk_r))
            vcols.append(jnp.zeros((count - 1,), jnp.float32))
        p = jnp.stack(pcols, -1) + center
        v = jnp.stack(vcols, -1) + drift
        m = jax.random.uniform(k3, (count - 1,), jnp.float32,
                               minval=cfg.min_body_mass,
                               maxval=0.01 * cfg.max_body_mass)
        rad = jax.random.uniform(k4, (count - 1,), jnp.float32,
                                 minval=cfg.min_radius * r_scale,
                                 maxval=cfg.max_radius * r_scale)
        p = jnp.concatenate([center[None, :], p], 0)
        v = jnp.concatenate([drift[None, :], v], 0)
        m = jnp.concatenate([jnp.array([m_central], jnp.float32), m], 0)
        rad = jnp.concatenate([jnp.array([cfg.max_radius], jnp.float32), rad], 0)
        return p, v, m, rad

    ka, kb = jax.random.split(key)
    zpad = [0.0] * (cfg.dimensions - 2)
    c1 = jnp.array([-sep / 2, 0.0] + zpad, jnp.float32)
    c2 = jnp.array([sep / 2, 0.0] + zpad, jnp.float32)
    d1 = jnp.array([approach_v, 0.0] + zpad, jnp.float32)
    d2 = jnp.array([-approach_v, 0.0] + zpad, jnp.float32)
    p1, v1, m1, r1 = disk(ka, n1, c1, d1)
    p2, v2, m2, r2 = disk(kb, n2, c2, d2)
    return make_state(jnp.concatenate([p1, p2]).astype(jnp.float32),
                      jnp.concatenate([v1, v2]).astype(jnp.float32),
                      jnp.concatenate([m1, m2]),
                      jnp.concatenate([r1, r2]))


def init_scene(cfg: SimConfig, *, parity: bool = True) -> SimState:
    if cfg.scene == "uniform":
        return uniform_scene(cfg, parity=parity)
    if cfg.scene == "three_body":
        return three_body_scene(cfg)
    if cfg.scene == "galaxy":
        return galaxy_scene(cfg)
    raise ValueError(f"unknown scene {cfg.scene!r}")
