"""Scene constructors.

- ``uniform``: the reference's random scene (nbody.cu:406-416), bit-exact via
  the ported jbutil RNG when ``parity=True``, or ``jax.random`` for large fast
  scenes.
- ``three_body``: the hand-checkable fixture the reference author used for
  debugging (commented out at /root/reference/src/nbody.cu:418-429).
- ``galaxy``: two rotating disks on a collision course — the BASELINE.json
  config-5 "galaxy collision" scenario (not present in the reference).
- ``plummer``: the classic Plummer-sphere cluster (not present in the
  reference) — near-equilibrium isotropic initial conditions for relaxation
  and accuracy studies.
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


def plummer_scene(cfg: SimConfig) -> SimState:
    """Plummer (1911) sphere — the standard self-gravitating cluster initial
    condition: density rho(r) = (3M/4 pi a^3) (1 + r^2/a^2)^{-5/2}.

    - Radii invert the cumulative mass M(r)/M = r^3/(r^2+a^2)^{3/2} exactly:
      r = a / sqrt(u^{-2/3} - 1), with u capped so the tail truncates at
      r_max = 5a (standard practice; also keeps every body inside the field).
    - Velocities are isotropic with speeds v = q * v_esc(r),
      v_esc = sqrt(2 G M) (r^2+a^2)^{-1/4}, where q follows Aarseth's
      distribution g(q) dq ∝ q^2 (1-q^2)^{7/2} dq — sampled by inverse CDF on
      a precomputed grid (deterministic and jit-friendly; no rejection loop).
    - dimensions=2 samples directions on the circle with the same radial laws
      (a "Plummer disk"); dimensions=3 is the classic sphere.

    The scale radius is a = min(field)/12 so the 5a truncation sits well
    inside the boundary. Body masses are uniform in [minRandBodyMass,
    maxRandBodyMass) (matching the reference scene's convention,
    nbody.cu:410-413); the velocity normalization uses the analytic total
    M = n * (min+max)/2. Body radii reuse the galaxy scene's ~1% packing cap
    so the core doesn't instantly agglomerate.
    """
    n = cfg.particle_count
    dim = cfg.dimensions
    key = jax.random.PRNGKey(cfg.seed)
    k_r, k_dir, k_q, k_vdir, k_m, k_rad = jax.random.split(key, 6)
    extents = _field_extents(cfg)
    a = float(min(extents)) / 12.0
    r_max = 5.0 * a
    m_total = n * 0.5 * (float(cfg.min_body_mass) + float(cfg.max_body_mass))

    # radial inverse CDF, truncated at r_max
    u_max = r_max ** 3 / (r_max ** 2 + a ** 2) ** 1.5
    u = jax.random.uniform(k_r, (n,), minval=1e-6, maxval=u_max)
    r = a / jnp.sqrt(u ** (-2.0 / 3.0) - 1.0)

    def _unit_vectors(k, count):
        if dim == 2:
            th = jax.random.uniform(k, (count,), maxval=2 * jnp.pi)
            return jnp.stack([jnp.cos(th), jnp.sin(th)], -1)
        k1, k2 = jax.random.split(k)
        z = jax.random.uniform(k1, (count,), minval=-1.0, maxval=1.0)
        th = jax.random.uniform(k2, (count,), maxval=2 * jnp.pi)
        s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        return jnp.stack([s * jnp.cos(th), s * jnp.sin(th), z], -1)

    pos = r[:, None] * _unit_vectors(k_dir, n)

    # Aarseth speed fraction q ~ q^2 (1-q^2)^{7/2}: inverse CDF on a grid
    qs = np.linspace(0.0, 1.0, 2049)
    pdf = qs ** 2 * (1.0 - qs ** 2) ** 3.5
    cdf = np.concatenate([[0.0], np.cumsum((pdf[1:] + pdf[:-1]) * 0.5)])
    cdf /= cdf[-1]
    uq = jax.random.uniform(k_q, (n,))
    q = jnp.interp(uq, jnp.asarray(cdf, jnp.float32),
                   jnp.asarray(qs, jnp.float32))
    v_esc = jnp.sqrt(2.0 * G * m_total) * (r * r + a * a) ** -0.25
    vel = (q * v_esc)[:, None] * _unit_vectors(k_vdir, n)

    mass = jax.random.uniform(k_m, (n,), jnp.float32,
                              minval=cfg.min_body_mass,
                              maxval=cfg.max_body_mass)
    # same ~1% packing cap as the galaxy scene, over the half-mass disk
    mean_r2 = (cfg.min_radius ** 2 + cfg.min_radius * cfg.max_radius
               + cfg.max_radius ** 2) / 3.0
    half_mass_r = a / np.sqrt(2.0 ** (2.0 / 3.0) - 1.0)
    packing = n * np.pi * mean_r2 / (np.pi * half_mass_r ** 2)
    r_scale = float(min(1.0, np.sqrt(0.01 / max(packing, 1e-30))))
    radius = jax.random.uniform(k_rad, (n,), jnp.float32,
                                minval=cfg.min_radius * r_scale,
                                maxval=cfg.max_radius * r_scale)
    return make_state(pos.astype(jnp.float32), vel.astype(jnp.float32),
                      mass, radius)


def init_scene(cfg: SimConfig, *, parity: bool = True) -> SimState:
    if cfg.scene == "uniform":
        return uniform_scene(cfg, parity=parity)
    if cfg.scene == "three_body":
        return three_body_scene(cfg)
    if cfg.scene == "galaxy":
        return galaxy_scene(cfg)
    if cfg.scene == "plummer":
        return plummer_scene(cfg)
    raise ValueError(f"unknown scene {cfg.scene!r}")
