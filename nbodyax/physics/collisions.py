"""Collision resolution modes.

Turns the pairwise accumulators into committed state updates. Three modes
(plus "none"), selectable via ``collisionMode`` in the config:

- ``reference`` — the reference's absorb-on-contact rule, verbatim
  (/root/reference/src/nbody.cu:215-226,245-246): every body that overlaps a
  lighter-or-equal body gains its mass and ``r_j * growthRate`` radius (quirk
  Q10, ad-hoc non-area-conserving growth); every body overlapped by a strictly
  heavier body dies (mass set to 0, the in-band marker of nbody.cu:245). Merges
  are non-transactional and equal masses double-absorb (quirk Q1), so neither
  mass nor momentum is conserved — that *is* the spec.

- ``momentum`` — physically-consistent merging (new; required by BASELINE
  configs): losers donate to the strongest overlapping winner; merge trees are
  resolved to their roots by pointer doubling so chains A<B<C collapse into C
  in one step. Mass and momentum are conserved exactly: the root gets the tree
  mass sum, momentum-weighted velocity, center-of-mass position, and an
  area-conserving radius sqrt(sum r^2).

- ``elastic`` — no merging; overlapping, approaching pairs exchange the
  standard 2-body elastic impulse (pairwise momentum- and energy-conserving).
  A ``restitution`` coefficient e in [0,1] generalizes it to partially
  inelastic bounces: the impulse scales by (1+e)/2, conserving momentum
  exactly while dissipating kinetic energy for e<1 (e=0 kills the normal
  relative velocity entirely — perfectly inelastic contact without merging).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from nbodyax.physics.pairwise import PairAccumulators

__all__ = ["resolve_collisions"]


def _pointer_double(parent: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Resolve parent pointers to their roots: parent <- parent[parent], log2(N)
    times. Each body's parent points at a strictly-stronger body (heavier, or
    equal mass with lower index), so the pointer graph is a forest and pointer
    doubling converges in ceil(log2 N) steps."""
    def body(_, p):
        return p[p]
    return lax.fori_loop(0, iters, body, parent)


def resolve_collisions(pos, vel, mass, radius, acc: PairAccumulators, *,
                       mode: str, restitution: float = 1.0):
    """Apply collision outcomes. Returns (pos, vel, mass, radius).

    Velocity here is the *pre-kick* velocity: the reference resolves merges in
    the same pass that computes forces, from step-start state (nbody.cu:215-226),
    and commits mass/radius in MoveBodies (nbody.cu:289-290).

    ``restitution`` (elastic mode only) scales the accumulated pair impulse by
    (1+e)/2 — the standard coefficient-of-restitution generalization of the
    e=1 impulse the accumulators carry. Since the scale is a per-run constant
    it hoists out of the pair sum, so every engine (oracle, Pallas kernel,
    ring, bh near field) shares this single commit point; e=1 keeps the factor
    exactly 1.0f and the original behavior bit-for-bit.
    """
    if mode == "none":
        return pos, vel, mass, radius

    if mode == "reference":
        new_mass = jnp.where(acc.died, 0.0, mass + acc.gained_mass)
        new_mass = jnp.where(mass > 0, new_mass, 0.0)
        # radius is committed even for dying bodies (nbody.cu:246); harmless
        # because dead slots are masked everywhere.
        new_radius = radius + acc.gained_radius
        return pos, vel, new_mass, new_radius

    if mode == "momentum":
        n, dim = pos.shape
        iters = max(1, (n - 1).bit_length())
        root = _pointer_double(acc.parent, iters)
        idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        alive = mass > 0
        root = jnp.where(alive, root, idx)  # dead slots stay self-rooted
        msum = jnp.zeros(n, jnp.float32).at[root].add(mass)
        psum = jnp.zeros((n, dim), jnp.float32).at[root].add(mass[:, None] * vel)
        xsum = jnp.zeros((n, dim), jnp.float32).at[root].add(mass[:, None] * pos)
        r2sum = jnp.zeros(n, jnp.float32).at[root].add(radius * radius)
        is_root = (root == idx) & alive
        safe_m = jnp.where(msum > 0, msum, 1.0)
        new_mass = jnp.where(is_root, msum, 0.0)
        new_vel = jnp.where(is_root[:, None], psum / safe_m[:, None], vel)
        new_pos = jnp.where(is_root[:, None], xsum / safe_m[:, None], pos)
        new_radius = jnp.where(is_root, jnp.sqrt(r2sum), radius)
        return new_pos, new_vel, new_mass, new_radius

    if mode == "elastic":
        fac = np.float32(0.5 * (1.0 + float(restitution)))
        dv = acc.dv if fac == np.float32(1.0) else fac * acc.dv
        return pos, vel + dv, mass, radius

    raise ValueError(f"unknown collision mode {mode!r}")
