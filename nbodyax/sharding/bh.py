"""Sharded Barnes-Hut step: compute-parallel hierarchical gravity.

Design: bodies stay index-sharded (same placement as the exact ring); each
step the full body set is all-gathered, every shard builds the
(deterministic, identical) quadtree grids and sorted partner structure from
the gathered arrays, and evaluates near+far accumulators *only for its local
i slice*. Compute scales with the device count; memory is O(N) per device.

Why compute-parallel is the right trade at the 4M/8-shard target (per-device
accounting; see also BENCHMARKS.md):

- **ICI**: one all_gather of (pos, vel, mass, radius) = 24 B/body, i.e.
  24*N*(P-1)/P received per device per pass — 96 MB at N=4M. At v5e ICI
  bandwidth that is milliseconds, against an O(N*levels) bh evaluation that
  takes seconds at this N (BENCHMARKS.md config 6). Momentum mode gathers
  the accumulators too (~36 B/body more) — still noise.
- **HBM**: gathered arrays (24 B/body) + sorted packed partner features
  (24 B/body: 6 f32 lanes — 8 in elastic mode, which also packs partner
  velocities; ids split across two exactly-f32-representable lanes, exact
  at any i32 N, barneshut._pack_id) + sort/index arrays (~12 B/body) +
  level grids (24 B * 4^levels, ~6 MB at levels=10)
  ~= 60-68 B/body ~= 240-272 MB at N=4M on a 16 GB chip.
- Therefore O(N) replication only becomes a binding constraint beyond ~10^8
  bodies; space-partitioned sharding (contiguous cell ranges per shard +
  ring-halo exchange, O(N/P) memory) buys nothing at any currently
  reachable scale. Future work, NEXT.md.

Collision resolution and integration mirror sharding/ring.py exactly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from nbodyax.config import SimConfig
from nbodyax.physics.barneshut import bh_local_accumulators
from nbodyax.physics.collisions import resolve_collisions
from nbodyax.physics.step import (PhysicsParams, finish_euler,
                                  finish_leapfrog, half_kick_drift)
from nbodyax.sharding.mesh import AXIS, make_mesh
from nbodyax.state import SimState

__all__ = ["make_sharded_bh_step"]


def make_sharded_bh_step(cfg: SimConfig,
                         p: PhysicsParams,
                         mesh: Mesh = None) -> Callable[[SimState], SimState]:
    if mesh is None:
        mesh = make_mesh(cfg.shards)

    def local_step(pos, vel, mass, radius):
        n_local = pos.shape[0]
        me = lax.axis_index(AXIS)
        i_ids = (me * n_local
                 + lax.broadcasted_iota(jnp.int32, (n_local, 1), 0).squeeze(-1))
        g = lambda x: lax.all_gather(x, AXIS, tiled=True)

        def bh_acc(lp, lv, lm, lr):
            """Gather the full body set, evaluate bh for the local i slice."""
            return bh_local_accumulators(
                lp, lv, lm, lr, i_ids, g(lp), g(lv), g(lm), g(lr),
                eps=p.eps, growth_rate=p.growth_rate, mode=p.collision_mode,
                levels=cfg.bh_levels, ring=cfg.bh_ring,
                neighbor_k=cfg.bh_neighbor_k, order=cfg.bh_order)

        acc = bh_acc(pos, vel, mass, radius)

        if p.collision_mode == "momentum":
            # merge trees cross shards: resolve on gathered global arrays
            acc_g = jax.tree.map(g, acc)
            pos2_g, vel2_g, mass2_g, radius2_g = resolve_collisions(
                g(pos), g(vel), g(mass), g(radius), acc_g, mode="momentum")
            sl = lambda x: lax.dynamic_slice_in_dim(x, me * n_local, n_local)
            pos2, vel2 = sl(pos2_g), sl(vel2_g)
            mass2, radius2 = sl(mass2_g), sl(radius2_g)
        else:
            pos2, vel2, mass2, radius2 = resolve_collisions(
                pos, vel, mass, radius, acc, mode=p.collision_mode)

        if p.integrator == "euler":
            return finish_euler(pos2, vel2, mass2, radius2, radius,
                                acc.force, p)
        v_half, new_pos = half_kick_drift(pos2, vel2, acc.force, p)
        acc2 = bh_acc(new_pos, v_half, mass2, radius2)  # KDK second pass
        return finish_leapfrog(pos2, new_pos, v_half, mass2, radius2,
                               acc2.force, p)

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(AXIS),) * 4, out_specs=(P(AXIS),) * 4,
        check_vma=False)

    @jax.jit
    def step(state: SimState) -> SimState:
        pos, vel, mass, radius = sharded(state.pos, state.vel, state.mass,
                                         state.radius)
        return SimState(pos, vel, mass, radius, state.step + 1)

    return step
