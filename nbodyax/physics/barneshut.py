"""Approximate hierarchical gravity: Barnes-Hut/FMM-style far field +
exact grid-neighbor near field (``forceModel=bh``).

Beyond-reference capability: the reference (and our default ``exact`` model)
is O(N^2) per step; this model is O(N * levels).

- **Far field**: bodies are binned into a complete quadtree (2-D) or octree
  (3-D — the model is dimension-generic) of dense per-level mass/moment grids
  over the *adaptive* bounding box of the live bodies (finest side 2^levels;
  coarsening is 2^dim-child sum-pooling — pure XLA scatter/reshape,
  MXU/VPU-friendly dense math, no pointer chasing). For each
  body, at every level, the classic FMM *interaction list* — children of the
  parent cell's ring-w neighborhood that are not within ring w of the body's
  own cell — contributes a softened monopole force. Every region of space
  outside the finest-level ring is accounted exactly once across levels
  (telescoping), with opening ratio <= 1/w: ring=1 gives ~1e-2 relative force
  error, ring=2 ~1e-3 (``bhRing``).
- **Near field**: bodies sorted by finest-level cell id; each body interacts
  *exactly* — identical per-pair semantics to physics/pairwise.py, collision
  channels included — with up to ``bhNeighborK`` bodies in each of its
  (2*ring+1) neighbor-cell ROWS (the row's cells are contiguous in sorted
  order, so a row is one gather window; a crowded cell can use its row
  neighbors' unused slots).

Because the near field carries the full collision semantics, every collision
mode (reference / momentum / elastic) composes with this model unchanged.
Documented approximations:
1. overlaps spanning beyond the near window (radius sum > ring * cell size)
   are missed — fine while radii stay below the cell size;
2. window rows holding more than K bodies drop the excess from near-field
   lists (``overflow_count`` reports how many — the driver logs it as
   ``bh_overflow``; raise ``bhNeighborK`` or ``bhLevels`` if it is nonzero);
3. the monopole far field is not exactly antisymmetric (body A's pull from
   B's cell aggregate differs from B's pull from A's), so total momentum
   drifts at the far-field error level over long runs — standard for tree
   codes; use ``forceModel=exact`` where strict momentum conservation
   matters.

Dead bodies (mass 0) go to an out-of-grid bucket: they occupy no near-field
slots and contribute nothing to the aggregates.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from nbodyax.physics.pairwise import (PairAccumulators, combine_accumulators,
                                      empty_accumulators)

__all__ = ["bh_accumulators", "bh_local_accumulators",
           "auto_levels", "pick_levels", "overflow_count"]

_NEG_INF = jnp.float32(-jnp.inf)


def auto_levels(n: int, target_occupancy: int = 16,
                max_levels: int = 10, dim: int = 2) -> int:
    """Finest level so average occupancy ~= target (grid side 2^levels,
    2^(dim*levels) cells: a quadtree in 2-D, an octree in 3-D).

    Occupancy 16 tuned on v5e at N=1M: the near field is CAP-bound (it
    gathers bhNeighborK rows per window regardless of occupancy, so coarser
    cells are nearly free until row occupancy approaches K), while each
    extra level costs a full interaction-list gather sweep — and the finest
    level's is the most expensive (largest cell table, worst locality).
    levels=8 vs 9 at N=1M: far field 0.93 s -> 0.52 s, same accuracy class
    (the near window covers MORE area exactly). 3-D levels are capped so the
    finest dense grid stays well under VMEM/HBM budgets (2^(3*7) = 2M cells)."""
    if dim == 3:
        max_levels = min(max_levels, 7)
    cells = max(4, n // max(1, target_occupancy))
    return max(2, min(max_levels, math.ceil(math.log(cells, 2 ** dim))))


def pick_levels(pos, mass, *, neighbor_k: int = 64, ring: int = 1,
                max_levels: int = 10, tolerance: float = 0.01) -> int:
    """Density-aware finest-level choice from an actual state.

    ``auto_levels`` assumes near-uniform density; clustered scenes (galaxy
    cores) can overflow the per-row near-field cap at that occupancy. This
    probes ``overflow_count`` on the given state and refines until the
    overflow fraction is within ``tolerance`` — coarse (fast) where density
    allows, fine where it doesn't. The default 1% tolerance keeps truncation
    within the model's ring=1 far-field accuracy class (uniform scenes sit
    at ~0.2% and stay coarse; galaxy scenes at ~10% refine one level). The
    driver calls this once at startup when ``bhLevels=0``; the logged
    ``bh_overflow`` metric catches later density drift."""
    n = pos.shape[0]
    dim = pos.shape[-1]
    lv = auto_levels(n, max_levels=max_levels, dim=dim)
    cap = min(max_levels, 7) if dim == 3 else max_levels
    while lv < cap:
        ov = int(overflow_count(pos, mass, levels=lv, neighbor_k=neighbor_k,
                                ring=ring))
        if ov <= n * tolerance:
            break
        lv += 1
    return lv


def _extent(pos, alive):
    """Adaptive bounding box of live bodies (traced scalars; shapes static).
    Returns (mins, spans): two length-D tuples, D = pos.shape[-1]."""
    big = jnp.float32(3e38)
    mins, spans = [], []
    for d in range(pos.shape[-1]):
        lo = jnp.min(jnp.where(alive, pos[:, d], big))
        hi = jnp.max(jnp.where(alive, pos[:, d], -big))
        mins.append(lo)
        spans.append(jnp.maximum(hi - lo, 1e-3) * 1.0001)
    return tuple(mins), tuple(spans)


def _cells(pos, ext, g):
    """Per-axis cell indices at grid side g: a length-D tuple of i32[N]."""
    mins, spans = ext
    return tuple(
        (jnp.clip((pos[:, d] - mins[d]) / spans[d], 0.0, 1.0 - 1e-7)
         * g).astype(jnp.int32)
        for d in range(pos.shape[-1]))


def _flatten_cells(cs, g):
    """Row-major flat cell id from per-axis indices (x fastest: adjacent x
    cells are adjacent flat ids — the near field's row-window contiguity)."""
    flat = cs[-1]
    for c in reversed(cs[:-1]):
        flat = flat * g + c
    return flat


def _cell_sizes(ext, g):
    mins, spans = ext
    return mins, tuple(s / g for s in spans)


def _moment_pairs(dim):
    """Index pairs (a <= b) of the symmetric second-moment tensor, in the
    channel order the grids store them."""
    return [(a, b) for a in range(dim) for b in range(a, dim)]


def _pool(a, s, dim):
    """Sum-pool 2^dim children into parents on a flat row-major grid of side
    s (x fastest — pooling pairs each axis, so axis order is irrelevant)."""
    shape = [s // 2, 2] * dim
    return a.reshape(shape).sum(axis=tuple(range(1, 2 * dim, 2))).reshape(-1)


def _level_grids(pos, mass, ext, levels, order=1):
    """Per-level cell aggregates, any dimensionality (quadtree in 2-D,
    octree in 3-D; 2^(dim*levels) cells at the finest level).

    order=1: (M, S_0..S_{D-1}) with S about the origin (COM = S/M — adequate
    for monopole). order=2 instead keeps moments about EACH CELL'S CENTER —
    origin-relative second moments would catastrophically cancel in f32
    (Q ~ M*cell^2 against raw terms ~ M*x^2) — and pools them with
    parallel-axis shifts: about a new reference t_p = t_c + delta,
        S_a' = S_a - M d_a,
        S_ab' = S_ab - d_a S_b - d_b S_a + M d_a d_b   (r' = r - delta).
    """
    dim = pos.shape[-1]
    g = 1 << levels
    cs = _cells(pos, ext, g)
    flat = _flatten_cells(cs, g)
    ncells = g ** dim
    zero = jnp.zeros((ncells,), jnp.float32)
    if order < 2:
        chans = [mass] + [mass * pos[:, d] for d in range(dim)]
        grids = {levels: tuple(zero.at[flat].add(c) for c in chans)}
        for l in range(levels - 1, 1, -1):
            s = 1 << (l + 1)
            grids[l] = tuple(_pool(a, s, dim) for a in grids[l + 1])
        return grids

    # order 2: finest-level moments about each body's own cell center
    pairs = _moment_pairs(dim)
    mins, csz = _cell_sizes(ext, g)
    r = [pos[:, d] - (mins[d] + (cs[d].astype(jnp.float32) + 0.5) * csz[d])
         for d in range(dim)]
    chans = ([mass] + [mass * r[d] for d in range(dim)]
             + [mass * r[a] * r[b] for a, b in pairs])
    grids = {levels: tuple(zero.at[flat].add(c) for c in chans)}
    for l in range(levels - 1, 1, -1):
        s = 1 << (l + 1)                      # child grid side
        arrs = grids[l + 1]
        M = arrs[0]
        S1 = list(arrs[1:1 + dim])
        S2 = list(arrs[1 + dim:])
        # child-center offset from parent center: +/- child_cell/2 per axis;
        # axis-d parity of a flat row-major id (x fastest, stride s^d) is
        # (id // s^d) & 1 (s is even)
        _, ccsz = _cell_sizes(ext, s)
        iota = lax.broadcasted_iota(jnp.int32, (s ** dim, 1), 0).squeeze(-1)
        delta = [jnp.where(((iota // (s ** d)) & 1) == 0,
                           0.5 * ccsz[d], -0.5 * ccsz[d])
                 for d in range(dim)]
        S2n = [S2[k] - delta[a] * S1[b] - delta[b] * S1[a]
               + M * delta[a] * delta[b]
               for k, (a, b) in enumerate(pairs)]
        S1n = [S1[d] - M * delta[d] for d in range(dim)]
        grids[l] = tuple(_pool(a, s, dim) for a in [M] + S1n + S2n)
    return grids


_DENSE_FAR_CELLS = {2: 256, 3: 512}  # levels up to this many cells skip gathers


def _far_force(i_pos, pos, mass, ext, levels, ring, eps2, chunk, order=1):
    """Far-field force for the i bodies (any subset), with grids aggregated
    from the full (pos, mass) partner set. Dimension-generic (2-D quadtree /
    3-D octree; the interaction-list window is win^dim cells per level).

    order=1: monopole (cell mass at its COM). order=2 adds the quadrupole
    term — the second-order Taylor expansion of u/|u|^3 about the COM (the
    first-order term vanishes there): with d = COM - p, r = |d|, and central
    second moments Q,
        F_quad = 1/2 [ -3 r^-5 (2 Q d + d tr Q) + 15 r^-7 (d^T Q d) d ],
    cutting the opening-ratio error from O((s/d)^2) to O((s/d)^3) — roughly
    ring=2 accuracy at ring=1 cost.

    Coarse levels (grid <= _DENSE_FAR_CELLS[dim] cells) are evaluated DENSELY
    over every cell with the interaction-list membership computed in-register
    — identical cell set to the gathered window, but zero gathers. Gathered
    rows cost ~7 ns each on v5e (the measured bottleneck of this model);
    a [chunk, few-hundred]-cell elementwise pass is VPU noise by comparison.
    """
    dim = pos.shape[-1]
    grids = _level_grids(pos, mass, ext, levels, order)
    n = i_pos.shape[0]
    win = 4 * ring + 2
    offs = [lax.broadcasted_iota(jnp.int32, (win,) * dim, d).reshape(-1)
            for d in range(dim)]
    pairs = _moment_pairs(dim)
    dense_cells = _DENSE_FAR_CELLS[dim]

    nchunks = -(-n // chunk)
    npad = nchunks * chunk
    pos_p = jnp.pad(i_pos, ((0, npad - n), (0, 0)))

    packed = {l: jnp.stack(grids[l], axis=1) for l in grids}  # [cells, ch]

    def one_chunk(c):
        pc = lax.dynamic_slice_in_dim(pos_p, c * chunk, chunk)
        force = jnp.zeros((chunk, dim), jnp.float32)
        for l in range(2, levels + 1):
            g = 1 << l
            cs = _cells(pc, ext, g)                     # dim x [C]
            ncells = g ** dim
            if ncells <= dense_cells:
                # dense: all cells as a [1, ncells] row, membership in-register
                cells = lax.broadcasted_iota(jnp.int32, (1, ncells), 1)
                ws, rem = [], cells
                for d in range(dim):                    # x fastest
                    ws.append(rem % g)
                    rem = rem // g
                near = jnp.bool_(True)
                parent_ok = jnp.bool_(True)
                for d in range(dim):
                    cd = cs[d][:, None]
                    near = near & (jnp.abs(ws[d] - cd) <= ring)
                    parent_ok = parent_ok & \
                        (jnp.abs((ws[d] >> 1) - (cd >> 1)) <= ring)
                use = parent_ok & ~near                 # [C, ncells]
                cellrow = packed[l][None, :, :]         # [1, ncells, ch]
            else:
                ws = [(((cs[d] >> 1) - ring) << 1)[:, None] + offs[d][None, :]
                      for d in range(dim)]              # [C, win^dim]
                near = jnp.bool_(True)
                inb = jnp.bool_(True)
                for d in range(dim):
                    near = near & (jnp.abs(ws[d] - cs[d][:, None]) <= ring)
                    inb = inb & (ws[d] >= 0) & (ws[d] < g)
                use = inb & ~near
                flat = jnp.clip(_flatten_cells(ws, g), 0, ncells - 1)
                cellrow = packed[l][flat]               # [C, win^dim, ch]
            M = jnp.where(use, cellrow[..., 0], 0.0)
            has = M > 0
            Minv = 1.0 / jnp.where(has, M, 1.0)
            if order >= 2:
                # moments are about the cell center (see _level_grids)
                mins, csz = _cell_sizes(ext, g)
                com = [mins[d] + (ws[d].astype(jnp.float32) + 0.5) * csz[d]
                       + cellrow[..., 1 + d] * Minv for d in range(dim)]
            else:
                com = [cellrow[..., 1 + d] * Minv for d in range(dim)]
            dv = [jnp.where(has, com[d] - pc[:, d:d + 1], 0.0)
                  for d in range(dim)]
            d2 = dv[0] * dv[0]
            for c2 in dv[1:]:
                d2 = d2 + c2 * c2
            d2 = d2 + eps2
            inv = lax.rsqrt(jnp.where(has, d2, 1.0))
            inv2 = inv * inv
            inv3 = inv2 * inv
            wgt = jnp.where(has, M * inv3, 0.0)
            f = [wgt * dv[d] for d in range(dim)]
            if order >= 2:
                # central (about-COM) moments from about-center moments:
                # Q = S2 - (S1/M) S1^T. Mask the channels FIRST (excluded
                # cells keep Minv=1, and S1*S1 there reaches ~1e45 -> inf,
                # which no later 0-multiply can cancel: inf*0 = NaN). Divide
                # before squaring for the same overflow reason.
                s1 = [jnp.where(use, cellrow[..., 1 + d], 0.0)
                      for d in range(dim)]
                rb = [s1[d] * Minv for d in range(dim)]
                q = {}
                for k, (a, b) in enumerate(pairs):
                    q[a, b] = (jnp.where(use, cellrow[..., 1 + dim + k], 0.0)
                               - rb[a] * s1[b])
                    q[b, a] = q[a, b]
                inv5 = inv3 * inv2
                # scale by inv5 BEFORE contracting with d: raw d^T Q d can
                # reach ~5e39 (Q ~ M cell^2 ~ 5e29, |d|^2 ~ 1e10) and
                # overflows f32
                u = [sum(q[a, b] * dv[b] for b in range(dim)) * inv5
                     for a in range(dim)]               # (Q d) r^-5
                trq5 = sum(q[a, a] for a in range(dim)) * inv5
                dqd7 = sum(dv[a] * u[a] for a in range(dim)) * inv2
                coef = jnp.where(has, 1.0, 0.0)
                f = [f[a] + coef * (-1.5 * (2.0 * u[a] + dv[a] * trq5)
                                    + 7.5 * dqd7 * dv[a])
                     for a in range(dim)]
            force = force + jnp.stack([jnp.sum(fa, axis=1) for fa in f],
                                      axis=1)
        return force

    if nchunks == 1:
        out = one_chunk(jnp.int32(0))[None]
    else:
        out = lax.map(one_chunk, jnp.arange(nchunks))
    return out.reshape(npad, dim)[:n]


def _pack_id(ids: jnp.ndarray):
    """Split i32 body ids across two exactly-f32-representable lanes:
    hi = id >> 12 (< 2^19 for any i32 id), lo = id & 0xFFF (< 2^12)."""
    ids = ids.astype(jnp.int32)
    return ((ids >> 12).astype(jnp.float32),
            (ids & 0xFFF).astype(jnp.float32))


def _unpack_id(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    return hi.astype(jnp.int32) * 4096 + lo.astype(jnp.int32)


def _gathered_pair_accum(pi, vi, mi, ri, ii, pj, vj, mj, rj, jj, *,
                         eps2, growth_rate, mode):
    """Exact per-pair semantics (mirrors pairwise.pair_accumulators_chunk)
    over per-body partner lists: i arrays are [C], j arrays are [C, M]
    gathered neighbors. Invalid/padded partners carry mass 0.
    Dimension-generic (positions/velocities are [..., D])."""
    dim = pi.shape[-1]
    alive = (mi > 0)[:, None] & (mj > 0)
    notself = ii[:, None] != jj
    valid = alive & notself

    dp = [pj[..., d] - pi[:, None, d] for d in range(dim)]
    d2 = dp[0] * dp[0]
    for c in dp[1:]:
        d2 = d2 + c * c
    rsum = ri[:, None] + rj
    overlap = (d2 <= rsum * rsum) & valid

    fmask = valid if mode == "elastic" else (valid & ~overlap)
    d2e = d2 + eps2
    safe = fmask & (d2e > 0)
    inv = lax.rsqrt(jnp.where(safe, d2e, 1.0))
    w = jnp.where(safe, mj * (inv * inv * inv), 0.0)
    force = jnp.stack([jnp.sum(w * c, axis=1) for c in dp], axis=1)

    out = empty_accumulators(ii, dim=dim)._replace(force=force)
    if mode == "reference":
        heavier = mi[:, None] >= mj
        merge = overlap & heavier
        out = out._replace(
            gained_mass=jnp.sum(jnp.where(merge, mj, 0.0), axis=1),
            gained_radius=jnp.sum(jnp.where(merge, rj * growth_rate, 0.0),
                                  axis=1),
            died=jnp.any(overlap & ~heavier, axis=1))
    elif mode == "momentum":
        beats = (mj > mi[:, None]) | ((mj == mi[:, None]) & (jj < ii[:, None]))
        cand = overlap & beats
        key = jnp.where(cand, mj, -jnp.inf)
        bm = jnp.max(key, axis=1)
        is_best = cand & (key == bm[:, None])
        order = jnp.where(is_best, -jj, jnp.iinfo(jnp.int32).min)
        best_local = jnp.argmax(order, axis=1)
        any_cand = jnp.any(cand, axis=1)
        parent = jnp.where(any_cand,
                           jnp.take_along_axis(jj, best_local[:, None],
                                               axis=1).squeeze(1),
                           ii).astype(jnp.int32)
        out = out._replace(best_mass=jnp.where(any_cand, bm, -jnp.inf),
                           parent=parent)
    elif mode == "elastic":
        vdotp = (vj[..., 0] - vi[:, None, 0]) * dp[0]
        for d in range(1, dim):
            vdotp = vdotp + (vj[..., d] - vi[:, None, d]) * dp[d]
        approaching = overlap & (vdotp < 0) & (d2 > 0)
        msum = mi[:, None] + mj
        coef = jnp.where(approaching,
                         2.0 * mj / jnp.where(msum > 0, msum, 1.0)
                         * vdotp / jnp.where(d2 > 0, d2, 1.0), 0.0)
        out = out._replace(dv=jnp.stack([jnp.sum(coef * c, axis=1)
                                         for c in dp], axis=1))
    elif mode != "none":
        raise ValueError(f"unknown collision mode {mode!r}")
    return out


def _near_field(i_pos, i_vel, i_mass, i_radius, i_ids,
                pos, vel, mass, radius, ext, levels, ring, eps2,
                growth_rate, mode, k, chunk):
    """Exact accumulators of i bodies against their (2*ring+1)^dim finest-cell
    neighbors among the (global) partner set.

    The i side is decoupled from the partner structure: partners come from
    the full (pos, vel, mass, radius) arrays sorted by cell; i bodies are any
    subset (the same arrays on one device, the local shard when sharded) with
    their *global* ids in ``i_ids``. Accumulators return in i order — no
    unsorting needed.

    Window shape: the (2*ring+1) x-adjacent cells of one neighbor-grid ROW
    are adjacent cell ids, hence CONTIGUOUS in the sorted order — so each row
    is ONE gather window of up to ``k`` partners (``bhNeighborK`` is a
    per-row cap). (2*ring+1)^(dim-1) row windows replace (2*ring+1)^dim
    per-cell windows (3 rows in 2-D at ring=1, 9 in 3-D), and a crowded cell
    can borrow its row neighbors' unused slots.
    """
    import itertools

    dim = pos.shape[-1]
    n_i = i_pos.shape[0]
    n = pos.shape[0]
    g = 1 << levels
    ncells = g ** dim
    cs = _cells(pos, ext, g)
    alive = mass > 0
    cell = jnp.where(alive, _flatten_cells(cs, g), ncells)  # dead -> bucket
    order = jnp.argsort(cell).astype(jnp.int32)        # sorted -> global index
    s_cell = cell[order]
    cells_iota = jnp.arange(ncells, dtype=s_cell.dtype)
    starts = jnp.searchsorted(s_cell, cells_iota).astype(jnp.int32)
    ends = jnp.searchsorted(s_cell, cells_iota, side="right").astype(jnp.int32)

    # single packed feature row per partner: one wide gather per neighbor
    # window instead of six narrow ones (TPU gathers are the bottleneck —
    # measured ~7 ns per gathered row on v5e, so row BYTES are the cost).
    # The global id rides two f32 lanes (12-bit lo, upper bits hi, each
    # exactly representable), so ids are exact at any i32-indexable N.
    # Only elastic mode reads partner velocities; the other modes skip them —
    # 25% less near-field gather traffic in 2-D (dim+4 vs 2*dim+4 lanes).
    id_hi, id_lo = _pack_id(order)
    need_vel = mode == "elastic"
    lanes = [pos[order, d] for d in range(dim)]
    if need_vel:
        lanes += [vel[order, d] for d in range(dim)]
    lanes += [mass[order], radius[order], id_hi, id_lo]
    # one zero row of tail padding: masked window rows gather pad row n —
    # inert (mass 0) for every channel, so no post-gather select is needed
    sf = jnp.pad(jnp.stack(lanes, axis=1), ((0, 1), (0, 0)))

    nchunks = -(-n_i // chunk)
    npad = nchunks * chunk

    def padded(x):
        return jnp.pad(x, [(0, npad - n_i)] + [(0, 0)] * (x.ndim - 1))

    ip, iv = padded(i_pos), padded(i_vel)
    im, ir = padded(i_mass), padded(i_radius)
    iid = jnp.pad(i_ids.astype(jnp.int32), (0, npad - n_i),
                  constant_values=-1)
    ics = _cells(ip, ext, g)
    # dead i rows produce junk that the alive_i mask inside the pair math
    # zeroes; their neighbor window is whatever their stale position hashes to
    ks = lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def one_chunk(c):
        s = c * chunk
        pi = lax.dynamic_slice_in_dim(ip, s, chunk)
        vi = lax.dynamic_slice_in_dim(iv, s, chunk)
        mi = lax.dynamic_slice_in_dim(im, s, chunk)
        ri = lax.dynamic_slice_in_dim(ir, s, chunk)
        ii = lax.dynamic_slice_in_dim(iid, s, chunk)
        ccs = [lax.dynamic_slice_in_dim(a, s, chunk) for a in ics]
        acc = empty_accumulators(ii, dim=dim)
        # row cells [ccx-ring, ccx+ring] clamped into the grid are contiguous
        # in sorted order: one (start, count) range per non-x neighbor offset
        left = jnp.maximum(ccs[0] - ring, 0)
        right = jnp.minimum(ccs[0] + ring, g - 1)
        for off in itertools.product(range(-ring, ring + 1), repeat=dim - 1):
            nds = [ccs[1 + a] + off[a] for a in range(dim - 1)]
            ok_row = jnp.bool_(True)
            for nd in nds:
                ok_row = ok_row & (nd >= 0) & (nd < g)
            ndc = tuple(jnp.clip(nd, 0, g - 1) for nd in nds)
            st = starts[_flatten_cells((left,) + ndc, g)]
            cnt = jnp.minimum(ends[_flatten_cells((right,) + ndc, g)] - st, k)
            slots = st[:, None] + ks               # [C, k]
            ok = ok_row[:, None] & (ks < cnt[:, None])
            # per-row gather (sf[idx]) is the FAST form here: a vmapped
            # [k, lanes] dynamic_slice per window (gather with full
            # slice_sizes) was measured 7x SLOWER on v5e — XLA:TPU handles
            # many small row gathers better than strided block gathers
            idx = jnp.where(ok, slots, n)          # n = the zero pad row
            fj = sf[idx]                           # [C, k, lanes]
            pj = fj[..., 0:dim]
            if need_vel:
                vj = fj[..., dim:2 * dim]
                rest = 2 * dim
            else:
                vj = jnp.zeros_like(pj)
                rest = dim
            mj, rj = fj[..., rest], fj[..., rest + 1]
            jj = jnp.where(ok, _unpack_id(fj[..., rest + 2],
                                          fj[..., rest + 3]), -1)
            acc = combine_accumulators(acc, _gathered_pair_accum(
                pi, vi, mi, ri, ii, pj, vj, mj, rj, jj,
                eps2=eps2, growth_rate=growth_rate, mode=mode))
        return acc

    if nchunks == 1:
        acc = jax.tree.map(lambda x: x[None], one_chunk(jnp.int32(0)))
    else:
        acc = lax.map(one_chunk, jnp.arange(nchunks))
    return jax.tree.map(lambda x: x.reshape((npad,) + x.shape[2:])[:n_i], acc)


def bh_accumulators(pos, vel, mass, radius, *, eps: float = 0.0,
                    growth_rate: float = 0.1, mode: str = "reference",
                    levels: int = 0, ring: int = 1, neighbor_k: int = 64,
                    order: int = 2, chunk: int = 8192) -> PairAccumulators:
    """Drop-in accum_fn (same interface as pair_accumulators): approximate
    far-field force + exact near-field force/collision accumulators."""
    n = pos.shape[0]
    levels = levels or auto_levels(n, dim=pos.shape[-1])
    eps2 = jnp.float32(eps) ** 2
    alive = mass > 0
    ext = _extent(pos, alive)

    ids = jnp.arange(n, dtype=jnp.int32)
    near = _near_field(pos, vel, mass, radius, ids,
                       pos, vel, mass, radius, ext, levels, ring, eps2,
                       jnp.float32(growth_rate), mode, neighbor_k,
                       min(chunk, n))
    far = _far_force(pos, pos, mass, ext, levels, ring, eps2, min(chunk, n),
                     order)
    far_acc = empty_accumulators(ids, dim=pos.shape[-1])._replace(
        force=jnp.where(alive[:, None], far, 0.0))
    return combine_accumulators(near, far_acc)


def bh_local_accumulators(i_pos, i_vel, i_mass, i_radius, i_ids,
                          pos, vel, mass, radius, *, eps: float,
                          growth_rate: float, mode: str, levels: int = 0,
                          ring: int = 1, neighbor_k: int = 64,
                          order: int = 2,
                          chunk: int = 8192) -> PairAccumulators:
    """Accumulators for a subset of bodies (the i side, with global ids)
    against the full global body set — the sharded-bh building block: each
    shard passes its local slice as i and the all-gathered arrays as the
    partner set. Identical math to bh_accumulators."""
    n = pos.shape[0]
    levels = levels or auto_levels(n, dim=pos.shape[-1])
    eps2 = jnp.float32(eps) ** 2
    ext = _extent(pos, mass > 0)
    c = min(chunk, i_pos.shape[0])
    near = _near_field(i_pos, i_vel, i_mass, i_radius, i_ids,
                       pos, vel, mass, radius, ext, levels, ring, eps2,
                       jnp.float32(growth_rate), mode, neighbor_k, c)
    far = _far_force(i_pos, pos, mass, ext, levels, ring, eps2, c, order)
    far_acc = empty_accumulators(i_ids.astype(jnp.int32),
                                 dim=pos.shape[-1])._replace(
        force=jnp.where((i_mass > 0)[:, None], far, 0.0))
    return combine_accumulators(near, far_acc)


def overflow_count(pos, mass, *, levels: int = 0, neighbor_k: int = 64,
                   ring: int = 1):
    """Diagnostic: how many live bodies exceed their window-row's K
    near-field slots (those are invisible to near-field physics for the
    bodies whose window that row is). The near field gathers one window per
    row of (2*ring+1) consecutive cells, capped at ``neighbor_k`` partners;
    this counts the total excess over all such rows. 0 means the near field
    is exact for the current distribution."""
    n = pos.shape[0]
    dim = pos.shape[-1]
    levels = levels or auto_levels(n, dim=dim)
    g = 1 << levels
    alive = mass > 0
    ext = _extent(pos, alive)
    cell = jnp.where(alive, _flatten_cells(_cells(pos, ext, g), g), g ** dim)
    occ = jnp.zeros((g ** dim + 1,), jnp.int32).at[cell].add(1)
    occg = occ[:-1].reshape((g,) * dim)   # row-major, x is the LAST axis
    # window-row occupancy at each center x: sum of the (2*ring+1)
    # consecutive cells, zero outside the grid (matches the clamped windows)
    occp = jnp.pad(occg, [(0, 0)] * (dim - 1) + [(ring, ring)])
    row = sum(occp[..., d:d + g] for d in range(2 * ring + 1))
    return jnp.sum(jnp.maximum(row - neighbor_k, 0))
