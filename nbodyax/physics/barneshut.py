"""Approximate hierarchical gravity: Barnes-Hut/FMM-style far field +
exact grid-neighbor near field (``forceModel=bh``).

Beyond-reference capability: the reference (and our default ``exact`` model)
is O(N^2) per step; this model is O(N * levels).

- **Far field**: bodies are binned into a complete quadtree of dense per-level
  (mass, m*x, m*y) grids over the *adaptive* bounding box of the live bodies
  (finest side 2^levels; coarsening is 2x2 sum-pooling — pure XLA
  scatter/reshape, MXU/VPU-friendly dense math, no pointer chasing). For each
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
                max_levels: int = 10) -> int:
    """Finest level so average occupancy ~= target (grid side 2^levels).

    Occupancy 16 tuned on v5e at N=1M: the near field is CAP-bound (it
    gathers bhNeighborK rows per window regardless of occupancy, so coarser
    cells are nearly free until row occupancy approaches K), while each
    extra level costs a full interaction-list gather sweep — and the finest
    level's is the most expensive (largest cell table, worst locality).
    levels=8 vs 9 at N=1M: far field 0.93 s -> 0.52 s, same accuracy class
    (the near window covers MORE area exactly)."""
    cells = max(4, n // max(1, target_occupancy))
    return max(2, min(max_levels, math.ceil(math.log(cells, 4))))


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
    lv = auto_levels(n, max_levels=max_levels)
    while lv < max_levels:
        ov = int(overflow_count(pos, mass, levels=lv, neighbor_k=neighbor_k,
                                ring=ring))
        if ov <= n * tolerance:
            break
        lv += 1
    return lv


def _extent(pos, alive):
    """Adaptive bounding box of live bodies (traced scalars; shapes static)."""
    big = jnp.float32(3e38)
    x = jnp.where(alive, pos[:, 0], big)
    y = jnp.where(alive, pos[:, 1], big)
    xmin, ymin = jnp.min(x), jnp.min(y)
    x = jnp.where(alive, pos[:, 0], -big)
    y = jnp.where(alive, pos[:, 1], -big)
    xmax, ymax = jnp.max(x), jnp.max(y)
    spanx = jnp.maximum(xmax - xmin, 1e-3) * 1.0001
    spany = jnp.maximum(ymax - ymin, 1e-3) * 1.0001
    return xmin, ymin, spanx, spany


def _cells(pos, ext, g):
    xmin, ymin, spanx, spany = ext
    ux = jnp.clip((pos[:, 0] - xmin) / spanx, 0.0, 1.0 - 1e-7)
    uy = jnp.clip((pos[:, 1] - ymin) / spany, 0.0, 1.0 - 1e-7)
    return (ux * g).astype(jnp.int32), (uy * g).astype(jnp.int32)


def _cell_centers_offsets(ext, g):
    xmin, ymin, spanx, spany = ext
    return xmin, ymin, spanx / g, spany / g


def _level_grids(pos, mass, ext, levels, order=1):
    """Per-level cell aggregates.

    order=1: (M, Sx, Sy) with S about the origin (COM = S/M — adequate for
    monopole). order=2 instead keeps moments about EACH CELL'S CENTER —
    origin-relative second moments would catastrophically cancel in f32
    (Q ~ M*cell^2 against raw terms ~ M*x^2) — and pools them with
    parallel-axis shifts: about a new reference t_p = t_c + delta,
        Sx' = Sx - M dx,  Sxx' = Sxx - 2 dx Sx + M dx^2,
        Sxy' = Sxy - dx Sy - dy Sx + M dx dy   (x-t_p = (x-t_c) - delta).
    """
    g = 1 << levels
    cx, cy = _cells(pos, ext, g)
    flat = cy * g + cx
    zero = jnp.zeros((g * g,), jnp.float32)
    if order < 2:
        chans = [mass, mass * pos[:, 0], mass * pos[:, 1]]
        grids = {levels: tuple(zero.at[flat].add(c) for c in chans)}
        for l in range(levels - 1, 1, -1):
            s = 1 << (l + 1)
            pool = lambda a: a.reshape(s // 2, 2, s // 2, 2).sum(
                (1, 3)).reshape(-1)
            grids[l] = tuple(pool(a.reshape(s, s)) for a in grids[l + 1])
        return grids

    # order 2: finest-level moments about each body's own cell center
    xmin, ymin, sx, sy = _cell_centers_offsets(ext, g)
    tx = xmin + (cx.astype(jnp.float32) + 0.5) * sx
    ty = ymin + (cy.astype(jnp.float32) + 0.5) * sy
    rx = pos[:, 0] - tx
    ry = pos[:, 1] - ty
    chans = [mass, mass * rx, mass * ry,
             mass * rx * rx, mass * rx * ry, mass * ry * ry]
    grids = {levels: tuple(zero.at[flat].add(c) for c in chans)}
    for l in range(levels - 1, 1, -1):
        s = 1 << (l + 1)                      # child grid side
        M, Sx, Sy, Sxx, Sxy, Syy = (a.reshape(s, s) for a in grids[l + 1])
        # child-center offset from parent center: +/- child_cell/2 per axis
        _, _, csx, csy = _cell_centers_offsets(ext, s)
        iy = lax.broadcasted_iota(jnp.int32, (s, s), 0)
        ix = lax.broadcasted_iota(jnp.int32, (s, s), 1)
        # delta = t_parent - t_child; child at even index sits at -child/2
        dx = jnp.where(ix % 2 == 0, 0.5 * csx, -0.5 * csx)
        dy = jnp.where(iy % 2 == 0, 0.5 * csy, -0.5 * csy)
        Sxx2 = Sxx - 2.0 * dx * Sx + M * dx * dx
        Sxy2 = Sxy - dx * Sy - dy * Sx + M * dx * dy
        Syy2 = Syy - 2.0 * dy * Sy + M * dy * dy
        Sx2 = Sx - M * dx
        Sy2 = Sy - M * dy
        pool = lambda a: a.reshape(s // 2, 2, s // 2, 2).sum((1, 3)).reshape(-1)
        grids[l] = (pool(M), pool(Sx2), pool(Sy2),
                    pool(Sxx2), pool(Sxy2), pool(Syy2))
    return grids


_DENSE_FAR_CELLS = 256  # levels with <= this many cells skip gathers entirely


def _far_force(i_pos, pos, mass, ext, levels, ring, eps2, chunk, order=1):
    """Far-field force for the i bodies (any subset), with grids aggregated
    from the full (pos, mass) partner set.

    order=1: monopole (cell mass at its COM). order=2 adds the quadrupole
    term — the second-order Taylor expansion of u/|u|^3 about the COM (the
    first-order term vanishes there): with d = COM - p, r = |d|, and central
    second moments Q,
        F_quad = 1/2 [ -3 r^-5 (2 Q d + d tr Q) + 15 r^-7 (d^T Q d) d ],
    cutting the opening-ratio error from O((s/d)^2) to O((s/d)^3) — roughly
    ring=2 accuracy at ring=1 cost.

    Coarse levels (grid <= _DENSE_FAR_CELLS cells) are evaluated DENSELY over
    every cell with the interaction-list membership computed in-register —
    identical cell set to the gathered window, but zero gathers. Gathered
    rows cost ~7 ns each on v5e (the measured bottleneck of this model);
    a [chunk, 256]-cell elementwise pass is VPU noise by comparison.
    """
    grids = _level_grids(pos, mass, ext, levels, order)
    n = i_pos.shape[0]
    win = 4 * ring + 2
    offy = lax.broadcasted_iota(jnp.int32, (win, win), 0).reshape(-1)
    offx = lax.broadcasted_iota(jnp.int32, (win, win), 1).reshape(-1)

    nchunks = -(-n // chunk)
    npad = nchunks * chunk
    pos_p = jnp.pad(i_pos, ((0, npad - n), (0, 0)))

    packed = {l: jnp.stack(grids[l], axis=1) for l in grids}  # [cells, 3|6]

    def one_chunk(c):
        pc = lax.dynamic_slice_in_dim(pos_p, c * chunk, chunk)
        force = jnp.zeros((chunk, 2), jnp.float32)
        for l in range(2, levels + 1):
            g = 1 << l
            cx, cy = _cells(pc, ext, g)
            if g * g <= _DENSE_FAR_CELLS:
                # dense: all cells as a [1, g^2] row, membership in-register
                cells = lax.broadcasted_iota(jnp.int32, (1, g * g), 1)
                wx = cells % g                          # [1, g^2]
                wy = cells // g
                near = (jnp.abs(wx - cx[:, None]) <= ring) & \
                       (jnp.abs(wy - cy[:, None]) <= ring)
                parent_ok = \
                    (jnp.abs((wx >> 1) - (cx[:, None] >> 1)) <= ring) & \
                    (jnp.abs((wy >> 1) - (cy[:, None] >> 1)) <= ring)
                use = parent_ok & ~near                 # [C, g^2]
                cellrow = packed[l][None, :, :]         # [1, g^2, 3|6]
            else:
                ox = ((cx >> 1) - ring) << 1
                oy = ((cy >> 1) - ring) << 1
                wx = ox[:, None] + offx[None, :]        # [C, win^2]
                wy = oy[:, None] + offy[None, :]
                near = (jnp.abs(wx - cx[:, None]) <= ring) & \
                       (jnp.abs(wy - cy[:, None]) <= ring)
                inb = (wx >= 0) & (wx < g) & (wy >= 0) & (wy < g)
                use = inb & ~near
                flat = jnp.clip(wy * g + wx, 0, g * g - 1)
                cellrow = packed[l][flat]               # [C, win^2, 3|6]
            M = jnp.where(use, cellrow[..., 0], 0.0)
            has = M > 0
            Minv = 1.0 / jnp.where(has, M, 1.0)
            if order >= 2:
                # moments are about the cell center (see _level_grids)
                xmin, ymin, csx, csy = _cell_centers_offsets(ext, g)
                tx = xmin + (wx.astype(jnp.float32) + 0.5) * csx
                ty = ymin + (wy.astype(jnp.float32) + 0.5) * csy
                comx = tx + cellrow[..., 1] * Minv
                comy = ty + cellrow[..., 2] * Minv
            else:
                comx = cellrow[..., 1] * Minv
                comy = cellrow[..., 2] * Minv
            dx = jnp.where(has, comx - pc[:, 0:1], 0.0)
            dy = jnp.where(has, comy - pc[:, 1:2], 0.0)
            d2 = dx * dx + dy * dy + eps2
            inv = lax.rsqrt(jnp.where(has, d2, 1.0))
            inv2 = inv * inv
            inv3 = inv2 * inv
            wgt = jnp.where(has, M * inv3, 0.0)
            fx = wgt * dx
            fy = wgt * dy
            if order >= 2:
                # central (about-COM) moments from about-center moments:
                # Q = S2 - (S1/M) S1^T. Mask the channels FIRST (excluded
                # cells keep Minv=1, and S1*S1 there reaches ~1e45 -> inf,
                # which no later 0-multiply can cancel: inf*0 = NaN). Divide
                # before squaring for the same overflow reason.
                s1x = jnp.where(use, cellrow[..., 1], 0.0)
                s1y = jnp.where(use, cellrow[..., 2], 0.0)
                rbx = s1x * Minv
                rby = s1y * Minv
                qxx = jnp.where(use, cellrow[..., 3], 0.0) - rbx * s1x
                qxy = jnp.where(use, cellrow[..., 4], 0.0) - rbx * s1y
                qyy = jnp.where(use, cellrow[..., 5], 0.0) - rby * s1y
                inv5 = inv3 * inv2
                # scale by inv5 BEFORE contracting with d: raw d^T Q d can
                # reach ~5e39 (Q ~ M cell^2 ~ 5e29, |d|^2 ~ 1e10) and
                # overflows f32
                u = (qxx * dx + qxy * dy) * inv5       # (Q d) r^-5
                v = (qxy * dx + qyy * dy) * inv5
                trq5 = (qxx + qyy) * inv5
                dqd7 = (dx * u + dy * v) * inv2        # (d^T Q d) r^-7
                coef = jnp.where(has, 1.0, 0.0)
                fx = fx + coef * (-1.5 * (2.0 * u + dx * trq5)
                                  + 7.5 * dqd7 * dx)
                fy = fy + coef * (-1.5 * (2.0 * v + dy * trq5)
                                  + 7.5 * dqd7 * dy)
            force = force + jnp.stack([jnp.sum(fx, axis=1),
                                       jnp.sum(fy, axis=1)], axis=1)
        return force

    if nchunks == 1:
        out = one_chunk(jnp.int32(0))[None]
    else:
        out = lax.map(one_chunk, jnp.arange(nchunks))
    return out.reshape(npad, 2)[:n]


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
    gathered neighbors. Invalid/padded partners carry mass 0."""
    alive = (mi > 0)[:, None] & (mj > 0)
    notself = ii[:, None] != jj
    valid = alive & notself

    dp_x = pj[..., 0] - pi[:, None, 0]
    dp_y = pj[..., 1] - pi[:, None, 1]
    d2 = dp_x * dp_x + dp_y * dp_y
    rsum = ri[:, None] + rj
    overlap = (d2 <= rsum * rsum) & valid

    fmask = valid if mode == "elastic" else (valid & ~overlap)
    d2e = d2 + eps2
    safe = fmask & (d2e > 0)
    inv = lax.rsqrt(jnp.where(safe, d2e, 1.0))
    w = jnp.where(safe, mj * (inv * inv * inv), 0.0)
    force = jnp.stack([jnp.sum(w * dp_x, axis=1),
                       jnp.sum(w * dp_y, axis=1)], axis=1)

    out = empty_accumulators(ii)._replace(force=force)
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
        rel_x = vj[..., 0] - vi[:, None, 0]
        rel_y = vj[..., 1] - vi[:, None, 1]
        vdotp = rel_x * dp_x + rel_y * dp_y
        approaching = overlap & (vdotp < 0) & (d2 > 0)
        msum = mi[:, None] + mj
        coef = jnp.where(approaching,
                         2.0 * mj / jnp.where(msum > 0, msum, 1.0)
                         * vdotp / jnp.where(d2 > 0, d2, 1.0), 0.0)
        out = out._replace(dv=jnp.stack([jnp.sum(coef * dp_x, axis=1),
                                         jnp.sum(coef * dp_y, axis=1)],
                                        axis=1))
    elif mode != "none":
        raise ValueError(f"unknown collision mode {mode!r}")
    return out


def _near_field(i_pos, i_vel, i_mass, i_radius, i_ids,
                pos, vel, mass, radius, ext, levels, ring, eps2,
                growth_rate, mode, k, chunk):
    """Exact accumulators of i bodies against their (2*ring+1)^2 finest-cell
    neighbors among the (global) partner set.

    The i side is decoupled from the partner structure: partners come from
    the full (pos, vel, mass, radius) arrays sorted by cell; i bodies are any
    subset (the same arrays on one device, the local shard when sharded) with
    their *global* ids in ``i_ids``. Accumulators return in i order — no
    unsorting needed.

    Window shape: the (2*ring+1) cells of one neighbor-grid ROW are adjacent
    cell ids, hence CONTIGUOUS in the sorted order — so each row is ONE
    gather window of up to ``k`` partners (``bhNeighborK`` is a per-row cap).
    (2*ring+1) row windows replace (2*ring+1)^2 per-cell windows: 3x fewer
    gathered rows at ring=1, and a crowded cell can borrow its row
    neighbors' unused slots.
    """
    n_i = i_pos.shape[0]
    n = pos.shape[0]
    g = 1 << levels
    cx, cy = _cells(pos, ext, g)
    alive = mass > 0
    cell = jnp.where(alive, cy * g + cx, g * g)        # dead -> bucket g^2
    order = jnp.argsort(cell).astype(jnp.int32)        # sorted -> global index
    s_cell = cell[order]
    cells_iota = jnp.arange(g * g, dtype=s_cell.dtype)
    starts = jnp.searchsorted(s_cell, cells_iota).astype(jnp.int32)
    ends = jnp.searchsorted(s_cell, cells_iota, side="right").astype(jnp.int32)

    # single packed feature row per partner: one wide gather per neighbor
    # window instead of six narrow ones (TPU gathers are the bottleneck —
    # measured ~7 ns per gathered row on v5e, so row BYTES are the cost).
    # The global id rides two f32 lanes (12-bit lo, upper bits hi, each
    # exactly representable), so ids are exact at any i32-indexable N.
    # Only elastic mode reads partner velocities; the other modes pack 6
    # lanes instead of 8 — 25% less near-field gather traffic.
    id_hi, id_lo = _pack_id(order)
    need_vel = mode == "elastic"
    lanes = ([pos[order, 0], pos[order, 1], vel[order, 0], vel[order, 1],
              mass[order], radius[order], id_hi, id_lo] if need_vel else
             [pos[order, 0], pos[order, 1],
              mass[order], radius[order], id_hi, id_lo])
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
    icx, icy = _cells(ip, ext, g)
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
        ccx = lax.dynamic_slice_in_dim(icx, s, chunk)
        ccy = lax.dynamic_slice_in_dim(icy, s, chunk)
        acc = empty_accumulators(ii)
        for di in range(-ring, ring + 1):   # one window per neighbor ROW
            ny = ccy + di
            ok_row = (ny >= 0) & (ny < g)
            # row cells [ccx-ring, ccx+ring] clamped into the grid are
            # contiguous in sorted order: one (start, count) range
            left = jnp.maximum(ccx - ring, 0)
            right = jnp.minimum(ccx + ring, g - 1)
            nyc = jnp.clip(ny, 0, g - 1)
            st = starts[nyc * g + left]
            cnt = jnp.minimum(ends[nyc * g + right] - st, k)
            slots = st[:, None] + ks               # [C, k]
            ok = ok_row[:, None] & (ks < cnt[:, None])
            # per-row gather (sf[idx]) is the FAST form here: a vmapped
            # [k, lanes] dynamic_slice per window (gather with full
            # slice_sizes) was measured 7x SLOWER on v5e — XLA:TPU handles
            # many small row gathers better than strided block gathers
            idx = jnp.where(ok, slots, n)          # n = the zero pad row
            fj = sf[idx]                           # [C, k, 6|8]
            pj = fj[..., 0:2]
            if need_vel:
                vj = fj[..., 2:4]
                mj, rj = fj[..., 4], fj[..., 5]
                hi_l, lo_l = fj[..., 6], fj[..., 7]
            else:
                vj = jnp.zeros_like(pj)
                mj, rj = fj[..., 2], fj[..., 3]
                hi_l, lo_l = fj[..., 4], fj[..., 5]
            jj = jnp.where(ok, _unpack_id(hi_l, lo_l), -1)
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
    levels = levels or auto_levels(n)
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
    far_acc = empty_accumulators(ids)._replace(
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
    levels = levels or auto_levels(n)
    eps2 = jnp.float32(eps) ** 2
    ext = _extent(pos, mass > 0)
    c = min(chunk, i_pos.shape[0])
    near = _near_field(i_pos, i_vel, i_mass, i_radius, i_ids,
                       pos, vel, mass, radius, ext, levels, ring, eps2,
                       jnp.float32(growth_rate), mode, neighbor_k, c)
    far = _far_force(i_pos, pos, mass, ext, levels, ring, eps2, c, order)
    far_acc = empty_accumulators(i_ids.astype(jnp.int32))._replace(
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
    levels = levels or auto_levels(n)
    g = 1 << levels
    alive = mass > 0
    ext = _extent(pos, alive)
    cx, cy = _cells(pos, ext, g)
    cell = jnp.where(alive, cy * g + cx, g * g)
    occ = jnp.zeros((g * g + 1,), jnp.int32).at[cell].add(1)
    occ2d = occ[:-1].reshape(g, g)
    # window-row occupancy at each center x: sum of the (2*ring+1)
    # consecutive cells, zero outside the grid (matches the clamped windows)
    occp = jnp.pad(occ2d, ((0, 0), (ring, ring)))
    row = sum(occp[:, d:d + g] for d in range(2 * ring + 1))
    return jnp.sum(jnp.maximum(row - neighbor_k, 0))
