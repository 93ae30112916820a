"""Pallas TPU kernel: fused bh near-field pass over the slots partner grid.

The measured bh bottleneck is the near field (NEXT.md: 0.273 s of the 0.354 s
N=1M 2-D step; 0.417 of 0.775 in 3-D). The jnp slots engine
(barneshut._near_field_cells, near="slots") already has the right *layout* —
every neighbor window is a contiguous slice of a cell-sorted slot grid — but
XLA materializes the [B, win*S] pair temporaries between fusion islands in
HBM, so the pass runs at HBM bandwidth instead of VPU speed. This kernel
streams the same slot grid through VMEM and fuses window construction + pair
math + channel reduction into one pass, the same dataflow the exact all-pairs
kernel (physics/kernels.py) uses for its j-tiles — applied to the bh near
window (the TPU analog of the reference's shared-memory j-tile loop,
/root/reference/src/nbody.cu:156-190, restricted to the 3^dim neighbor
cells).

Dataflow per grid program (one block of C consecutive finest cells):

- the (2*ring+1)^(dim-1) window ROWS of the block are each one CONTIGUOUS
  row range of the (padded) slot grid: DMA them HBM -> VMEM double-buffered,
  [C + 2*ring, L, S] per row (features on sublanes, slots on lanes);
- per row, the per-cell x-window is the concat of the (2*ring+1) shifted
  leading-dim slices -> [C, L, win*S]: zero-copy slices + one lane concat,
  no gathers anywhere;
- pair math i x j on [C, ci_cap, win*S] broadcast grids (identical per-pair
  semantics to barneshut._gathered_pair_accum, the tested oracle), reduced
  over the window lanes and accumulated across rows in registers;
- one [C, NUM_CH * ci_cap] channel block written per program, channels
  LANE-MERGED channel-major (all ci slots of channel 0, then channel 1,
  ...): a trailing channel axis of 8 would be lane-padded to 128 by XLA —
  a measured 16x HBM expansion that OOMs N=16M grids (16 GB for a 1 GB
  output) and pays 16x the write bandwidth; the merged layout is exactly
  2 lane tiles at ci=32. The caller un-merges with one [ncells, NUM_CH,
  ci] reshape+transpose before the slot unsort;
- blocks with no alive i slot (mass 0 is the in-band dead marker, and pad
  slots carry zero rows) skip the window DMAs and pair math entirely under
  ``pl.when`` and write the exact dead-row outputs instead (zeros; momentum
  writes the no-candidate sentinel with the i slots' own ids) — clustered
  scenes leave most of the finest grid empty, so most programs reduce to
  one center-row DMA + one predicated store.

Geometry masks (out-of-grid window cells from the flat layout's x wrap) are
computed from the program's cell ids with static g — the slot grid needs no
precomputed masks. Out-of-range flat slices land in the grid's padding
cells (barneshut pads by ring*sum(g^d) cells of zero rows), whose mass-0
rows are inert through every channel.

Id channels ride the two exactly-f32-representable lanes the slot grid
already carries (hi = id >> 12 < 2^19, lo = id & 0xFFF < 2^12), so self-pair
and momentum-mode id ordering are exact at any i32-indexable N — the same
scheme the jnp engines use, with the comparisons done lane-wise in f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["slots_near_raw", "NUM_CH"]

NUM_CH = 8
_NEG_INF = float(np.finfo(np.float32).min)  # "no candidate" sentinel


def block_cells(ncells: int, ci: int, W: int) -> int:
    """Cells per grid program: aim each [C, ci, W] f32 pair temporary at
    ~4 MB (Mosaic keeps ~10 of them + double-buffered in/out windows live;
    8 MB temps measured 164M > the 128M v5e VMEM at W=120); power of two
    so it divides the (power-of-two) cell grid. The caller must fall back
    to the jnp engine when this degenerates below 8 (huge-occupancy grids:
    slot_cap 512 at occupancy 256 gives C=1, whose [C+2r, L, S] DMA slice
    Mosaic rejects — and a 1-cell program would be slow anyway)."""
    target = max(1, (4 << 20) // (4 * ci * max(W, 128)))
    return min(1 << max(0, min(ncells.bit_length() - 1,
                               target.bit_length() - 1)), ncells)


def _koffs(g: int, ring: int, dim: int):
    """Static flat-cell offsets of the (2*ring+1)^(dim-1) window rows,
    CENTER ROW FIRST: the kernel reads its i-slots out of the center row's
    DMA block (they are its first ci lanes), so no separate i-feature
    input or host-side transpose is needed."""
    import itertools
    offs = list(itertools.product(range(-ring, ring + 1), repeat=dim - 1))
    offs.sort(key=lambda o: o != (0,) * (dim - 1))
    return offs, [sum(o[a] * g ** (1 + a) for a in range(dim - 1))
                  for o in offs]


def _near_kernel(eps2_ref, growth_ref, cbase_ref, jrows_hbm, out_ref, *,
                 mode: str, g: int, ring: int, dim: int, C: int,
                 S: int, ci: int, L: int, eps_pos: bool):
    """One block of C cells: i slots (the center row's first ci lanes per
    cell) vs all window rows.

    jrows is [cells, L, Spad] with Spad = 128-aligned slot lanes (the
    manual-DMA alignment unit; pad slots carry zero rows -> mass 0 ->
    inert). The window concat slices each piece back to the real S lanes
    first, so the pair grids carry only the win*S real window lanes (~6%
    pad at S=40) instead of the 3.2x the padded lanes would cost — the
    pieces are 3-D (sublane = L), so their leading-dim offsets don't
    trip Mosaic's concat lowering."""
    eps2 = eps2_ref[0, 0]
    growth = growth_ref[0, 0]
    offs, koffs = _koffs(g, ring, dim)
    win = 2 * ring + 1
    rows = len(offs)
    need_vel = mode == "elastic"
    rest = 2 * dim if need_vel else dim
    # cbase: first cell of this shard's contiguous slice (0 unsharded) —
    # the slot grid and its padding are always GLOBAL, windows cross
    # shard boundaries (barneshut._near_field_cells cell_range contract)
    base = cbase_ref[0, 0] + pl.program_id(0) * C

    # cell coordinates of the block (x fastest in the flat id)
    cid = base + lax.broadcasted_iota(jnp.int32, (C, 1), 0)      # [C, 1]
    xs = cid % g
    higher = [(cid // (g ** (1 + a))) % g for a in range(dim - 1)]

    padc = ring * sum(g ** d for d in range(dim))   # front-padding cells

    spad = jrows_hbm.shape[-1]                      # 128-aligned slot lanes

    def body(blks, sems):
        # slot 0 PINS the center row for the whole program (the i-side
        # feature reads hit it in every row iteration); rows 1+ double-
        # buffer through slots 1 and 2
        def slot_of(r):
            return 0 if r == 0 else 1 + ((r - 1) % 2)

        def dma(r):
            # row r's window block: cells [base + koff - ring, ... + C + 2r)
            # shifted by the grid's padc zero-cell front padding
            start = base + (koffs[r] - ring + padc)
            return pltpu.make_async_copy(
                jrows_hbm.at[pl.ds(start, C + 2 * ring)],
                blks.at[slot_of(r)], sems.at[slot_of(r)])

        dma(0).start()
        dma(0).wait()

        # i-side feature planes [C, ci, 1] from the CENTER row block
        # (offs[0] is the all-zero offset): each cell's i slots are its
        # own first ci slot lanes
        blk0 = blks[0]

        def ival(f):
            return blk0[ring:ring + C, f, 0:ci][:, :, None]

        mi = ival(rest)
        # block occupancy: mass 0 marks dead bodies AND pad slots, so a
        # zero max means no pair in this block can contribute — skip the
        # window DMAs and the pair math and write the exact dead-row
        # outputs instead (clustered scenes leave most cell blocks empty)
        any_alive = jnp.max(mi) > 0.0

        @pl.when(jnp.logical_not(any_alive))
        def _empty_block():
            if mode == "momentum":
                # dead/pad i rows still carry their own id lanes through
                # the parent channels, with the no-candidate sentinel
                # already decoded to the oracle's -inf (see cols below)
                zero = jnp.zeros((C, ci), jnp.float32)
                cols0 = [zero] * dim
                cols0 += [jnp.full((C, ci), -jnp.inf, jnp.float32),
                          ival(rest + 2)[..., 0], ival(rest + 3)[..., 0]]
                cols0 += [zero] * (NUM_CH - len(cols0))
                out_ref[:] = jnp.concatenate(cols0, axis=-1)
            else:
                out_ref[:] = jnp.zeros((C, NUM_CH * ci), jnp.float32)

        @pl.when(any_alive)
        def _compute_block():
            pis = [ival(f) for f in range(dim)]
            vis = ([ival(dim + f) for f in range(dim)]
                   if need_vel else None)
            ri = ival(rest + 1)
            hi_i, lo_i = ival(rest + 2), ival(rest + 3)

            acc = {"force": [jnp.zeros((C, ci), jnp.float32)
                             for _ in range(dim)]}
            if mode == "reference":
                acc["gm"] = jnp.zeros((C, ci), jnp.float32)
                acc["gr"] = jnp.zeros((C, ci), jnp.float32)
                acc["died"] = jnp.zeros((C, ci), jnp.float32)
            elif mode == "momentum":
                acc["bm"] = jnp.full((C, ci), _NEG_INF, jnp.float32)
                acc["ph"] = hi_i[..., 0]
                acc["pl"] = lo_i[..., 0]
            elif mode == "elastic":
                acc["dv"] = [jnp.zeros((C, ci), jnp.float32)
                             for _ in range(dim)]

            for r in range(rows):
                if r + 1 < rows:
                    dma(r + 1).start()
                if r > 0:
                    dma(r).wait()
                blk = blks[slot_of(r)]              # [C + 2r, L, Spad]

                # per-cell x-window: concat of the win shifted leading-dim
                # slices, each cut back to its real S slot lanes
                jc = jnp.concatenate(
                    [blk[dx:dx + C, :, 0:S] for dx in range(win)],
                    axis=-1)                        # [C, L, win*S]

                def jval(f):
                    return jc[:, f, :][:, None, :]               # [C,1,W]

                # geometry mask [C, W]: row offset in range (lane-uniform)
                # and x + dx in range (per S-lane block) — folded into m_j
                # so wrapped flat neighbors are inert like dead/pad rows
                ok_row = jnp.ones((C, 1), jnp.float32)
                for a, o in enumerate(offs[r]):
                    nd = higher[a] + o
                    ok_row = ok_row * ((nd >= 0)
                                       & (nd < g)).astype(jnp.float32)
                okx = jnp.concatenate(
                    [jnp.broadcast_to(
                        (ok_row * (((xs + dx - ring) >= 0)
                                   & ((xs + dx - ring)
                                      < g)).astype(jnp.float32)),
                        (C, S)) for dx in range(win)], axis=-1)  # [C, W]

                pjs = [jval(f) for f in range(dim)]
                mj = jval(rest) * okx[:, None, :]
                rj = jval(rest + 1)
                hi_j, lo_j = jval(rest + 2), jval(rest + 3)

                # The hot loop carries NO alive masks — the same maskless
                # design as the exact kernel (kernels.py body_features):
                # dead BODIES never reach the slot grid at all
                # (_partner_structure sorts them into the trailing
                # out-of-grid bucket), pad slots carry zero rows whose
                # m_j = 0 / r_j = 0 make them inert through every channel
                # (force/gm/elastic carry an m_j factor; gr adds r_j*growth
                # = 0; died needs m_j > m_i which 0 never wins; momentum
                # cand needs m_j to beat a live m_i), and pad *i* rows
                # compute junk that the slot unsort never reads (it
                # gathers only rank < occupancy slots and valid-masks the
                # rest). Dropping the old (mi > 0) & (mj > 0) & ... chain
                # + the eps_pos guards measured N=1M 3-D near kernel
                # 0.103 -> 0.100 s (step 0.228 -> 0.225) with identical
                # channel outputs on every referenced row.
                notself = (hi_i != hi_j) | (lo_i != lo_j)

                dp = [b - a for a, b in zip(pis, pjs)]  # [C, ci, W] each
                d2 = dp[0] * dp[0]
                for c in dp[1:]:
                    d2 = d2 + c * c
                rsum = ri + rj
                overlap = (d2 <= rsum * rsum) & notself

                fmask = notself if mode == "elastic" else (notself & ~overlap)
                d2e = d2 + eps2
                if eps_pos:
                    # softened: d2e >= eps2 > 0 everywhere (incl. the
                    # self-pair and all-zero pad rows), so rsqrt is finite
                    # with no guard and junk rows stay NaN-free for
                    # --debug-nans
                    inv = lax.rsqrt(d2e)
                    w = jnp.where(fmask, mj * (inv * inv * inv), 0.0)
                else:
                    safe = fmask & (d2e > 0)
                    inv = lax.rsqrt(jnp.where(safe, d2e, 1.0))
                    w = jnp.where(safe, mj * (inv * inv * inv), 0.0)
                for d in range(dim):
                    acc["force"][d] = acc["force"][d] + jnp.sum(w * dp[d],
                                                                axis=2)

                if mode == "reference":
                    heavier = mi >= mj
                    merge = overlap & heavier
                    acc["gm"] = acc["gm"] + jnp.sum(
                        jnp.where(merge, mj, 0.0), axis=2)
                    acc["gr"] = acc["gr"] + jnp.sum(
                        jnp.where(merge, rj * growth, 0.0), axis=2)
                    acc["died"] = acc["died"] + jnp.sum(
                        jnp.where(overlap & ~heavier, 1.0, 0.0), axis=2)
                elif mode == "momentum":
                    # j beats i if heavier, or equal mass and lower global
                    # id (hi/lo lexicographic — both lanes exact in f32)
                    id_lt = (hi_j < hi_i) | ((hi_j == hi_i)
                                             & (lo_j < lo_i))
                    cand = overlap & ((mj > mi) | ((mj == mi) & id_lt))
                    key = jnp.where(cand, mj, _NEG_INF)
                    bm = jnp.max(key, axis=2)                    # [C, ci]
                    # tie-break lowest global id among the best: first
                    # minimize hi, then lo within the winning hi — exact f32
                    is_best = cand & (key == bm[..., None])
                    oh = jnp.where(is_best, -hi_j, _NEG_INF)
                    bh = -jnp.max(oh, axis=2)
                    ol = jnp.where(is_best & (hi_j == bh[..., None]),
                                   -lo_j, _NEG_INF)
                    bl = -jnp.max(ol, axis=2)
                    has = bm > _NEG_INF
                    # combine with the running best across rows
                    better = (bm > acc["bm"]) | (
                        has & (bm == acc["bm"])
                        & ((bh < acc["ph"])
                           | ((bh == acc["ph"]) & (bl < acc["pl"]))))
                    acc["ph"] = jnp.where(better, bh, acc["ph"])
                    acc["pl"] = jnp.where(better, bl, acc["pl"])
                    acc["bm"] = jnp.maximum(acc["bm"], bm)
                elif mode == "elastic":
                    vdotp = (jval(dim) - vis[0]) * dp[0]
                    for d in range(1, dim):
                        vdotp = vdotp + (jval(dim + d) - vis[d]) * dp[d]
                    # vdotp < 0 alone excludes exact coincidence (there
                    # dp = 0 so vdotp == 0 exactly — same argument as
                    # kernels.py's elastic branch); no d2 > 0 gate needed
                    approaching = overlap & (vdotp < 0)
                    # 2*m_j/(m_i+m_j) * vdotp/d2 via rsqrt-and-square
                    # (exact division costs many VPU ops; rsqrt^2 is ~2
                    # ulp — the same trade the exact kernel makes,
                    # kernels.py:197-206)
                    rs = lax.rsqrt(jnp.where(approaching,
                                             (mi + mj) * d2, 1.0))
                    coef = jnp.where(approaching,
                                     2.0 * vdotp * (rs * rs) * mj, 0.0)
                    for d in range(dim):
                        acc["dv"][d] = acc["dv"][d] + jnp.sum(
                            coef * dp[d], axis=2)

            cols = list(acc["force"])
            if mode == "reference":
                cols += [acc["gm"], acc["gr"], acc["died"]]
            elif mode == "momentum":
                # hot loop runs on the finite finfo.min sentinel; the
                # unsort passes this lane through verbatim, so decode the
                # no-candidate sentinel to the oracle's -inf here
                cols += [jnp.where(acc["bm"] > _NEG_INF,
                                   acc["bm"], -jnp.inf),
                         acc["ph"], acc["pl"]]
            elif mode == "elastic":
                cols += acc["dv"]
            z = jnp.zeros((C, ci), jnp.float32)
            cols += [z] * (NUM_CH - len(cols))
            # LANE-MERGED channel-major write ([C, NUM_CH*ci]): a trailing
            # 8-wide channel axis would be lane-padded to 128 by XLA (16x
            # HBM expansion on the kernel output — OOMs N=16M and pays 16x
            # the write bandwidth)
            out_ref[:] = jnp.concatenate(cols, axis=-1)

    pl.run_scoped(
        body,
        # sublane dim mirrors the (8-aligned) HBM layout, not the logical
        # L: Mosaic requires the leading-dim DMA slice's trailing dims to
        # fill whole (8, 128) tiles — slicing a [cells, 6, Spad] grid is
        # rejected ("slice shape along dimension 1 must be aligned to
        # tiling (8)"); feature reads index f < L either way
        pltpu.VMEM((3, C + 2 * ring, jrows_hbm.shape[1], spad), jnp.float32),
        pltpu.SemaphoreType.DMA((3,)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mode", "g", "ring", "dim", "S", "ci", "L",
                     "ncells_eval", "interpret", "eps_pos"))
def slots_near_raw(jrows, *, mode: str, eps2, growth,
                   g: int, ring: int, dim: int, S: int, ci: int, L: int,
                   cell_base=0, ncells_eval: int = 0,
                   interpret: Optional[bool] = None, eps_pos: bool = False):
    """Near-field channel block for every (cell, i-slot) of the slot grid.

    jrows: f32[(g**dim + 2*padc), L, Spad] — the slot grid by cell,
    features on the middle axis, slot lanes zero-padded to a multiple of
    128 (the manual-DMA alignment unit), cells padded by padc =
    ring*sum(g^d for d in range(dim)) zero cells on BOTH sides. The i
    slots are read out of the center window row in-kernel (each cell's
    first ci slot lanes) — no separate i-feature input.

    With ``cell_base``/``ncells_eval`` (the cell-sharded hooks), only that
    contiguous cell slice is evaluated: cell_base is a traced scalar (the
    shard's first cell), ncells_eval the static slice length; the slot
    grid stays global so windows cross shard boundaries.

    ``eps_pos``: static promise that eps2 > 0, letting the hot loop drop
    the d2e > 0 singularity guards (callers with a concrete softening pass
    float(eps2) > 0; False always safe).

    Returns f32[ncells_eval or g**dim, NUM_CH * ci]: per-slot channels,
    LANE-MERGED channel-major per cell (lanes [k*ci, (k+1)*ci) hold
    channel k for the cell's ci slots), in the unsort's packed-lane
    channel order (force[0:dim], then mode lanes: gained_mass /
    gained_radius / died_count | best_mass / parent_hi / parent_lo |
    dv[0:dim]). The caller un-merges with
    ``raw.reshape(ncells, NUM_CH, ci).transpose(0, 2, 1)``; a trailing
    8-wide channel axis here would be lane-padded to 128 by XLA — a
    measured 16x HBM expansion of the kernel output.
    """
    ncells = ncells_eval or g ** dim
    win = 2 * ring + 1
    W = win * S
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    C = block_cells(ncells, ci, W)

    # the in-kernel leading-dim DMA slice needs the trailing [feature,
    # slot-lane] dims tile-aligned: pad features to the 8-sublane unit
    # (no-op when the caller fused this into its cell pad — the fast path)
    lpad = -(-L // 8) * 8
    if jrows.shape[1] > lpad:
        raise ValueError(
            f"jrows has {jrows.shape[1]} feature rows but L={L} implies at "
            f"most {lpad} (sublane-padded); the caller's L and jrows are "
            "inconsistent")
    if jrows.shape[1] != lpad:
        jrows = jnp.pad(jrows, ((0, 0), (0, lpad - jrows.shape[1]), (0, 0)))

    kernel = functools.partial(
        _near_kernel, mode=mode, g=g, ring=ring, dim=dim, C=C,
        S=S, ci=ci, L=L, eps_pos=eps_pos)

    wpad = -(-W // 128) * 128
    flops_per_pair = 22 + 8 * (dim - 2)
    npairs = ncells * ci * len(_koffs(g, ring, dim)[0]) * W
    return pl.pallas_call(
        kernel,
        grid=(ncells // C,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),     # eps2
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),     # growth
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),     # cell_base
            pl.BlockSpec(memory_space=pl.ANY),         # jrows: manual DMA
        ],
        out_specs=pl.BlockSpec((C, NUM_CH * ci), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncells, NUM_CH * ci), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Mosaic keeps ~20 [C, ci, Wpad] pair temporaries on its stack
            # (measured 86M at C=256, ci=32, Wpad=128); the flat 100M limit
            # leaves headroom under the 128M v5e VMEM
            vmem_limit_bytes=100 << 20),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * npairs,
            bytes_accessed=(ncells + 2 * ring) * L * S * 4
            * len(_koffs(g, ring, dim)[0])
            + ncells * ci * NUM_CH * 4,
            transcendentals=npairs),
        interpret=interpret,
    )(jnp.asarray(eps2, jnp.float32).reshape(1, 1),
      jnp.asarray(growth, jnp.float32).reshape(1, 1),
      jnp.asarray(cell_base, jnp.int32).reshape(1, 1),
      jrows)
