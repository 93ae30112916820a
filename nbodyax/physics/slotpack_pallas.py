"""Pallas TPU kernel: build the bh near kernel's slot-grid input (jrows) by
block DMA + VMEM re-spacing instead of an XLA row gather.

Why: ``_build_slot_grid`` (physics/barneshut.py) materializes the slot grid
with ONE wide row gather of ncells*S rows. XLA:TPU lowers row gathers to a
per-row latency-bound stream (~7 ns/row at N=1M growing to ~24 ns/row at
N=4M as the table leaves cache), so the build costs ~18 ms of the 124 ms
N=1M bh step and ~0.25 s of the 0.72 s N=4M step — the one near-field
component whose cost grows SUPERLINEARLY with N (measured, NEXT.md).

The gather is redundant data movement: the sorted feature pack already holds
every cell's rows CONTIGUOUSLY (structure sort), and consecutive cells'
ranges are adjacent — the slot grid is just those ranges re-spaced to a
fixed per-cell stride with zero pad rows. That is a ragged copy:

- each grid program owns CB consecutive cells whose bodies are ONE
  contiguous range of the FEATURE-MAJOR pack ``sfT`` [L, n]: DMA it
  HBM -> VMEM sequentially (dense DMA at HBM bandwidth, no per-row
  latency). Feature-major because Mosaic requires DMA slice lanes in
  128-aligned widths — the [L, cap] slice puts the ragged axis on lanes
  where cap can be a 128 multiple (a [cap, L] row-major slice with L=6
  lanes is rejected outright);
- an unrolled per-cell loop re-spaces the block in VMEM: cell c's rows sit
  at the (dynamic, data-dependent) lane offset rel[c] of the buffer; one
  [L, 128]-lane dynamic slice + an occupancy mask emits the cell's slot
  lanes directly in the near kernel's jrows layout
  (cell-major, [cell, L, Spad=128] — so the downstream pad/transpose prep
  of near_pallas.py disappears too);
- the [CB*L, 128] block leaves through a regular output BlockSpec.

Capacity: the VMEM buffer holds ``cap`` lanes — a STATIC bound on any
block's row span. ``slot_pack_plan`` sizes it for near-uniform occupancy
(mean block span * slack; a CB=128-cell aggregate has ~9% relative Poisson
spread at occupancy 16). Whether the CURRENT state fits is a cheap runtime
predicate (block spans are first differences of ``starts``), and the caller
wraps kernel vs. gather in ``lax.cond`` — clustered states (galaxy cores:
single cells holding thousands of bodies) take the exact gather path at
runtime, so the kernel is a pure fast path with bitwise-identical output
(tests/test_barneshut.py pins kernel == gather+prep).

Reference analog: none — the reference has no spatial structure; this
accelerates the TPU-native bh engine's build stage (the reference's
shared-memory j-tile loop, /root/reference/src/nbody.cu:156-190, is the
*consumer*-side analog, implemented in near_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["slot_pack_plan", "build_jrows_pallas"]

SPAD = 128   # slot-lane width of a jrows cell (the manual-DMA tile unit)


def slot_pack_plan(n: int, ncells: int, S: int, L: int = 0):
    """Static (cb, cap) for the pack kernel, or None when the shape doesn't
    fit its model (tiny grids, S past one lane tile, huge-occupancy blocks,
    or more feature rows than the 8-sublane DMA tile — 3-D elastic packs
    2*dim+4 = 10 lanes, which the buffer cannot hold; those states take the
    exact gather path). cb: cells per program. cap: VMEM lane capacity =
    mean block span * 1.5 slack + one 128-lane tile of alignment headroom,
    rounded to 128."""
    if ncells < 128 or ncells % 128 or S > SPAD or L > 8:
        return None
    cb = 128
    mean_span = cb * max(1.0, n / ncells)
    cap = int(mean_span * 1.5) + 3 * SPAD
    cap = -(-cap // SPAD) * SPAD
    if cap * 4 * 8 > 8 << 20:      # [8, cap] f32 buffer; keep it modest
        return None
    return cb, cap


def _respace(buf, roff, rel_ref, occ_ref, out_ref, cb: int, L: int):
    """Re-space the DMA'd block in VMEM: one [L, SPAD] slot tile per cell
    with zero pad lanes past each cell's (capped) occupancy."""
    lane = lax.broadcasted_iota(jnp.int32, (1, SPAD), 1)
    for c in range(cb):
        # Mosaic only allows DYNAMIC lane offsets that are provable
        # 128-multiples: take the aligned 2-tile window and rotate the
        # residue in-register (the classic unaligned-load split)
        off = roff + rel_ref[0, 0, c]
        base = pl.multiple_of((off // SPAD) * SPAD, SPAD)
        frac = off - base
        wide = buf[:, pl.ds(base, 2 * SPAD)]                # [8, 2*SPAD]
        rows = pltpu.roll(wide, 2 * SPAD - frac, 1)[:L, :SPAD]
        keep = lane < occ_ref[0, 0, c]
        out_ref[0, c * L:(c + 1) * L, :] = jnp.where(keep, rows, 0.0)


def _pack_kernel(start_ref, rel_ref, occ_ref, sft_hbm, out_ref, *,
                 cb: int, L: int, cap: int):
    """One program: DMA the block's contiguous sorted range (feature-major),
    re-space it to one [L, SPAD] slot tile per cell with zero pad lanes."""

    def body(buf, sem):
        start = start_ref[0, 0, 0]
        # 128-aligned DMA offset (Mosaic requires provable lane alignment)
        al = pl.multiple_of((start // SPAD) * SPAD, SPAD)
        roff = start - al
        dma = pltpu.make_async_copy(
            sft_hbm.at[:, pl.ds(al, cap)], buf, sem)
        dma.start()
        dma.wait()
        _respace(buf, roff, rel_ref, occ_ref, out_ref, cb, L)

    pl.run_scoped(
        body,
        # 8 sublanes: the DMA destination must fill whole sublane tiles
        pltpu.VMEM((8, cap), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


def _pack_mom_kernel(start_ref, rel_ref, occ_ref, rc_ref, ctr_ref, sft_hbm,
                     out_ref, mom_ref, *, cb: int, L: int, cap: int,
                     dim: int, nmp: int):
    """_pack_kernel plus a second output: EXACT order-2 finest-level FMM
    moments per cell, reduced in VMEM while the block is resident.

    Replaces the N-row scatter of _finest_moments_scatter (barneshut.py) —
    TPU scatters stream one update row at a time, the single most expensive
    grid op at large N — with two MXU matmuls against the block's 0/1
    cell-membership mask: per-lane cell centers come out of
    (centers [8,cb]) x (maskT [cap,cb])^T (each lane sums exactly one f32
    center — exact), per-cell channel sums out of
    (chans [nmp,cap]) x (maskT [cap,cb]).

    Exactness needs the FULL cell populations in the buffer (the jrows
    output is capped at S slots per cell, the moments are not), so the
    caller's runtime fit predicate covers the uncapped block span."""

    def body(buf, sem):
        start = start_ref[0, 0, 0]
        al = pl.multiple_of((start // SPAD) * SPAD, SPAD)
        roff = start - al
        dma = pltpu.make_async_copy(
            sft_hbm.at[:, pl.ds(al, cap)], buf, sem)
        dma.start()
        dma.wait()
        _respace(buf, roff, rel_ref, occ_ref, out_ref, cb, L)
        # membership mask: lane l of the buffer belongs to cell c iff
        # roff+rel[c] <= l < roff+rel[c]+count[c] (full counts, not the
        # S-capped occupancy)
        rc = rc_ref[0]                                     # [2, cb] i32
        lo = roff + rc[0:1, :]                             # [1, cb]
        hi = lo + rc[1:2, :]
        sub = lax.broadcasted_iota(jnp.int32, (cap, cb), 0)
        maskT = ((sub >= lo) & (sub < hi)).astype(jnp.float32)  # [cap, cb]
        # HIGHEST precision: the MXU's default bf16 pass would round the
        # field-scale (~1e5) centers by ~2^-9*|ctr| — larger than the
        # cell-relative offsets r themselves
        ctr_lane = lax.dot_general(                        # [8, cap]
            ctr_ref[0], maskT, (((1,), (1,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        m = buf[L - 4:L - 3, :]                            # mass feature row
        r = [buf[d:d + 1, :] - ctr_lane[d:d + 1, :] for d in range(dim)]
        rows = ([m] + [m * r[d] for d in range(dim)]
                + [m * r[a] * r[b]
                   for a in range(dim) for b in range(a, dim)])
        if len(rows) < nmp:
            rows.append(jnp.zeros((nmp - len(rows), cap), jnp.float32))
        chans = jnp.concatenate(rows, axis=0)              # [nmp, cap]
        mom_ref[0] = lax.dot_general(                      # [nmp, cb]
            chans, maskT, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    pl.run_scoped(
        body,
        pltpu.VMEM((8, cap), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("ncells", "L", "cb", "cap",
                                             "interpret"))
def _pack_call(sft_pad, start_tab, rel_tab, occ_tab, *, ncells: int, L: int,
               cb: int, cap: int, interpret: bool):
    nprog = ncells // cb
    kernel = functools.partial(_pack_kernel, cb=cb, L=L, cap=cap)
    out = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            # singleton middle dims satisfy Mosaic's block rule (last two
            # block dims must divide (8, 128) or EQUAL the array dims)
            pl.BlockSpec((1, 1, 1), lambda p: (p, 0, 0),
                         memory_space=pltpu.SMEM),      # block row start
            pl.BlockSpec((1, 1, cb), lambda p: (p, 0, 0),
                         memory_space=pltpu.SMEM),      # per-cell rel offs
            pl.BlockSpec((1, 1, cb), lambda p: (p, 0, 0),
                         memory_space=pltpu.SMEM),      # per-cell counts
            pl.BlockSpec(memory_space=pl.ANY),          # sfT: manual DMA
        ],
        out_specs=pl.BlockSpec((1, cb * L, SPAD), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nprog, cb * L, SPAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=ncells * L * SPAD,
            bytes_accessed=nprog * cap * L * 4 + ncells * L * SPAD * 4,
            transcendentals=0),
        interpret=interpret,
    )(start_tab, rel_tab, occ_tab, sft_pad)
    return out.reshape(ncells, L, SPAD)


@functools.partial(jax.jit, static_argnames=("ncells", "L", "cb", "cap",
                                             "dim", "nmp", "interpret"))
def _pack_mom_call(sft_pad, start_tab, rel_tab, occ_tab, rc_tab, ctr_tab, *,
                   ncells: int, L: int, cb: int, cap: int, dim: int,
                   nmp: int, interpret: bool):
    nprog = ncells // cb
    kernel = functools.partial(_pack_mom_kernel, cb=cb, L=L, cap=cap,
                               dim=dim, nmp=nmp)
    out, mom = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda p: (p, 0, 0),
                         memory_space=pltpu.SMEM),      # block row start
            pl.BlockSpec((1, 1, cb), lambda p: (p, 0, 0),
                         memory_space=pltpu.SMEM),      # per-cell rel offs
            pl.BlockSpec((1, 1, cb), lambda p: (p, 0, 0),
                         memory_space=pltpu.SMEM),      # per-cell occupancy
            pl.BlockSpec((1, 2, cb), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),      # (rel, full count)
            pl.BlockSpec((1, 8, cb), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),      # cell centers
            pl.BlockSpec(memory_space=pl.ANY),          # sfT: manual DMA
        ],
        out_specs=[
            pl.BlockSpec((1, cb * L, SPAD), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nmp, cb), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nprog, cb * L, SPAD), jnp.float32),
            jax.ShapeDtypeStruct((nprog, nmp, cb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=ncells * L * SPAD + 2 * nprog * (8 + nmp) * cap * cb,
            bytes_accessed=(nprog * cap * L * 4 + ncells * L * SPAD * 4
                            + ncells * nmp * 4),
            transcendentals=0),
        interpret=interpret,
    )(start_tab, rel_tab, occ_tab, rc_tab, ctr_tab, sft_pad)
    return (out.reshape(ncells, L, SPAD),
            mom.transpose(0, 2, 1).reshape(ncells, nmp))


def build_jrows_pallas(sf, starts, ends, n: int, ncells: int, S: int,
                       plan, moments=None,
                       interpret: Optional[bool] = None):
    """The near kernel's [ncells, L, SPAD] slot input, cell-major with slot
    lanes zero past each cell's count: Pallas block-DMA pack when every
    block's row span fits the plan's static capacity, the exact
    gather + transpose otherwise (one runtime ``lax.cond`` — only the taken
    branch executes). Bitwise-identical either way; the caller adds the
    window-reach cell padding.

    ``moments``: optional (pos, mass, ext, levels). When given, returns
    (jrows, finest) where ``finest`` is the [ncells, NM] order-2
    finest-level FMM moment table — reduced in VMEM by the pack kernel
    while each block is resident (two MXU matmuls against the membership
    mask) instead of the N-row scatter of ``_finest_moments_scatter``,
    which stays as the cond's fallback. Moment exactness needs FULL cell
    populations in the buffer, so the fit predicate tightens from "last
    cell's 2-tile window readable" to "whole uncapped block span
    resident"."""
    from nbodyax.physics.barneshut import (_build_slot_grid, _cell_sizes,
                                           _finest_moments_scatter)

    cb, cap = plan
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = sf.shape[1]
    nprog = ncells // cb
    start2d = starts.reshape(nprog, cb)[:, :1]                  # [nprog, 1]
    rel2d = starts.reshape(nprog, cb) - start2d                 # [nprog, cb]
    occ_tab = jnp.minimum(ends - starts, S).reshape(nprog, cb)  # [nprog, cb]
    # worst per-block requirement: the last cell's aligned 2-tile window
    # readable after the <=127-lane alignment shift
    fits = jnp.max(rel2d[:, -1]) + 3 * SPAD <= cap
    start_tab = start2d.reshape(nprog, 1, 1)
    rel_tab = rel2d.reshape(nprog, 1, cb)
    occ_tab = occ_tab.reshape(nprog, 1, cb)
    # feature-major pack: lanes padded so the last block's cap-lane DMA
    # stays in bounds whatever its (aligned) start; sublanes padded to the
    # 8-row tile the DMA slice must cover in full
    sft_pad = jnp.pad(sf.T, ((0, 8 - L), (0, cap)))

    def gather_prep(a):
        fslot = _build_slot_grid(a[4], a[5], a[6], n, ncells, S)
        return jnp.pad(fslot.transpose(0, 2, 1),
                       ((0, 0), (0, 0), (0, SPAD - S)))

    operands = (sft_pad, start_tab, rel_tab, occ_tab, sf, starts, ends)
    if moments is None:
        return lax.cond(
            fits,
            lambda a: _pack_call(a[0], a[1], a[2], a[3], ncells=ncells, L=L,
                                 cb=cb, cap=cap, interpret=interpret),
            gather_prep,
            operands)

    pos, mass, ext, levels = moments
    dim = pos.shape[-1]
    nm = 1 + dim + dim * (dim + 1) // 2
    nmp = 8 if nm <= 8 else 16
    cnt2d = (ends - starts).reshape(nprog, cb)
    # whole uncapped block span resident after the <=127-lane align shift —
    # a TIGHTER predicate than the jrows one (the pack output is S-capped,
    # the moment reduction is not), so it gets its own nested cond below: a
    # hot cell only demotes the moment reduction to the scatter while jrows
    # keeps the pack kernel (clustered scenes — merged galaxy cores — break
    # exactly this predicate while the capped jrows span still fits)
    fits_m = fits & (jnp.max(rel2d[:, -1] + cnt2d[:, -1]) + SPAD <= cap)
    rc_tab = jnp.stack([rel2d, cnt2d], axis=1).astype(jnp.int32)
    # per-cell centers, the exact expression of _finest_moments_scatter
    # (mins + (c + 0.5) * csz); flat ids are row-major with x fastest, so
    # axis d has stride g^d
    g = 1 << levels
    mins, csz = _cell_sizes(ext, g)
    flat = jnp.arange(ncells, dtype=jnp.int32)
    ctr = jnp.stack(
        [mins[d] + (((flat // (g ** d)) % g).astype(jnp.float32) + 0.5)
         * csz[d] for d in range(dim)], axis=1)            # [ncells, dim]
    ctr_tab = jnp.pad(ctr.reshape(nprog, cb, dim).transpose(0, 2, 1),
                      ((0, 0), (0, 8 - dim), (0, 0)))      # [nprog, 8, cb]

    def kernel_branch(a):
        jr, mom = _pack_mom_call(a[0], a[1], a[2], a[3], a[7], a[8],
                                 ncells=ncells, L=L, cb=cb, cap=cap,
                                 dim=dim, nmp=nmp, interpret=interpret)
        return jr, mom[:, :nm]

    def jrows_only(a):
        # hot cell broke only the uncapped-span (moment) predicate: keep
        # the pack kernel for jrows, take the scatter for the moments
        jr = _pack_call(a[0], a[1], a[2], a[3], ncells=ncells, L=L,
                        cb=cb, cap=cap, interpret=interpret)
        return jr, _finest_moments_scatter(pos, mass, ext, levels)

    def pack_branch(a):
        return lax.cond(fits_m, kernel_branch, jrows_only, a)

    def fallback(a):
        return gather_prep(a), _finest_moments_scatter(pos, mass, ext,
                                                       levels)

    return lax.cond(fits, pack_branch, fallback,
                    operands + (rc_tab, ctr_tab))
