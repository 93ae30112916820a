"""Pallas TPU kernel: fused all-pairs gravity + collision pass.

TPU-native rebuild of the reference's ``ComputeForces`` CUDA megakernel
(/root/reference/src/nbody.cu:139-271). The mapping (SURVEY.md section 2.1):

- CUDA thread-per-body grid + 128-wide shared-memory j-tiles
  (nbody.cu:142,156-190) becomes a 2-D Pallas grid over (i-tile, j-tile): the
  i-tile's features and its accumulator block stay resident in VMEM while
  j-tiles stream through, double-buffered by the Pallas pipeline — the same
  dataflow as the reference's rotating shared-memory tile sweep, minus its
  mod-129 tail bug (Q2) and dropped-tail-bodies bug (Q3).
- The per-pair semantics (overlap test, merge bookkeeping, force kernel,
  self-skip) are exactly those of physics/pairwise.py — the oracle this kernel
  is tested against.
- All per-i reductions are packed into an 8-lane f32 accumulator row so one
  [TILE_I, 8] output block accumulates across j-steps in VMEM.

Design notes (why not the MXU ||a-b||^2 expansion): positions span the field
(~1e5) while collision distances are ~1e2; computing d^2 = |pi|^2+|pj|^2-2pi.pj
in f32 loses ~eps*|p|^2 ~ 6e2 absolute, corrupting the overlap test. The
subtract-first VPU form (dx = xj - xi exact, then dx^2+dy^2) keeps full f32
accuracy, and with ~20 VPU ops/pair the kernel is VPU-bound, which the MXU
cannot lift anyway (reductions over the lane axis are cheap on the VPU; a
[TI,TJ]x[TJ,3] MXU matmul pads its 3-wide output to 128 lanes and costs more
than the ops it saves).

The kernel is dimension-generic (``dim`` static argument, 2 or 3; the
reference is 2-D, 3-D is a framework extension). Feature layout for D
dimensions (NUM_FEATS = 8 fits both): pos[0:D], vel[D:2D], mass at 2D,
radius at 2D+1, zero padding to 8.

Accumulator channel layout (one f32[N, 8] array, positions a function of D):
  ch[0:D]   force components                  (all modes; additive)
  ch[D]     gained_mass | dvx                 (reference | elastic; additive)
  ch[D+1]   gained_radius | dvy               (reference | elastic; additive)
  ch[D+2]   died_count | dvz (D=3)            (reference; additive, decoded
                                               as >0 | elastic; additive)
  ch6       best_mass                         (momentum; max-combined; stays
                                               _NEG_INF iff no candidate)
  remaining channels unused (zero; channels [0:6] are additive in every mode)

Momentum mode additionally emits an i32[N, 8] block (col 0 = parent body id,
combined with ch6 across j-steps) so parent ids are exact at any N an i32 can
index — ids used to ride an f32 channel, which capped momentum mode at 2^24
bodies.
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

from nbodyax.physics.pairwise import PairAccumulators

__all__ = ["pallas_pair_accumulators", "tile_accumulators_raw",
           "body_features", "decode_raw", "DEFAULT_TILE_I", "DEFAULT_TILE_J"]

NUM_FEATS = 8   # x, y, vx, vy, mass, radius, pad, pad
NUM_CH = 8
DEFAULT_TILE_I = 1024  # tuned on v5e: sweep over (TI,TJ), 2026-08
DEFAULT_TILE_J = 2048
_NEG_INF = float(np.finfo(np.float32).min)  # sentinel for "no candidate"
_I32_MAX = np.iinfo(np.int32).max           # sentinel parent: no candidate


def body_features(pos, vel, mass, radius) -> jax.Array:
    """Pack state into the kernel's [N, NUM_FEATS] i-side feature layout
    (pos[0:D], vel[D:2D], mass, radius, zero padding; D = pos.shape[-1]).

    Dead bodies (mass <= 0) get radius 0 here. With that, every inner-loop
    contribution of a dead or padded j body vanishes without explicit alive
    masks — force/merge-gain/elastic all carry an m_j factor, die needs
    m_j > m_i >= 0, and the only mass-free channel (gained radius,
    nbody.cu:219) is zeroed by this clamp. Saves ~3 VPU ops/pair in the
    kernel's hot loop.
    """
    n, d = pos.shape
    z = jnp.zeros((n,), jnp.float32)
    cols = ([pos[:, k] for k in range(d)] + [vel[:, k] for k in range(d)]
            + [mass, jnp.where(mass > 0, radius, 0.0)])
    cols += [z] * (NUM_FEATS - len(cols))
    return jnp.stack(cols, axis=1)


def _pair_kernel(ioff_ref, joff_ref, xi_ref, xj_ref, out_ref, *opt_refs,
                 mode: str, eps2: float, growth: float,
                 tile_i: int, tile_j: int, dim: int):
    """One (i-tile, j-tile) visit. xi: [TI, F] body rows; xj: [F, TJ] body
    columns (pre-transposed on the host side so no in-kernel transposes are
    needed); out: [TI, NUM_CH] accumulator rows, revisited across j.
    Momentum mode gets a second i32[TI, 8] output ref (col 0 = parent id)."""
    par_ref = opt_refs[0] if mode == "momentum" else None
    jstep = pl.program_id(1)

    # i-side columns [TI, 1]; j-side rows [1, TJ]
    pi = [xi_ref[:, d:d + 1] for d in range(dim)]
    mi = xi_ref[:, 2 * dim:2 * dim + 1]
    ri = xi_ref[:, 2 * dim + 1:2 * dim + 2]
    pj = [xj_ref[d:d + 1, :] for d in range(dim)]
    mj = xj_ref[2 * dim:2 * dim + 1, :]
    rj = xj_ref[2 * dim + 1:2 * dim + 2, :]

    dp = [b - a for a, b in zip(pi, pj)]   # p_j - p_i, dim x [TI, TJ]
    d2 = dp[0] * dp[0]
    for c in dp[1:]:
        d2 = d2 + c * c
    rsum = ri + rj
    # overlap_raw includes self-pairs (d2=0 <= rsum^2) and any overlap with a
    # dead body (dead radius is clamped to 0 in body_features, so only when
    # the live body's own disc covers the dead slot's position). Both are
    # exactly the pairs that must not contribute force, so the force path
    # needs no alive/self masks at all; notself is only needed for the
    # merge modes (elastic gates on d2 > 0 instead, which excludes self).
    overlap_raw = d2 <= rsum * rsum        # nbody.cu:133
    if mode in ("reference", "momentum"):
        # Global-id comparisons via tile-LOCAL f32 iotas against a scalar:
        # for locals il < TILE_I, jl < TILE_J, global j <=> i compares reduce
        # to (jl - il) <=> (i_base - j_base). The difference grid is exact in
        # f32 (|jl - il| < 4096) and the scalar bound is exact whenever it
        # lies inside that band (f32 holds all ints < 2^24; outside the band
        # the comparison is constant either way) — so this is EXACT at any N
        # while keeping the hot loop entirely on the f32 vector path.
        il = lax.broadcasted_iota(jnp.int32, (tile_i, 1), 0)
        jl = lax.broadcasted_iota(jnp.int32, (1, tile_j), 1)
        dl = (jl.astype(jnp.float32) - il.astype(jnp.float32))  # [TI, TJ]
        i_base = ioff_ref[0, 0] + pl.program_id(0) * tile_i
        j_base = joff_ref[0, 0] + jstep * tile_j
        base_diff = (i_base - j_base).astype(jnp.float32)
        if mode == "reference":
            overlap = overlap_raw & (dl != base_diff)   # j_id != i_id

    d2e = d2 if eps2 == 0.0 else d2 + eps2
    inv = lax.rsqrt(d2e)
    wm = mj * (inv * inv * inv)            # m_j factor zeroes dead-j pairs
    if mode == "elastic":
        # gravity acts on overlapping pairs too; only the d2=0 singularities
        # (self / exactly coincident, which contribute 0 force anyway via
        # dx=dy=0) must be kept out of the rsqrt result. With softening on,
        # wm is finite everywhere and wm*dx is exactly 0 there — no mask.
        w = wm if eps2 > 0.0 else jnp.where(d2 > 0, wm, 0.0)
    else:
        w = jnp.where(overlap_raw, 0.0, wm)
    forces = [jnp.sum(w * c, axis=1, keepdims=True) for c in dp]

    zcol = jnp.zeros((tile_i, 1), jnp.float32)
    mode_cols = []                         # channels [dim:...], additive
    best = jnp.full((tile_i, 1), _NEG_INF)  # ch6, max-combined (momentum)
    best_j = None

    if mode == "reference":
        heavier = mi >= mj                 # nbody.cu:215 (>=: quirk Q1)
        merge = overlap & heavier
        mode_cols = [
            jnp.sum(jnp.where(merge, mj, 0.0), axis=1, keepdims=True),
            jnp.sum(jnp.where(merge, rj * growth, 0.0), axis=1, keepdims=True),
            jnp.sum(jnp.where(overlap & ~heavier, 1.0, 0.0), axis=1,
                    keepdims=True)]
    elif mode == "momentum":
        # j beats i if heavier, or equal mass with lower global id — the id
        # comparison via the same local-difference trick as above. beats
        # already excludes the self-pair (equal mass, equal id), so no
        # explicit not-self mask is needed here.
        beats = (mj > mi) | ((mj == mi) & (dl < base_diff))
        cand = overlap_raw & beats
        key = jnp.where(cand, mj, _NEG_INF)
        bm = jnp.max(key, axis=1, keepdims=True)
        # Tie-break equal best mass toward the lowest global j id, via
        # tile-local f32 ordering (local ids < TILE_J are exactly f32-
        # representable at any global N; global i32 ids are reconstructed
        # from the tile base afterwards). f32 select/max keeps the hot loop
        # off the slower i32 vector path. No cand mask needed: when bm is a
        # real mass, non-candidate lanes have key = -inf != bm; when bm is
        # the -inf sentinel (no candidate anywhere), best_j is overridden to
        # _I32_MAX below and decode_raw ignores it.
        jlf = jl.astype(jnp.float32)
        order = jnp.where(key == bm, -jlf, _NEG_INF)
        best_local = -jnp.max(order, axis=1, keepdims=True)
        best_j = jnp.where(bm > _NEG_INF,
                           j_base + best_local.astype(jnp.int32), _I32_MAX)
        best = bm
    elif mode == "elastic":
        vi = [xi_ref[:, dim + d:dim + d + 1] for d in range(dim)]
        vj = [xj_ref[dim + d:dim + d + 1, :] for d in range(dim)]
        vdotp = (vj[0] - vi[0]) * dp[0]
        for d in range(1, dim):
            vdotp = vdotp + (vj[d] - vi[d]) * dp[d]
        # vdotp < 0 alone excludes self-pairs and exact coincidence (there
        # dx = dy = 0 so vdotp == 0 exactly) — no id math or d2 > 0 needed
        approaching = overlap_raw & (vdotp < 0)
        # (2*m_j/(m_i+m_j)) * vdotp / d2 via the fast hardware reciprocal
        # (~9 bits on v5e) + ONE Newton step (error squares: ~2e-3 ->
        # ~5e-6 relative on the dv channel): measured 1.034e11 ->
        # 1.125e11 pairs/s vs the old rsqrt-and-square — this was the
        # mode's second transcendental. ONE step (not two) is deliberate:
        # the oracle test gates dv at 1e-5, leaving only ~2x headroom,
        # and that is the point — the gate is set just above this path's
        # known ~5e-6 approximation error so any STRUCTURAL regression
        # (wrong mass ratio, dropped term, lost Newton step: back to
        # ~2e-3) trips it, while the approximation itself passes
        # deterministically. A second Newton step would buy ~1e-11
        # accuracy nobody observes (the impulse feeds an f32 velocity
        # whose own rounding is ~6e-8) at ~4 extra VPU ops on the
        # innermost pair loop; f32 exactness is not reachable by ANY
        # divide ordering since the reference computes this in a
        # different association anyway (PARITY.md Q-class f32 noise). The min() clamp keeps overflowed denominators
        # finite so the Newton step degrades them to an exactly-zero
        # impulse (flushed r0) instead of NaN; 1/0 = inf on self-pairs
        # turns the Newton step NaN, which the coef where() discards
        # (approaching lanes have d2 > 0 by the vdotp gate).
        # The physical factor 2 is applied once in decode_raw, not per pair.
        md = jnp.minimum((mi + mj) * d2, jnp.float32(3.0e38))
        r0 = pl.reciprocal(md, approx=True)
        invmd = r0 * (2.0 - md * r0)
        coef = jnp.where(approaching, vdotp * invmd * mj, 0.0)
        mode_cols = [jnp.sum(coef * c, axis=1, keepdims=True) for c in dp]

    cols = forces + mode_cols              # additive channels [0:6]
    cols += [zcol] * (6 - len(cols))
    block = jnp.concatenate(cols + [best, zcol], axis=1)
    zpar = (jnp.zeros((tile_i, 7), jnp.int32) if mode == "momentum" else None)

    @pl.when(jstep == 0)
    def _():
        out_ref[:] = block
        if mode == "momentum":
            par_ref[:] = jnp.concatenate([best_j, zpar], axis=1)

    @pl.when(jstep > 0)
    def _():
        prev = out_ref[:]
        add = prev[:, 0:6] + block[:, 0:6]
        if mode == "momentum":
            old_bm, new_bm = prev[:, 6:7], block[:, 6:7]
            old_par = par_ref[:, 0:1]
            win = (new_bm > old_bm) | ((new_bm == old_bm) & (best_j < old_par))
            tail = jnp.concatenate([jnp.maximum(old_bm, new_bm),
                                    prev[:, 7:8]], axis=1)
            par_ref[:] = jnp.concatenate(
                [jnp.where(win, best_j, old_par), zpar], axis=1)
        else:
            tail = prev[:, 6:8]
        out_ref[:] = jnp.concatenate([add, tail], axis=1)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "eps", "growth_rate", "tile_i", "tile_j",
                     "interpret", "dim"))
def tile_accumulators_raw(feats_i, feats_j_t, i_offset, j_offset, *,
                          mode: str, eps: float, growth_rate: float,
                          tile_i: int = DEFAULT_TILE_I,
                          tile_j: int = DEFAULT_TILE_J,
                          interpret: Optional[bool] = None,
                          dim: int = 2):
    """Raw channel accumulators of i bodies against j bodies.

    feats_i: f32[Ni, NUM_FEATS] (rows); feats_j_t: f32[NUM_FEATS, Nj]
    (pre-transposed columns). i_offset/j_offset: global index of row/column 0
    (scalars; dynamic so ring hops don't retrace). ``dim`` must match the
    dimensionality the features were packed with (body_features; the packed
    [N, 8] layout does not encode it). Returns (f32[Ni, NUM_CH], parent)
    where parent is i32[Ni, 8] (col 0 = parent id) in momentum mode and None
    otherwise.

    Reverse-mode differentiable: a ``jax.custom_vjp`` routes cotangents on
    the raw channels through the analytic backward Pallas pass
    (physics/kernels_bwd.py), with gradient semantics matching ``jax.grad``
    of the jnp oracle (zero-gradient events, alive/self gating — see that
    module's docstring).
    """
    ni, nj = feats_i.shape[0], feats_j_t.shape[1]
    tile_i = min(tile_i, max(8, ni))
    tile_j = min(tile_j, max(128, nj))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _raw(feats_i, feats_j_t,
                jnp.asarray(i_offset, jnp.int32),
                jnp.asarray(j_offset, jnp.int32),
                mode, float(eps), float(growth_rate), int(tile_i),
                int(tile_j), bool(interpret), dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _raw(feats_i, feats_j_t, i_offset, j_offset, mode, eps, growth_rate,
         tile_i, tile_j, interpret, dim):
    """custom_vjp core: the forward Pallas sweep (primal) with the analytic
    backward pass of kernels_bwd.py as its VJP."""
    return _raw_impl(feats_i, feats_j_t, i_offset, j_offset, mode, eps,
                     growth_rate, tile_i, tile_j, interpret, dim)


def _raw_fwd(feats_i, feats_j_t, i_offset, j_offset, mode, eps, growth_rate,
             tile_i, tile_j, interpret, dim):
    out = _raw_impl(feats_i, feats_j_t, i_offset, j_offset, mode, eps,
                    growth_rate, tile_i, tile_j, interpret, dim)
    # residuals: the (cheap) inputs — pair quantities rematerialize in the
    # backward kernel — plus the momentum parent block, which routes the
    # best-mass cotangent without re-running the argmax
    return out, (feats_i, feats_j_t, i_offset, j_offset, out[1])


def _raw_bwd(mode, eps, growth_rate, tile_i, tile_j, interpret, dim,
             res, g):
    from nbodyax.physics.kernels_bwd import raw_backward
    feats_i, feats_j_t, i_offset, j_offset, parent = res
    d_fi, d_fjt = raw_backward(
        feats_i, feats_j_t, i_offset, j_offset, parent, g[0], mode=mode,
        eps=eps, growth_rate=growth_rate, tile_i=tile_i, tile_j=tile_j,
        interpret=interpret, dim=dim)
    f0 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)  # int offsets
    return d_fi, d_fjt, f0(i_offset), f0(j_offset)


_raw.defvjp(_raw_fwd, _raw_bwd)


def _raw_impl(feats_i, feats_j_t, i_offset, j_offset, mode, eps, growth_rate,
              tile_i, tile_j, interpret, dim):
    ni, nj = feats_i.shape[0], feats_j_t.shape[1]
    ni_pad = -(-ni // tile_i) * tile_i
    nj_pad = -(-nj // tile_j) * tile_j
    feats_i = _pad_to(feats_i, ni_pad, 0)       # pad rows: mass 0 => dead
    feats_j_t = _pad_to(feats_j_t, nj_pad, 1)

    grid = (ni_pad // tile_i, nj_pad // tile_j)
    kernel = functools.partial(
        _pair_kernel, mode=mode, eps2=float(eps) ** 2,
        growth=float(np.float32(growth_rate)), tile_i=tile_i, tile_j=tile_j,
        dim=dim)

    out_block = pl.BlockSpec((tile_i, NUM_CH), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    if mode == "momentum":
        out_specs = [out_block, out_block]
        out_shape = [jax.ShapeDtypeStruct((ni_pad, NUM_CH), jnp.float32),
                     jax.ShapeDtypeStruct((ni_pad, NUM_CH), jnp.int32)]
    else:
        out_specs = out_block
        out_shape = jax.ShapeDtypeStruct((ni_pad, NUM_CH), jnp.float32)

    flops_per_pair = (22 if mode != "none" else 14) + 8 * (dim - 2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),   # i_offset
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),   # j_offset
            pl.BlockSpec((tile_i, NUM_FEATS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_FEATS, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Pallas' default scoped limit (16M) is conservative; the hot
            # loop's [TI, TJ] f32 temporaries need ~4 tiles' worth of stack
            # (measured: 1024x2048 fits in 64M, 1024x4096 needs ~66M). Scale
            # with the tile footprint, capped under the v5e 128M VMEM.
            # NOTE: raising this does NOT fix grad-graph scoped-vmem OOMs —
            # the stack reservation grows to fill whatever is granted; the
            # optimization_barrier on the outputs below is the actual fix
            # (bench.bwd_check r5).
            vmem_limit_bytes=min(100, 64 * max(1, (tile_i * tile_j) >> 21))
            * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * ni_pad * nj_pad,
            bytes_accessed=(ni_pad * NUM_FEATS * 4
                            + grid[0] * nj_pad * NUM_FEATS * 4
                            + ni_pad * NUM_CH * 4),
            transcendentals=ni_pad * nj_pad),
        interpret=interpret,
    )(jnp.asarray(i_offset, jnp.int32).reshape(1, 1),
      jnp.asarray(j_offset, jnp.int32).reshape(1, 1),
      feats_i, feats_j_t)
    # barrier: inside a grad program XLA otherwise co-locates this call's
    # output in the kernel's own scoped-VMEM region, which cannot fit by
    # construction (the kernel's stack reservation already fills whatever
    # vmem_limit_bytes grants — measured 64.98M/64M and 81.78M/80M on the
    # chip, bench.bwd_check r5). The barrier keeps the output a plain HBM
    # buffer; forward-only graphs are unaffected (the output was
    # HBM-resident there anyway).
    out = jax.lax.optimization_barrier(out)
    if mode == "momentum":
        return out[0][:ni], out[1][:ni]
    return out[:ni], None


def decode_raw(raw, parent_raw, i_offset, mass_i, mode: str,
               dim: int = 2) -> PairAccumulators:
    """Unpack the channel block(s) into PairAccumulators (see module
    docstring for the dim-dependent channel positions). ``parent_raw`` is the
    momentum-mode i32 block (None for other modes).

    The hot loop carries no alive-i masks (dead-i rows compute junk); they are
    zeroed here, once per i body, to match the oracle exactly.
    """
    n = raw.shape[0]
    alive = mass_i > 0
    ids = (jnp.asarray(i_offset, jnp.int32)
           + lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1))
    force = jnp.where(alive[:, None], raw[:, 0:dim], 0.0)
    z = jnp.zeros((n,), jnp.float32)
    gm = gr = z
    died = jnp.zeros((n,), bool)
    best_mass = jnp.full((n,), -jnp.inf, jnp.float32)
    parent = ids
    dv = jnp.zeros((n, dim), jnp.float32)
    if mode == "reference":
        gm = jnp.where(alive, raw[:, dim], 0.0)
        gr = jnp.where(alive, raw[:, dim + 1], 0.0)
        died = (raw[:, dim + 2] > 0) & alive
    elif mode == "momentum":
        any_cand = (raw[:, 6] > _NEG_INF) & alive
        best_mass = jnp.where(any_cand, raw[:, 6], -jnp.inf)
        parent = jnp.where(any_cand, parent_raw[:, 0], ids)
    elif mode == "elastic":
        # the kernel accumulates m_j/(m_i+m_j) * vdotp/d2 * dp; the impulse
        # formula's factor 2 is applied here, once per i body
        dv = jnp.where(alive[:, None], 2.0 * raw[:, dim:2 * dim], 0.0)
    return PairAccumulators(force=force, gained_mass=gm, gained_radius=gr,
                            died=died, best_mass=best_mass, parent=parent,
                            dv=dv)


def pallas_pair_accumulators(pos, vel, mass, radius, *, eps: float = 0.0,
                             growth_rate: float = 0.1,
                             mode: str = "reference",
                             tile_i: int = DEFAULT_TILE_I,
                             tile_j: int = DEFAULT_TILE_J,
                             interpret: Optional[bool] = None
                             ) -> PairAccumulators:
    """Drop-in Pallas replacement for physics.pairwise.pair_accumulators."""
    dim = pos.shape[-1]
    feats = body_features(pos, vel, mass, radius)
    raw, par = tile_accumulators_raw(feats, feats.T, 0, 0, mode=mode, eps=eps,
                                     growth_rate=growth_rate, tile_i=tile_i,
                                     tile_j=tile_j, interpret=interpret,
                                     dim=dim)
    return decode_raw(raw, par, 0, mass, mode, dim=dim)
