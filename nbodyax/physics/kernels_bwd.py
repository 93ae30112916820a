"""Analytic backward pass (VJP) for the fused Pallas pair kernel.

The reference is forward-only (a CUDA kernel has no adjoint;
/root/reference/src/nbody.cu), and until this module the framework's
differentiable path stopped at the jnp oracle: ``jax.grad`` through a
``backend="pallas"`` step raised inside ``pallas_call``. The gravity and
elastic-impulse backward maps are analytic and tile exactly like the forward
pass, so this module implements them as a second Pallas kernel and
``physics/kernels.py`` wires it up with ``jax.custom_vjp`` — making the
headline-scale kernel (and the ppermute ring built on it) reverse-mode
differentiable.

Gradient semantics match ``jax.grad`` of the jnp oracle
(physics/pairwise.py) — the spec for what "the derivative of a step" means
here (tests/test_autodiff.py pins them against each other):

- All discrete events (overlap tests, merge winner selection, death marks,
  boundary flips) are step functions of the state: their masks are treated
  as constants, exactly as JAX treats ``jnp.where(mask, x, y)`` — gradients
  flow through the selected branch, never through the mask.
- Masked-out pairs contribute zero gradient, including pairs with a dead
  partner: the oracle gates every pair on ``alive_i & alive_j & not-self``
  (pairwise.py ``valid``), so the backward gates match, even where the
  forward kernel can skip the mask because an ``m_j`` factor already
  zeroes the value (a zero VALUE still has a nonzero d/dm_j — the oracle's
  ``where`` zeroes that too, so we must as well).
- The elastic backward differentiates the exact impulse formula; the
  forward's fast-reciprocal + Newton trick is a numerics implementation
  detail below the gradient's f32 tolerance.

Channel cotangents consumed (layout of kernels.py): force ch[0:D] (all
modes), gained mass/radius ch[D],ch[D+1] (reference), elastic dv ch[D:2D];
the died count (comparison, no grad) and momentum parent (int) carry none.
The momentum best-mass channel's cotangent is routed outside the kernel:
its argmax-j is the saved parent id, so it scatter-adds onto that body's
mass feature (kernels.py ``_raw_bwd``).

Derivatives implemented per pair (u = p_j - p_i, s = (d2+eps2)^-3/2,
F_i = sum_j c m_j s u with gate c):

  dL/dp_i += c m_j (3 s (g.u)/d2e * u - s g)        g = force cotangent of i
  dL/dp_j += c m_j (s g - 3 s (g.u)/d2e * u)
  dL/dm_j += c s (g.u)

and for the elastic impulse C_i = sum_j a m_j q u, q = vdotp/((m_i+m_j) d2),
vdotp = (v_j - v_i).u, gate a (overlap & approaching):

  dL/dv_j += a m_j (g.u)/((m_i+m_j) d2) u            (v_i: negated)
  dL/dp_j += a m_j [(g.u)(dvel - 2 vdotp u/d2)/((m_i+m_j) d2) + q g]
                                                     (p_i: negated)
  dL/dm_j += a (g.u) q m_i/(m_i+m_j)
  dL/dm_i -= a (g.u) q m_j/(m_i+m_j)

Both row-sides of each pairwise term are needed, so the backward runs the
kernel twice per call: once with the i bodies as output rows (cotangents
resident in VMEM, j features streamed) and once with the j bodies as output
rows (i features *and* their cotangents streamed). Each pass has the same
(rows x stream) dataflow and grid as the forward kernel.
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

__all__ = ["raw_backward"]

NUM_FEATS = 8
NUM_CH = 8


def _bwd_kernel(roff_ref, coff_ref, rows_ref, cols_ref, g_ref, out_ref, *,
                side: str, mode: str, eps2: float, growth: float,
                tile_r: int, tile_c: int, dim: int):
    """One (row-tile, col-tile) visit of the backward sweep.

    rows: [TR, F] features of the bodies whose feature-gradients this pass
    produces; cols: [F, TC] partner features (streamed). g: the raw-channel
    cotangents — side "i": [TR, NUM_CH] resident with the rows (rows ARE the
    i bodies); side "j": [NUM_CH, TC] streamed with the cols (the cols are
    the i bodies whose accumulators the rows fed). out: [TR, NUM_FEATS]
    feature-gradient rows, accumulated across col-steps in VMEM.
    """
    cstep = pl.program_id(1)
    rows_are_i = side == "i"

    p_r = [rows_ref[:, d:d + 1] for d in range(dim)]
    m_r = rows_ref[:, 2 * dim:2 * dim + 1]
    r_r = rows_ref[:, 2 * dim + 1:2 * dim + 2]
    p_o = [cols_ref[d:d + 1, :] for d in range(dim)]
    m_o = cols_ref[2 * dim:2 * dim + 1, :]
    r_o = cols_ref[2 * dim + 1:2 * dim + 2, :]

    # u = p_j - p_i regardless of which role the rows play
    u = ([b - a for a, b in zip(p_r, p_o)] if rows_are_i
         else [a - b for a, b in zip(p_r, p_o)])
    m_j = m_o if rows_are_i else m_r
    m_i = m_r if rows_are_i else m_o
    d2 = u[0] * u[0]
    for c in u[1:]:
        d2 = d2 + c * c
    d2e = d2 if eps2 == 0.0 else d2 + eps2
    inv = lax.rsqrt(d2e)                   # inf on coincident pairs: every
    s = inv * inv * inv                    # use below is where()-gated

    rsum = r_r + r_o
    overlap_raw = d2 <= rsum * rsum
    aj = m_j > 0
    # not-self via the forward kernel's tile-local iota trick (exact at any
    # N; see kernels.py _pair_kernel)
    rl = lax.broadcasted_iota(jnp.int32, (tile_r, 1), 0)
    cl = lax.broadcasted_iota(jnp.int32, (1, tile_c), 1)
    dl = cl.astype(jnp.float32) - rl.astype(jnp.float32)
    r_base = roff_ref[0, 0] + pl.program_id(0) * tile_r
    c_base = coff_ref[0, 0] + cstep * tile_c
    notself = dl != (r_base - c_base).astype(jnp.float32)

    # force cotangent g (per i body): resident rows or streamed cols
    if rows_are_i:
        gF = [g_ref[:, d:d + 1] for d in range(dim)]
    else:
        gF = [g_ref[d:d + 1, :] for d in range(dim)]
    gdotu = gF[0] * u[0]
    for d in range(1, dim):
        gdotu = gdotu + gF[d] * u[d]

    if mode == "elastic":
        c = aj & notself & (d2e > 0)       # oracle: fmask = valid
    else:
        c = (~overlap_raw) & aj & notself & (d2e > 0)
    t = (3.0 * (inv * inv)) * s * gdotu    # 3 s (g.u) / d2e
    zero = jnp.zeros((), jnp.float32)
    if rows_are_i:
        dpos = [jnp.sum(jnp.where(c, m_j * (t * ud - s * gd), zero), axis=1,
                        keepdims=True) for ud, gd in zip(u, gF)]
        dmass = jnp.zeros((tile_r, 1), jnp.float32)
    else:
        dpos = [jnp.sum(jnp.where(c, m_j * (s * gd - t * ud), zero), axis=1,
                        keepdims=True) for ud, gd in zip(u, gF)]
        dmass = jnp.sum(jnp.where(c, s * gdotu, zero), axis=1, keepdims=True)
    dvel = [jnp.zeros((tile_r, 1), jnp.float32) for _ in range(dim)]
    drad = jnp.zeros((tile_r, 1), jnp.float32)

    if mode == "reference" and not rows_are_i:
        # gained_mass/radius flow only to the j side (the rows here); the
        # merge mask (overlap & alive & not-self & heavier) is an event.
        heavier = m_i >= m_j
        merge = overlap_raw & aj & notself & heavier
        g_gm = g_ref[dim:dim + 1, :]
        g_gr = g_ref[dim + 1:dim + 2, :]
        dmass = dmass + jnp.sum(jnp.where(merge, g_gm, zero), axis=1,
                                keepdims=True)
        drad = jnp.sum(jnp.where(merge, growth * g_gr, zero), axis=1,
                       keepdims=True)

    if mode == "elastic":
        v_r = [rows_ref[:, dim + d:dim + d + 1] for d in range(dim)]
        v_o = [cols_ref[dim + d:dim + d + 1, :] for d in range(dim)]
        dv_ = ([b - a for a, b in zip(v_r, v_o)] if rows_are_i
               else [a - b for a, b in zip(v_r, v_o)])   # v_j - v_i
        vdotp = dv_[0] * u[0]
        for d in range(1, dim):
            vdotp = vdotp + dv_[d] * u[d]
        a = overlap_raw & aj & notself & (vdotp < 0) & (d2 > 0)
        invd2 = 1.0 / d2                   # inf on d2=0: a-gated below
        minv = 1.0 / (m_i + m_j)
        recip = minv * invd2               # 1/((m_i+m_j) d2)
        q = vdotp * recip
        if rows_are_i:
            gdv = [g_ref[:, dim + d:dim + d + 1] for d in range(dim)]
        else:
            gdv = [g_ref[dim + d:dim + d + 1, :] for d in range(dim)]
        gdvdotu = gdv[0] * u[0]
        for d in range(1, dim):
            gdvdotu = gdvdotu + gdv[d] * u[d]
        sgn = -1.0 if rows_are_i else 1.0
        gr_ = gdvdotu * recip
        for d in range(dim):
            pterm = m_j * (gr_ * (dv_[d] - (2.0 * vdotp) * u[d] * invd2)
                           + q * gdv[d])
            dpos[d] = dpos[d] + sgn * jnp.sum(jnp.where(a, pterm, zero),
                                              axis=1, keepdims=True)
            dvel[d] = dvel[d] + sgn * jnp.sum(
                jnp.where(a, m_j * gr_ * u[d], zero), axis=1, keepdims=True)
        m_other = m_j if rows_are_i else m_i
        dmass = dmass + sgn * jnp.sum(
            jnp.where(a, gdvdotu * q * m_other * minv, zero), axis=1,
            keepdims=True)

    zcol = jnp.zeros((tile_r, 1), jnp.float32)
    cols_out = dpos + dvel + [dmass, drad]
    cols_out += [zcol] * (NUM_FEATS - len(cols_out))
    block = jnp.concatenate(cols_out, axis=1)

    @pl.when(cstep == 0)
    def _():
        out_ref[:] = block

    @pl.when(cstep > 0)
    def _():
        out_ref[:] = out_ref[:] + block


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _bwd_pass(rows, cols_t, g, row_off, col_off, *, side: str, mode: str,
              eps: float, growth_rate: float, tile_r: int, tile_c: int,
              interpret: bool, dim: int):
    """One backward sweep: feature-gradients [R, NUM_FEATS] of the row-side
    bodies. ``g``: side "i" -> [R, NUM_CH] (rows are the i bodies); side
    "j" -> [NUM_CH, C] (cotangents of the streamed i bodies)."""
    nr, nc = rows.shape[0], cols_t.shape[1]
    tile_r = min(tile_r, max(8, nr))
    # the backward body holds ~2x the forward's live [TR, TC] temporaries
    # (u, gates, cotangent products for both pair sides): at the forward's
    # (1024, 2048) tiles its scoped stack measured 64.98M against the 64M
    # limit ON THE CHIP (bench.bwd_check r5 — interpret mode cannot see
    # Mosaic stack accounting). Half the stream tile halves the stack;
    # the kernel stays VPU-bound and streaming, so throughput is
    # unaffected at >=1024 lanes.
    tile_c = min(tile_c, 1024, max(128, nc))
    nr_pad = -(-nr // tile_r) * tile_r
    nc_pad = -(-nc // tile_c) * tile_c
    rows = _pad_to(rows, nr_pad, 0)        # padded rows: mass 0 => gated off
    cols_t = _pad_to(cols_t, nc_pad, 1)
    g = _pad_to(g, nr_pad if side == "i" else nc_pad,
                0 if side == "i" else 1)   # padded cotangents are zero

    grid = (nr_pad // tile_r, nc_pad // tile_c)
    kernel = functools.partial(
        _bwd_kernel, side=side, mode=mode, eps2=float(eps) ** 2,
        growth=float(np.float32(growth_rate)), tile_r=tile_r, tile_c=tile_c,
        dim=dim)
    g_spec = (pl.BlockSpec((tile_r, NUM_CH), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM) if side == "i" else
              pl.BlockSpec((NUM_CH, tile_c), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_r, NUM_FEATS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_FEATS, tile_c), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            g_spec,
        ],
        out_specs=pl.BlockSpec((tile_r, NUM_FEATS), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nr_pad, NUM_FEATS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the backward holds ~2x the forward's live [TR, TC] temporaries
            # (u, gates, cotangent products); same scaling rule, same cap
            vmem_limit_bytes=min(100, 64 * max(1, (tile_r * tile_c) >> 21))
            * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(40 + 10 * (dim - 2)) * nr_pad * nc_pad,
            bytes_accessed=(nr_pad * NUM_FEATS * 8
                            + grid[0] * nc_pad * NUM_FEATS * 8),
            transcendentals=nr_pad * nc_pad),
        interpret=interpret,
    )(jnp.asarray(row_off, jnp.int32).reshape(1, 1),
      jnp.asarray(col_off, jnp.int32).reshape(1, 1),
      rows, cols_t, g)
    # same barrier as the forward kernel (kernels.py _raw_impl): without
    # it the grad program scopes this output into the kernel's own VMEM
    # stack region, which cannot fit (on-chip bench.bwd_check r5)
    out = jax.lax.optimization_barrier(out)
    return out[:nr]


def raw_backward(feats_i, feats_j_t, i_offset, j_offset, parent, g_raw, *,
                 mode: str, eps: float, growth_rate: float,
                 tile_i: int, tile_j: int, interpret: bool, dim: int):
    """Full VJP of ``tile_accumulators_raw`` w.r.t. both feature operands.

    Returns (d_feats_i [Ni, F], d_feats_j_t [F, Nj]). ``parent`` is the
    forward's momentum-mode parent block (None otherwise), used to route the
    best-mass cotangent; ``g_raw`` the [Ni, NUM_CH] raw-channel cotangent.
    """
    nj = feats_j_t.shape[1]
    kw = dict(mode=mode, eps=eps, growth_rate=growth_rate, tile_r=tile_i,
              tile_c=tile_j, interpret=interpret, dim=dim)
    d_fi = _bwd_pass(feats_i, feats_j_t, g_raw, i_offset, j_offset,
                     side="i", **kw)
    d_fj = _bwd_pass(feats_j_t.T, feats_i.T, g_raw.T, j_offset, i_offset,
                     side="j", **kw)
    d_fjt = d_fj.T
    if mode == "momentum" and parent is not None:
        # best-mass channel: d best_mass_i / d m_j = 1 at j = parent_i (the
        # kernel's argmax with lowest-id tie-break). Scatter the cotangent
        # onto that body's mass feature; out-of-tile parents (ring hops where
        # the winner lives in another shard's tile) drop — the winning hop's
        # call owns the gradient, routed there by combine_accumulators' VJP.
        par = parent[:, 0]
        tgt = par - jnp.asarray(j_offset, jnp.int32)
        in_tile = (par != np.iinfo(np.int32).max) & (tgt >= 0) & (tgt < nj)
        upd = jnp.where(in_tile, g_raw[:, 6], 0.0)
        dm = jnp.zeros((nj,), jnp.float32).at[
            jnp.clip(tgt, 0, nj - 1)].add(upd)
        d_fjt = d_fjt.at[2 * dim].add(dm)
    return d_fi, d_fjt
