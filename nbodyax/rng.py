"""Deterministic RNG, bit-compatible with the reference scene generator.

The reference seeds a Numerical-Recipes "Ranq"-style combined xorshift /
LCG / MWC generator with 1024 and draws ``(x, y, mass, radius)`` per body
(``/root/reference/src/nbody.cu:401-416``; generator state machine at
``/root/reference/include/jbutil.h:514-562``). Trajectory-parity tests need the
*identical* initial scene, so this module reimplements that generator exactly
(same public constants, same update order) and is validated against golden
outputs captured by running the reference generator (tests/test_rng.py).

For large scenes there is a native C++ fast path (nbodyax/native) since the
recurrence is inherently sequential; the pure-Python path is the fallback and
the source of truth. Non-parity scenes should use ``jax.random`` instead
(see nbodyax/scenes.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["RefRandgen", "scene_arrays"]

_M64 = (1 << 64) - 1


class RefRandgen:
    """Bit-exact reimplementation of ``jbutil::randgen`` (jbutil.h:514-562).

    Three-component combined generator: 64-bit LCG (u), 64-bit xorshift (v),
    32-bit multiply-with-carry (w); output is a xorshifted mix of u added to v,
    xored with w. All arithmetic mod 2^64.
    """

    __slots__ = ("u", "v", "w")

    def __init__(self, s: int = 0):
        self.seed(s)

    def seed(self, s: int) -> None:
        # jbutil.h:525-535
        self.v = 4101842887655102017
        self.w = 1
        self.u = (s ^ self.v) & _M64
        self.ival64()
        self.v = self.u
        self.ival64()
        self.w = self.v
        self.ival64()

    def _advance(self) -> None:
        # jbutil.h:538-544
        self.u = (self.u * 2862933555777941757 + 7046029254386353087) & _M64
        v = self.v
        v ^= v >> 17
        v ^= (v << 31) & _M64
        v ^= v >> 8
        self.v = v
        self.w = (4294957665 * (self.w & 0xFFFFFFFF) + (self.w >> 32)) & _M64

    def ival64(self) -> int:
        # jbutil.h:546-553
        self._advance()
        x = self.u ^ ((self.u << 21) & _M64)
        x ^= x >> 35
        x = x ^ ((x << 4) & _M64)
        return ((x + self.v) ^ self.w) & _M64

    def fval(self) -> float:
        # jbutil.h:554-557 — double in [0, 1)
        return 5.42101086242752217e-20 * self.ival64()

    def fval_range(self, a: float, b: float) -> float:
        # jbutil.h:558-561
        return self.fval() * (b - a) + a


def scene_arrays(seed: int, n: int, field_width: int, field_height: int,
                 min_mass: float, max_mass: float,
                 min_radius: float, max_radius: float):
    """Generate the reference's random scene (nbody.cu:406-416) as float32 SoA.

    Draw order per body: x, y, mass, radius. Each value is computed in double
    and narrowed to float32 on store, matching the reference's assignment of
    ``double fval(...)`` results to ``float`` locals (nbody.cu:396,408-411).

    Uses the native C++ generator when available (identical semantics; see
    nbodyax/native), else pure Python.
    """
    try:
        from nbodyax.native import binding as _native
    except Exception:  # pragma: no cover - import is best-effort
        _native = None
    if _native is not None and _native.available():
        return _native.scene_arrays(seed, n, field_width, field_height,
                                    min_mass, max_mass, min_radius, max_radius)

    g = RefRandgen(seed)
    pos = np.empty((n, 2), np.float32)
    mass = np.empty((n,), np.float32)
    radius = np.empty((n,), np.float32)
    dw, dh = field_width * 2, field_height * 2
    # ConfigData stores these as C++ float (nbodyConfig.h:9-12); they are
    # narrowed to float32 *before* being widened to double inside fval.
    min_mass = float(np.float32(min_mass))
    max_mass = float(np.float32(max_mass))
    min_radius = float(np.float32(min_radius))
    max_radius = float(np.float32(max_radius))
    for i in range(n):
        pos[i, 0] = np.float32(g.fval_range(0, dw) - field_width)
        pos[i, 1] = np.float32(g.fval_range(0, dh) - field_height)
        mass[i] = np.float32(g.fval_range(min_mass, max_mass))
        radius[i] = np.float32(g.fval_range(min_radius, max_radius))
    vel = np.zeros((n, 2), np.float32)  # nbody.cu:413 — bodies start at rest
    return pos, vel, mass, radius
