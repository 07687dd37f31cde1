"""Transcendentals missing from the Mosaic TPU lowering, as pure jnp.

Pallas TPU has no ``atan``/``atan2``/``asin`` primitives (probed: Mosaic
raises ``Unimplemented primitive ... atan2``), but the 6-D attitude kernel's
lane-recompute mode (ops/pallas_backup6.py) must evaluate the reference's
quaternion-to-Euler readback — two ``atan2`` and one ``asin``
(attitude-control/Solver_attitude.m:485-489) — INSIDE the kernel. These
implementations use only primitives Mosaic lowers (mul/add/select/sqrt/
reciprocal), so the SAME function runs in XLA (plan builds, tap-liveness
analysis) and in the kernel — keeping the two sides' float behavior as close
as instruction scheduling allows.

Algorithm: the classic Cephes ``atanf`` single-precision kernel — range
reduction at tan(pi/8) and tan(3pi/8), then a degree-9 odd minimax
polynomial — with quadrant fixes for ``atan2`` and the identity
``asin(x) = atan2(x, sqrt(1-x^2))``. Measured max abs error vs numpy
float64: ~4e-7 rad for atan2 over all quadrants, ~1e-6 for asin on
[-0.9999, 0.9999] (tests/test_kernelmath.py) — an order below the f32
grid-locate noise floor of the consuming kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["atan_f32", "atan2_f32", "asin_f32"]

_PI = 3.14159265358979323846
_PI_2 = _PI / 2.0
_PI_4 = _PI / 4.0
_TAN_3PI_8 = 2.414213562373095   # tan(3*pi/8)
_TAN_PI_8 = 0.4142135623730950   # tan(pi/8)


def _atan_core(z):
    """Minimax odd polynomial for atan on |z| <= tan(pi/8) (Cephes atanf)."""
    z2 = z * z
    p = ((8.05374449538e-2 * z2 - 1.38776856032e-1) * z2
         + 1.99777106478e-1) * z2 - 3.33329491539e-1
    return p * z2 * z + z


def atan_f32(x):
    """f32 arctangent via Cephes range reduction; Mosaic-lowerable."""
    x = jnp.asarray(x, jnp.float32)
    sign = jnp.where(x < 0, -1.0, 1.0).astype(jnp.float32)
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = ax > _TAN_PI_8
    # guard the 1/ax and (ax-1)/(ax+1) reductions against ax == 0
    safe = jnp.maximum(ax, jnp.float32(1e-30))
    z = jnp.where(big, -1.0 / safe,
                  jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    y0 = jnp.where(big, jnp.float32(_PI_2),
                   jnp.where(mid, jnp.float32(_PI_4), jnp.float32(0.0)))
    return sign * (y0 + _atan_core(z))


def atan2_f32(y, x):
    """f32 four-quadrant arctangent; Mosaic-lowerable.

    Matches ``jnp.arctan2``'s quadrant conventions on finite inputs,
    including the axes: atan2(0, +x) = 0, atan2(0, -x) = pi (sign of y
    carries to -pi), atan2(+-y, 0) = +-pi/2, atan2(0, 0) = 0.
    """
    y = jnp.asarray(y, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    safe_x = jnp.where(x == 0, jnp.float32(1.0), x)
    base = atan_f32(y / safe_x)
    ysign = jnp.where(y < 0, -1.0, 1.0).astype(jnp.float32)
    # x > 0: base; x < 0: base +- pi; x == 0: +-pi/2 (0 when y == 0 too)
    out = jnp.where(x > 0, base, base + ysign * jnp.float32(_PI))
    out_x0 = jnp.where(y == 0, jnp.float32(0.0), ysign * jnp.float32(_PI_2))
    return jnp.where(x == 0, out_x0, out)


def asin_f32(x):
    """f32 arcsine on [-1, 1] via asin(x) = atan2(x, sqrt(1-x^2));
    Mosaic-lowerable. Inputs are clipped to [-1, 1] (the consuming
    quaternion readback already clips, Solver_attitude.m:487)."""
    x = jnp.clip(jnp.asarray(x, jnp.float32), -1.0, 1.0)
    return atan2_f32(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)))
