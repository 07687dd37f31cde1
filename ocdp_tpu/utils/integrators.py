"""On-device ODE integrators (SURVEY.md L2/L6).

The reference integrates rollout plants with MATLAB ``ode45`` or the Curtis
``rkf45`` adaptive Runge-Kutta-Fehlberg routine
(position-control/private/rkf45.m; pos-att/Solver_pos_att.m:504). Both are
re-designed here as jit/scan-compatible pure functions: fixed-step RK4 for
grid dynamics and a ``lax.while_loop`` RKF4(5) with the same embedded
coefficients and step-control law for rollouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rk4_step", "rkf45_integrate"]


def rk4_step(f, t, y, h):
    """One classical RK4 step of ``dy/dt = f(t, y)``."""
    k1 = f(t, y)
    k2 = f(t + h / 2, y + (h / 2) * k1)
    k3 = f(t + h / 2, y + (h / 2) * k2)
    k4 = f(t + h, y + h * k3)
    return y + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)


# Fehlberg coefficients (Curtis, Orbital Mechanics, Table D.x; identical to
# position-control/private/rkf45.m:27-47)
_A = np.array([0, 1 / 4, 3 / 8, 12 / 13, 1, 1 / 2])
_B = np.array([
    [0, 0, 0, 0, 0],
    [1 / 4, 0, 0, 0, 0],
    [3 / 32, 9 / 32, 0, 0, 0],
    [1932 / 2197, -7200 / 2197, 7296 / 2197, 0, 0],
    [439 / 216, -8, 3680 / 513, -845 / 4104, 0],
    [-8 / 27, 2, -3544 / 2565, 1859 / 4104, -11 / 40],
])
_C4 = np.array([25 / 216, 0, 1408 / 2565, 2197 / 4104, -1 / 5, 0])
_C5 = np.array([16 / 135, 0, 6656 / 12825, 28561 / 56430, -9 / 50, 2 / 55])


def rkf45_integrate(f, t0, t1, y0, *, tol=1e-8, max_steps=10_000):
    """Adaptive RKF4(5) from ``t0`` to ``t1``; returns ``y(t1)``.

    Step-control law matches the reference (rkf45.m:73-113): initial step
    ``(t1-t0)/100``; truncation error per step ``te = h*(C4-C5)·k`` compared
    against ``tol*max(|y|, 1)``; accepted steps advance with the 5th-order
    combination ``y + h*C5·k``; step scaled by
    ``h_new = h*min((te_allowed/te_max)^(1/5), 4)`` with no extra safety
    factor. Runs entirely on device as a ``lax.while_loop``.
    """
    dtype = jnp.result_type(y0)
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    y0 = jnp.asarray(y0, dtype)
    h0 = (t1 - t0) / 100.0  # reference: "Assumed initial time step" rkf45.m:73

    def body(carry):
        t, y, h, steps = carry
        h = jnp.minimum(h, t1 - t)

        ks = []
        for i in range(6):
            yi = y
            for j in range(i):
                if _B[i, j] != 0.0:
                    yi = yi + h * _B[i, j] * ks[j]
            ks.append(f(t + _A[i] * h, yi))
        k = jnp.stack(ks)
        te = h * jnp.tensordot(jnp.asarray(_C4 - _C5, dtype), k, axes=1)
        y5 = y + h * jnp.tensordot(jnp.asarray(_C5, dtype), k, axes=1)

        ymax = jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
        te_allowed = tol * ymax
        te_max = jnp.max(jnp.abs(te))
        delta = (te_allowed / (te_max + 1e-30)) ** 0.2

        accept = te_max <= te_allowed
        t_new = jnp.where(accept, t + h, t)
        y_new = jax.tree.map(lambda a, b: jnp.where(accept, a, b), y5, y)
        h_new = h * jnp.minimum(delta, 4.0)
        return t_new, y_new, h_new, steps + 1

    def cond(carry):
        t, _, _, steps = carry
        return jnp.logical_and(t < t1, steps < max_steps)

    _, y_fin, _, _ = jax.lax.while_loop(cond, body, (t0, y0, h0, jnp.asarray(0)))
    return y_fin
