"""Relative orbital motion of a chaser about an elliptical target.

The reference's rollout plant (``rates`` nested function,
position-control/Solver_position.m:259-309; pos-att/Solver_pos_att.m:675-729):
linearized relative motion in the target's co-moving RSW frame with the full
time-varying radius — Curtis eq. 7.36, a generalization of Clohessy-Wiltshire
to eccentric target orbits. The target state (R, V) is propagated with the
universal-variable Kepler solver at every evaluation time, exactly like the
reference does inside its ODE callback.
"""

from __future__ import annotations

import jax.numpy as jnp

from .orbital import MU_EARTH, propagate_kepler

__all__ = ["cw_relative_rates"]


def cw_relative_rates(t, y, accel, R0, V0, *, mu=MU_EARTH):
    """d/dt of [dr (3), dv (3)] with control acceleration ``accel`` (km/s^2).

    Curtis eq. 7.36 with time-varying R (Solver_position.m:296-306):
      ddx = (2mu/R^3 + H^2/R^4) dx - 2 (R.V) H/R^4 dy + 2H/R^2 dvy + a_x
      ddy = -(mu/R^3 - H^2/R^4) dy + 2 (R.V) H/R^4 dx - 2H/R^2 dvx + a_y
      ddz = -mu/R^3 dz + a_z
    """
    R, V = propagate_kepler(R0, V0, t, mu=mu)
    nR = jnp.linalg.norm(R)
    RdotV = jnp.dot(R, V)
    H = jnp.linalg.norm(jnp.cross(R, V))

    dx, dy, dz = y[0], y[1], y[2]
    dvx, dvy, dvz = y[3], y[4], y[5]

    nR3 = nR**3
    nR4 = nR**4
    dax = (2 * mu / nR3 + H * H / nR4) * dx - 2 * RdotV / nR4 * H * dy \
        + 2 * H / nR**2 * dvy + accel[0]
    day = -(mu / nR3 - H * H / nR4) * dy + 2 * RdotV / nR4 * H * dx \
        - 2 * H / nR**2 * dvx + accel[1]
    daz = -mu / nR3 * dz + accel[2]
    return jnp.stack([dvx, dvy, dvz, dax, day, daz])
