"""Reference-frame transforms: RSW (target co-moving) <-> ECI <-> body.

Matches ``RSW2ECI`` (pos-att/Solver_pos_att.m:831-847) and the body
transform composition used in policy lookup (:404-415) and force mapping
(:804-823).
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternions import quat_to_dcm

__all__ = ["rsw_to_eci_matrix", "rsw_to_body", "body_to_rsw"]


def rsw_to_eci_matrix(pos, vel):
    """Rotation matrix M with ECI_vec = M @ RSW_vec (Solver_pos_att.m:831-847)."""
    R = pos / jnp.linalg.norm(pos)
    W = jnp.cross(pos, vel)
    W = W / jnp.linalg.norm(W)
    S = jnp.cross(W, R)
    return jnp.stack([R, S, W], axis=1)


def rsw_to_body(vec, q, R_target, V_target):
    """RSW -> ECI -> body (policy-lookup path, Solver_pos_att.m:411-415)."""
    m = rsw_to_eci_matrix(R_target, V_target)
    return quat_to_dcm(q) @ (m @ vec)


def body_to_rsw(vec, q, R_target, V_target):
    """body -> ECI -> RSW (force mapping, Solver_pos_att.m:815-823).

    Rotation inverses are transposes; the reference uses matrix division.
    """
    m = rsw_to_eci_matrix(R_target, V_target)
    return m.T @ (quat_to_dcm(q).T @ vec)
