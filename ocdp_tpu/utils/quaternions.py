"""Quaternion algebra with the reference's conventions.

The reference stores quaternions SCALAR-LAST, q = [q1 q2 q3 q4] with q4 the
scalar part (pos-att/Solver_pos_att.m:462-463 reverses MATLAB Aerospace
Toolbox scalar-first output; the convention notes in
attitude-control/Solver_attitude.m:322-340 are load-bearing). All functions
here are scalar-last unless suffixed ``_wxyz``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quat_normalize",
    "quat_to_dcm",
    "quat_kinematics",
    "euler_zyx_to_quat",
    "quat_to_euler_zyx",
    "small_angles_from_quat",
]


def quat_normalize(q):
    return q / jnp.linalg.norm(q)


def quat_to_dcm(q):
    """ECI->body direction-cosine matrix from a scalar-last quaternion.

    Matches ``ECI2body`` (pos-att/Solver_pos_att.m:825-829) exactly.
    """
    q1, q2, q3, q4 = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (q2 * q2 + q3 * q3), 2 * (q1 * q2 + q3 * q4), 2 * (q1 * q3 - q2 * q4)],
        [2 * (q2 * q1 - q3 * q4), 1 - 2 * (q1 * q1 + q3 * q3), 2 * (q2 * q3 + q1 * q4)],
        [2 * (q3 * q1 + q2 * q4), 2 * (q3 * q2 - q1 * q4), 1 - 2 * (q1 * q1 + q2 * q2)],
    ])


def quat_kinematics(q, w):
    """dq/dt for body rates w, scalar-last.

    The component form used in the reference's 13-state plant
    (pos-att/Solver_pos_att.m:712-716).
    """
    q1, q2, q3, q4 = q[0], q[1], q[2], q[3]
    w1, w2, w3 = w[0], w[1], w[2]
    return 0.5 * jnp.stack([
        w3 * q2 - w2 * q3 + w1 * q4,
        -w3 * q1 + w1 * q3 + w2 * q4,
        w2 * q1 - w1 * q2 + w3 * q4,
        -w1 * q1 - w2 * q2 - w3 * q3,
    ])


def euler_zyx_to_quat(yaw, pitch, roll):
    """ZYX (yaw-pitch-roll) Euler angles -> TRUE scalar-last quaternion
    [x y z w] (same rotation as MATLAB ``angle2quat(yaw, pitch, roll)``,
    which is scalar-FIRST [w x y z]).

    NOTE: this is *not* the reference's stored component order. The
    reference reverses angle2quat's output (``q0(end:-1:1)``,
    Solver_pos_att.m:462-463), and reversing [w x y z] yields [z y x w] —
    the "kirk" order of Solver_attitude.m:322-340. Use
    :func:`kirk_quat_from_euler` to build reference-ordered components;
    the two orders coincide only for pitch-only rotations (yaw=roll=0),
    e.g. the reference's default pos-att x0.
    """
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    w = cy * cp * cr + sy * sp * sr
    x = cy * cp * sr - sy * sp * cr
    y = cy * sp * cr + sy * cp * sr
    z = sy * cp * cr - cy * sp * sr
    return jnp.stack([x, y, z, w])


def kirk_quat_from_euler(yaw, pitch, roll):
    """ZYX Euler angles -> quaternion in the REFERENCE's component order.

    The kirk order [z y x w] produced by the reference's
    ``angle2quat(...); q0(end:-1:1)`` idiom (Solver_pos_att.m:462-463) and
    documented at Solver_attitude.m:322-340: kirk q1 = z, q2 = y, q3 = x,
    q4 = w in terms of the true scalar-last components.
    """
    q = euler_zyx_to_quat(yaw, pitch, roll)
    return jnp.stack([q[2], q[1], q[0], q[3]])


def quat_to_euler_zyx(q):
    """Scalar-last quaternion -> (yaw, pitch, roll), ZYX.

    Equivalent to MATLAB ``quat2angle`` on the scalar-first reversal
    (Solver_attitude.m:540,757).
    """
    x, y, z, w = q[0], q[1], q[2], q[3]
    yaw = jnp.arctan2(2 * (x * y + w * z), w * w + x * x - y * y - z * z)
    pitch = jnp.arcsin(jnp.clip(-2 * (x * z - w * y), -1.0, 1.0))
    roll = jnp.arctan2(2 * (y * z + w * x), w * w - x * x - y * y + z * z)
    return yaw, pitch, roll


def small_angles_from_quat(q):
    """Per-axis rotation angles t_i = 2*asin(q_i), the reference's readback
    for policy lookup (Solver_pos_att.m:490-492)."""
    return 2.0 * jnp.arcsin(jnp.clip(q[:3], -1.0, 1.0))
