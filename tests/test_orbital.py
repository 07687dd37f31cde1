"""Orbital mechanics: universal-variable Kepler propagation cross-checks."""

import numpy as np

from ocdp_tpu.dynamics import (
    MU_EARTH,
    propagate_kepler,
    stumpff_C,
    stumpff_S,
    target_orbit_R0V0,
)


def test_stumpff_matches_definitions():
    for z in (-25.0, -1.0, -1e-6, 0.0, 1e-6, 1.0, 25.0):
        C = float(stumpff_C(z))
        S = float(stumpff_S(z))
        if z > 1e-4:
            sz = np.sqrt(z)
            assert np.isclose(C, (1 - np.cos(sz)) / z, rtol=1e-5)
            assert np.isclose(S, (sz - np.sin(sz)) / sz**3, rtol=1e-5)
        elif z < -1e-4:
            sz = np.sqrt(-z)
            assert np.isclose(C, (np.cosh(sz) - 1) / -z, rtol=1e-5)
            assert np.isclose(S, (np.sinh(sz) - sz) / sz**3, rtol=1e-5)
        else:
            assert np.isclose(C, 0.5, atol=1e-4)
            assert np.isclose(S, 1 / 6, atol=1e-4)


def test_target_orbit_initial_state():
    R0, V0 = target_orbit_R0V0()
    R0, V0 = np.asarray(R0), np.asarray(V0)
    # perigee of a 300-km, e=0.1 orbit: r = 6678 km, purely radial position
    assert np.isclose(np.linalg.norm(R0), 6678.0, rtol=1e-5)
    assert np.isclose(R0[1], 0) and np.isclose(R0[2], 0)
    # vis-viva at perigee
    a = 6678.0 / (1 - 0.1)
    v_expect = np.sqrt(MU_EARTH * (2 / 6678.0 - 1 / a))
    assert np.isclose(np.linalg.norm(V0), v_expect, rtol=1e-5)


def test_kepler_propagation_energy_and_period():
    R0, V0 = target_orbit_R0V0()
    R0, V0 = np.asarray(R0, np.float64), np.asarray(V0, np.float64)
    a = 6678.0 / (1 - 0.1)
    period = 2 * np.pi * np.sqrt(a**3 / MU_EARTH)
    e0 = 0.5 * np.dot(V0, V0) - MU_EARTH / np.linalg.norm(R0)
    for t in (10.0, 600.0, period / 2):
        R, V = propagate_kepler(R0, V0, t)
        R, V = np.asarray(R, np.float64), np.asarray(V, np.float64)
        e = 0.5 * np.dot(V, V) - MU_EARTH / np.linalg.norm(R)
        assert np.isclose(e, e0, rtol=5e-4), f"energy drift at t={t}"
    # full-period propagation returns to the initial state
    R, V = propagate_kepler(R0, V0, period)
    np.testing.assert_allclose(np.asarray(R), R0, atol=2.0)  # km, f32 kepler
    np.testing.assert_allclose(np.asarray(V), V0, atol=2e-3)


def test_half_period_is_apogee():
    R0, V0 = target_orbit_R0V0()
    a = 6678.0 / (1 - 0.1)
    period = 2 * np.pi * np.sqrt(a**3 / MU_EARTH)
    R, V = propagate_kepler(np.asarray(R0), np.asarray(V0), period / 2)
    r = np.linalg.norm(np.asarray(R))
    assert np.isclose(r, a * (1 + 0.1), rtol=1e-3)


def test_quaternion_roundtrips_and_frames():
    import jax.numpy as jnp

    from ocdp_tpu.utils.frames import body_to_rsw, rsw_to_body, rsw_to_eci_matrix
    from ocdp_tpu.utils.quaternions import (
        euler_zyx_to_quat,
        quat_to_dcm,
        quat_to_euler_zyx,
    )

    rng = np.random.default_rng(0)
    for _ in range(5):
        y, p, r = rng.uniform(-0.5, 0.5, 3)
        q = euler_zyx_to_quat(jnp.asarray(y), jnp.asarray(p), jnp.asarray(r))
        y2, p2, r2 = quat_to_euler_zyx(q)
        np.testing.assert_allclose([y, p, r],
                                   [float(y2), float(p2), float(r2)], atol=1e-6)
        # DCM orthonormality
        M = np.asarray(quat_to_dcm(q), np.float64)
        np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(M), 1.0, atol=1e-6)

    # frames: rsw<->body are inverse transforms
    R0, V0 = target_orbit_R0V0()
    q = euler_zyx_to_quat(jnp.asarray(0.1), jnp.asarray(-0.2), jnp.asarray(0.3))
    v = jnp.asarray(np.array([0.3, -1.2, 0.7], np.float32))
    vb = rsw_to_body(v, q, R0, V0)
    v2 = body_to_rsw(vb, q, R0, V0)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)
    # RSW matrix orthonormal
    M = np.asarray(rsw_to_eci_matrix(jnp.asarray(R0), jnp.asarray(V0)), np.float64)
    np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-6)
