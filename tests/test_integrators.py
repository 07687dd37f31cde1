"""Adaptive integrators: ode45 (Dormand-Prince, MATLAB-default tolerances)
vs rkf45 (Curtis/Fehlberg) accuracy and agreement (VERDICT r2 item 5).

The reference integrates the attitude and pos-att rollout plants with MATLAB
``ode45`` (Solver_pos_att.m:504; Solver_attitude.m:851) and the position
rollout with ``private/rkf45.m`` — both adaptive pairs must exist and agree
to integration tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocdp_tpu.utils.integrators import (
    adaptive_integrator,
    ode45_integrate,
    rk4_step,
    rkf45_integrate,
)


def test_ode45_exponential_decay():
    f = lambda t, y: -y  # noqa: E731
    y = ode45_integrate(f, 0.0, 2.0, jnp.asarray([1.0]))
    # MATLAB default RelTol=1e-3: local tolerance, global error same order
    assert abs(float(y[0]) - np.exp(-2.0)) < 2e-3 * np.exp(-2.0) + 1e-6


def test_ode45_harmonic_oscillator():
    f = lambda t, y: jnp.stack([y[1], -y[0]])  # noqa: E731
    y = ode45_integrate(f, 0.0, 5.0, jnp.asarray([1.0, 0.0]))
    np.testing.assert_allclose(
        np.asarray(y), [np.cos(5.0), -np.sin(5.0)], atol=5e-3)


def test_ode45_tighter_tolerance_converges():
    """Shrinking RelTol/AbsTol must shrink the global error (step control
    responds to the tolerance, not just the tableau)."""
    f = lambda t, y: jnp.stack([y[1], -y[0]])  # noqa: E731
    y0 = jnp.asarray([1.0, 0.0])
    exact = np.array([np.cos(5.0), -np.sin(5.0)])
    e_loose = np.abs(np.asarray(ode45_integrate(f, 0.0, 5.0, y0)) - exact).max()
    e_tight = np.abs(np.asarray(
        ode45_integrate(f, 0.0, 5.0, y0, rtol=1e-5, atol=1e-8)) - exact).max()
    assert e_tight < e_loose
    assert e_tight < 1e-4


def test_ode45_matches_rkf45_nonlinear():
    """Both adaptive pairs on a stiff-ish nonlinear ODE (Riccati blow-up
    toward t=1, truncated early): agreement to the looser tolerance."""
    f = lambda t, y: y * y  # noqa: E731  y(t) = 1/(1-t)
    y0 = jnp.asarray([1.0])
    a = float(ode45_integrate(f, 0.0, 0.9, y0, rtol=1e-5, atol=1e-8)[0])
    b = float(rkf45_integrate(f, 0.0, 0.9, y0, tol=1e-6)[0])
    exact = 1.0 / (1.0 - 0.9)
    assert abs(a - exact) < 5e-3 * exact
    assert abs(b - exact) < 5e-3 * exact
    assert abs(a - b) < 5e-3 * exact


def test_ode45_under_jit_and_scan():
    """The rollout engines call the integrator inside lax.scan under jit."""
    f = lambda t, y: -0.5 * y  # noqa: E731

    @jax.jit
    def run(y0):
        def step(y, k):
            t0 = k * 0.5
            return ode45_integrate(f, t0, t0 + 0.5, y), y
        y_fin, _ = jax.lax.scan(step, y0, jnp.arange(4))
        return y_fin

    y = run(jnp.asarray([2.0]))
    assert abs(float(y[0]) - 2.0 * np.exp(-1.0)) < 5e-3


def test_adaptive_integrator_resolver():
    assert adaptive_integrator("ode45") is ode45_integrate
    assert adaptive_integrator("rkf45") is rkf45_integrate
    try:
        adaptive_integrator("euler")
    except ValueError as e:
        assert "ode45" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_rk4_step_order():
    """Halving h cuts the one-step error ~32x (O(h^5) local) on y' = y;
    large steps keep the errors far above the f32 noise floor."""
    f = lambda t, y: y  # noqa: E731
    e1 = abs(float(rk4_step(f, 0.0, jnp.asarray(1.0), 0.8)) - np.exp(0.8))
    e2 = abs(float(rk4_step(f, 0.0, jnp.asarray(1.0), 0.4)) - np.exp(0.4))
    assert e1 / e2 > 16.0


def test_rk4_mode_matches_ode45_on_smooth_plant():
    """The fixed-step serving mode: one RK4 step per 5 ms stage tracks the
    adaptive ode45 solution to ~per-step truncation accuracy on a smooth
    nonlinear plant."""
    from ocdp_tpu.utils.integrators import integrator_kwargs

    f = lambda t, y: jnp.stack([y[1], -jnp.sin(y[0])])  # noqa: E731 pendulum
    fn_rk4, kw4 = integrator_kwargs("rk4")
    fn_dp, kwd = integrator_kwargs("ode45")

    @jax.jit
    def run(y0):
        def step(carry, k):
            y4, yd = carry
            t0 = 0.005 * k
            return (fn_rk4(f, t0, t0 + 0.005, y4, **kw4),
                    fn_dp(f, t0, t0 + 0.005, yd, **kwd)), None

        (y4, yd), _ = jax.lax.scan(step, (y0, y0), jnp.arange(200.0))
        return y4, yd

    y4, yd = run(jnp.asarray([0.3, 0.0]))       # 1 s at h = 5 ms
    np.testing.assert_allclose(np.asarray(y4), np.asarray(yd), atol=5e-5)


def test_rk4_mode_rejects_tolerance():
    from ocdp_tpu.utils.integrators import integrator_kwargs

    with pytest.raises(ValueError, match="fixed-step"):
        integrator_kwargs("rk4", 1e-6)


@pytest.mark.parametrize("integ", [rkf45_integrate, ode45_integrate])
def test_truncated_integration_returns_nan(integ):
    """A step budget too small to reach t1 must NOT silently return
    y(t < t1): MATLAB's integrators error/warn when tolerances can't be
    met, so truncation is poisoned with NaN (ADVICE r3)."""
    f = lambda t, y: -y  # noqa: E731
    y = integ(f, 0.0, 2.0, jnp.asarray([1.0]), max_steps=2)
    assert np.all(np.isnan(np.asarray(y)))
    # ...and a sufficient budget stays finite
    y = integ(f, 0.0, 2.0, jnp.asarray([1.0]))
    assert np.all(np.isfinite(np.asarray(y)))
