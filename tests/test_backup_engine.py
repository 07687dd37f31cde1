"""Bellman-backup + engine tests vs the brute-force numpy oracle."""

import numpy as np

import jax
import jax.numpy as jnp

from ocdp_tpu import bellman_backup, build_plan, value_iteration_converged, value_iteration_finite
from oracle import bellman_backup as np_backup


def _random_problem(rng, state_shape=(7, 6), n_actions=5):
    d = len(state_shape)
    axes = tuple(np.sort(rng.uniform(-1, 1, size=n)).astype(np.float32) for n in state_shape)
    # random affine dynamics per action; some next states fall outside grid
    next_states = np.empty(state_shape + (n_actions, d), np.float32)
    mesh = np.meshgrid(*axes, indexing="ij")
    for a in range(n_actions):
        for k in range(d):
            mix = rng.uniform(-0.3, 0.3, size=d)
            shift = rng.uniform(-0.4, 0.4)
            coord = sum(mix[j] * mesh[j] for j in range(d)) + 0.8 * mesh[k] + shift
            next_states[..., a, k] = coord
    cost = rng.uniform(0, 1, size=state_shape + (n_actions,)).astype(np.float32)
    return axes, next_states, cost


def test_backup_matches_oracle():
    rng = np.random.default_rng(42)
    axes, next_states, cost = _random_problem(rng)
    values = rng.standard_normal([len(a) for a in axes]).astype(np.float32)

    plan = build_plan(axes, tuple(next_states[..., k] for k in range(len(axes))))
    res = bellman_backup(jnp.asarray(values), plan, jnp.asarray(cost))
    want_v, want_a = np_backup(values, axes, next_states, cost)

    np.testing.assert_allclose(np.asarray(res.values), want_v, rtol=2e-4, atol=2e-4)
    # argmin may differ only where two actions are within fp tolerance
    diff = np.asarray(res.argmin) != want_a
    if diff.any():
        tot = np.asarray(res.values)
        assert np.allclose(tot[diff], want_v[diff], rtol=1e-4, atol=1e-4)


def test_tie_break_first_minimum():
    # duplicate actions -> identical totals -> argmin must pick the FIRST,
    # matching MATLAB min (test/Dynamic_Solver.m:209).
    ax = np.linspace(-1, 1, 5).astype(np.float32)
    values = np.zeros((5,), np.float32)
    q = np.tile(ax[:, None], (1, 3)).astype(np.float32)  # same next state for all 3 actions
    cost = np.ones((5, 3), np.float32)
    plan = build_plan((ax,), (q,))
    res = bellman_backup(jnp.asarray(values), plan, jnp.asarray(cost))
    assert np.all(np.asarray(res.argmin) == 0)


def test_finite_engine_multi_sweep_matches_oracle():
    rng = np.random.default_rng(7)
    axes, next_states, cost = _random_problem(rng, state_shape=(5, 4), n_actions=3)
    plan = build_plan(axes, tuple(next_states[..., k] for k in range(len(axes))))
    res = value_iteration_finite(plan, jnp.asarray(cost), 4, store_policies=True)

    v = np.zeros([len(a) for a in axes])
    pols = []
    for _ in range(4):
        v, a = np_backup(v, axes, next_states, cost)
        pols.append(a)
    np.testing.assert_allclose(np.asarray(res.values), v, rtol=5e-4, atol=5e-4)
    assert res.policies.shape == (4, 5, 4)
    np.testing.assert_allclose(np.asarray(res.num_sweeps), 4)
    # last sweep policy == argmin
    np.testing.assert_array_equal(np.asarray(res.policies[-1]), np.asarray(res.argmin))


def test_finite_engine_no_store_same_values():
    rng = np.random.default_rng(3)
    axes, next_states, cost = _random_problem(rng, state_shape=(5, 4), n_actions=3)
    plan = build_plan(axes, tuple(next_states[..., k] for k in range(len(axes))))
    r1 = value_iteration_finite(plan, jnp.asarray(cost), 6, store_policies=True)
    r2 = value_iteration_finite(plan, jnp.asarray(cost), 6, store_policies=False)
    np.testing.assert_array_equal(np.asarray(r1.values), np.asarray(r2.values))
    np.testing.assert_array_equal(np.asarray(r1.argmin), np.asarray(r2.argmin))


def test_converged_engine_early_stop():
    # contractive problem: next state = 0.5 x (within grid), cost time-invariant
    ax = np.linspace(-1, 1, 9).astype(np.float32)
    q = (0.5 * ax)[:, None] + np.zeros((1, 2), np.float32)
    cost = np.stack([ax**2, ax**2 + 0.1], axis=-1).astype(np.float32)
    plan = build_plan((ax,), (q,))
    res = value_iteration_converged(plan, jnp.asarray(cost), 2000, check_every=50, tol=1e-2)
    assert bool(res.converged)
    assert int(res.num_sweeps) < 2000
    # converged values satisfy the Bellman equation
    chk = bellman_backup(res.values, plan, jnp.asarray(cost))
    np.testing.assert_allclose(np.asarray(chk.values), np.asarray(res.values), atol=2e-2)
    # action 0 strictly dominates
    assert np.all(np.asarray(res.argmin) == 0)


def test_engines_jit_compatible():
    ax = np.linspace(-1, 1, 9).astype(np.float32)
    q = (0.5 * ax)[:, None] + np.zeros((1, 2), np.float32)
    cost = np.stack([ax**2, ax**2 + 0.1], axis=-1).astype(np.float32)
    plan = build_plan((ax,), (q,))
    f = jax.jit(lambda p, c: value_iteration_finite(p, c, 10).values)
    np.testing.assert_allclose(
        np.asarray(f(plan, jnp.asarray(cost))),
        np.asarray(value_iteration_finite(plan, jnp.asarray(cost), 10).values),
        rtol=1e-6,
    )


def test_finite_rejects_too_narrow_policy_dtype():
    """An explicit policy_dtype that cannot hold the action count must
    raise instead of silently wrapping the returned argmin (the no-store
    carry is held in the narrow dtype)."""
    import jax.numpy as jnp
    import pytest

    from ocdp_tpu.engine import value_iteration_finite
    from ocdp_tpu.models import kirk

    p = kirk.build(kirk.KirkConfig(N=4, dx=8, du=300))
    with pytest.raises(ValueError, match="cannot hold"):
        value_iteration_finite(p.plan, p.stage_cost, 2,
                               store_policies=False,
                               policy_dtype=jnp.uint8)
