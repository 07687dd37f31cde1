"""Base-gather backup (ops/basegather.py) vs the gather oracle.

Must reproduce multilinear interpolation + MATLAB extrapolation + flat
first-min argmin exactly — including across chunk boundaries and at
boundary-extrapolating queries (the taps whose clamping inflates the banded
stencil, NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocdp_tpu import value_iteration_finite
from ocdp_tpu.models import kirk
from ocdp_tpu.ops.backup import bellman_backup
from ocdp_tpu.ops.basegather import build_basegather_backup


@pytest.fixture(scope="module")
def golden_problem():
    return kirk.build(kirk.KirkConfig.golden())


def test_single_sweep_matches_gather(golden_problem):
    p = golden_problem
    bg = build_basegather_backup(p.plan, p.stage_cost, action_chunk=10)
    v = jax.random.uniform(jax.random.PRNGKey(0), p.plan.grid_shape,
                           jnp.float32)
    ref = bellman_backup(v, p.plan, p.stage_cost)
    out = jax.jit(lambda b, v: b(v))(bg, v)
    np.testing.assert_allclose(np.asarray(out.values), np.asarray(ref.values),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.argmin),
                                  np.asarray(ref.argmin))


@pytest.mark.parametrize("chunk", [10, 25, 50])
def test_chunk_sizes_agree(golden_problem, chunk):
    p = golden_problem
    bg = build_basegather_backup(p.plan, p.stage_cost, action_chunk=chunk)
    v = jax.random.uniform(jax.random.PRNGKey(1), p.plan.grid_shape,
                           jnp.float32)
    ref = bellman_backup(v, p.plan, p.stage_cost)
    out = jax.jit(lambda b, v: b(v))(bg, v)
    np.testing.assert_array_equal(np.asarray(out.argmin),
                                  np.asarray(ref.argmin))


def test_combo_budget_guard(golden_problem):
    """A combo count past the budget must raise, pointing the caller back
    at the banded stencil. (Joint-live pruning keeps Kirk's correlated
    geometry compact, so the budget is tightened explicitly here.)"""
    p = golden_problem
    with pytest.raises(ValueError, match="combos"):
        build_basegather_backup(p.plan, p.stage_cost, action_chunk=100,
                                max_combos=8)


def test_engine_solve_matches_gather(golden_problem):
    p = golden_problem
    bg = build_basegather_backup(p.plan, p.stage_cost, action_chunk=10)
    ref = value_iteration_finite(p.plan, p.stage_cost, 20)
    got = jax.jit(
        lambda b: value_iteration_finite(p.plan, p.stage_cost, 20, backup=b)
    )(bg)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=1e-5, atol=1e-4)
    agree = (np.asarray(got.argmin) == np.asarray(ref.argmin)).mean()
    assert agree > 0.999


def test_kirk_solve_impl_basegather_matches_reference_golden():
    """Full pipeline via kirk.solve(impl='basegather') against the
    reference's extracted obj_1.mat arrays."""
    import os

    ref_path = os.path.join(os.path.dirname(__file__), "golden",
                            "obj1_reference.npz")
    sol = kirk.solve(kirk.KirkConfig.golden(), impl="basegather")
    with np.load(ref_path) as z:
        np.testing.assert_allclose(np.asarray(sol.result.values),
                                   z["J_star"][:, :, 0], rtol=1e-4, atol=1e-2)


def test_position_shape_works_too():
    """basegather is problem-agnostic: a 3-D (channel, x, v) plan with only
    3 actions still matches the oracle (chunk = all actions)."""
    from ocdp_tpu.models import position

    p = position.build(position.PositionConfig(n_mesh_x=12, n_mesh_v=12))
    bg = build_basegather_backup(p.plan, p.stage_cost, action_chunk=3)
    v = jax.random.uniform(jax.random.PRNGKey(2), p.plan.grid_shape,
                           jnp.float32)
    ref = bellman_backup(v, p.plan, p.stage_cost)
    out = jax.jit(lambda b, v: b(v))(bg, v)
    np.testing.assert_array_equal(np.asarray(out.argmin),
                                  np.asarray(ref.argmin))
    np.testing.assert_allclose(np.asarray(out.values), np.asarray(ref.values),
                               rtol=1e-6, atol=1e-5)
