"""Shear-gather backup (ops/sheargather.py) vs the gather oracle.

Must reproduce multilinear interpolation + MATLAB extrapolation (unclamped
fracs, test/Dynamic_Solver.m:207) + flat first-min argmin (:209) exactly —
including lattice upsampling on axes whose shear slope exceeds 1 (Kirk
axis 1: a22 = 1.1591 would otherwise skip corner indices), per-chunk window
shifts, and boundary-extrapolating queries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocdp_tpu import value_iteration_finite
from ocdp_tpu.models import kirk
from ocdp_tpu.ops.backup import bellman_backup
from ocdp_tpu.ops.sheargather import build_sheargather_backup


@pytest.fixture(scope="module")
def golden_problem():
    return kirk.build(kirk.KirkConfig.golden())


def test_single_sweep_matches_gather(golden_problem):
    p = golden_problem
    sg = build_sheargather_backup(p.plan, p.stage_cost, action_chunk=10)
    assert sg.upsample == (1, 2)   # a11 = 0.9974 -> 1; a22 = 1.1591 -> 2
    v = jax.random.uniform(jax.random.PRNGKey(0), p.plan.grid_shape,
                           jnp.float32)
    ref = bellman_backup(v, p.plan, p.stage_cost)
    out = jax.jit(lambda b, v_: b(v_))(sg, v)
    np.testing.assert_allclose(np.asarray(out.values), np.asarray(ref.values),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.argmin),
                                  np.asarray(ref.argmin))


@pytest.mark.parametrize("chunk", [4, 5, 10])
def test_chunk_sizes_agree(golden_problem, chunk):
    p = golden_problem
    sg = build_sheargather_backup(p.plan, p.stage_cost, action_chunk=chunk)
    v = jax.random.uniform(jax.random.PRNGKey(1), p.plan.grid_shape,
                           jnp.float32)
    ref = bellman_backup(v, p.plan, p.stage_cost)
    out = jax.jit(lambda b, v_: b(v_))(sg, v)
    np.testing.assert_array_equal(np.asarray(out.argmin),
                                  np.asarray(ref.argmin))


def test_band_budget_guard(golden_problem):
    """A chunk so wide the within-chunk action drift exceeds the search
    band must raise, pointing the caller back at the banded stencil."""
    p = golden_problem
    with pytest.raises(ValueError, match="band|match"):
        build_sheargather_backup(p.plan, p.stage_cost, action_chunk=50,
                                 max_band=5)


def test_engine_solve_matches_gather(golden_problem):
    p = golden_problem
    sg = build_sheargather_backup(p.plan, p.stage_cost, action_chunk=10)
    ref = value_iteration_finite(p.plan, p.stage_cost, 20)
    got = jax.jit(lambda plan, cost, b: value_iteration_finite(
        plan, cost, 20, backup=b))(p.plan, p.stage_cost, sg)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=2e-5, atol=2e-4)
    pol_ref = np.asarray(ref.policies)
    pol_got = np.asarray(got.policies)
    # f32 near-ties may flip by one control step; everything else is exact
    assert (pol_ref != pol_got).mean() < 1e-3


@pytest.mark.slow
def test_full_workload_geometry_builds():
    """The full Kirk workload (100x100x1000) must fit the shear model —
    this is the bench fast path (test/Dynamic_Solver.m:49-63)."""
    p = kirk.build(kirk.KirkConfig())
    sg = build_sheargather_backup(p.plan, p.stage_cost, action_chunk=20)
    assert sg.upsample == (1, 2)
    v = jax.random.uniform(jax.random.PRNGKey(2), p.plan.grid_shape,
                           jnp.float32)
    ref = bellman_backup(v, p.plan, p.stage_cost)
    out = jax.jit(lambda b, v_: b(v_))(sg, v)
    np.testing.assert_allclose(np.asarray(out.values),
                               np.asarray(ref.values),
                               rtol=1e-6, atol=1e-5)
    # the weight algebra is the oracle's, but XLA's FMA-contraction choices
    # differ between the two programs, so exact f32 ties in the oracle can
    # flip to the adjacent control by 1 ulp (same caveat as the matref
    # parity ledger); anything beyond rare near-ties is a real bug
    assert (np.asarray(out.argmin) != np.asarray(ref.argmin)).mean() < 5e-4
