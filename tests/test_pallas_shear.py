"""Pallas shear-gather kernel (ops/pallas_shear.py) vs the gather oracle.

Interpret mode on CPU; the compiled-Mosaic path is validated on hardware
(NOTES.md round 2: bitwise argmin parity on-chip, 5.5e9 evals/s).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocdp_tpu import value_iteration_finite
from ocdp_tpu.models import kirk
from ocdp_tpu.ops.backup import bellman_backup
from ocdp_tpu.ops.pallas_shear import build_pallas_shear_backup


@pytest.fixture(scope="module")
def golden_problem():
    return kirk.build(kirk.KirkConfig.golden())


def test_single_sweep_matches_gather(golden_problem):
    p = golden_problem
    bk = build_pallas_shear_backup(p.plan, p.stage_cost, action_chunk=10)
    v = jax.random.uniform(jax.random.PRNGKey(0), p.plan.grid_shape,
                           jnp.float32)
    ref = bellman_backup(v, p.plan, p.stage_cost)
    out = jax.jit(lambda b, v_: b(v_))(bk, v)
    np.testing.assert_allclose(np.asarray(out.values), np.asarray(ref.values),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.argmin),
                                  np.asarray(ref.argmin))


def test_first_min_across_chunks(golden_problem):
    """Chunk-boundary tie-breaking: smaller chunks exercise the
    across-chunk strict-< combine in the revisited output block."""
    p = golden_problem
    bk = build_pallas_shear_backup(p.plan, p.stage_cost, action_chunk=5)
    v = jax.random.uniform(jax.random.PRNGKey(1), p.plan.grid_shape,
                           jnp.float32)
    ref = bellman_backup(v, p.plan, p.stage_cost)
    out = jax.jit(lambda b, v_: b(v_))(bk, v)
    np.testing.assert_array_equal(np.asarray(out.argmin),
                                  np.asarray(ref.argmin))


def test_engine_solve_matches_gather(golden_problem):
    p = golden_problem
    bk = build_pallas_shear_backup(p.plan, p.stage_cost, action_chunk=10)
    ref = value_iteration_finite(p.plan, p.stage_cost, 15)
    got = jax.jit(lambda plan, cost, b: value_iteration_finite(
        plan, cost, 15, backup=b))(p.plan, p.stage_cost, bk)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=2e-5, atol=2e-4)
    assert (np.asarray(ref.policies)
            != np.asarray(got.policies)).mean() < 1e-3


def test_separable_cost_bitwise(golden_problem):
    """cost_terms mode (state + action split re-added in-kernel) is
    bitwise equal to the full cost stack, and a wrong split is rejected
    at build."""
    from ocdp_tpu.models.kirk import _separable_cost_terms

    p = golden_problem
    ct = _separable_cost_terms(kirk.KirkConfig.golden())
    bk = build_pallas_shear_backup(p.plan, p.stage_cost, action_chunk=10,
                                   cost_terms=ct)
    bk_full = build_pallas_shear_backup(p.plan, p.stage_cost,
                                        action_chunk=10)
    v = jax.random.uniform(jax.random.PRNGKey(2), p.plan.grid_shape,
                           jnp.float32)
    out = jax.jit(lambda b, v_: b(v_))(bk, v)
    ref = jax.jit(lambda b, v_: b(v_))(bk_full, v)
    np.testing.assert_array_equal(np.asarray(out.values),
                                  np.asarray(ref.values))
    np.testing.assert_array_equal(np.asarray(out.argmin),
                                  np.asarray(ref.argmin))

    bad = (ct[0] + 1e-3, ct[1])
    with pytest.raises(ValueError, match="recompose"):
        build_pallas_shear_backup(p.plan, p.stage_cost, action_chunk=10,
                                  cost_terms=bad)


@pytest.mark.slow
def test_solve_impl_pallas(golden_problem):
    """kirk.solve(impl='pallas') routes to the kernel and matches the
    stencil solve's rollout."""
    sol_p = kirk.solve(kirk.KirkConfig.golden(), impl="pallas")
    sol_s = kirk.solve(kirk.KirkConfig.golden())
    Xp, Up = kirk.optimal_path(sol_p, (2.0, 1.0))
    Xs, Us = kirk.optimal_path(sol_s, (2.0, 1.0))
    np.testing.assert_allclose(np.asarray(Up), np.asarray(Us), atol=1e-3)
