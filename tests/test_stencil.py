"""Stencil (gather-free) backup == gather backup == float64 oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from ocdp_tpu import bellman_backup, value_iteration_finite
from ocdp_tpu.models import kirk
from ocdp_tpu.ops.stencil import build_stencil_backup

from oracle import bellman_backup as oracle_backup


@pytest.mark.parametrize("chunk", [None, 10, 50])
def test_stencil_matches_gather_kirk(chunk):
    problem = kirk.build(kirk.KirkConfig(N=10, dx=20, du=50))
    sb = build_stencil_backup(problem.plan, problem.stage_cost,
                              action_chunk=chunk)
    v = jnp.asarray(np.random.default_rng(0).normal(size=(20, 20)), jnp.float32)
    ref = bellman_backup(v, problem.plan, problem.stage_cost)
    got = sb(v)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=2e-6, atol=2e-6)
    # identical first-min semantics; tolerate flips only at float near-ties
    mism = np.asarray(got.argmin) != np.asarray(ref.argmin)
    assert mism.mean() < 0.002, f"argmin mismatch {mism.mean():.4%}"


def test_stencil_matches_oracle():
    problem = kirk.build(kirk.KirkConfig(N=5, dx=8, du=9))
    sb = build_stencil_backup(problem.plan, problem.stage_cost, action_chunk=3)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(8, 8)).astype(np.float32)
    got = sb(jnp.asarray(v))

    axes = problem.grid.axes
    x1 = axes[0][:, None, None]
    x2 = axes[1][None, :, None]
    u = problem.u_mesh[None, None, :]
    cfg = problem.config
    (a11, a12), (a21, a22) = cfg.A
    b1, b2 = cfg.B
    q = np.stack(np.broadcast_arrays(a11 * x1 + a12 * x2 + b1 * u,
                                     a21 * x1 + a22 * x2 + b2 * u), axis=-1)
    cost = np.asarray(problem.stage_cost)
    v_ref, arg_ref = oracle_backup(v.astype(np.float64), axes, q, cost)
    np.testing.assert_allclose(np.asarray(got.values), v_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.argmin), arg_ref)


def test_engine_with_stencil_backup_matches_default():
    problem = kirk.build(kirk.KirkConfig(N=12, dx=16, du=20))
    sb = build_stencil_backup(problem.plan, problem.stage_cost, action_chunk=10)
    ref = value_iteration_finite(problem.plan, problem.stage_cost, 11,
                                 store_policies=True)
    got = value_iteration_finite(problem.plan, problem.stage_cost, 11,
                                 store_policies=True, backup=sb)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=1e-5, atol=1e-5)
    agree = (np.asarray(got.policies) == np.asarray(ref.policies)).mean()
    assert agree > 0.995


def test_per_chunk_base_below_global_band_no_clamp():
    """Regression: a chunk whose base is smaller than another chunk's low
    residual band used to produce a negative window start; dynamic_slice
    clamped it and silently shifted the live taps. Engineered 1-D plan:
    chunk A offsets ~0..2, chunk B offsets ~10..30 (base ~20, residual
    +-10), so A's stored start = base_A + global t_lo < 0 without the
    low-pad extension."""
    import jax.numpy as jnp
    import numpy as np

    from ocdp_tpu.ops.backup import bellman_backup
    from ocdp_tpu.ops.interp import build_plan

    axis = np.arange(64, dtype=np.float32)
    x = jnp.arange(64, dtype=jnp.float32)[:, None]
    q = jnp.concatenate([x + 0.4,                      # chunk A: offset 0
                         10.0 + x * (1.0 + 20.0 / 63.0)], axis=1)
    plan = build_plan([axis], (q,))
    cost = jnp.zeros((64, 2), jnp.float32)
    sb = build_stencil_backup(plan, cost, action_chunk=1)
    v = jnp.asarray(np.random.default_rng(3).normal(size=64), jnp.float32)
    ref = bellman_backup(v, plan, cost)
    got = sb(v)
    # 1-ulp weight-formula noise vs the oracle is expected; the clamp bug
    # this guards against produced errors of O(1)
    np.testing.assert_allclose(np.asarray(got.values),
                               np.asarray(ref.values),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.argmin),
                                  np.asarray(ref.argmin))
