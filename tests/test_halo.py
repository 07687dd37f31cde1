"""Halo-exchange sharded engine == single-chip stencil engine (bitwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ocdp_tpu import value_iteration_finite
from ocdp_tpu.models import kirk
from ocdp_tpu.ops.stencil import build_stencil_backup
from ocdp_tpu.parallel.halo import value_iteration_finite_halo


@pytest.mark.parametrize("store", [False, True])
def test_halo_matches_single_chip_stencil(store):
    problem = kirk.build(kirk.KirkConfig(N=10, dx=24, du=20))
    sb = build_stencil_backup(problem.plan, problem.stage_cost, action_chunk=10)
    ref = value_iteration_finite(problem.plan, problem.stage_cost, 9,
                                 store_policies=store, backup=sb)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("s",))
    got = value_iteration_finite_halo(problem.plan, problem.stage_cost, 9,
                                      mesh, action_chunk=10,
                                      store_policies=store)
    np.testing.assert_array_equal(np.asarray(got.values), np.asarray(ref.values))
    np.testing.assert_array_equal(np.asarray(got.argmin), np.asarray(ref.argmin))
    if store:
        np.testing.assert_array_equal(np.asarray(got.policies),
                                      np.asarray(ref.policies))


@pytest.mark.parametrize("store", [False, True])
def test_halo_2d_state_action_mesh_matches_single_chip(store):
    """CP(halo) x TP(action) composition: 4 row shards x 2 action shards.
    Values bitwise; argmin preserves global first-min across action
    shards."""
    problem = kirk.build(kirk.KirkConfig(N=10, dx=24, du=20))
    sb = build_stencil_backup(problem.plan, problem.stage_cost,
                              action_chunk=10)
    ref = value_iteration_finite(problem.plan, problem.stage_cost, 9,
                                 store_policies=store, backup=sb)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("s", "a"))
    got = value_iteration_finite_halo(problem.plan, problem.stage_cost, 9,
                                      mesh, action_axis_name="a",
                                      action_chunk=10, store_policies=store)
    np.testing.assert_array_equal(np.asarray(got.values),
                                  np.asarray(ref.values))
    np.testing.assert_array_equal(np.asarray(got.argmin),
                                  np.asarray(ref.argmin))
    if store:
        np.testing.assert_array_equal(np.asarray(got.policies),
                                      np.asarray(ref.policies))


def test_halo_2d_mesh_rejects_indivisible_chunks():
    problem = kirk.build(kirk.KirkConfig(N=6, dx=16, du=9))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("s", "a"))
    with pytest.raises(ValueError, match="do not divide"):
        value_iteration_finite_halo(problem.plan, problem.stage_cost, 3,
                                    mesh, action_axis_name="a",
                                    action_chunk=3)


def test_halo_precomputed_weights_and_factorized_cost():
    cfg = kirk.KirkConfig(N=8, dx=16, du=10)
    problem = kirk.build(cfg)
    s = problem.grid.axes[0]
    x1 = jnp.asarray(s)[:, None, None]
    x2 = jnp.asarray(s)[None, :, None]
    u = jnp.asarray(problem.u_mesh)[None, None, :]
    terms = (cfg.Q[0] * x1**2, cfg.Q[1] * x2**2, cfg.R * u**2)
    sb = build_stencil_backup(problem.plan, terms, action_chunk=5,
                              weight_mode="precomputed")
    ref = value_iteration_finite(problem.plan, terms, 7, backup=sb)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("s",))
    got = value_iteration_finite_halo(problem.plan, terms, 7, mesh,
                                      action_chunk=5,
                                      weight_mode="precomputed")
    # separate XLA compilations may contract mul+add to FMA differently;
    # agreement is to 1 ulp, argmin may flip only at exact float near-ties
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=5e-6, atol=5e-6)
    assert (np.asarray(got.argmin) == np.asarray(ref.argmin)).mean() > 0.999


def test_halo_rejects_too_wide_halo():
    # axis-0 reach of 8 cells > per-device block height of 2
    from ocdp_tpu.ops.interp import build_plan

    axes = (np.linspace(0, 1, 16, dtype=np.float32),)
    q = (np.linspace(0, 1, 16, dtype=np.float32) + 0.5)[:, None]
    plan = build_plan(axes, (np.broadcast_to(q, (16, 3)),))
    cost = jnp.zeros((16, 3), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("s",))
    with pytest.raises(ValueError, match="halo widths"):
        value_iteration_finite_halo(plan, cost, 3, mesh, action_chunk=3)
