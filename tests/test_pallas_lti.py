"""Pallas LTI (Kirk-shape) kernel == gather backup (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ocdp_tpu.models import kirk
from ocdp_tpu.ops.backup import bellman_backup
from ocdp_tpu.ops.pallas_lti import build_pallas_lti_backup


@pytest.mark.parametrize("dx,du,chunk", [(20, 20, 10), (24, 30, 30)])
def test_lti_kernel_matches_gather(dx, du, chunk):
    cfg = kirk.KirkConfig(N=8, dx=dx, du=du)
    p = kirk.build(cfg)
    pb = build_pallas_lti_backup(cfg, u_chunk=chunk)
    v = jnp.asarray(np.random.default_rng(0).normal(size=(dx, dx)), jnp.float32)
    got = pb(v)
    ref = bellman_backup(v, p.plan, p.stage_cost)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=2e-5, atol=2e-5)
    assert (np.asarray(got.argmin) == np.asarray(ref.argmin)).mean() > 0.999


def test_lti_kernel_in_engine_solves_kirk():
    from ocdp_tpu.engine import value_iteration_finite

    cfg = kirk.KirkConfig(N=10, dx=16, du=12)
    p = kirk.build(cfg)
    pb = build_pallas_lti_backup(cfg, u_chunk=12)
    ref = value_iteration_finite(p.plan, p.stage_cost, 9)
    got = value_iteration_finite(p.plan, p.stage_cost, 9, backup=pb)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(got.argmin) == np.asarray(ref.argmin)).mean() > 0.995
