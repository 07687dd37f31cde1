"""Pallas 2-D backup kernel == gather backup (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ocdp_tpu.grids import Grid, linspace_axis
from ocdp_tpu.ops.backup import bellman_backup
from ocdp_tpu.ops.interp import build_plan
from ocdp_tpu.ops.pallas_backup import build_pallas_backup_2d

DEG = np.pi / 180


def make_problem(n1, n2, J=0.0285, u_max=0.11, h=0.005):
    s_w = linspace_axis(-50 * DEG, 50 * DEG, n1)
    s_t = linspace_axis(-30 * DEG, 30 * DEG, n2)
    grid = Grid((s_w, s_t))
    w = jnp.asarray(s_w)[:, None, None]
    t = jnp.asarray(s_t)[None, :, None]
    u = jnp.asarray(np.array([-u_max, 0, u_max], np.float32))[None, None, :]
    plan = build_plan(grid.axes, (w + h * u / J, t + h * w))
    cost = 6 * w**2 + 6 * t**2 + 4 * u**2
    return grid, plan, cost


@pytest.mark.parametrize("n1,n2", [(64, 128), (17, 40)])  # tiled + whole-array
def test_pallas_matches_gather(n1, n2):
    grid, plan, cost = make_problem(n1, n2)
    pb = build_pallas_backup_2d(plan, cost)
    v = jnp.asarray(np.random.default_rng(0).normal(size=grid.shape),
                    jnp.float32)
    got = pb(v)
    ref = bellman_backup(v, plan, cost)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=3e-6, atol=3e-6)
    np.testing.assert_array_equal(np.asarray(got.argmin), np.asarray(ref.argmin))


def test_pallas_in_engine():
    from ocdp_tpu.engine import value_iteration_finite

    grid, plan, cost = make_problem(16, 24)
    pb = build_pallas_backup_2d(plan, cost)
    ref = value_iteration_finite(plan, cost, 6)
    got = value_iteration_finite(plan, cost, 6, backup=pb)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.argmin) == np.asarray(ref.argmin)).mean() > 0.999


def test_pallas_rejects_3d():
    from ocdp_tpu.models import position

    p = position.build(position.PositionConfig(n_mesh_x=8, n_mesh_v=8))
    with pytest.raises(ValueError, match="2-D"):
        build_pallas_backup_2d(p.plan, p.stage_cost)
