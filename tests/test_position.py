"""Position model tests: channel-batched VI vs oracle; rollout sanity."""

import numpy as np
import pytest

from ocdp_tpu.models import position
from oracle import bellman_backup as oracle_backup


def small_cfg(**kw):
    base = dict(n_mesh_x=12, n_mesh_v=12, T_final=0.1, h=0.005,
                Qx=(6.0, 5.0, 4.0), Qv=(6.0, 6.0, 6.0), R=(0.1, 0.2, 0.3))
    base.update(kw)
    return position.PositionConfig(**base)


@pytest.mark.parametrize("impl", ["gather", "stencil"])
def test_channels_match_per_channel_oracle(impl):
    cfg = small_cfg()
    sol = position.solve(cfg, num_sweeps=8, impl=impl)
    got_v = np.asarray(sol.result.values)
    got_u = np.asarray(sol.u_tables)

    prob = sol.problem
    s_x, s_v = prob.grid.axes[1], prob.grid.axes[2]
    c_h = 1 + cfg.h / 2 + cfg.h**2 / 6 + cfg.h**3 / 24
    u_vec = cfg.u_vector
    for c in range(3):
        x = s_x.astype(np.float64)[:, None, None]
        v = s_v.astype(np.float64)[None, :, None]
        u = u_vec.astype(np.float64)[None, None, :]
        nxt = np.stack(np.broadcast_arrays(x + cfg.h * v * c_h,
                                           v + cfg.h * u / cfg.mass), axis=-1)
        cost = cfg.Qx[c] * x**2 + cfg.Qv[c] * v**2 + cfg.R[c] * u**2
        cost = np.broadcast_to(cost, nxt.shape[:-1])
        vv = np.zeros((len(s_x), len(s_v)))
        for _ in range(8):
            vv, aa = oracle_backup(vv, (s_x, s_v), nxt, cost)
        np.testing.assert_allclose(got_v[c], vv, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got_u[c], u_vec[aa], atol=1e-6)


def test_sym_grid_has_exact_zero():
    prob = position.build(small_cfg())
    for ax in prob.grid.axes[1:]:
        assert (ax == 0.0).sum() == 1
        assert len(ax) == 13  # 12 -> 2*ceil(12/2)+1


def test_rollout_regulates_toward_origin():
    # stronger solve so the policy is meaningful on a coarse grid
    cfg = position.PositionConfig(n_mesh_x=40, n_mesh_v=40, T_final=30.0)
    sol = position.solve(cfg, num_sweeps=400)
    T, X, U = position.get_optimal_path(
        sol, (-0.4, 0.1, 0.05, 0.0, 0.0, 0.0), t_final=6.0)
    X = np.asarray(X)
    U = np.asarray(U)
    assert np.all(np.isfinite(X))
    assert np.isin(np.round(U.astype(np.float64), 4),
                   [-0.26, 0.0, 0.26]).all()
    # position error must shrink substantially from |x0|=0.4
    assert np.abs(X[-1, 0]) < 0.2


def test_rollout_controls_match_policy_lookup():
    """Trajectory-level oracle check: every applied control must equal a
    numpy nearest-neighbor lookup of the solved table at the rolled state
    (Solver_position.m:210-215 policy wiring), not merely lie in the
    admissible set."""
    cfg = position.PositionConfig(n_mesh_x=24, n_mesh_v=24, T_final=30.0)
    sol = position.solve(cfg, num_sweeps=200)
    T, X, U = position.get_optimal_path(
        sol, (-0.3, 0.05, 0.02, 0.0, 0.0, 0.0), t_final=2.0)
    X = np.asarray(X, np.float64)
    U = np.asarray(U, np.float64)
    tables = np.asarray(sol.u_tables, np.float64)
    axes = [np.asarray(a, np.float64) for a in sol.problem.grid.axes[1:]]

    def nearest(ax, q):
        lo = int(np.clip(np.searchsorted(ax, q, side="right") - 1, 0,
                         len(ax) - 2))
        return lo + 1 if (q - ax[lo]) > (ax[lo + 1] - q) else lo

    for k in range(U.shape[0]):
        for c in range(3):
            i = nearest(axes[0], X[k, c])
            j = nearest(axes[1], X[k, 3 + c])
            np.testing.assert_allclose(U[k, c], tables[c, i, j], atol=1e-5)
