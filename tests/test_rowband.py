"""Row-band 2-D backup (ops/rowband.py): oracle parity on the attitude-axis
geometry, exactness at clamped/extrapolating edges, structure rejection and
auto fallback.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ocdp_tpu.grids import Grid, linspace_axis
from ocdp_tpu.ops.backup import bellman_backup
from ocdp_tpu.ops.interp import build_plan
from ocdp_tpu.ops.rowband import RowBandStructureError, build_rowband_backup


def axis_problem(n_w=80, n_t=40, w_max=0.9, t_max=0.3, h=0.01, J=0.021):
    """A scaled-down attitude axis: w' = w + h*u/J (per-action shift),
    t' = t + h*w (row-dependent lane shift) — same geometry class as
    attitude-control/Solver_attitude.m:236-247."""
    s_w = linspace_axis(-w_max, w_max, n_w)
    s_t = linspace_axis(-t_max, t_max, n_t)
    grid = Grid((s_w, s_t))
    w = jnp.asarray(s_w)[:, None, None]
    t = jnp.asarray(s_t)[None, :, None]
    u = jnp.asarray([-0.11, 0.0, 0.11])[None, None, :]
    plan = build_plan(grid.axes, (w + h * u / J, t + h * w))
    cost = 5.0 * w**2 + 10.0 * t**2 + 0.5 * u**2
    cost = jnp.broadcast_to(cost, plan.query_shape)
    return plan, cost


def test_matches_gather_oracle_multi_sweep():
    """30 sweeps: values to f32 rounding, argmin EXACT vs the oracle —
    including the clamped/extrapolating edge rows and lanes."""
    plan, cost = axis_problem()
    rb = build_rowband_backup(plan, cost)
    assert len(rb.bands) >= 2          # real per-row lane-shift structure
    assert any(s != 0 for s in rb.shifts)
    v = vo = jnp.zeros(plan.grid_shape, jnp.float32)
    for i in range(30):
        r = rb(v)
        o = bellman_backup(vo, plan, cost)
        np.testing.assert_allclose(np.asarray(r.values), np.asarray(o.values),
                                   rtol=2e-6, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(r.argmin),
                                      np.asarray(o.argmin))
        v, vo = r.values, o.values


def test_large_shifts_and_asymmetric_grid():
    """Coarse grid -> multi-cell lane shifts in both directions (16 row
    bands, pads 8/7), heavy edge clamping; still exact vs the oracle."""
    plan, cost = axis_problem(n_w=28, n_t=18, w_max=2.3, t_max=0.053, h=0.021)
    rb = build_rowband_backup(plan, cost)
    assert len(rb.bands) > 8 and rb.pad_lo >= 5 and rb.pad_hi >= 5
    v = jnp.asarray(np.random.default_rng(0).normal(
        size=plan.grid_shape).astype(np.float32))
    r = rb(v)
    o = bellman_backup(v, plan, cost)
    np.testing.assert_allclose(np.asarray(r.values), np.asarray(o.values),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(r.argmin), np.asarray(o.argmin))


def test_rejects_f32_boundary_wobble():
    """Coarse grids can put queries ON cell boundaries where f32 rounding
    breaks the per-row constant-shift identity by one lane — those plans
    must be rejected (the auto path then uses the stencil), never served
    approximately."""
    plan, cost = axis_problem(n_w=24, n_t=16, w_max=2.0, t_max=0.05, h=0.02)
    with pytest.raises(RowBandStructureError):
        build_rowband_backup(plan, cost)


def test_rejects_cross_coupled_queries():
    """Kirk-style dynamics (axis-0 query depends on axis 1) must raise."""
    from ocdp_tpu.models import kirk

    p = kirk.build(kirk.KirkConfig.golden())
    with pytest.raises(RowBandStructureError):
        build_rowband_backup(p.plan, p.stage_cost)


def test_rejects_action_coupled_lane_queries():
    """Axis-1 queries that vary with the action must raise."""
    s = linspace_axis(-1.0, 1.0, 12)
    grid = Grid((s, s))
    x = jnp.asarray(s)[:, None, None]
    y = jnp.asarray(s)[None, :, None]
    u = jnp.asarray([-0.1, 0.1])[None, None, :]
    plan = build_plan(grid.axes, (x + 0.01 * u, y + 0.01 * u))
    cost = jnp.broadcast_to(x**2 + y**2 + u**2, plan.query_shape)
    with pytest.raises(RowBandStructureError):
        build_rowband_backup(plan, cost)


def test_solve_simplified_rowband_matches_stencil():
    """Engine integration + the auto path's equivalence: impl='rowband'
    equals impl='stencil' to f32 rounding on a short solve."""
    from ocdp_tpu.models import attitude

    cfg = attitude.AttitudeConfig(n_mesh_w=120, n_mesh_t=60)
    a = attitude.solve_simplified(cfg, num_sweeps=120, impl="rowband")
    b = attitude.solve_simplified(cfg, num_sweeps=120, impl="stencil")
    for va, vb, ta, tb in zip(a.values, b.values, a.u_tables, b.u_tables):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-5, atol=1e-4)
        assert (np.asarray(ta) == np.asarray(tb)).mean() > 0.999


def test_clamped_edge_plan_is_stable_at_full_horizon():
    """The reference's extrapolating semantics DIVERGE at edge cells whose
    dynamics exit the grid (observed with the gather oracle itself on the
    roll axis at the reference's 5999-sweep horizon: the linear-extrapolation
    weights make the backup locally expansive, ~13x/sweep once rounding
    flips the argmin). The shipping default (edge='clamp') projects those
    queries onto the boundary: weights stay in [0,1], so the full-horizon
    solve is unconditionally non-negative and finite."""
    import jax

    from ocdp_tpu.engine import value_iteration_finite
    from ocdp_tpu.models.attitude import AttitudeConfig, _quirk

    cfg = AttitudeConfig()
    i = 2                                  # roll: the observed-divergent axis
    deg = np.pi / 180.0
    t_lo, t_hi = cfg.euler_ranges[i]
    s_w = linspace_axis(cfg.w_min_deg * deg, cfg.w_max_deg * deg,
                        cfg.n_mesh_w)
    s_t = linspace_axis(t_lo, t_hi, cfg.n_mesh_t)
    J = cfg.inertia_diag[i]
    w = jnp.asarray(s_w)[:, None, None]
    t = jnp.asarray(s_t)[None, :, None]
    u = jnp.asarray(cfg.u_vector)[None, None, :]
    plan = build_plan((s_w, s_t), (w + cfg.h * u / J,
                                   t + cfg.h * w * _quirk(cfg.h, True)),
                      edge="clamp")
    cost = jnp.broadcast_to(cfg.Qw[i] * w**2 + cfg.Qq[i] * t**2
                            + cfg.R[i] * u**2, plan.query_shape)
    rb = build_rowband_backup(plan, cost)
    res = jax.jit(lambda p_, c_: value_iteration_finite(
        p_, c_, cfg.n_stage - 1, store_policies=False, backup=rb))(plan, cost)
    v = np.asarray(res.values)
    assert np.isfinite(v).all()
    assert v.min() >= 0.0


def test_rejects_nonuniform_axis():
    """A non-uniform omega axis breaks the constant-shift structure (the
    solve_simplified auto path falls back to the stencil on this error)."""
    # non-uniform omega axis breaks the constant-shift structure
    s_w = np.concatenate([np.linspace(-0.9, 0.0, 40),
                          np.linspace(0.0, 0.9, 41)[1:]]).astype(np.float32)
    s_w = np.sign(s_w) * s_w**2  # quadratic spacing
    s_t = linspace_axis(-0.3, 0.3, 40)
    w = jnp.asarray(s_w)[:, None, None]
    t = jnp.asarray(s_t)[None, :, None]
    u = jnp.asarray([-0.11, 0.0, 0.11])[None, None, :]
    plan2 = build_plan((s_w, s_t), (w + 0.01 * u / 0.021, t + 0.01 * w))
    cost2 = jnp.broadcast_to(5.0 * w**2 + 10.0 * t**2 + 0.5 * u**2,
                             plan2.query_shape)
    with pytest.raises(RowBandStructureError):
        build_rowband_backup(plan2, cost2)
