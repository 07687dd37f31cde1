"""Converged (early-stopping) engines: single-chip vs sharded vs halo.

The stopping rule is the reference's periodic checksum
(pos-att/Solver_pos_att.m:268-286): every ``check_every`` sweeps compare
errorF = Δ Σ V against tol; also log errorU = Δ Σ argmin ids. The sharded
engines must make the IDENTICAL stopping decision and produce bitwise-equal
tables — the property the reference gets for free by being single-process.
"""

import jax
import numpy as np
from jax.sharding import Mesh

from ocdp_tpu import value_iteration_converged, value_iteration_finite
from ocdp_tpu.models import kirk
from ocdp_tpu.ops.stencil import build_stencil_backup
from ocdp_tpu.parallel import (
    value_iteration_converged_halo,
    value_iteration_converged_sharded,
)


def small_problem(dx=16, du=12):
    return kirk.build(kirk.KirkConfig(N=12, dx=dx, du=du))


def test_converged_stops_and_logs_checks():
    """Huge tol -> stop at the first check; the check log carries
    [k_s, errorF, errorU] for exactly one row."""
    p = small_problem()
    res = value_iteration_converged(p.plan, p.stage_cost, 20,
                                    check_every=5, tol=1e12)
    assert bool(res.converged)
    # k_s runs 20..1; first k_s % 5 == 0 is k_s=20 -> stops after 1 sweep
    assert int(res.num_sweeps) == 1
    checks = np.asarray(res.checks)
    assert checks[0, 0] == 20.0
    assert checks[0, 1] != 0.0          # errorF of the first sweep
    assert np.all(checks[1:] == 0.0)


def test_converged_to_cap_matches_finite():
    """tol=0 never stops: the converged loop to the cap equals the finite
    engine's result exactly."""
    p = small_problem()
    res_c = value_iteration_converged(p.plan, p.stage_cost, 9,
                                      check_every=4, tol=0.0)
    res_f = value_iteration_finite(p.plan, p.stage_cost, 9)
    assert not bool(res_c.converged)
    assert int(res_c.num_sweeps) == 9
    np.testing.assert_array_equal(np.asarray(res_c.values),
                                  np.asarray(res_f.values))
    np.testing.assert_array_equal(np.asarray(res_c.argmin),
                                  np.asarray(res_f.argmin))


def test_on_check_host_callback():
    """The reference's 'stage %d ... errorF %f - errorU %f' stream
    (Solver_pos_att.m:278) surfaces through jax.debug.callback."""
    p = small_problem()
    seen = []

    def on_check(k_s, err_f, err_u):
        seen.append((int(k_s), float(err_f), float(err_u)))

    res = value_iteration_converged(p.plan, p.stage_cost, 12, check_every=4,
                                    tol=0.0, on_check=on_check)
    jax.effects_barrier()
    assert [s[0] for s in seen] == [12, 8, 4]
    checks = np.asarray(res.checks)
    for i, (k_s, err_f, err_u) in enumerate(seen):
        np.testing.assert_allclose(checks[i], [k_s, err_f, err_u], rtol=1e-6)


def test_sharded_converged_matches_single(monkeypatch=None):
    for dx, du in ((16, 12), (17, 13)):   # 17/13 exercises padding
        p = small_problem(dx, du)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("s",))
        ref = value_iteration_converged(p.plan, p.stage_cost, 20,
                                        check_every=5, tol=0.0)
        got = value_iteration_converged_sharded(p.plan, p.stage_cost, 20,
                                                mesh, check_every=5, tol=0.0)
        assert int(got.num_sweeps) == int(ref.num_sweeps)
        assert bool(got.converged) == bool(ref.converged)
        np.testing.assert_array_equal(np.asarray(got.values),
                                      np.asarray(ref.values))
        np.testing.assert_array_equal(np.asarray(got.argmin),
                                      np.asarray(ref.argmin))
        np.testing.assert_array_equal(np.asarray(got.checks),
                                      np.asarray(ref.checks))


def test_sharded_converged_early_stop_decision():
    """Same stopping sweep as single-chip when the tolerance fires."""
    p = small_problem()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("s",))
    ref = value_iteration_converged(p.plan, p.stage_cost, 20,
                                    check_every=5, tol=1e12)
    got = value_iteration_converged_sharded(p.plan, p.stage_cost, 20,
                                            mesh, check_every=5, tol=1e12)
    assert bool(got.converged) and int(got.num_sweeps) == int(ref.num_sweeps)
    np.testing.assert_array_equal(np.asarray(got.values),
                                  np.asarray(ref.values))


def test_halo_converged_matches_single_stencil():
    p = small_problem(dx=24, du=10)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("s",))
    sb = build_stencil_backup(p.plan, p.stage_cost, action_chunk=10)
    ref = value_iteration_converged(p.plan, p.stage_cost, 12, check_every=4,
                                    tol=0.0, backup=sb)
    got = value_iteration_converged_halo(p.plan, p.stage_cost, 12, mesh,
                                         check_every=4, tol=0.0,
                                         action_chunk=10)
    assert int(got.num_sweeps) == int(ref.num_sweeps)
    np.testing.assert_array_equal(np.asarray(got.values),
                                  np.asarray(ref.values))
    np.testing.assert_array_equal(np.asarray(got.argmin),
                                  np.asarray(ref.argmin))
    # errorF sums per-shard then psums -> f32 reduction order differs from
    # the single-chip full-table sum by ~1 ulp; values/argmin stay bitwise
    np.testing.assert_allclose(np.asarray(got.checks),
                               np.asarray(ref.checks), rtol=1e-5)


def test_sharded_policies_narrow_dtype():
    """Policy stacks use the narrowest index dtype (Solver_attitude.m:189-191
    plans uint8 the same way)."""
    from ocdp_tpu.parallel import (
        value_iteration_finite_halo,
        value_iteration_finite_sharded,
    )

    p = small_problem(16, 12)   # 12 actions -> uint8
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("s",))
    got = value_iteration_finite_sharded(p.plan, p.stage_cost, 5, mesh,
                                         store_policies=True)
    assert got.policies.dtype == np.uint8
    p2 = small_problem(24, 10)
    got2 = value_iteration_finite_halo(p2.plan, p2.stage_cost, 5, mesh,
                                       action_chunk=10, store_policies=True)
    assert got2.policies.dtype == np.uint8


def test_sharded_on_check_emits_once_per_check():
    """The sharded converged engine streams each check to the host exactly
    once (gated to mesh coordinate 0), with the same rows it records in
    SolveResult.checks."""
    p = small_problem()
    mesh = Mesh(np.array(jax.devices()[:4]), ("s",))
    seen = []
    got = value_iteration_converged_sharded(
        p.plan, p.stage_cost, 20, mesh, check_every=5, tol=0.0,
        on_check=lambda k, ef, eu: seen.append(
            (float(k), float(ef), float(eu))))
    jax.effects_barrier()
    checks = np.asarray(got.checks)
    assert len(seen) == 4                      # k_s = 20, 15, 10, 5
    np.testing.assert_allclose(np.asarray(sorted(seen, reverse=True)),
                               checks, rtol=0, atol=0)


def test_relative_tolerance_stop_fires():
    """tol_mode='rel' (beyond-parity, VERDICT r3 item 5): a contraction
    whose checksum deltas shrink geometrically must stop once
    |dSumV| < tol * |SumV|, while the same run under the reference's
    absolute rule at a scale-blind tol runs to the cap."""
    import jax.numpy as jnp

    from ocdp_tpu.engine import value_iteration_converged
    from ocdp_tpu.grids import Grid, linspace_axis
    from ocdp_tpu.ops.interp import build_plan

    # odd point count => exact 0 on the grid: the zero-cost absorbing
    # state that makes undiscounted VI converge (same reason the reference
    # forces exact 0 via sym_linspace, Solver_position.m:363-371)
    s = linspace_axis(-1.0, 1.0, 21)
    grid = Grid((s, s))
    x1 = jnp.asarray(s)[:, None, None]
    x2 = jnp.asarray(s)[None, :, None]
    u = jnp.asarray([-0.1, 0.0, 0.1])[None, None, :]
    # contracting dynamics: V converges geometrically
    plan = build_plan(grid.axes, (0.8 * x1 + 0.05 * u, 0.8 * x2))
    cost = jnp.broadcast_to(x1**2 + x2**2 + u**2,
                            plan.query_shape).astype(jnp.float32)

    rel = value_iteration_converged(plan, cost, 2000, check_every=10,
                                    tol=1e-6, tol_mode="rel")
    assert bool(rel.converged)
    assert int(rel.num_sweeps) < 2000
    # the absolute rule with a tolerance far below the value scale never
    # fires at the same horizon windows where 'rel' already stopped
    absr = value_iteration_converged(plan, cost, int(rel.num_sweeps),
                                     check_every=10, tol=1e-30,
                                     tol_mode="abs")
    assert not bool(absr.converged)
    # invalid mode is rejected loudly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        value_iteration_converged(plan, cost, 10, tol_mode="median")


def test_relative_stop_identical_across_engines():
    """The 'rel' stop decision is shared machinery: the sharded converged
    engine stops on the same sweep as the single-chip engine."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from ocdp_tpu.engine import value_iteration_converged
    from ocdp_tpu.grids import Grid, linspace_axis
    from ocdp_tpu.parallel.sharded import value_iteration_converged_sharded
    from ocdp_tpu.ops.interp import build_plan

    s = linspace_axis(-1.0, 1.0, 17)
    grid = Grid((s, s))
    x1 = jnp.asarray(s)[:, None, None]
    x2 = jnp.asarray(s)[None, :, None]
    u = jnp.asarray([-0.1, 0.0, 0.1])[None, None, :]
    plan = build_plan(grid.axes, (0.7 * x1 + 0.1 * u, 0.7 * x2))
    cost = jnp.broadcast_to(x1**2 + x2**2 + u**2,
                            plan.query_shape).astype(jnp.float32)

    single = value_iteration_converged(plan, cost, 1000, check_every=10,
                                       tol=1e-5, tol_mode="rel")
    mesh = Mesh(np.array(jax.devices()[:4]), ("s",))
    sh = value_iteration_converged_sharded(plan, cost, 1000, mesh,
                                           check_every=10, tol=1e-5,
                                           tol_mode="rel")
    assert bool(single.converged) and bool(sh.converged)
    assert int(single.num_sweeps) == int(sh.num_sweeps)
    np.testing.assert_array_equal(np.asarray(single.values),
                                  np.asarray(sh.values))
