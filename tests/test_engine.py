"""Engine-level flags not covered by the per-family suites."""

import jax.numpy as jnp
import numpy as np

from ocdp_tpu.engine import value_iteration_finite
from ocdp_tpu.models import attitude
from ocdp_tpu.ops.interp import PlanShape
from ocdp_tpu.ops.pallas_backup6 import PallasBackup6D


def test_narrow_argmin_result_flag():
    """narrow_argmin_result keeps the carry-padded backup's narrow dtype
    across the jit boundary (the int32 output buffer is ~3.5 GB at the
    884M-cell envelope); values identical either way."""
    cfg = attitude.AttitudeConfig(n_mesh_w=5, n_mesh_q=4)
    grid, plan, cost = attitude.build_full(cfg, flat=True)
    bk = PallasBackup6D(plan, cost, interpret=True, argmin_dtype=jnp.uint8,
                        carry_padded=True)
    ps = PlanShape.of(plan)
    r32 = value_iteration_finite(ps, None, 3, store_policies=False,
                                 backup=bk)
    r8 = value_iteration_finite(ps, None, 3, store_policies=False,
                                backup=bk, narrow_argmin_result=True)
    assert r32.argmin.dtype == jnp.int32
    assert r8.argmin.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(r32.values),
                                  np.asarray(r8.values))
    np.testing.assert_array_equal(np.asarray(r32.argmin),
                                  np.asarray(r8.argmin, np.int32))


def test_narrow_argmin_result_plain_path():
    """narrow_argmin_result must also be honored when the backup is NOT
    carry-padded — the non-carry scan otherwise silently re-widens to the
    int32 buffer the flag exists to avoid."""
    cfg = attitude.AttitudeConfig(n_mesh_w=5, n_mesh_q=4)
    grid, plan, cost = attitude.build_full(cfg, flat=True)
    bk = PallasBackup6D(plan, cost, interpret=True, argmin_dtype=jnp.uint8)
    ps = PlanShape.of(plan)
    r32 = value_iteration_finite(ps, None, 3, store_policies=False,
                                 backup=bk)
    r8 = value_iteration_finite(ps, None, 3, store_policies=False,
                                backup=bk, narrow_argmin_result=True)
    assert r32.argmin.dtype == jnp.int32
    assert r8.argmin.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(r32.argmin),
                                  np.asarray(r8.argmin, np.int32))


def test_converged_carry_padded_bitwise():
    """The converged engine's padded-carry branch: identical stop sweep,
    checks log, values, argmin vs the plain backup path (the checksums
    must exclude the padded lanes' duplicated-lane-0 garbage)."""
    from ocdp_tpu.engine import value_iteration_converged

    cfg = attitude.AttitudeConfig(n_mesh_w=5, n_mesh_q=4)
    grid, plan, cost = attitude.build_full(cfg, flat=True)
    bk0 = PallasBackup6D(plan, cost, interpret=True)
    bk1 = PallasBackup6D(plan, cost, interpret=True, carry_padded=True)
    ps = PlanShape.of(plan)
    kw = dict(check_every=3, tol=1e-3, tol_mode="rel")
    r0 = value_iteration_converged(ps, None, 30, backup=bk0, **kw)
    r1 = value_iteration_converged(ps, None, 30, backup=bk1, **kw)
    assert int(r0.num_sweeps) == int(r1.num_sweeps)
    assert bool(r0.converged) == bool(r1.converged)
    np.testing.assert_array_equal(np.asarray(r0.checks),
                                  np.asarray(r1.checks))
    # flat-plan carry results stay in the flat (rows, lanes) layout
    # (the 6-D jit output's ~8x tile padding was the envelope wall)
    np.testing.assert_array_equal(
        np.asarray(r0.values).reshape(np.asarray(r1.values).shape),
        np.asarray(r1.values))
    np.testing.assert_array_equal(
        np.asarray(r0.argmin).reshape(np.asarray(r1.argmin).shape),
        np.asarray(r1.argmin))
