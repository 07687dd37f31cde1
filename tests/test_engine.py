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
