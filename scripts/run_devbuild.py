"""Validate + time the device-side kernel construction on the real chip.

1. equivalence: device-built lane arrays/combos == host-built (11^3x10^3,
   forced over the threshold via the module constant)
2. end-to-end construction + sweep timing at 19^3x14^3 and 27^3x18^3
   (vs NOTES.md host numbers: 27^3 build_full 192s + kernel build 730s)
"""
import time

import jax
import numpy as np

from ocdp_tpu.engine import value_iteration_finite
from ocdp_tpu.models import attitude
from ocdp_tpu.ops import pallas_backup6 as pb6


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


print("device:", jax.devices()[0], flush=True)

# ---- 1. device build == host build at flagship size ------------------------
cfg = attitude.AttitudeConfig(n_mesh_w=11, n_mesh_q=10)
grid, plan, cost = attitude.build_full(cfg)   # small path: host/CPU build
orig = pb6._DEVICE_BUILD_MIN_ELEMS
pb6._DEVICE_BUILD_MIN_ELEMS = 1           # force device build
bk_d = pb6.PallasBackup6D(plan, cost)
pb6._DEVICE_BUILD_MIN_ELEMS = 10**18      # force host build
bk_h = pb6.PallasBackup6D(plan, cost)
pb6._DEVICE_BUILD_MIN_ELEMS = orig
assert bk_d.row_combos == bk_h.row_combos
assert bk_d.lane_combos == bk_h.lane_combos
assert bk_d.w_taps == bk_h.w_taps and bk_d.e_taps == bk_h.e_taps
for a, b in zip(bk_d.sweep_args, bk_h.sweep_args):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("device build == host build (combos, taps, all sweep args)", flush=True)

# ---- 2. end-to-end timing at envelope sizes ---------------------------------
from ocdp_tpu.ops.interp import PlanShape

for nw, nq, sweeps in [(19, 14, 10), (27, 18, 3)]:
    t0 = time.perf_counter()
    cfg = attitude.AttitudeConfig(n_mesh_w=nw, n_mesh_q=nq)
    grid, plan, cost = attitude.build_full(cfg)
    jax.block_until_ready(plan.lo)
    t1 = time.perf_counter()
    bk = pb6.PallasBackup6D(plan, cost)
    jax.block_until_ready(bk.sweep_args)
    t2 = time.perf_counter()
    shapes = PlanShape.of(plan)
    del plan, cost     # free the flat plan's HBM before the solve
    fn = jax.jit(lambda p_, b: value_iteration_finite(
        p_, None, sweeps, store_policies=False, backup=b))
    t3 = time.perf_counter()
    res = fn(shapes, bk)
    fetch(res.values)
    t4 = time.perf_counter()
    res = fn(shapes, bk)
    fetch(res.values)
    dt = time.perf_counter() - t4
    cells = int(np.prod(shapes.grid_shape))
    del res, bk
    print(f"[{nw}^3x{nq}^3] build_full={t1-t0:.1f}s kernel_build={t2-t1:.1f}s "
          f"compile+{sweeps}sw={t4-t3:.1f}s warm={dt/sweeps*1e3:.0f} ms/sweep "
          f"({cells*27*sweeps/dt:.3g} evals/s)", flush=True)
