"""HBM vs VMEM table mode on the small row/lane shapes + envelope push.

1. pos-att x-channel rowlane kernel (tiny 1.2MB table): does per-tile DMA
   cost anything vs VMEM residency? (decides the auto default)
2. 23^3x16^3 = 49.8M-cell envelope point in HBM mode.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ocdp_tpu.engine import value_iteration_converged, value_iteration_finite
from ocdp_tpu.models import attitude, pos_att

cpu = jax.local_devices(backend="cpu")[0]


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


print("device:", jax.devices()[0], flush=True)

# ---- pos-att rowlane, hbm vs vmem -----------------------------------------
cfg = pos_att.PosAttConfig()
with jax.default_device(cpu):
    problem = pos_att.build_channel(cfg, "x")
for hbm in (False, True):
    from ocdp_tpu.ops.pallas_backup6 import PermutedRowLaneBackup

    ax = [jnp.asarray(a, jnp.float32) for a in problem.grid.axes]
    bk = PermutedRowLaneBackup(
        problem.plan,
        [cfg.Qx * ax[0][:, None, None, None, None] ** 2,
         cfg.Qv * ax[1][None, :, None, None, None] ** 2,
         cfg.Qt * ax[2][None, None, :, None, None] ** 2,
         cfg.Qw * ax[3][None, None, None, :, None] ** 2,
         cfg.R * jnp.asarray((problem.forces ** 2).sum(axis=1),
                             jnp.float32)[None, None, None, None, :]],
        perm=(1, 3, 0, 2), row_axes=2, table_hbm=hbm)
    fn = jax.jit(lambda p_, c_, b: value_iteration_converged(
        p_, c_, cfg.n_stage - 1, check_every=cfg.check_every, tol=cfg.tol,
        backup=b))
    t0 = time.perf_counter()
    res = fn(problem.plan, problem.stage_cost, bk)
    fetch(res.values)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        res = fn(problem.plan, problem.stage_cost, bk)
        fetch(res.values)
        best = min(best, time.perf_counter() - t0)
    sweeps = int(res.num_sweeps)
    cells = cfg.n_mesh_x * cfg.n_mesh_v * cfg.n_mesh_t * cfg.n_mesh_w
    print(f"[pos-att rowlane hbm={hbm}] compile={compile_s:.1f}s "
          f"warm={best:.3f}s sweeps={sweeps} "
          f"({cells*9*sweeps/best:.3g} evals/s)", flush=True)

# ---- 23^3x16^3 envelope ----------------------------------------------------
t0 = time.perf_counter()
with jax.default_device(cpu):
    acfg = attitude.AttitudeConfig(n_mesh_w=23, n_mesh_q=16)
    grid, plan, cost = attitude.build_full(acfg)
print(f"build_full 23^3x16^3: {time.perf_counter()-t0:.1f}s", flush=True)
from ocdp_tpu.ops.pallas_backup6 import PallasBackup6D

t0 = time.perf_counter()
bk = PallasBackup6D(plan, cost)  # auto -> hbm (199MB table)
print(f"kernel build: {time.perf_counter()-t0:.1f}s T={bk.row_tile} "
      f"NEp={bk.NEp} span={bk.d_max-bk.d_min}", flush=True)
sweeps = 5
fn = jax.jit(lambda p_, c_, b: value_iteration_finite(
    p_, c_, sweeps, store_policies=False, backup=b))
t0 = time.perf_counter()
res = fn(plan, cost, bk)
fetch(res.values)
print(f"compile+{sweeps} sweeps: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
res = fn(plan, cost, bk)
fetch(res.values)
dt = time.perf_counter() - t0
cells = int(np.prod(plan.grid_shape))
print(f"[23^3x16^3 hbm] cells={cells/1e6:.1f}M warm={dt:.2f}s "
      f"({dt/sweeps*1e3:.1f} ms/sweep, {cells*27*sweeps/dt:.3g} evals/s)",
      flush=True)
