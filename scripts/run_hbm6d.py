"""Validate + time the 6-D kernel's HBM-table mode on the real chip.

Stages:
1. small-config argmin/value parity: table_hbm=True vs table_hbm=False
2. flagship 11^3x10^3 sweep timing in HBM mode (vs the ~5.5 ms/sweep
   VMEM-resident number, NOTES.md)
3. 19^3x14^3 — the config whose VMEM-resident compile crashed (82MB table)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ocdp_tpu.engine import value_iteration_finite
from ocdp_tpu.models import attitude
from ocdp_tpu.ops.pallas_backup6 import PallasBackup6D

cpu = jax.local_devices(backend="cpu")[0]


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


def build(nw, nq):
    with jax.default_device(cpu):
        cfg = attitude.AttitudeConfig(n_mesh_w=nw, n_mesh_q=nq)
        return attitude.build_full(cfg)


def run(nw, nq, sweeps, table_hbm, trials=2):
    grid, plan, cost = build(nw, nq)
    bk = PallasBackup6D(plan, cost, table_hbm=table_hbm)
    fn = jax.jit(lambda p_, c_, b: value_iteration_finite(
        p_, c_, sweeps, store_policies=False, backup=b))
    t0 = time.perf_counter()
    res = fn(plan, cost, bk)
    fetch(res.values)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        res = fn(plan, cost, bk)
        fetch(res.values)
        best = min(best, time.perf_counter() - t0)
    cells = int(np.prod(plan.grid_shape))
    print(f"[{nw}^3x{nq}^3 hbm={table_hbm}] cells={cells/1e6:.2f}M "
          f"compile={compile_s:.1f}s warm={best:.3f}s "
          f"({best/sweeps*1e3:.2f} ms/sweep, "
          f"{cells*27*sweeps/best:.3g} evals/s)", flush=True)
    return res


print("device:", jax.devices()[0], flush=True)

# 1. parity, small config on-chip
grid, plan, cost = build(5, 4)
v = jax.random.normal(jax.random.PRNGKey(0), plan.grid_shape, jnp.float32)
r_v = PallasBackup6D(plan, cost, table_hbm=False)(v)
r_h = PallasBackup6D(plan, cost, table_hbm=True)(v)
ok_v = bool(jnp.array_equal(r_v.values, r_h.values))
ok_a = bool(jnp.array_equal(r_v.argmin, r_h.argmin))
print(f"parity 5^3x4^3 on-chip: values={ok_v} argmin={ok_a}", flush=True)
assert ok_v and ok_a

# 2. flagship timing in HBM mode
run(11, 10, 50, True)

# 3. the config that crashed VMEM-resident
run(19, 14, 10, True, trials=1)
