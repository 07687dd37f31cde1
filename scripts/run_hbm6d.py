"""HBM-table-mode experiments for the row/lane kernel (consolidated driver).

One parameterized script replacing the round-3 pair run_hbm6d.py /
run_hbm6d2.py (VERDICT r3 item 10); NOTES.md holds the measured records.

Stages (select with --stage, default all):
  parity    small-config argmin/value parity: table_hbm=True vs False
  attitude  6-D attitude sweeps at --nw/--nq (flagship 11^3x10^3 by
            default; pass e.g. --nw 23 --nq 16 for envelope points)
  rowlane   pos-att x-channel rowlane kernel, HBM vs VMEM table residency
            (the measurement behind the _VMEM_TABLE_BUDGET auto threshold)
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ocdp_tpu.engine import value_iteration_converged, value_iteration_finite
from ocdp_tpu.models import attitude, pos_att
from ocdp_tpu.ops.pallas_backup6 import PallasBackup6D

cpu = jax.local_devices(backend="cpu")[0]


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


def build(nw, nq):
    cfg = attitude.AttitudeConfig(n_mesh_w=nw, n_mesh_q=nq)
    return attitude.build_full(cfg)


def stage_parity():
    grid, plan, cost = build(5, 4)
    v = jax.random.normal(jax.random.PRNGKey(0), plan.grid_shape, jnp.float32)
    r_v = PallasBackup6D(plan, cost, table_hbm=False)(v)
    r_h = PallasBackup6D(plan, cost, table_hbm=True)(v)
    ok_v = bool(jnp.array_equal(r_v.values, r_h.values))
    ok_a = bool(jnp.array_equal(r_v.argmin, r_h.argmin))
    print(f"parity 5^3x4^3 on-chip: values={ok_v} argmin={ok_a}", flush=True)
    assert ok_v and ok_a


def stage_attitude(nw, nq, sweeps, table_hbm, trials=2):
    t0 = time.perf_counter()
    cells = nw**3 * nq**3
    # build_full pins small grids to host CPU and builds big ones on-device
    grid, plan, cost = build(nw, nq)
    print(f"build_full {nw}^3x{nq}^3: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    bk = PallasBackup6D(plan, cost, table_hbm=table_hbm)
    print(f"kernel build: {time.perf_counter()-t0:.1f}s T={bk.row_tile} "
          f"NEp={bk.NEp} span={bk.d_max-bk.d_min}", flush=True)
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
    print(f"[{nw}^3x{nq}^3 hbm={table_hbm}] cells={cells/1e6:.2f}M "
          f"compile={compile_s:.1f}s warm={best:.3f}s "
          f"({best/sweeps*1e3:.2f} ms/sweep, "
          f"{cells*27*sweeps/best:.3g} evals/s)", flush=True)
    return res


def stage_rowlane():
    cfg = pos_att.PosAttConfig()
    with jax.default_device(cpu):
        problem = pos_att.build_channel(cfg, "x")
    for hbm in (False, True):
        # the library builder owns the channel cost factorization and the
        # (v, w, x, t) permutation — re-deriving them here would drift
        bk = pos_att.build_channel_rowlane_backup(cfg, problem,
                                                  table_hbm=hbm)
        fn = jax.jit(lambda p_, c_, b: value_iteration_converged(
            p_, c_, cfg.n_stage - 1, check_every=cfg.check_every,
            tol=cfg.tol, backup=b))
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="all",
                   choices=["all", "parity", "attitude", "rowlane"])
    p.add_argument("--nw", type=int, default=11)
    p.add_argument("--nq", type=int, default=10)
    p.add_argument("--sweeps", type=int, default=50)
    p.add_argument("--vmem", action="store_true",
                   help="force VMEM table residency (default HBM)")
    p.add_argument("--trials", type=int, default=2)
    args = p.parse_args()
    print("device:", jax.devices()[0], flush=True)
    if args.stage in ("all", "parity"):
        stage_parity()
    if args.stage in ("all", "attitude"):
        stage_attitude(args.nw, args.nq, args.sweeps, not args.vmem,
                       trials=args.trials)
    if args.stage in ("all", "rowlane"):
        stage_rowlane()


if __name__ == "__main__":
    main()
