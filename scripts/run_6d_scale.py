"""At-scale 6-D attitude runs on the real TPU chip (flagship scaling axis).

Usage: python scripts/run_6d_scale.py [n_mesh_w] [n_mesh_q] [sweeps]

Reports each phase separately — plan construction (on-device flat build past
8M cells), kernel construction, engine compile, and warm per-sweep runtime /
backups/s — for the 6-D Pallas kernel at sizes the round-1 XLA stencil could
not survive (NOTES.md: worker crash at ~1e6 cells). The reference's
historically-run scale is 11^3 x 10^3
(attitude-control/Solver_attitude.asv:95-103).
"""

import sys
import time

import numpy as np


def main():
    if len(sys.argv) > 4:   # the old 4th arg (impl) no longer exists
        raise SystemExit(f"usage: {sys.argv[0]} [n_mesh_w] [n_mesh_q] "
                         f"[sweeps]  (got extra args {sys.argv[4:]})")
    n_w = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sweeps = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import jax

    from ocdp_tpu.engine import value_iteration_finite
    from ocdp_tpu.models import attitude
    from ocdp_tpu.ops.pallas_backup6 import build_pallas_backup_6d
    from ocdp_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = attitude.AttitudeConfig(n_mesh_w=n_w, n_mesh_q=n_q)
    cells = n_w**3 * n_q**3
    print(f"config {n_w}^3 x {n_q}^3 = {cells:,} cells x 27 actions, "
          f"{sweeps} sweeps", flush=True)
    print("device:", jax.devices(), flush=True)

    t0 = time.perf_counter()
    grid, plan, cost = attitude.build_full(cfg)
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    from ocdp_tpu.engine import policy_dtype_for

    # envelope levers: narrow in-kernel argmin dtype (uint8 at 27 actions)
    # + padded-carry sweeps (the scan carry IS the kernel's padded table —
    # no per-sweep pad/slice copies); both bitwise vs the plain path
    bk = build_pallas_backup_6d(plan, cost,
                                consume_plan=attitude.plan_is_flat(plan),
                                argmin_dtype=policy_dtype_for(27),
                                carry_padded=True)
    t_kernel = time.perf_counter() - t0
    print(f"plan build {t_plan:.1f}s  kernel build {t_kernel:.1f}s "
          f"(table {bk.NWp}x{bk.NEp}, hbm={bk.table_hbm})", flush=True)
    # the engine reads the plan only for shapes; dropping the real plan
    # frees its ~24 B/cell of HBM before the solve (as solve_full does)
    from ocdp_tpu.ops.interp import PlanShape

    plan, cost = PlanShape.of(plan), None

    # narrow_argmin_result: the int32 argmin OUTPUT buffer alone is
    # ~3.5 GB at 884M cells — keep the kernel's uint8 across the boundary
    fn = jax.jit(lambda p_, c_, b: value_iteration_finite(
        p_, c_, sweeps, store_policies=False, backup=b,
        narrow_argmin_result=True))

    def run():
        t0 = time.perf_counter()
        res = fn(plan, cost, bk)
        # reduce ON DEVICE, fetch one scalar: pulling the whole table
        # through the tunnel costs ~6 s at envelope sizes
        vsum = float(np.asarray(res.values.sum()))
        return time.perf_counter() - t0, vsum

    t_cold, vsum = run()
    print(f"compile+{sweeps} sweeps: {t_cold:.1f}s (vsum={vsum:.6e})",
          flush=True)
    best = np.inf
    for _ in range(2):
        dt, vsum = run()
        best = min(best, dt)
    evals = cells * 27 * sweeps
    print(f"warm {sweeps} sweeps: {best:.2f}s = {best/sweeps*1e3:.1f} "
          f"ms/sweep  ->  {evals/best:.3e} evals/s  (vsum={vsum:.6e})",
          flush=True)


if __name__ == "__main__":
    main()
