"""At-scale 6-D attitude runs on the real TPU chip (flagship scaling axis).

Usage: python scripts/run_6d_scale.py [n_mesh_w] [n_mesh_q] [sweeps] [impl]

Reports compile time, run wall-clock, and backups/s for the 6-D Pallas
kernel (default) at sizes the round-1 XLA stencil could not survive
(NOTES.md: worker crash at ~1e6 cells). The reference's historically-run
scale is 11^3 x 10^3 (attitude-control/Solver_attitude.asv:95-103).
"""

import sys
import time

import numpy as np


def main():
    n_w = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sweeps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    impl = sys.argv[4] if len(sys.argv) > 4 else "pallas"

    import jax

    from ocdp_tpu.models import attitude

    cfg = attitude.AttitudeConfig(n_mesh_w=n_w, n_mesh_q=n_q)
    cells = n_w**3 * n_q**3
    print(f"config {n_w}^3 x {n_q}^3 = {cells:,} cells x 27 actions, "
          f"{sweeps} sweeps, impl={impl}", flush=True)
    print("device:", jax.devices(), flush=True)

    t0 = time.perf_counter()
    sol = attitude.solve_full(cfg, num_sweeps=sweeps, impl=impl)
    vsum = float(np.asarray(sol.result.values).sum())
    t_cold = time.perf_counter() - t0
    print(f"cold (compile+{sweeps} sweeps): {t_cold:.1f}s "
          f"(vsum={vsum:.6e})", flush=True)

    t0 = time.perf_counter()
    sol = attitude.solve_full(cfg, num_sweeps=sweeps, impl=impl)
    vsum = float(np.asarray(sol.result.values).sum())
    dt = time.perf_counter() - t0
    evals = cells * 27 * sweeps
    print(f"warm {sweeps} sweeps: {dt:.2f}s  ->  {evals/dt:.3e} evals/s  "
          f"(vsum={vsum:.6e})", flush=True)


if __name__ == "__main__":
    main()
