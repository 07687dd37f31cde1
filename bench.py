"""Benchmark: Bellman backups (state-action evals)/s/chip on the Kirk workload.

Runs the reference's headline workload — the Kirk ch.3 regulator at its full
parameterization (100x100 states x 1000 controls x 199 sweeps ≈ 2e9
state-action evaluations, test/Dynamic_Solver.m:49-63) — as one jitted
``lax.scan`` on the attached chip and reports throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

``vs_baseline``: the reference publishes no timings (BASELINE.md), so the
baseline is a measured stand-in: a fully *vectorized* numpy implementation of
the same backup (prebuilt interpolation indices + corner gathers + fused
min/argmin) — the same algorithmic shape MATLAB's vectorized
griddedInterpolant/min path executes in its C internals, run on this host's
CPU. vs_baseline = our evals/s divided by the stand-in's evals/s.
"""

import json
import time

import numpy as np


def numpy_baseline_stage_seconds(cfg, n_timed=3):
    """Vectorized numpy Bellman backup on the Kirk grid, seconds/stage."""
    s_r = np.linspace(cfg.x_min, cfg.x_max, cfg.dx).astype(np.float32)
    u = np.linspace(cfg.u_min, cfg.u_max, cfg.du).astype(np.float32)
    x1 = s_r[:, None, None]
    x2 = s_r[None, :, None]
    uu = u[None, None, :]
    (a11, a12), (a21, a22) = cfg.A
    b1, b2 = cfg.B
    q1n = (a11 * x1 + a12 * x2 + b1 * uu).astype(np.float32)
    q2n = (a21 * x1 + a22 * x2 + b2 * uu).astype(np.float32)
    cost = (cfg.Q[0] * x1**2 + cfg.Q[1] * x2**2 + cfg.R * uu**2).astype(np.float32)
    cost = np.broadcast_to(cost, (cfg.dx, cfg.dx, cfg.du))

    # prebuilt interpolation plan (the reference's prebuilt griddedInterpolant)
    def locate(g, q):
        lo = np.clip(np.searchsorted(g, q, side="right") - 1, 0, len(g) - 2)
        frac = (q - g[lo]) / (g[lo + 1] - g[lo])
        return lo.astype(np.int64), frac.astype(np.float32)

    lo1, f1 = locate(s_r, np.broadcast_to(q1n, cost.shape))
    lo2, f2 = locate(s_r, np.broadcast_to(q2n, cost.shape))
    flat00 = lo1 * cfg.dx + lo2
    v = np.zeros((cfg.dx, cfg.dx), np.float32)
    w00 = (1 - f1) * (1 - f2)
    w01 = (1 - f1) * f2
    w10 = f1 * (1 - f2)
    w11 = f1 * f2

    def stage(v):
        fv = v.ravel()
        tot = (w00 * fv[flat00] + w01 * fv[flat00 + 1]
               + w10 * fv[flat00 + cfg.dx] + w11 * fv[flat00 + cfg.dx + 1]
               + cost)
        return tot.min(axis=-1)

    v = stage(v)  # warm
    t0 = time.perf_counter()
    for _ in range(n_timed):
        v = stage(v)
    return (time.perf_counter() - t0) / n_timed


def main():
    import jax

    from ocdp_tpu.engine import value_iteration_finite
    from ocdp_tpu.models import kirk

    cfg = kirk.KirkConfig()  # full workload: dx=100, du=1000, N=200
    problem = kirk.build(cfg)
    sweeps = cfg.N - 1
    evals_per_sweep = cfg.dx * cfg.dx * cfg.du

    from ocdp_tpu.ops.stencil import build_stencil_backup

    backup = build_stencil_backup(problem.plan, problem.stage_cost,
                                  action_chunk=50)
    run = jax.jit(
        lambda plan, cost: value_iteration_finite(
            plan, cost, sweeps, store_policies=False, backup=backup
        )
    )

    # NOTE: on the axon tunnel platform jax.block_until_ready returns early;
    # a device->host fetch is the only reliable barrier, so we time through a
    # scalar fetch of the result (negligible next to the solve itself).
    def timed_run():
        t0 = time.perf_counter()
        res = run(problem.plan, problem.stage_cost)
        float(np.asarray(res.values[0, 0]))
        return time.perf_counter() - t0

    timed_run()  # compile + warm
    dt = min(timed_run() for _ in range(2))
    evals_per_s = evals_per_sweep * sweeps / dt

    base_stage = numpy_baseline_stage_seconds(cfg)
    base_evals_per_s = evals_per_sweep / base_stage
    vs_baseline = evals_per_s / base_evals_per_s

    print(json.dumps({
        "metric": "bellman_backups_per_s_per_chip",
        "value": round(evals_per_s, 1),
        "unit": "state-action evals/s",
        "vs_baseline": round(vs_baseline, 2),
        "workload": "kirk dx=100 du=1000 N=200 (2e9 evals)",
        "wall_s": round(dt, 4),
        "baseline_evals_per_s": round(base_evals_per_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
