"""Benchmark: Bellman backups (state-action evals)/s/chip on the reference's
north-star workloads (BASELINE.md).

Prints ONE JSON line. The headline metric/value is the Kirk ch.3 full
workload (100x100 states x 1000 controls x 199 sweeps ~= 2e9 state-action
evaluations, test/Dynamic_Solver.m:49-63); the ``families`` field carries
every other family the judge tracks:

* ``kirk``            — full finite-horizon solve, fastest impl
* ``attitude_axis``   — 3 simplified (omega, theta) axes, 1000x300x3 x 5999
                        sweeps each (Solver_attitude.m:108,116,143-144)
* ``pos_att_channel`` — one 30x30x20x15 x 9-combo channel, early-stop loop
                        incl. the periodic checks (Solver_pos_att.m:268-286)
* ``pos_att_serving`` — reference grid, the serving path: unified
                        4-channel solve (ONE compiled program) + 'rk4'
                        closed-loop rollouts, single-flight and batch-256
* ``attitude_6d``     — full coupled 6-D attitude at the reference's
                        historically-run 11^3 x 10^3 scale
                        (Solver_attitude.asv:95-103), 6-D Pallas kernel
                        (50-sweep envelope point)
* ``attitude_6d_converged`` — the BASELINE north star: the same 6-D grid run
                        to the reference's FULL 5999-sweep horizon under the
                        converged engine, wall/compile/sweeps recorded
* ``pos_att_highres`` — BASELINE config #5: 60x60x40x30 = 4.32M cells x 9,
                        converged channel solve + full 3-channel solve +
                        receding-horizon closed-loop rollout wall-clock

``vs_baseline``: the reference publishes no timings (BASELINE.md), so the
baseline is a measured stand-in: a fully *vectorized* numpy implementation
of the same backup (prebuilt interpolation indices + corner gathers + fused
min/argmin) — the same algorithmic shape MATLAB's vectorized
griddedInterpolant/min path executes in its C internals, run on this host's
CPU. Pinned as the MIN seconds/stage over 5 trials (host-load jitter made
single-trial ratios noisy in round 1). vs_baseline = our evals/s divided by
the stand-in's evals/s.

Set BENCH_FAMILIES=kirk (comma list) to restrict; default runs all.
"""

import json
import os
import time

import numpy as np


def numpy_baseline_stage_seconds(cfg, n_trials=5):
    """Vectorized numpy Bellman backup on the Kirk grid, min seconds/stage."""
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
    best = np.inf
    for _ in range(n_trials):
        t0 = time.perf_counter()
        v = stage(v)
        best = min(best, time.perf_counter() - t0)
    return best


def _fetch(x):
    """Reliable device barrier on the axon tunnel: a scalar host fetch
    (jax.block_until_ready returns early there, NOTES.md). The scalar is
    sliced ON DEVICE first — transferring the whole result through the
    tunnel costs milliseconds at MB sizes and skews the timings."""
    return float(np.asarray(x.ravel()[0]))


def _time_jitted(fn, *args, trials=2):
    """Compile once, then min wall-clock over ``trials`` runs.

    ``compile_s`` = first-call wall MINUS the warm run time, so long-running
    workloads (the 14.5 s converged 6-D solve) don't inflate it."""
    t0 = time.perf_counter()
    _fetch(fn(*args).values)
    first_s = time.perf_counter() - t0
    best = np.inf
    res = None
    for _ in range(trials):
        t0 = time.perf_counter()
        res = fn(*args)
        _fetch(res.values)
        best = min(best, time.perf_counter() - t0)
    return best, max(first_s - best, 0.0), res


def bench_kirk():
    import jax

    from ocdp_tpu.engine import value_iteration_finite
    from ocdp_tpu.models import kirk
    from ocdp_tpu.models.kirk import _separable_cost_terms
    from ocdp_tpu.ops.pallas_shear import build_pallas_shear_backup
    from ocdp_tpu.ops.sheargather import build_sheargather_backup

    cfg = kirk.KirkConfig()  # full workload: dx=100, du=1000, N=200
    p = kirk.build(cfg)
    sweeps = cfg.N - 1
    evals = cfg.dx * cfg.dx * cfg.du * sweeps

    # the exact configuration kirk.solve(impl='pallas') ships
    ps = build_pallas_shear_backup(p.plan, p.stage_cost, action_chunk=50,
                                   cost_terms=_separable_cost_terms(cfg))
    f_b = jax.jit(lambda plan, cost, b: value_iteration_finite(
        plan, cost, sweeps, store_policies=False, backup=b))
    dt_ps, _, _ = _time_jitted(f_b, p.plan, p.stage_cost, ps)

    sg = build_sheargather_backup(p.plan, p.stage_cost, action_chunk=20)
    dt_sg, _, _ = _time_jitted(f_b, p.plan, p.stage_cost, sg)

    impl, dt = min((("pallas-shear", dt_ps), ("sheargather", dt_sg)),
                   key=lambda t: t[1])
    return {
        "evals_per_s": round(evals / dt, 1),
        "wall_s": round(dt, 4),
        "impl": impl,
        "alternatives": {"pallas-shear": round(dt_ps, 4),
                         "sheargather": round(dt_sg, 4)},
        "workload": "kirk dx=100 du=1000 N=200 (2e9 evals)",
    }


def bench_attitude_axis():
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from ocdp_tpu.engine import value_iteration_finite
    from ocdp_tpu.grids import Grid, linspace_axis
    from ocdp_tpu.models.attitude import AttitudeConfig, _quirk
    from ocdp_tpu.ops.interp import build_plan
    from ocdp_tpu.ops.stencil import build_stencil_backup

    cfg = AttitudeConfig()            # per axis: 1000 x 300 x 3, 5999 sweeps
    sweeps = cfg.n_stage - 1
    deg = _np.pi / 180.0
    t_lo, t_hi = (r * deg for r in cfg.yaw_range_deg)
    s_w = linspace_axis(cfg.w_min_deg * deg, cfg.w_max_deg * deg, cfg.n_mesh_w)
    s_t = linspace_axis(t_lo, t_hi, cfg.n_mesh_t)
    grid = Grid((s_w, s_t))
    J = cfg.inertia_diag[0]
    w = jnp.asarray(s_w)[:, None, None]
    t = jnp.asarray(s_t)[None, :, None]
    u = jnp.asarray(cfg.u_vector)[None, None, :]
    plan = build_plan(grid.axes, (w + cfg.h * u / J,
                                  t + cfg.h * w * _quirk(cfg.h, True)))
    cost_terms = [cfg.Qw[0] * w**2, cfg.Qq[0] * t**2, cfg.R[0] * u**2]
    cost = sum(jnp.broadcast_to(c, plan.query_shape) for c in cost_terms)
    sb = build_stencil_backup(plan, cost)
    fn_sb = jax.jit(lambda p_, c_: value_iteration_finite(
        p_, c_, sweeps, store_policies=False, backup=sb))
    dt_sb, _, _ = _time_jitted(fn_sb, plan, cost)

    from ocdp_tpu.ops.rowband import build_rowband_backup

    # the shipping default path (solve_simplified impl='auto'): row-band
    # backup on the clamped-edge plan (stable at the full horizon; identical
    # op count to the extrapolating plan, only frac values differ)
    plan_c = build_plan(grid.axes, (w + cfg.h * u / J,
                                    t + cfg.h * w * _quirk(cfg.h, True)),
                        edge="clamp")
    rb = build_rowband_backup(plan_c, cost)
    fn_rb = jax.jit(lambda p_, c_: value_iteration_finite(
        p_, c_, sweeps, store_policies=False, backup=rb))
    dt_rb, _, _ = _time_jitted(fn_rb, plan_c, cost)

    impl, dt = min((("stencil", dt_sb), ("rowband", dt_rb)),
                   key=lambda p: p[1])
    evals = cfg.n_mesh_w * cfg.n_mesh_t * 3 * sweeps
    return {
        "evals_per_s": round(evals / dt, 1),
        "wall_s": round(dt, 4),
        "impl": impl,
        "alternatives": {"stencil": round(dt_sb, 4),
                         "rowband": round(dt_rb, 4)},
        "workload": "attitude simplified yaw axis (1000x300x3) x 5999 sweeps",
    }


def bench_position():
    import jax

    from ocdp_tpu.engine import value_iteration_finite
    from ocdp_tpu.models import position
    from ocdp_tpu.ops.stencil import build_stencil_backup

    cfg = position.PositionConfig()   # 3 channels x 201x201 x 3, 5999 sweeps
    sweeps = cfg.n_stage - 1
    problem = position.build(cfg)
    sb = build_stencil_backup(problem.plan, problem.stage_cost)
    fn = jax.jit(lambda p_, c_: value_iteration_finite(
        p_, c_, sweeps, store_policies=False, backup=sb))
    dt, _, _ = _time_jitted(fn, problem.plan, problem.stage_cost)
    evals = 3 * (cfg.n_mesh_x + 1) * (cfg.n_mesh_v + 1) * 3 * sweeps
    return {
        "evals_per_s": round(evals / dt, 1),
        "wall_s": round(dt, 4),
        "impl": "stencil",
        "workload": "position 3 channels (201x201x3) x 5999 sweeps",
    }


def bench_pos_att_channel():
    import jax

    from ocdp_tpu.engine import value_iteration_converged
    from ocdp_tpu.models import pos_att

    cfg = pos_att.PosAttConfig()      # 30x30x20x15 x 9 combos, early stop
    max_sweeps = cfg.n_stage - 1
    problem = pos_att.build_channel(cfg, "x")
    bk = pos_att.build_channel_rowlane_backup(cfg, problem)
    fn = jax.jit(lambda p_, c_, b: value_iteration_converged(
        p_, c_, max_sweeps, check_every=cfg.check_every, tol=cfg.tol,
        backup=b))
    dt, _, res = _time_jitted(fn, problem.plan, problem.stage_cost, bk)
    sweeps = int(res.num_sweeps)
    cells = cfg.n_mesh_x * cfg.n_mesh_v * cfg.n_mesh_t * cfg.n_mesh_w
    evals = cells * 9 * sweeps

    # Beyond-parity demonstrated early stop: the scale-free 'rel' rule
    # (engine.convergence_stop) at 1e-3 — "Σ V stable to 0.1% per 50-sweep
    # window" — actually fires inside the cap (the reference's absolute
    # tol=1e-2 against ~1e6-scale checksum deltas never does; NOTES.md
    # parity ledger). North-star "wall-clock to converge" has a literal
    # instance here: converged=True + wall_s below.
    fn_rel = jax.jit(lambda p_, c_, b: value_iteration_converged(
        p_, c_, max_sweeps, check_every=cfg.check_every, tol=1e-3,
        tol_mode="rel", backup=b))
    dt_rel, _, res_rel = _time_jitted(fn_rel, problem.plan,
                                      problem.stage_cost, bk)
    return {
        "evals_per_s": round(evals / dt, 1),
        "wall_s": round(dt, 4),
        "sweeps": sweeps,
        # at reference defaults the checksum never fires inside the cap —
        # matching the reference's actual behavior (NOTES.md parity ledger)
        "converged": bool(res.converged),
        "rel_stop": {
            "tol_mode": "rel", "tol": 1e-3,
            "wall_s": round(dt_rel, 4),
            "sweeps": int(res_rel.num_sweeps),
            "converged": bool(res_rel.converged),
        },
        "impl": "pallas-rowlane",
        "workload": f"pos-att x channel {cells}x9, early-stop loop "
                    f"(cap {max_sweeps})",
    }


def bench_pos_att_serving():
    """Serving benchmarks on the REFERENCE grid (Solver_pos_att.m:100-119):
    the unified all-channel solve (x, y, z, x-failure through ONE compiled
    rowlane program — the north-star "full coupled position+attitude value
    iteration converged in seconds") + the 'rk4' closed-loop serving
    rollout, single-flight and batched (a fleet of initial conditions per
    dispatch, the TPU-native serving shape the MATLAB reference can only
    loop one x0 at a time, :452-506)."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from ocdp_tpu.models import pos_att

    cfg = pos_att.PosAttConfig()
    t0 = time.perf_counter()
    sol = pos_att.solve(cfg, impl="pallas")          # 4 ctrls, one compile
    solve_all_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sol = pos_att.solve(cfg, impl="pallas")
    solve_all_warm_s = time.perf_counter() - t0      # jit cache hit

    x0 = _np.array(pos_att.default_x0(pitch_deg=2.0))
    x0[0] = -0.08
    t0 = time.perf_counter()
    T, X, _, _ = pos_att.get_optimal_path(sol, jnp.asarray(x0, jnp.float32),
                                          integrator="rk4")
    _fetch(X)
    rk4_cold_s = time.perf_counter() - t0
    x0[0] = 0.06
    t0 = time.perf_counter()
    T, X, _, _ = pos_att.get_optimal_path(sol, jnp.asarray(x0, jnp.float32),
                                          integrator="rk4")
    _fetch(X)
    rk4_warm_s = time.perf_counter() - t0
    flight_s = float(T[-1])

    B = 256
    rng = _np.random.default_rng(0)
    x0s = _np.tile(_np.asarray(pos_att.default_x0()), (B, 1))
    x0s += rng.normal(0, 0.01, x0s.shape).astype(_np.float32)
    Tb, Xb, _, _ = pos_att.rollout_batch(sol, x0s)       # compile
    _fetch(Xb)
    t0 = time.perf_counter()
    Tb, Xb, _, _ = pos_att.rollout_batch(sol, x0s)
    _fetch(Xb)
    batch_warm_s = time.perf_counter() - t0
    return {
        "solve_all_channels_s": round(solve_all_s, 2),
        "solve_all_channels_warm_s": round(solve_all_warm_s, 2),
        "rollout_rk4_cold_s": round(rk4_cold_s, 2),
        "rollout_rk4_warm_s": round(rk4_warm_s, 3),
        "realtime_factor": round(flight_s / rk4_warm_s, 1),
        "batch": B,
        "batch_warm_s": round(batch_warm_s, 3),
        "batch_flight_s_per_s": round(B * flight_s / batch_warm_s, 1),
        "impl": "pallas-rowlane + affine-locate rk4 scan",
        "workload": "pos-att reference grid: unified 4-channel solve + "
                    f"{flight_s:.0f} s closed-loop serving rollouts",
    }


def bench_pos_att_highres():
    """BASELINE.json config #5: the high-res coupled grid (60x60x40x30 =
    4.32M cells x 9 combos per channel) — converged x-channel solve plus the
    receding-horizon closed-loop rollout (policies re-queried from the
    13-state every step, Solver_pos_att.m:484-506 generalized)."""
    import jax
    import jax.numpy as jnp

    from ocdp_tpu.engine import value_iteration_converged
    from ocdp_tpu.models import pos_att

    cfg = pos_att.PosAttConfig.high_res()
    max_sweeps = cfg.n_stage - 1
    problem = pos_att.build_channel(cfg, "x")
    bk = pos_att.build_channel_rowlane_backup(cfg, problem)
    fn = jax.jit(lambda p_, c_, b: value_iteration_converged(
        p_, c_, max_sweeps, check_every=cfg.check_every, tol=cfg.tol,
        backup=b))
    dt, compile_s, res = _time_jitted(fn, problem.plan, problem.stage_cost,
                                      bk, trials=1)
    sweeps = int(res.num_sweeps)
    cells = cfg.n_mesh_x * cfg.n_mesh_v * cfg.n_mesh_t * cfg.n_mesh_w
    evals = cells * 9 * sweeps

    # receding-horizon evaluation: full 3-channel solve + closed loop from
    # an off-nominal x0 (solve wall includes the channel compiles)
    t0 = time.perf_counter()
    sol = pos_att.solve(cfg, include_failure=False, impl="pallas")
    solve_all_s = time.perf_counter() - t0
    import numpy as _np

    x0 = _np.array(pos_att.default_x0(pitch_deg=2.0))
    x0[0] = -0.08
    t0 = time.perf_counter()
    _, (T, X, F_th, FM) = pos_att.receding_horizon(x0, sol=sol, t_final=10.0)
    _fetch(X)
    rollout_cold_s = time.perf_counter() - t0     # includes the scan compile
    x_err = float(_np.abs(_np.asarray(X)[-1, 0]))
    x0[0] = 0.06                                  # replan: compiled scan reused
    t0 = time.perf_counter()
    _, (T2, X2, _, _) = pos_att.receding_horizon(x0, sol=sol, t_final=10.0)
    _fetch(X2)
    rollout_warm_s = time.perf_counter() - t0

    # the 'rk4' SERVING mode: one fixed 4th-order step per 5 ms stage, no
    # adaptive while_loops — the fast replanning path (final state agrees
    # with ode45 to integration tolerance, tests/test_pos_att.py). Cold
    # includes its own scan compile; warm is the replanning number.
    t0 = time.perf_counter()
    T3, X3, _, _ = pos_att.get_optimal_path(sol, jnp.asarray(x0, jnp.float32),
                                            t_final=10.0, integrator="rk4")
    _fetch(X3)
    rollout_rk4_cold_s = time.perf_counter() - t0
    x0[0] = -0.05
    t0 = time.perf_counter()
    T4, X4, _, _ = pos_att.get_optimal_path(sol, jnp.asarray(x0, jnp.float32),
                                            t_final=10.0, integrator="rk4")
    _fetch(X4)
    rollout_rk4_warm_s = time.perf_counter() - t0

    # batched-x0 serving throughput on the HIGH-RES tables (207 MB of
    # policy — the affine-locate gathers amortize across the fleet)
    B = 256
    rng = _np.random.default_rng(0)
    x0s = _np.tile(_np.asarray(pos_att.default_x0()), (B, 1))
    x0s += rng.normal(0, 0.01, x0s.shape).astype(_np.float32)
    Tb, Xb, _, _ = pos_att.rollout_batch(sol, x0s, t_final=10.0)  # compile
    _fetch(Xb)
    t0 = time.perf_counter()
    Tb, Xb, _, _ = pos_att.rollout_batch(sol, x0s, t_final=10.0)
    _fetch(Xb)
    batch_warm_s = time.perf_counter() - t0
    return {
        "evals_per_s": round(evals / dt, 1),
        "wall_s": round(dt, 4),
        "compile_s": round(compile_s, 1),
        "sweeps": sweeps,
        "converged": bool(res.converged),
        "solve_all_channels_s": round(solve_all_s, 1),
        "receding_horizon_cold_s": round(rollout_cold_s, 2),
        "receding_horizon_warm_s": round(rollout_warm_s, 2),
        "receding_horizon_rk4_cold_s": round(rollout_rk4_cold_s, 2),
        "receding_horizon_rk4_warm_s": round(rollout_rk4_warm_s, 2),
        "batch": B,
        "batch_warm_s": round(batch_warm_s, 3),
        "batch_flight_s_per_s": round(B * float(Tb[-1]) / batch_warm_s, 1),
        "final_x_error_m": round(x_err, 4),
        "impl": "pallas-rowlane",
        "workload": f"pos-att high-res x channel {cells}x9 converged loop "
                    f"(cap {max_sweeps}) + 10 s receding-horizon rollout",
    }


def bench_attitude_6d():
    import jax

    from ocdp_tpu.engine import value_iteration_finite
    from ocdp_tpu.models import attitude
    from ocdp_tpu.ops.pallas_backup6 import build_pallas_backup_6d

    cfg = attitude.AttitudeConfig(n_mesh_w=11, n_mesh_q=10)
    sweeps = 50                       # envelope point, not a full solve
    cells = cfg.n_mesh_w**3 * cfg.n_mesh_q**3
    evals = cells * 27 * sweeps
    grid, plan, cost = attitude.build_full(cfg)
    bk = build_pallas_backup_6d(plan, cost)
    fn = jax.jit(lambda p_, c_, b: value_iteration_finite(
        p_, c_, sweeps, store_policies=False, backup=b))
    dt, compile_s, _ = _time_jitted(fn, plan, cost, bk, trials=1)
    return {
        "evals_per_s": round(evals / dt, 1),
        "wall_s": round(dt, 4),
        "compile_s": round(compile_s, 1),
        "sweeps": sweeps,
        "impl": "pallas6d",
        "workload": "attitude full 11^3x10^3 (1.33M cells) x 27 actions",
    }


def bench_attitude_6d_converged():
    """The BASELINE north-star workload: the FULL coupled 6-D attitude value
    iteration at the reference's historically-run 11^3 x 10^3 scale
    (Solver_attitude.asv:95-103), run to the reference's full 5999-sweep
    horizon (Solver_attitude.m:261-300) under the periodic-checksum
    converged engine (Solver_pos_att.m:268-286 machinery)."""
    import jax

    from ocdp_tpu.engine import value_iteration_converged
    from ocdp_tpu.models import attitude
    from ocdp_tpu.ops.pallas_backup6 import build_pallas_backup_6d

    cfg = attitude.AttitudeConfig(n_mesh_w=11, n_mesh_q=10)
    max_sweeps = cfg.n_stage - 1        # 5999: the reference's full horizon
    cells = cfg.n_mesh_w**3 * cfg.n_mesh_q**3
    grid, plan, cost = attitude.build_full(cfg)
    bk = build_pallas_backup_6d(plan, cost)
    fn = jax.jit(lambda p_, c_, b: value_iteration_converged(
        p_, c_, max_sweeps, check_every=50, tol=1e-2, backup=b))
    dt, compile_s, res = _time_jitted(fn, plan, cost, bk, trials=1)
    sweeps = int(res.num_sweeps)
    evals = cells * 27 * sweeps
    return {
        "evals_per_s": round(evals / dt, 1),
        "wall_s": round(dt, 4),
        "compile_s": round(compile_s, 1),
        "sweeps": sweeps,
        "converged": bool(res.converged),
        "impl": "pallas6d",
        "workload": "attitude full 11^3x10^3 x 27, full-horizon converged "
                    f"engine (cap {max_sweeps})",
    }


def main():
    import jax

    from ocdp_tpu.models import kirk
    from ocdp_tpu.profiling import enable_compilation_cache

    # persistent compile cache: the 6-D Mosaic kernel costs ~40-60 s to
    # compile cold; warm processes pay ~3 s (cache honored through the axon
    # tunnel). compile_s fields report whatever this process actually paid.
    enable_compilation_cache()

    which = os.environ.get(
        "BENCH_FAMILIES",
        "kirk,attitude_axis,position,pos_att_channel,pos_att_serving,"
        "attitude_6d,attitude_6d_converged,pos_att_highres",
    ).split(",")
    runners = {
        "kirk": bench_kirk,
        "attitude_axis": bench_attitude_axis,
        "position": bench_position,
        "pos_att_channel": bench_pos_att_channel,
        "pos_att_serving": bench_pos_att_serving,
        "attitude_6d": bench_attitude_6d,
        "attitude_6d_converged": bench_attitude_6d_converged,
        "pos_att_highres": bench_pos_att_highres,
    }
    unknown = [n.strip() for n in which if n.strip() not in runners]
    if unknown:
        raise SystemExit(f"unknown BENCH_FAMILIES entries: {unknown}; "
                         f"choose from {sorted(runners)}")
    families = {}
    for name in which:
        name = name.strip()
        try:
            families[name] = runners[name]()
        except Exception as e:  # record, don't kill the headline
            families[name] = {"error": f"{type(e).__name__}: {e}"[:300]}

    kcfg = kirk.KirkConfig()
    if "kirk" in families:
        base_stage = numpy_baseline_stage_seconds(kcfg)
        base_evals_per_s = kcfg.dx**2 * kcfg.du / base_stage
    else:  # baseline is a Kirk stand-in; skip its cost when kirk is excluded
        base_evals_per_s = 0.0

    head = families.get("kirk", {})
    value = head.get("evals_per_s", 0.0)
    print(json.dumps({
        "metric": "bellman_backups_per_s_per_chip",
        "value": value,
        "unit": "state-action evals/s",
        "vs_baseline": (round(value / base_evals_per_s, 2)
                        if value and base_evals_per_s else 0.0),
        "workload": head.get("workload", ""),
        "wall_s": head.get("wall_s", 0.0),
        "baseline_evals_per_s": round(base_evals_per_s, 1),
        "families": families,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
