"""Roofline accounting for the bench families (VERDICT r4 item 4).

For each north-star family this script measures warm s/sweep on the
attached chip and combines it with an EXACT per-sweep HBM traffic model —
the value table + every array the kernel actually streams (taken from the
backup's own ``sweep_args`` leaves, not estimated) + the value/argmin
outputs — and an approximate VPU op model (FMAs + selects + lane rolls
counted at 1 op/element) derived from the kernel's tap/combo metadata.

Peaks used (TPU v5e, public numbers):
* HBM: 819 GB/s
* VPU: 8 ALUs x (8, 128) lanes x ~0.94 GHz ~= 7.7e12 f32 ops/s. The MXU
  (197 bf16 TFLOPs) is irrelevant here: value-iteration backups are
  gather/lerp/min kernels with no matmul contraction, so the VPU number
  is the compute roof that matters.

Output: one markdown table row per family + a JSON line; NOTES.md carries
the round-5 snapshot. The first executable timed in a fresh process
reports a bogus ~0 wall through the axon tunnel (measured round 5); a
throwaway warmup family absorbs it.

Usage: PYTHONPATH=. python scripts/roofline.py [--families a,b,...]
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ocdp_tpu.engine import value_iteration_finite

HBM_PEAK = 819e9          # bytes/s, v5e
VPU_PEAK = 7.7e12         # f32 lane-ops/s, v5e (8 ALUs x 1024 lanes x .94GHz)


def _fetch(res):
    """A real host fetch, not block_until_ready: through the axon tunnel
    block_until_ready on a fresh executable can return before the work
    (bogus ~0 walls measured round 5); fetching a scalar cannot."""
    return (float(np.asarray(res.values.ravel()[0]))
            + float(np.asarray(res.argmin.ravel()[0])))


def _time_sweeps(fn, args, sweeps, trials):
    res = fn(*args)
    _fetch(res)
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        res = fn(*args)
        _fetch(res)
        best = min(best, time.perf_counter() - t0)
    return best / sweeps, res


def pallas_bytes_per_sweep(bk):
    """Exact HBM bytes each sweep moves for a PallasBackup6D-family kernel:
    table read + every sweep_arg leaf + the two outputs. (VMEM BlockSpec
    copies stage THROUGH VMEM; the source/sink is HBM every sweep because
    the scan carry and the pallas outputs are HBM-backed.)"""
    bk = getattr(bk, "bk", bk)          # unwrap PermutedRowLaneBackup
    table = bk.NWp * bk.NEp * 4
    args_b = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for a in bk.sweep_args)
    out_v = bk.NWp * bk.NEp * 4
    out_a = bk.NWp * bk.NEp * bk.argmin_dtype.itemsize
    return table + args_b + out_v + out_a


def pallas_ops_per_sweep(bk):
    """Approximate VPU lane-ops per sweep (per-element FMAs = 2 ops,
    rolls/selects/compares = 1) from the kernel's own structure."""
    bk = getattr(bk, "bk", bk)          # unwrap PermutedRowLaneBackup
    cells = bk.NWp * bk.NEp
    ops = 0
    # lane phase: per row-combo j, joint lane taps (or separable passes)
    if bk.lane_separable:
        per_j = sum(2 * len(t) + len(t) for t in bk.e_taps)  # FMA + roll
    else:
        per_j = 3 * len(bk.lane_deltas)                      # FMA + roll
    ops += per_j * len(bk.row_combos)
    # action phase
    m = bk.action_digits
    if m and len(bk.w_taps) == 3:
        t0s, t01s, b_slot, c_slot = bk._bc_layout()
        ops += 2 * len(b_slot) * 2 + 2 * len(c_slot) * 2     # bc contraction
        ops += bk.n_actions * (2 * len(t0s) + 3)             # final + min
    else:
        ops += bk.n_actions * (2 * len(bk.row_combos) + 3)
    return ops * cells


def fam_kirk():
    from ocdp_tpu.models import kirk
    from ocdp_tpu.models.kirk import _build_shear_walkdown, _separable_cost_terms
    from ocdp_tpu.ops.pallas_shear import build_pallas_shear_backup

    cfg = kirk.KirkConfig()
    problem = kirk.build(cfg)
    bk = _build_shear_walkdown(build_pallas_shear_backup, problem, cfg.du,
                               start=50, cost_terms=_separable_cost_terms(cfg))
    sweeps = cfg.N - 1
    fn = jax.jit(lambda p, c, b: value_iteration_finite(
        p, c, sweeps, store_policies=False, backup=b))
    sps, _ = _time_sweeps(fn, (problem.plan, problem.stage_cost, bk),
                          sweeps, 3)
    cells = cfg.dx * cfg.dx
    # 2-D shear kernel: table + cost (S x A f32) + outputs each sweep
    byts = (2 * cells * 4) + cells * cfg.du * 4 + cells * 4
    # per eval: 1-D lerp row (2 FMA) x 2 corners + cost add + min cmp/sel
    ops = cells * cfg.du * (4 + 1 + 3)
    return dict(cells=cells, actions=cfg.du, s_per_sweep=sps,
                bytes_per_sweep=byts, ops_per_sweep=ops, kernel="pallas-shear")


def fam_attitude_axis():
    from ocdp_tpu.grids import Grid, linspace_axis
    from ocdp_tpu.models import attitude
    from ocdp_tpu.models.attitude import _DEG, _quirk
    from ocdp_tpu.ops.interp import build_plan
    from ocdp_tpu.ops.rowband import build_rowband_backup

    # axis 0 of solve_simplified, same construction (models/attitude.py)
    cfg = attitude.AttitudeConfig()
    t_lo, t_hi = cfg.euler_ranges[0]
    s_w = linspace_axis(cfg.w_min_deg * _DEG, cfg.w_max_deg * _DEG,
                        cfg.n_mesh_w)
    s_t = linspace_axis(t_lo, t_hi, cfg.n_mesh_t)
    grid = Grid((s_w, s_t))
    J = cfg.inertia_diag[0]
    w = jnp.asarray(s_w)[:, None, None]
    t = jnp.asarray(s_t)[None, :, None]
    u = jnp.asarray(cfg.u_vector)[None, None, :]
    plan = build_plan(grid.axes,
                      (w + cfg.h * u / J,
                       t + cfg.h * w * _quirk(cfg.h, cfg.rk4_t_parity)),
                      edge="clamp")
    cost = cfg.Qw[0] * w**2 + cfg.Qq[0] * t**2 + cfg.R[0] * u**2
    bk = build_rowband_backup(plan, cost)
    sweeps = 500
    # rowband is not a traced-argument backup: close over it (weights fold)
    fn = jax.jit(lambda p, c: value_iteration_finite(
        p, c, sweeps, store_policies=False, backup=bk))
    sps, _ = _time_sweeps(fn, (plan, cost), sweeps, 3)
    cells = int(np.prod(plan.grid_shape))
    na = plan.query_shape[-1]
    byts = 2 * cells * 4 + cells * na * 4 + cells * 4
    ops = cells * na * (2 * 4 + 1 + 3)   # 2-D bilinear (4 taps) + add + min
    return dict(cells=cells, actions=na, s_per_sweep=sps,
                bytes_per_sweep=byts, ops_per_sweep=ops, kernel="rowband-xla")


def fam_pos_att_channel(highres=False):
    from ocdp_tpu.models import pos_att

    cfg = pos_att.PosAttConfig.high_res() if highres else pos_att.PosAttConfig()
    problem = pos_att.build_channel(cfg, "x", with_cost=False)
    bk = pos_att.build_channel_rowlane_backup(cfg, problem)
    sweeps = 200
    fn = jax.jit(lambda p, b: value_iteration_finite(
        p, None, sweeps, store_policies=False, backup=b))
    sps, _ = _time_sweeps(fn, (problem.plan, bk), sweeps, 3)
    cells = int(np.prod(problem.grid.shape))
    return dict(cells=cells, actions=9, s_per_sweep=sps,
                bytes_per_sweep=pallas_bytes_per_sweep(bk),
                ops_per_sweep=pallas_ops_per_sweep(bk),
                kernel="pallas-rowlane" + (" hbm" if getattr(bk, "bk", bk).table_hbm else ""))


def fam_attitude_6d(nw=11, nq=10, sweeps=50, **build_kw):
    from ocdp_tpu.models import attitude
    from ocdp_tpu.ops.interp import PlanShape
    from ocdp_tpu.ops.pallas_backup6 import build_pallas_backup_6d

    cfg = attitude.AttitudeConfig(n_mesh_w=nw, n_mesh_q=nq)
    grid, plan, cost = attitude.build_full(cfg, **build_kw)
    cells = nw ** 3 * nq ** 3
    flat = len(plan.query_shape) != plan.ndim + 1
    bk = build_pallas_backup_6d(plan, cost, consume_plan=flat,
                                argmin_dtype=jnp.uint8 if flat else jnp.int32,
                                carry_padded=flat)
    if flat:
        plan, cost = PlanShape.of(plan), None
    fn = jax.jit(lambda b: value_iteration_finite(
        plan, cost, sweeps, store_policies=False, backup=b,
        narrow_argmin_result=flat))
    sps, _ = _time_sweeps(fn, (bk,), sweeps, 2)
    return dict(cells=cells, actions=27, s_per_sweep=sps,
                bytes_per_sweep=pallas_bytes_per_sweep(bk),
                ops_per_sweep=pallas_ops_per_sweep(bk),
                kernel="pallas6d" + (" flat+carry" if flat else "")
                + (" hbm" if bk.table_hbm else ""))


FAMILIES = {
    "warmup": lambda: fam_attitude_6d(5, 4, sweeps=4),  # absorbs the bogus
    "kirk": fam_kirk,                                   # first-exec timing
    "attitude_axis": fam_attitude_axis,
    "pos_att_channel": fam_pos_att_channel,
    "pos_att_highres": lambda: fam_pos_att_channel(highres=True),
    "attitude_6d": fam_attitude_6d,
    "attitude_6d_env": lambda: fam_attitude_6d(
        27, 14, sweeps=10, lane_mode="recompute", flat=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    args = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)
    rows = []
    for name in args.families.split(","):
        t0 = time.perf_counter()
        r = FAMILIES[name]()
        if name == "warmup":
            continue
        sps = r["s_per_sweep"]
        gbs = r["bytes_per_sweep"] / sps / 1e9
        gops = r["ops_per_sweep"] / sps / 1e9
        evals = r["cells"] * r["actions"] / sps
        row = dict(family=name, kernel=r["kernel"], cells=r["cells"],
                   actions=r["actions"], ms_per_sweep=round(sps * 1e3, 3),
                   evals_per_s=float(f"{evals:.3g}"),
                   hbm_gb_per_s=round(gbs, 1),
                   hbm_pct_peak=round(100 * gbs * 1e9 / HBM_PEAK, 1),
                   vpu_gops_per_s=round(gops, 1),
                   vpu_pct_peak=round(100 * gops * 1e9 / VPU_PEAK, 1),
                   wall_s=round(time.perf_counter() - t0, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)
    print("\n| family | kernel | cells | ms/sweep | evals/s | HBM GB/s "
          "(%peak) | VPU Gops/s (%peak) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['family']} | {r['kernel']} | {r['cells']/1e6:.2f}M | "
              f"{r['ms_per_sweep']} | {r['evals_per_s']:.3g} | "
              f"{r['hbm_gb_per_s']} ({r['hbm_pct_peak']}%) | "
              f"{r['vpu_gops_per_s']} ({r['vpu_pct_peak']}%) |")


if __name__ == "__main__":
    main()
