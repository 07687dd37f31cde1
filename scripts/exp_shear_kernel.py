"""Time pallas_shear full-workload Kirk sweeps on the chip + argmin parity
vs the gather oracle (quick kernel-variant iteration harness).

Usage: python scripts/exp_shear_kernel.py [action_chunk ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ocdp_tpu.engine import value_iteration_finite
from ocdp_tpu.models import kirk
from ocdp_tpu.ops.backup import bellman_backup
from ocdp_tpu.ops.pallas_shear import build_pallas_shear_backup


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [20]
    print("device:", jax.devices()[0], flush=True)
    cfg = kirk.KirkConfig()
    p = kirk.build(cfg)
    sweeps = cfg.N - 1
    evals = cfg.dx * cfg.dx * cfg.du * sweeps

    # small-config argmin parity vs the gather oracle first
    cfg_s = kirk.KirkConfig.golden()
    ps = kirk.build(cfg_s)
    bks = build_pallas_shear_backup(ps.plan, ps.stage_cost, action_chunk=10)
    v = jax.random.normal(jax.random.PRNGKey(1), ps.plan.grid_shape)
    r_k = bks(v)
    r_o = bellman_backup(v, ps.plan, ps.stage_cost)
    agree = float(jnp.mean((r_k.argmin == r_o.argmin).astype(jnp.float32)))
    vmax = float(jnp.max(jnp.abs(r_k.values - r_o.values)))
    print(f"parity: argmin agree {agree:.6f}, |dV|max {vmax:.2e}", flush=True)

    from ocdp_tpu.models.kirk import _separable_cost_terms
    ct = _separable_cost_terms(cfg)
    f_b = jax.jit(lambda plan, cost, b: value_iteration_finite(
        plan, cost, sweeps, store_policies=False, backup=b))
    for ch in chunks:
        bk = build_pallas_shear_backup(p.plan, p.stage_cost, action_chunk=ch,
                                       cost_terms=ct)
        t0 = time.perf_counter()
        fetch(f_b(p.plan, p.stage_cost, bk).values)
        comp = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(f_b(p.plan, p.stage_cost, bk).values)
            best = min(best, time.perf_counter() - t0)
        print(f"chunk={ch:3d}: {best:.4f} s = {evals / best:.3e} evals/s "
              f"({best / sweeps * 1e3:.3f} ms/sweep, compile {comp:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
