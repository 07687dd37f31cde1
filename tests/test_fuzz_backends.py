"""Randomized cross-implementation agreement (property fuzz).

Every backup implementation claims the same semantics: multilinear
interpolation with MATLAB extrapolation, fused cost add, first-min argmin.
The per-family tests pin specific geometries; this fuzz sweeps RANDOM
axis-structured 2-D problems (random grids, ranges, step sizes, costs)
through the gather oracle, the banded stencil, and — where its structure
check admits the plan — the row-band backup, and demands agreement. A
regression that only bites some geometry class (band widths, clamp spans,
shift signs) has many more chances to surface here than in the pinned
tests.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ocdp_tpu.grids import Grid, linspace_axis
from ocdp_tpu.ops.backup import bellman_backup
from ocdp_tpu.ops.interp import build_plan
from ocdp_tpu.ops.rowband import RowBandStructureError, build_rowband_backup
from ocdp_tpu.ops.stencil import build_stencil_backup


def _random_axis_problem(rng):
    """Random (omega, theta)-class 2-D problem: axis-0 query = row value +
    per-action constant; axis-1 query = lane value + row-dependent shift."""
    n1 = int(rng.integers(12, 90))
    n2 = int(rng.integers(10, 70))
    w_max = float(rng.uniform(0.2, 2.5))
    t_max = float(rng.uniform(0.02, 0.6))
    h = float(rng.uniform(0.002, 0.03))
    J = float(rng.uniform(0.01, 0.1))
    n_u = int(rng.integers(2, 6))
    u_vals = np.sort(rng.uniform(-0.2, 0.2, n_u)).astype(np.float32)

    s_w = linspace_axis(-w_max, w_max, n1)
    s_t = linspace_axis(-t_max, t_max, n2)
    grid = Grid((s_w, s_t))
    w = jnp.asarray(s_w)[:, None, None]
    t = jnp.asarray(s_t)[None, :, None]
    u = jnp.asarray(u_vals)[None, None, :]
    plan = build_plan(grid.axes, (w + h * u / J, t + h * w))
    qw, qt, r = rng.uniform(0.1, 10.0, 3)
    cost = jnp.broadcast_to(qw * w**2 + qt * t**2 + r * u**2,
                            plan.query_shape).astype(jnp.float32)
    return plan, cost


@pytest.mark.parametrize("seed", range(12))
def test_random_2d_geometries_agree(seed):
    rng = np.random.default_rng(seed)
    plan, cost = _random_axis_problem(rng)
    v = jnp.asarray(rng.normal(size=plan.grid_shape).astype(np.float32) * 5.0)

    ref = bellman_backup(v, plan, cost)
    rv, ra = np.asarray(ref.values), np.asarray(ref.argmin)
    scale = max(1.0, float(np.abs(rv).max()))

    sb = build_stencil_backup(plan, cost)
    out = sb(v)
    np.testing.assert_allclose(np.asarray(out.values), rv,
                               atol=2e-5 * scale)
    assert (np.asarray(out.argmin) == ra).mean() > 0.999

    try:
        rb = build_rowband_backup(plan, cost)
    except RowBandStructureError:
        # coarse-grid f32 boundary wobble: legitimately rejected
        return
    out = rb(v)
    np.testing.assert_allclose(np.asarray(out.values), rv,
                               atol=2e-5 * scale)
    assert (np.asarray(out.argmin) == ra).mean() > 0.999


def test_fuzz_covers_rowband_often():
    """The fuzz must actually exercise the row-band path for a healthy
    share of geometries (guards against a structure check that silently
    starts rejecting everything). Self-contained: rebuilds the 12 seeds'
    row-band admissions directly (cheap host-side structure checks) rather
    than sharing state with the agreement tests — under pytest-xdist or
    ``-k`` selections a shared-state guard silently stops guarding."""
    admitted = 0
    for seed in range(12):
        rng = np.random.default_rng(seed)
        plan, cost = _random_axis_problem(rng)
        try:
            build_rowband_backup(plan, cost)
        except RowBandStructureError:
            continue
        admitted += 1
    assert admitted >= 6, f"row-band admitted only {admitted}/12 geometries"
