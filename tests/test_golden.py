"""Golden regression on the Kirk ch.3 configuration against obj_1.mat.

The reference regression-checks a fresh solve against a saved object with
``compare_data``/``isequal`` (test/Dynamic_Solver.m:266-280, golden artifact
test/obj_1.mat produced by the N=130/dx=35/du=100 config of obj_1.txt).

Two golden sources here:

* ``tests/golden/obj1_reference.npz`` — the REFERENCE's own solved
  ``J_star``/``u_star`` stacks, extracted from obj_1.mat's MCOS object
  serialization by ``ocdp_tpu.matref`` (the actual MATLAB ground truth;
  float64 run, so agreement is to f32 tolerance).
* ``tests/golden/kirk_golden.npz`` — this package's own stored solve
  (values, argmin, rollout trajectory from X0=[2;1]) for tight bitwise-class
  regression across impls.
"""

import os

import numpy as np
import pytest

from ocdp_tpu.diagnostics import compare_solutions
from ocdp_tpu.models import kirk

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "kirk_golden.npz")
REF_GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                          "obj1_reference.npz")


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def ref_golden():
    with np.load(REF_GOLDEN) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def golden_solution():
    return kirk.solve(kirk.KirkConfig.golden(), impl="gather")


def test_obj1_config_matches_golden_config(ref_golden):
    """The extracted constructor params equal KirkConfig.golden()'s
    (test/obj_1.txt:1-17)."""
    cfg = kirk.KirkConfig.golden()
    assert int(ref_golden["N"]) == cfg.N
    assert int(ref_golden["dx"]) == cfg.dx
    assert int(ref_golden["du"]) == cfg.du
    np.testing.assert_allclose(ref_golden["A"], np.asarray(cfg.A))
    np.testing.assert_allclose(ref_golden["B"].ravel(), np.asarray(cfg.B))
    np.testing.assert_allclose(np.diag(ref_golden["Q"]), np.asarray(cfg.Q))
    assert float(ref_golden["R"]) == cfg.R
    assert (float(ref_golden["x_min"]), float(ref_golden["x_max"])) == \
        (cfg.x_min, cfg.x_max)
    assert (float(ref_golden["u_min"]), float(ref_golden["u_max"])) == \
        (cfg.u_min, cfg.u_max)


def test_final_values_match_reference_mat(ref_golden, golden_solution):
    """Our fully-iterated table vs the reference's J_star(:,:,1).

    The reference run was float64 (pre-'single' revision); measured
    agreement is ~3e-3 abs / 8e-6 rel over values up to ~366.
    """
    vals = np.asarray(golden_solution.result.values)
    ref = ref_golden["J_star"][:, :, 0]
    np.testing.assert_allclose(vals, ref, rtol=1e-4, atol=1e-2)


def test_per_stage_values_match_reference_mat(ref_golden):
    """Every stage's value table vs the reference's J_star stack.

    Sweep j (0-based) produces the table the reference stores at
    k_s = N-1-j (1-based slice, test/Dynamic_Solver.m:88,100), captured
    here via the engine's probe window.
    """
    import jax

    from ocdp_tpu.engine import value_iteration_finite

    p = kirk.build(kirk.KirkConfig.golden())
    dx = p.config.dx
    res = jax.jit(lambda plan, cost: value_iteration_finite(
        plan, cost, p.config.N - 1, store_policies=False,
        probe_window=((0, dx), (0, dx))))(p.plan, p.stage_cost)
    probes = np.asarray(res.probes)                       # (N-1, dx, dx)
    ref_stack = np.moveaxis(ref_golden["J_star"][:, :, :p.config.N - 1],
                            2, 0)[::-1]                   # sweep order
    np.testing.assert_allclose(probes, ref_stack, rtol=1e-4, atol=1e-2)


def test_policy_stack_matches_reference_mat(ref_golden, golden_solution):
    """Per-stage u* tables vs the reference's u_star stack.

    Exact equality except where f32-vs-f64 rounding flips a first-min tie
    to an adjacent control (measured: 99.99% exact, all mismatches one
    control step of 50/99).
    """
    ours = np.asarray(golden_solution.u_star)             # (N-1, dx, dx)
    ref = np.moveaxis(ref_golden["u_star"][:, :, :129], 2, 0)
    diff = np.abs(ours - ref)
    u_step = (ref_golden["u_max"] - ref_golden["u_min"]) / (ref_golden["du"] - 1)
    assert (diff < 1e-4).mean() > 0.999
    assert diff.max() < 1.5 * u_step


def test_gather_solve_matches_golden(golden):
    sol = kirk.solve(kirk.KirkConfig.golden(), impl="gather")
    np.testing.assert_allclose(np.asarray(sol.result.values), golden["values"],
                               rtol=1e-6, atol=1e-5)
    agree = (np.asarray(sol.result.argmin) == golden["argmin"]).mean()
    assert agree > 0.999


def test_stencil_solve_matches_golden(golden):
    sol = kirk.solve(kirk.KirkConfig.golden(), impl="stencil")
    np.testing.assert_allclose(np.asarray(sol.result.values), golden["values"],
                               rtol=1e-5, atol=1e-4)
    agree = (np.asarray(sol.result.argmin) == golden["argmin"]).mean()
    assert agree > 0.995


def test_rollout_matches_golden_trajectory(golden):
    sol = kirk.solve(kirk.KirkConfig.golden(), impl="gather")
    X, U = kirk.optimal_path(sol, (2.0, 1.0))
    np.testing.assert_allclose(np.asarray(X), golden["X"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(U), golden["U"], atol=1e-3)


def test_compare_solutions_tolerance_mode(golden):
    class Saved:
        values = golden["values"]
        argmin = golden["argmin"]

    sol = kirk.solve(kirk.KirkConfig.golden(), impl="gather")
    rep = compare_solutions(sol.result, Saved, atol=1e-4)
    assert rep.equal, rep


REF_MAT = "/root/reference/test/obj_1.mat"


@pytest.mark.skipif(not os.path.exists(REF_MAT),
                    reason="reference checkout not present")
def test_matref_extraction_roundtrip(ref_golden):
    """ocdp_tpu.matref re-extracts obj_1.mat to the committed npz arrays."""
    from ocdp_tpu.matref import load_dynamic_solver_golden

    g = load_dynamic_solver_golden(REF_MAT)
    assert g["J_star"].shape == (35, 35, 130)
    np.testing.assert_allclose(g["J_star"].astype(np.float32),
                               ref_golden["J_star"])
    np.testing.assert_allclose(g["u_star"].astype(np.float32),
                               ref_golden["u_star"])
    # terminal slice N is the untouched preallocation (zeros)
    assert np.all(g["J_star"][:, :, -1] == 0)
