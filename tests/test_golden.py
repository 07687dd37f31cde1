"""Golden regression on the Kirk ch.3 configuration (obj_1 analog).

The reference regression-checks a fresh solve against a saved object with
``compare_data``/``isequal`` (test/Dynamic_Solver.m:266-280, golden artifact
test/obj_1.mat produced by the N=130/dx=35/du=100 config of obj_1.txt).
Here the golden arrays (values, argmin, rollout trajectory from X0=[2;1])
live in tests/golden/kirk_golden.npz; fresh solves must reproduce them —
bitwise for the same impl on the same backend class, to float32 rounding for
the stencil fast path.
"""

import os

import numpy as np
import pytest

from ocdp_tpu.diagnostics import compare_solutions
from ocdp_tpu.models import kirk

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "kirk_golden.npz")


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


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
