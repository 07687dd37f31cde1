"""Self-golden regression for the non-Kirk families (VERDICT r2 item 7).

The reference ships a golden artifact only for the Kirk problem
(test/obj_1.mat, checked by ``compare_data`` — test/Dynamic_Solver.m:
266-280). These tests hold the other three families to the same standard
against this package's OWN stored solves (scripts/make_goldens.py):
reference grid constants, shortened horizons, stencil impl on the CPU test
backend. A kernel refactor that shifts family numerics beyond f32
reduction-order noise fails here even if it stays inside oracle tolerance.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    with np.load(os.path.join(GOLDEN_DIR, name)) as z:
        return {k: z[k] for k in z.files}


def test_position_matches_self_golden():
    from ocdp_tpu.models import position

    g = _load("position_golden.npz")
    sol = position.solve(position.PositionConfig(),
                         num_sweeps=int(g["sweeps"]), impl="stencil")
    np.testing.assert_allclose(np.asarray(sol.result.values), g["values"],
                               rtol=1e-6, atol=1e-6)
    agree = (np.asarray(sol.result.argmin) == g["argmin"]).mean()
    assert agree > 0.9995, f"argmin agreement {agree}"


def test_attitude_axis_matches_self_golden():
    from ocdp_tpu.models import attitude

    g = _load("attitude_axis_golden.npz")
    sol = attitude.solve_simplified(attitude.AttitudeConfig(),
                                    num_sweeps=int(g["sweeps"]),
                                    impl="stencil", edge="extrapolate")
    vals = np.stack([np.asarray(v) for v in sol.values])
    np.testing.assert_allclose(vals, g["values"], rtol=1e-6, atol=1e-6)
    tabs = np.stack([np.asarray(t) for t in sol.u_tables])
    agree = (tabs == g["u_tables"]).mean()
    assert agree > 0.9995, f"policy agreement {agree}"


def test_pos_att_channel_matches_self_golden():
    from ocdp_tpu.models import pos_att

    g = _load("pos_att_channel_golden.npz")
    _, res = pos_att.solve_channel(pos_att.PosAttConfig(), "x",
                                   impl="stencil",
                                   max_sweeps=int(g["sweeps"]))
    np.testing.assert_allclose(np.asarray(res.values), g["values"],
                               rtol=1e-6, atol=1e-6)
    agree = (np.asarray(res.argmin) == g["argmin"]).mean()
    assert agree > 0.9995, f"argmin agreement {agree}"


@pytest.mark.parametrize("name", ["position_golden.npz",
                                  "attitude_axis_golden.npz",
                                  "pos_att_channel_golden.npz"])
def test_golden_artifacts_present_and_finite(name):
    g = _load(name)
    assert np.isfinite(g["values"]).all()
    assert g["values"].dtype == np.float32
