"""(Re)generate the package's SELF-golden regression artifacts.

The reference regression-checks a fresh solve against a saved object
(``compare_data``, test/Dynamic_Solver.m:266-280) but ships a golden only
for the Kirk family (test/obj_1.mat). This script stores our own solved
values/argmin for the other three families at small-but-real configs —
reference grid constants, shortened horizons — so a kernel refactor cannot
silently shift family numerics within oracle tolerance (VERDICT r2 item 7).

Run on the CPU backend (the test suite's backend — tests/conftest.py):

    python scripts/make_goldens.py

Regenerating is a DELIBERATE act: only do it when a numerics change is
intended and understood, and say so in the commit message.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                          "tests", "golden")

# Horizons trimmed from the reference's 5999/1999 sweeps to keep the
# regression tests fast; grids/dynamics/costs are the reference's.
POSITION_SWEEPS = 300
ATTITUDE_SWEEPS = 300
POS_ATT_SWEEPS = 200


def make_position():
    from ocdp_tpu.models import position

    cfg = position.PositionConfig()
    sol = position.solve(cfg, num_sweeps=POSITION_SWEEPS, impl="stencil")
    path = os.path.join(GOLDEN_DIR, "position_golden.npz")
    np.savez_compressed(
        path,
        sweeps=POSITION_SWEEPS,
        values=np.asarray(sol.result.values),
        argmin=np.asarray(sol.result.argmin),
    )
    print("wrote", path, np.asarray(sol.result.values).shape)


def make_attitude_axis():
    from ocdp_tpu.models import attitude

    cfg = attitude.AttitudeConfig()
    # pinned to the strict reference-parity path (extrapolating edges)
    sol = attitude.solve_simplified(cfg, num_sweeps=ATTITUDE_SWEEPS,
                                    impl="stencil", edge="extrapolate")
    path = os.path.join(GOLDEN_DIR, "attitude_axis_golden.npz")
    np.savez_compressed(
        path,
        sweeps=ATTITUDE_SWEEPS,
        values=np.stack([np.asarray(v) for v in sol.values]),
        u_tables=np.stack([np.asarray(t) for t in sol.u_tables]),
    )
    print("wrote", path)


def make_pos_att_channel():
    from ocdp_tpu.models import pos_att

    cfg = pos_att.PosAttConfig()
    _, res = pos_att.solve_channel(cfg, "x", impl="stencil",
                                   max_sweeps=POS_ATT_SWEEPS)
    path = os.path.join(GOLDEN_DIR, "pos_att_channel_golden.npz")
    np.savez_compressed(
        path,
        sweeps=POS_ATT_SWEEPS,
        values=np.asarray(res.values),
        argmin=np.asarray(res.argmin),
    )
    print("wrote", path)


if __name__ == "__main__":
    make_position()
    make_attitude_axis()
    make_pos_att_channel()
