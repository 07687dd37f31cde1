"""pos-att channel expert-parallelism: 4 channels in one mesh dispatch.

The reference solves x / y / z / x-failure serially
(Solver_pos_att.m:217-240); ``solve_ep`` shards them over a mesh axis with
per-channel early stopping. Must be bitwise equal to the serial solves.
"""

import numpy as np
import pytest

from ocdp_tpu.models import pos_att


def small_cfg(**kw):
    return pos_att.PosAttConfig(n_mesh_x=8, n_mesh_v=8, n_mesh_t=6,
                                n_mesh_w=5, **kw)


@pytest.mark.parametrize("include_failure", [True, False])
def test_ep_matches_serial(include_failure):
    cfg = small_cfg()
    sol = pos_att.solve_ep(cfg, include_failure=include_failure,
                           max_sweeps=40)
    names = ["x", "y", "z"] + (["x_failure"] if include_failure else [])
    assert set(sol.controllers) == set(names)
    for name in names:
        ctrl_ref, _ = pos_att.solve_channel(
            cfg, name.replace("_failure", ""), failure="failure" in name,
            impl="gather", max_sweeps=40)
        got = sol.controllers[name]
        np.testing.assert_array_equal(got.values, ctrl_ref.values)
        np.testing.assert_array_equal(got.argmin, ctrl_ref.argmin)
        np.testing.assert_array_equal(got.forces, ctrl_ref.forces)


def test_ep_per_channel_early_stop_freeze():
    """With a huge tolerance every channel stops at its first check and the
    frozen tables equal the serial early-stopped solves."""
    cfg = small_cfg(tol=1e12, check_every=5)
    sol = pos_att.solve_ep(cfg, max_sweeps=40)
    for name in ("x", "y", "z", "x_failure"):
        ctrl_ref, res_ref = pos_att.solve_channel(
            cfg, name.replace("_failure", ""), failure="failure" in name,
            impl="gather", max_sweeps=40)
        assert bool(res_ref.converged)
        got = sol.controllers[name]
        np.testing.assert_array_equal(got.values, ctrl_ref.values)
        np.testing.assert_array_equal(got.argmin, ctrl_ref.argmin)


def test_ep_failure_channel_action_padding():
    """The padded (inf-cost) combos of the 6-action failure channel must
    never be selected."""
    cfg = small_cfg()
    sol = pos_att.solve_ep(cfg, max_sweeps=10)
    n_fail_actions = sol.controllers["x_failure"].forces.shape[0]
    assert n_fail_actions == 6
    assert sol.controllers["x_failure"].argmin.max() < n_fail_actions


def test_sharded_channel_solve_matches_serial():
    """solve_channel_sharded (halo + replicated engines) == the single-chip
    early-stopping channel solve — the high-res scaling path of
    BASELINE.json configs #4/#5."""
    import jax
    from jax.sharding import Mesh

    cfg = pos_att.PosAttConfig(n_mesh_x=16, n_mesh_v=8, n_mesh_t=6,
                               n_mesh_w=5)
    ref_ctrl, ref_res = pos_att.solve_channel(cfg, "x", max_sweeps=30)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("s",))
    # halo shares the serial solve's stencil backup -> bitwise; replicated
    # uses the gather backup -> f32 summation-order differences only
    for engine, atol in (("halo", 0.0), ("replicated", 1e-4)):
        ctrl, res = pos_att.solve_channel_sharded(cfg, "x", mesh,
                                                  max_sweeps=30,
                                                  engine=engine)
        np.testing.assert_allclose(ctrl.values, ref_ctrl.values, atol=atol)
        agree = (ctrl.argmin == ref_ctrl.argmin).mean()
        assert agree > 0.999, engine
        assert int(res.num_sweeps) == int(ref_res.num_sweeps)
