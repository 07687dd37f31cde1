"""Segmented solve: streaming policies, checkpoints, resume == one-shot."""

import numpy as np

from ocdp_tpu import value_iteration_finite
from ocdp_tpu.engine import value_iteration_segmented
from ocdp_tpu.io import load_values
from ocdp_tpu.models import kirk


def test_segmented_matches_oneshot_with_streamed_policies():
    p = kirk.build(kirk.KirkConfig(N=14, dx=12, du=9))
    ref = value_iteration_finite(p.plan, p.stage_cost, 13, store_policies=True)
    got = value_iteration_segmented(p.plan, p.stage_cost, 13, segment_size=5,
                                    store_policies=True)
    np.testing.assert_array_equal(np.asarray(got.values), np.asarray(ref.values))
    np.testing.assert_array_equal(np.asarray(got.argmin), np.asarray(ref.argmin))
    assert isinstance(got.policies, np.ndarray)  # host-resident
    np.testing.assert_array_equal(got.policies, np.asarray(ref.policies))


def test_checkpoint_and_resume(tmp_path):
    p = kirk.build(kirk.KirkConfig(N=14, dx=12, du=9))
    ckpt = str(tmp_path / "vi.npz")
    seen = []
    ref = value_iteration_finite(p.plan, p.stage_cost, 12)

    # run 7 of 12 sweeps, checkpointing
    value_iteration_segmented(p.plan, p.stage_cost, 7, segment_size=4,
                              checkpoint_path=ckpt,
                              checkpoint_axes=p.grid.axes,
                              on_segment=lambda k, v: seen.append(k))
    assert seen == [4, 7]
    v, sweep, axes = load_values(ckpt)
    assert sweep == 7 and len(axes) == 2

    # resume the remaining 5
    got = value_iteration_segmented(p.plan, p.stage_cost, 12, segment_size=4,
                                    init_values=v, start_sweep=sweep)
    np.testing.assert_array_equal(np.asarray(got.values), np.asarray(ref.values))
    np.testing.assert_array_equal(np.asarray(got.argmin), np.asarray(ref.argmin))
