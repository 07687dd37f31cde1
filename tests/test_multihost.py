"""Real 2-process jax.distributed execution (the DCN-analog test).

SURVEY.md §2.5/§5 mandates `jax.distributed` as the multi-host backend; this
test actually RUNS it: two local processes, 4 virtual CPU devices each,
one global 8-device mesh, a sharded Kirk solve whose per-sweep all_gather
crosses the process boundary. Results must equal the single-process solve
bitwise.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

from ocdp_tpu import value_iteration_finite
from ocdp_tpu.models import kirk

_WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_solve_matches_single_process():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, f"p{i}.npz") for i in range(2)]
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [
            subprocess.Popen(
                [sys.executable, _WORKER, coordinator, "2", str(i), outs[i]],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(2)
        ]
        logs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=240)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            logs.append(out.decode(errors="replace"))
        for p, log in zip(procs, logs):
            assert p.returncode == 0, f"worker failed:\n{log}"

        problem = kirk.build(kirk.KirkConfig(N=12, dx=16, du=12))
        ref = value_iteration_finite(problem.plan, problem.stage_cost, 11)
        # halo reference: the single-chip stencil engine (the halo engine's
        # bitwise contract), same geometry the workers ran
        from ocdp_tpu.ops.stencil import build_stencil_backup

        problem2 = kirk.build(kirk.KirkConfig(N=6, dx=64, du=12))
        sb = build_stencil_backup(problem2.plan, problem2.stage_cost,
                                  action_chunk=12, state_blocks=8)
        ref_h = value_iteration_finite(problem2.plan, problem2.stage_cost, 5,
                                       backup=sb)
        ref_hv = np.asarray(ref_h.values)
        ref_ha = np.asarray(ref_h.argmin)
        seen_rows = set()
        for out_path in outs:
            with np.load(out_path) as z:
                np.testing.assert_array_equal(z["values"],
                                              np.asarray(ref.values))
                np.testing.assert_array_equal(z["argmin"],
                                              np.asarray(ref.argmin))
                # each process's local halo shards match the single-chip
                # reference rows bitwise
                rows = z["halo_values"].shape[1]
                for s, v, a in zip(z["halo_starts"], z["halo_values"],
                                   z["halo_argmin"]):
                    np.testing.assert_array_equal(v, ref_hv[s:s + rows])
                    np.testing.assert_array_equal(a, ref_ha[s:s + rows])
                    seen_rows.update(range(s, s + rows))
        assert seen_rows == set(range(64))   # both processes covered all rows
