"""Measured comms term for the multi-chip budget math (VERDICT r3 item 7).

The v5p projection in NOTES.md previously asserted halo traffic is "trivial
next to compute" — an adjective. ``ocdp_tpu.parallel.comms`` makes it a
number: it compiles a row-sharded 6-D halo sweep on a virtual mesh and sums
the bytes every ``collective-permute`` in the optimized HLO actually moves,
cross-checked against the analytic halo size (tested equal in
tests/test_comms.py). This script runs that measurement and folds PUBLIC
per-chip ICI bandwidths (How to Scale Your Model,
jax-ml.github.io/scaling-book: v5p ~ 9e10 B/s/link x 3 torus axes x 2
directions ~ 5.4e11 B/s/chip) plus the measured single-chip evals/s into
the nominal 10^12-cell projection.

Usage: python scripts/comms_budget.py [n_mesh_w] [n_mesh_q] [n_dev]
(defaults 11 10 8 — CPU virtual mesh friendly: set
XLA_FLAGS=--xla_force_host_platform_device_count=8 off-TPU).
"""

import sys


def project(nominal_cells: float = 1e12, n_chips: int = 256,
            evals_per_s_chip: float = 1.3e10,
            ici_bytes_per_s: float = 5.4e11, ne: int = 1000,
            halo_rows: int = 24):
    """Sweep-time components for the nominal config on a v5p slice.

    ``ne`` = Euler lanes (10^3 nominal); halo bytes/device/sweep =
    halo_rows x NEp x 4 with NEp = roundup(ne, 128). ``halo_rows`` is the
    kernel's flat row-tap reach at the nominal grid (its omega taps span
    +-1 cell per axis -> ~(NW_row_strides + alignment) rows; 24 is the
    measured pad_top + pad_bot at 8-aligned tiles for +-1-cell reach)."""
    nep = -(-ne // 128) * 128
    comms_bytes = halo_rows * nep * 4
    t_comms = comms_bytes / ici_bytes_per_s
    t_compute = (nominal_cells * 27 / n_chips) / evals_per_s_chip
    return {
        "halo_bytes_per_dev_sweep": comms_bytes,
        "t_comms_s": t_comms,
        "t_compute_s": t_compute,
        "comms_fraction": t_comms / (t_comms + t_compute),
    }


def main():
    from ocdp_tpu.models.attitude import AttitudeConfig
    from ocdp_tpu.parallel.comms import measure_halo6_comms

    n_w = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_dev = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cfg = AttitudeConfig(n_mesh_w=n_w, n_mesh_q=n_q)
    m = measure_halo6_comms(cfg, n_dev)
    print("measured (virtual mesh, compiled HLO):")
    for k, v in m.items():
        print(f"  {k}: {v}")
    p = project()
    print("nominal 10^12-cell projection (v5p-256, public ICI numbers):")
    for k, v in p.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
