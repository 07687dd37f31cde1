"""Pallas TPU kernel: Bellman backup for 2-state LTI regulators (Kirk shape).

The Kirk workload (test/Dynamic_Solver.m: 100x100 states x 1000 controls)
stresses the stencil path in two ways: the control term drags queries ~49
cells along the x2 axis, and boundary extrapolation clamps inflate the
residual band to ~47 taps. This kernel sidesteps both by evaluating the x2
interpolation as a **one-hot matmul on the MXU**:

    interp(p) = sum_t1 w1[p, t1] * sum_k2 W2[p, k2] * V[row(t1), k2]

* W2 is the dense one-hot interpolation matrix over the FULL x2 axis —
  built in VMEM from iota compares, fed straight to the MXU (``pl.dot``),
  never touching HBM. Arbitrary lo2 (including clamped/extrapolating
  queries) is just another one-hot row — no band, no padding on x2.
* the x1 axis keeps the narrow banded-stencil form (its reach is a few
  cells and clamping cannot widen it beyond the band, see NOTES.md): rows
  come from an 8-aligned VMEM window with static offsets.
* everything else — next-state queries, interpolation indices, stage cost —
  is computed IN-KERNEL from a handful of scalars (A, B, Q, R, grid
  origins/steps), so a sweep reads only the 40 KB value table from HBM.
* min/argmin over the control axis runs on the lane dimension per chunk,
  combined across chunks through the resident output block with strict
  ``<`` (MATLAB first-minimum order preserved: chunks ascend in u).

Requires uniform grids (the Kirk constructor's ``linspace``) and a control
count divisible by the chunk size; rows are padded to the tile size.

Measured on a v5e (full Kirk workload, 199 sweeps): 17.7 ms/sweep =
5.6e8 evals/s — exact argmin parity, but SLOWER than the XLA banded
stencil (8.2 ms/sweep, 1.23e9 evals/s): the rank-3 ``dot_general`` (the
only layout Mosaic accepts without lane-collapsing reshapes) lowers to
many small (100x100)@(100x10) matmuls that underutilize the MXU. Kept as a
correct, tested alternative and a record of the experiment; SUPERSEDED by
``ops/pallas_shear.py`` (the fused shear-gather kernel, 5.5e9 evals/s on
the same workload — ``kirk.solve(impl="pallas")``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backup import BackupResult

__all__ = ["PallasLTIBackup", "build_pallas_lti_backup"]


class PallasLTIBackup:
    """Fused LTI backup kernel; call with the value table like any backup."""

    def __init__(self, config, *, u_chunk: int = 100, row_tile: int = 8):
        """``config`` is a KirkConfig-like object: A, B, Q, R, N grid fields."""
        self.A = tuple(tuple(float(v) for v in row) for row in config.A)
        self.B = tuple(float(v) for v in config.B)
        self.Q = tuple(float(v) for v in config.Q)
        self.R = float(config.R)
        self.n1 = int(config.dx)
        self.n2 = int(config.dx)
        self.nu = int(config.du)
        self.x_min = float(config.x_min)
        self.x_max = float(config.x_max)
        self.u_min = float(config.u_min)
        self.u_max = float(config.u_max)
        self.d1 = (self.x_max - self.x_min) / (self.n1 - 1)
        self.d2 = (self.x_max - self.x_min) / (self.n2 - 1)
        self.du_ = (self.u_max - self.u_min) / (self.nu - 1)
        if self.nu % u_chunk:
            raise ValueError(f"du={self.nu} not divisible by u_chunk={u_chunk}")
        if row_tile % 8:
            raise ValueError("row_tile must be a multiple of 8")
        self.u_chunk = u_chunk
        self.row_tile = row_tile
        # output rows padded up to the tile size; extra rows compute
        # zero-weight garbage and are sliced off after the kernel
        self.n1_pad = row_tile * (-(-self.n1 // row_tile))
        self.grid_shape = (self.n1, self.n2)
        self.state_shape = (self.n1, self.n2)

        # x1-axis band: off1 = clamp(floor((q1 - x0)/d1), 0, n1-2) - i over
        # all queries; clamping cannot push off1 outside the interior band
        # because the boundary rows' own indices are near the clamp values.
        i = np.arange(self.n1)[:, None, None]
        j = np.arange(self.n2)[None, :, None]
        u = np.arange(self.nu)[None, None, :]
        x1 = self.x_min + i * self.d1
        x2 = self.x_min + j * self.d2
        uu = self.u_min + u * self.du_
        q1 = self.A[0][0] * x1 + self.A[0][1] * x2 + self.B[0] * uu
        lo1 = np.clip(np.floor((q1 - self.x_min) / self.d1), 0, self.n1 - 2)
        off1 = lo1.astype(np.int64) - i
        self.b1_lo = int(off1.min())
        self.b1_hi = int(off1.max())
        self.t1 = self.b1_hi - self.b1_lo + 2   # taps incl. the +1 corner
        # v rows padding so every window stays in bounds: the tap rows of
        # output row i sit at padded rows i + row_base + t, t in [0, t1)
        self.pad_lo = max(0, -self.b1_lo)
        self.row_base = self.b1_lo + self.pad_lo   # = max(b1_lo, 0)
        span = self.row_tile + self.row_base + self.t1
        self.win_rows = 8 * ((span + 7) // 8)
        # padded v must cover the last (row-padded) tile's window
        self.pad_hi = max(0, (self.n1_pad - self.row_tile) + self.win_rows
                          - self.n1 - self.pad_lo)

    def _kernel(self, v_ref, out_v_ref, out_a_ref):
        (a11, a12), (a21, a22) = self.A
        b1v, b2v = self.B
        q1c, q2c = self.Q
        n1, n2, TU, T = self.n1, self.n2, self.u_chunk, self.row_tile
        T1 = self.t1
        i0 = pl.multiple_of(pl.program_id(0) * T, 8)
        c = pl.program_id(1)

        # 8-aligned row window covering all taps of this tile's rows:
        # padded row of state row r is r + pad_lo; taps start at r + b1_lo.
        window = v_ref[pl.ds(i0, self.win_rows), :]

        # layout: u on SUBLANES (axis 0), x2/k2 on LANES (axis 1); the
        # one-hot contraction runs as a rank-3 dot_general so no
        # lane-collapsing reshape is ever needed (Mosaic restriction)
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (TU, 1, 1), 0).astype(jnp.float32)
        u_vals = self.u_min + (c.astype(jnp.float32) * TU + u_iota) * self.du_
        x2 = self.x_min + self.d2 * jax.lax.broadcasted_iota(
            jnp.int32, (1, n2, 1), 1).astype(jnp.float32)        # (1, n2, 1)
        k2_iota = jax.lax.broadcasted_iota(jnp.int32, (TU, n2, n2), 2)
        t1_iota = jax.lax.broadcasted_iota(jnp.int32, (TU, n2, T1), 2)

        for iloc in range(T):
            x1 = self.x_min + self.d1 * (i0 + iloc).astype(jnp.float32)
            q1 = a11 * x1 + a12 * x2 + b1v * u_vals              # (TU, n2, 1)
            q2 = a21 * x1 + a22 * x2 + b2v * u_vals
            lo1 = jnp.clip(jnp.floor((q1 - self.x_min) / self.d1),
                           0, n1 - 2).astype(jnp.int32)
            f1 = (q1 - (self.x_min + lo1.astype(jnp.float32) * self.d1)) / self.d1
            lo2 = jnp.clip(jnp.floor((q2 - self.x_min) / self.d2),
                           0, n2 - 2).astype(jnp.int32)
            f2 = (q2 - (self.x_min + lo2.astype(jnp.float32) * self.d2)) / self.d2

            # dense one-hot interpolation tensor over the full x2 axis
            W2 = jnp.where(k2_iota == lo2, 1.0 - f2, 0.0) \
                + jnp.where(k2_iota == lo2 + 1, f2, 0.0)         # (TU, n2, n2)

            # x1 tap rows for this output row (static window offsets)
            rows = [window[iloc + self.row_base + t, :]
                    for t in range(T1)]                          # T1 x (n2,)
            H = jnp.stack(rows, axis=1)                          # (n2, T1)
            Rm = jax.lax.dot_general(
                W2, H, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (TU, n2, T1)

            # x1 tap weights: relative tap index r1 = lo1 - (i + b1_lo)
            r1 = lo1 - (i0 + iloc + self.b1_lo)
            W1 = jnp.where(t1_iota == r1, 1.0 - f1, 0.0) \
                + jnp.where(t1_iota == r1 + 1, f1, 0.0)          # (TU, n2, T1)
            interp = jnp.sum(W1 * Rm, axis=2)                    # (TU, n2)

            cost = (q1c * x1 * x1 + q2c * x2 * x2
                    + self.R * u_vals * u_vals)[:, :, 0]         # (TU, n2)
            total = interp + cost
            m = jnp.min(total, axis=0)                           # (n2,)
            a = jnp.argmin(total, axis=0).astype(jnp.int32) + c * TU

            @pl.when(c == 0)
            def _():
                out_v_ref[iloc, :] = m
                out_a_ref[iloc, :] = a

            @pl.when(c > 0)
            def _():
                prev = out_v_ref[iloc, :]
                better = m < prev                                # first-min
                out_v_ref[iloc, :] = jnp.where(better, m, prev)
                out_a_ref[iloc, :] = jnp.where(better, a, out_a_ref[iloc, :])

    @partial(jax.jit, static_argnums=0)
    def __call__(self, values: jax.Array) -> BackupResult:
        v_pad = jnp.pad(values, ((self.pad_lo, self.pad_hi), (0, 0)))
        grid = (self.n1_pad // self.row_tile, self.nu // self.u_chunk)
        out = pl.pallas_call(
            self._kernel,
            grid=grid,
            interpret=jax.default_backend() != "tpu",
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((self.row_tile, self.n2), lambda i, c: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.row_tile, self.n2), lambda i, c: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((self.n1_pad, self.n2), jnp.float32),
                jax.ShapeDtypeStruct((self.n1_pad, self.n2), jnp.int32),
            ],
        )(v_pad)
        return BackupResult(out[0][:self.n1], out[1][:self.n1])


def build_pallas_lti_backup(config, **kw) -> PallasLTIBackup:
    return PallasLTIBackup(config, **kw)
