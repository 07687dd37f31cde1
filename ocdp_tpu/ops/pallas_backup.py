"""Pallas TPU kernel: fused banded-stencil Bellman backup for 2-D problems.

One kernel invocation computes a tile of rows of the new value table:
interpolate J_{k+1} at every (state, action) query via the banded stencil
(statically shifted VMEM loads of the padded table — the whole 2-D table
fits VMEM for every reference problem), add the stage cost, and reduce
min/argmin over the action axis with MATLAB first-minimum tie-breaking —
all in one pass with zero HBM round-trips for intermediates.

Scope: d=2 state grids with a single action chunk and no per-chunk base
shifts beyond a static offset — i.e. the position channels
(position-control/Solver_position.m:131-137), the simplified attitude axes
(attitude-control/Solver_attitude.m:236-247), and small-control 2-D
problems. Wider problems use the XLA stencil (``ops/stencil.py``); affine
geometries use the faster shear kernels (``ops/pallas_shear.py``,
``ops/pallas_backup6.py`` row/lane).

The tap geometry (band, pads, static bases) is reused from the stencil
builder so the two paths stay semantically identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backup import BackupResult
from .interp import InterpPlan
from .stencil import build_stencil_backup

__all__ = ["PallasBackup2D", "build_pallas_backup_2d"]


class PallasBackup2D:
    """Callable backup op backed by a Pallas kernel (see module docstring)."""

    def __init__(self, plan: InterpPlan, stage_cost, *, row_tile=None):
        if plan.ndim != 2:
            raise ValueError("PallasBackup2D supports 2-D state grids only")
        sb = build_stencil_backup(plan, stage_cost, action_chunk=None)
        if sb.base.shape[:2] != (1, 1):
            raise ValueError(
                "PallasBackup2D requires a single action chunk "
                f"(got {sb.base.shape[1]}); use the XLA stencil instead")
        self.grid_shape = sb.grid_shape
        self.state_shape = sb.state_shape
        self.pad = sb.pad
        self.taps = sb.taps
        self.valid_taps = sb.valid_taps
        self.n_actions = sb.n_actions
        # static slice bases (pad_lo + chunk base + t_lo), host ints
        self.base = tuple(int(b) for b in np.asarray(sb.base[0, 0]))

        n1, n2 = self.state_shape
        if row_tile is None:
            # Mosaic needs sublane-divisible tiles (multiples of 8) unless the
            # block spans the full dimension; fall back to one whole-array
            # program when the row count isn't 8-divisible (tables are small).
            row_tile = 8 if n1 % 8 == 0 else n1
        if n1 % row_tile or (row_tile != n1 and row_tile % 8):
            raise ValueError(f"invalid row tile {row_tile} for {n1} rows")
        self.row_tile = row_tile

        # materialize per-axis offsets/fracs + cost once (host), laid out
        # ACTION-MAJOR (A, n1, n2) so the kernel's lane axis is the wide
        # state axis, not the tiny action axis
        q_shape = self.state_shape + (self.n_actions,)

        def amaj(arr, dtype):
            full = np.broadcast_to(np.asarray(arr), q_shape)
            return jnp.asarray(np.ascontiguousarray(
                np.moveaxis(full, -1, 0)).astype(dtype))

        self.off1 = amaj(sb.off_res[0][0, 0], np.int32)
        self.off2 = amaj(sb.off_res[1][0, 0], np.int32)
        self.fr1 = amaj(sb.frac[0][0, 0], np.float32)
        self.fr2 = amaj(sb.frac[1][0, 0], np.float32)
        terms = (list(stage_cost) if isinstance(stage_cost, (tuple, list))
                 else [stage_cost])
        cost = np.zeros(q_shape, np.float32)
        for t in terms:
            cost = cost + np.asarray(t, np.float32)
        self.cost = amaj(cost, np.float32)

    def _kernel(self, v_ref, off1_ref, fr1_ref, off2_ref, fr2_ref, cost_ref,
                out_v_ref, out_a_ref):
        t1_lo, t1_hi = self.taps[0]
        t2_lo, _ = self.taps[1]
        b1, b2 = self.base
        T = self.row_tile
        n2 = self.state_shape[1]
        # Mosaic requires sublane-aligned loads: fetch an 8-aligned window
        # of rows covering every row tap, then realize each tap's unaligned
        # row shift as a static sublane roll + aligned slice.
        span1 = t1_hi + 1 - t1_lo
        win_rows = T + 8 * ((b1 + span1 + 7) // 8)
        row0 = pl.multiple_of(pl.program_id(0) * T, 8)
        window = v_ref[pl.ds(row0, win_rows), :]

        leaves = {}
        for t1 in self.valid_taps[0]:
            shift1 = b1 + (t1 - t1_lo)
            # circular roll; shift must be non-negative, so roll forward by
            # (win_rows - shift1) to realize a backward shift of shift1
            rolled = pltpu.roll(window, win_rows - shift1, 0) if shift1 \
                else window
            for t2 in self.valid_taps[1]:
                c0 = b2 + (t2 - t2_lo)
                leaves[(t1, t2)] = rolled[:T, c0:c0 + n2]

        best_v = None
        best_a = None
        for a in range(self.n_actions):
            w1s = {}
            for t1 in self.valid_taps[0]:
                w1s[t1] = jnp.where(off1_ref[a, :, :] == t1,
                                    1.0 - fr1_ref[a, :, :], 0.0) \
                    + jnp.where(off1_ref[a, :, :] == t1 - 1,
                                fr1_ref[a, :, :], 0.0)
            acc = jnp.zeros((T, n2), jnp.float32)
            for t2 in self.valid_taps[1]:
                w2 = jnp.where(off2_ref[a, :, :] == t2,
                               1.0 - fr2_ref[a, :, :], 0.0) \
                    + jnp.where(off2_ref[a, :, :] == t2 - 1,
                                fr2_ref[a, :, :], 0.0)
                for t1 in self.valid_taps[0]:
                    acc = acc + w1s[t1] * w2 * leaves[(t1, t2)]
            total = acc + cost_ref[a, :, :]
            if best_v is None:
                best_v = total
                best_a = jnp.zeros((T, n2), jnp.int32)
            else:
                better = total < best_v  # strict: first minimum wins ties
                best_v = jnp.where(better, total, best_v)
                best_a = jnp.where(better, jnp.int32(a), best_a)
        out_v_ref[:, :] = best_v
        out_a_ref[:, :] = best_a

    @partial(jax.jit, static_argnums=0)
    def __call__(self, values: jax.Array) -> BackupResult:
        n1, n2 = self.state_shape
        T = self.row_tile
        # extra bottom rows so the last tile's aligned window stays in-bounds
        t1_lo, t1_hi = self.taps[0]
        win_extra = 8 * ((self.base[0] + (t1_hi + 1 - t1_lo) + 7) // 8)
        p1lo, p1hi = self.pad[0]
        extra = max(0, win_extra - p1lo - p1hi)
        v_pad = jnp.pad(values, ((p1lo, p1hi + extra), self.pad[1]))
        grid = (n1 // T,)
        tile_spec = pl.BlockSpec((self.n_actions, T, n2),
                                 lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            self._kernel,
            grid=grid,
            interpret=jax.default_backend() != "tpu",  # CPU tests
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole padded table
                tile_spec, tile_spec, tile_spec, tile_spec, tile_spec,
            ],
            out_specs=[
                pl.BlockSpec((T, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n1, n2), jnp.float32),
                jax.ShapeDtypeStruct((n1, n2), jnp.int32),
            ],
        )(v_pad, self.off1, self.fr1, self.off2, self.fr2, self.cost)
        return BackupResult(out[0], out[1])


def build_pallas_backup_2d(plan: InterpPlan, stage_cost, **kw) -> PallasBackup2D:
    return PallasBackup2D(plan, stage_cost, **kw)
