"""Base-gather Bellman backup: pre-gather a tiny per-cell tap block, then
sweep actions against it — the fast path for LARGE action sets (Kirk's
1000-control axis, test/Dynamic_Solver.m:58-59).

The banded stencil (``ops/stencil.py``) realizes every tap as a shifted
slice of the whole table; its band must cover the query spread across ALL
state cells of a (block, chunk) tile, which for Kirk inflates to ~47 taps
on the x2 axis (state drift + extrapolation clamping, NOTES.md) — ~235
weighted leaves per sweep. This module separates concerns:

* a per-(state cell, action chunk) integer BASE pins each cell's tap block
  at the chunk-midpoint query's cell (clamping included, so boundary
  extrapolation never widens anything);
* the residual band then only covers the WITHIN-chunk action spread plus
  the interpolation corner — 2-4 taps per axis for Kirk's 50-control
  chunks (8 leaves vs 235);
* the value table is PRE-GATHERED once per (sweep, chunk) at those
  ``cells x tap-combo`` flat indices (time-invariant indices, built on the
  host). The gather touches |cells| * |combos| elements — for action-heavy
  problems that is ``actions / chunk-spread`` times SMALLER than the query
  set, so XLA's slow scalar gather path costs nothing (Kirk: 8e4 gathered
  elements serving 5e5 queries per chunk).

Weights are recomputed on the fly from int8 residual offsets + f32 fracs
(shipped as jit ARGUMENTS: unclamped fracs preserve MATLAB linear
extrapolation exactly, and nothing big lands in the executable). Chunks
combine min/argmin with strict ``<`` in ascending action order — MATLAB
first-minimum tie-breaking (test/Dynamic_Solver.m:209).

When to use which backup:
* few actions, narrow drift -> banded stencil (``ops/stencil.py``);
* many actions (du >> per-chunk taps) -> this module;
* 6-D separable attitude -> the Pallas kernel (``ops/pallas_backup6.py``).
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from .backup import BackupResult
from .interp import InterpPlan

__all__ = ["BaseGatherBackup", "build_basegather_backup"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BaseGatherBackup:
    """Precomputed base-gather backup operator (one problem, fixed plan).

    Engines must pass this backup as a traced jit ARGUMENT (it is a pytree;
    ``traced_argument`` flags it): its off/frac/cost stacks are ~100s of MB
    for the full Kirk workload and must not become compile-payload
    constants (remote-compile size limit, NOTES.md).
    """

    flat_idx: jax.Array     # (C, cells, n_combos) int32 into the padded table
    off_res: jax.Array      # (C, d, cells, chunk) int8 residual offsets
    frac: jax.Array         # (C, d, cells, chunk) f32 unclamped fracs
    cost: jax.Array         # (C, cells, chunk) f32 stage cost
    # static metadata
    grid_shape: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    state_shape: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    pad: tuple[tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))
    combos: tuple[tuple[int, ...], ...] = dataclasses.field(metadata=dict(static=True))
    chunk: int = dataclasses.field(metadata=dict(static=True))
    n_actions: int = dataclasses.field(metadata=dict(static=True))

    traced_argument = True   # see class docstring

    def __call__(self, values: jax.Array) -> BackupResult:
        cells = int(np.prod(self.state_shape))
        v_flat = jnp.pad(values, self.pad).reshape(-1)
        d = len(self.grid_shape)

        def chunk_step(carry, xs):
            best_v, best_a, a_off = carry
            fidx, offs, fr, cost = xs
            P = jnp.take(v_flat, fidx)               # (cells, n_combos)
            tot = cost                                # (cells, chunk)
            for ci, combo in enumerate(self.combos):
                w = None
                for k, r in enumerate(combo):
                    wk = jnp.where(offs[k] == r, 1.0 - fr[k], 0.0) \
                        + jnp.where(offs[k] == r - 1, fr[k], 0.0)
                    w = wk if w is None else w * wk
                tot = tot + w * P[:, ci][:, None]
            m = jnp.min(tot, axis=-1)
            a = jnp.argmin(tot, axis=-1).astype(jnp.int32) + a_off
            better = m < best_v                       # strict: first min wins
            return (jnp.where(better, m, best_v),
                    jnp.where(better, a, best_a),
                    a_off + self.chunk), None

        init = (jnp.full((cells,), jnp.inf, jnp.float32),
                jnp.zeros((cells,), jnp.int32),
                jnp.asarray(0, jnp.int32))
        (vals, args, _), _ = jax.lax.scan(
            chunk_step, init,
            (self.flat_idx, self.off_res, self.frac, self.cost))
        return BackupResult(vals.reshape(self.state_shape),
                            args.reshape(self.state_shape))


def build_basegather_backup(
    plan: InterpPlan,
    stage_cost,
    *,
    action_chunk: int = 50,
    max_combos: int = 64,
) -> BaseGatherBackup:
    """Host-side analysis + index/offset construction (once per problem)."""
    d = plan.ndim
    q_shape = plan.query_shape
    state_shape = q_shape[:-1]
    n_actions = q_shape[-1]
    if n_actions % action_chunk:
        raise ValueError(
            f"action axis {n_actions} not divisible by chunk {action_chunk}")
    n_chunks = n_actions // action_chunk
    cells = int(np.prod(state_shape))

    # (cells, C, chunk) per-axis lo/frac
    lo = [np.broadcast_to(np.asarray(l), q_shape)
          .reshape(cells, n_chunks, action_chunk) for l in plan.lo]
    fr = [np.broadcast_to(np.asarray(f), q_shape).astype(np.float32)
          .reshape(cells, n_chunks, action_chunk) for f in plan.frac]

    mid = action_chunk // 2
    bases, offs, taps = [], [], []
    for k in range(d):
        b = lo[k][:, :, mid].astype(np.int64)         # (cells, C) chunk base
        off = lo[k].astype(np.int64) - b[:, :, None]  # residual
        t_lo, t_hi = int(off.min()), int(off.max())
        bases.append(b)
        offs.append(off)
        taps.append(list(range(t_lo, t_hi + 2)))      # +1 corner

    # jointly-live tap combos: a combo survives only if SOME single query
    # reaches that corner on every axis simultaneously (per-axis liveness
    # alone over-keeps corners when axis residuals are correlated,
    # inflating the per-sweep gather with zero-weight reads)
    combos = []
    for combo in itertools.product(*taps):
        mask = True
        for k, r in enumerate(combo):
            o, f = offs[k], fr[k]
            mask = mask & (((o == r) & (1.0 - f != 0.0))
                           | ((o == r - 1) & (f != 0.0)))
        if np.any(mask):
            combos.append(combo)
    if len(combos) > max_combos:
        raise ValueError(
            f"{len(combos)} tap combos exceed max_combos={max_combos}; "
            "shrink action_chunk or use the banded stencil")

    # padded-table strides + flat gather indices
    pads = []
    for k in range(d):
        gmin = int(bases[k].min()) + taps[k][0]
        gmax = int(bases[k].max()) + taps[k][-1]
        pads.append((max(0, -gmin), max(0, gmax - (plan.grid_shape[k] - 1))))
    padded_shape = tuple(n + p[0] + p[1]
                         for n, p in zip(plan.grid_shape, pads))
    strides = np.ones(d, np.int64)
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * padded_shape[k + 1]

    flat_idx = np.zeros((n_chunks, cells, len(combos)), np.int64)
    for ci, combo in enumerate(combos):
        idx = 0
        for k, r in enumerate(combo):
            idx = idx + (bases[k].T + r + pads[k][0]) * strides[k]  # (C, cells)
        flat_idx[:, :, ci] = idx
    if flat_idx.max() >= np.iinfo(np.int32).max:
        raise ValueError("padded table too large for int32 gather indices")

    off_res = np.stack([np.moveaxis(o, 1, 0) for o in offs], axis=1)  # C,d,cells,TU
    frac = np.stack([np.moveaxis(f, 1, 0) for f in fr], axis=1)
    cost = np.broadcast_to(np.asarray(stage_cost, np.float32), q_shape) \
        .reshape(cells, n_chunks, action_chunk)
    cost = np.ascontiguousarray(np.moveaxis(cost, 1, 0))

    if np.abs(off_res).max() <= np.iinfo(np.int8).max:
        off_dtype = np.int8
    else:
        off_dtype = np.int16

    return BaseGatherBackup(
        flat_idx=jnp.asarray(flat_idx.astype(np.int32)),
        off_res=jnp.asarray(off_res.astype(off_dtype)),
        frac=jnp.asarray(np.ascontiguousarray(frac)),
        cost=jnp.asarray(cost),
        grid_shape=plan.grid_shape,
        state_shape=state_shape,
        pad=tuple(pads),
        combos=tuple(combos),
        chunk=action_chunk,
        n_actions=n_actions,
    )
