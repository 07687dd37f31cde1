"""Gather-free Bellman backup: banded-stencil interpolation via shifted slices.

The generic backup (``ops/backup.py``) evaluates J_{k+1}(f(x,u)) with 2^d
corner *gathers* — correct everywhere, but XLA lowers large random gathers on
TPU to a slow path (~1 element/cycle), which caps the whole solver. This
module exploits the structure the reference's problems all share: queries are
laid out on the state grid itself, and the next state lands only a bounded
number of cells away from the source cell (reach = h·max|ẋ| / cell size,
SURVEY.md §7 "hard parts"). Then for every tap offset δ in a small static
band, the corner read ``V[i + δ]`` is a **statically shifted slice** of the
(padded) value table — a pure VPU mul-add sweep, no gather at all:

    interp(V)[i, a] = Σ_{δ1..δd in band} Π_k w_k(δ_k; i, a) · V[i1+δ1, ..., id+δd]

with per-axis tap weights w_k(δ) = [off_k == δ]·(1-frac_k) + [off_k == δ-1]·frac_k
(only 2 nonzero per query, so the sum is exact multilinear interpolation with
MATLAB extrapolation semantics inherited from the plan's unclamped fracs).

Problems whose *control* term moves queries many cells (Kirk: B·u spans ~49
cells of the x2 axis over the 1000-control range) are handled by chunking the
action axis: each chunk gets a per-axis integer **base shift** (a
``dynamic_slice`` start), and the residual band within a chunk stays narrow.
The chunk loop is a ``lax.scan`` with running (min, argmin) combined by
strict ``<`` so MATLAB first-minimum tie-breaking is preserved across chunks.

All band/base analysis happens once on the host at build time; the per-sweep
work is elementwise f32 on the VPU plus d-dimensional static/dynamic slices.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .backup import BackupResult
from .interp import InterpPlan

__all__ = ["StencilBackup", "build_stencil_backup"]


def _chunk_axis(arr: np.ndarray, n_chunks: int, chunk: int) -> np.ndarray:
    """Reshape the trailing action axis A -> leading (n_chunks, ..., chunk)."""
    shp = arr.shape
    out = arr.reshape(shp[:-1] + (n_chunks, chunk))
    return np.moveaxis(out, -2, 0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StencilBackup:
    """Precomputed banded-stencil backup operator (one problem, fixed plan).

    Call with the current value table to get one Bellman sweep:
    ``StencilBackup.__call__(values) -> BackupResult``.
    """

    # arrays (leading chunk axis C on everything that varies per chunk)
    off_res: tuple[jax.Array, ...]   # per axis: residual tap offset, int32
    frac: tuple[jax.Array, ...]      # per axis: fractional weight, f32
    base: jax.Array                  # (C, d) int32 per-chunk slice base
    cost: jax.Array                  # (C, *bcast_state, chunk) f32 stage cost
    # static metadata
    grid_shape: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    state_shape: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    taps: tuple[tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))
    pad: tuple[tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))
    chunk: int = dataclasses.field(metadata=dict(static=True))
    n_actions: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_chunks(self) -> int:
        return self.cost.shape[0]

    def __call__(self, values: jax.Array) -> BackupResult:
        d = len(self.grid_shape)
        v_pad = jnp.pad(values, self.pad)

        def chunk_step(carry, xs):
            best_v, best_a, a_offset = carry
            offs, fracs, base, cost = xs

            # per-axis tap-weight stacks, computed once per chunk
            wstacks = []
            for k in range(d):
                lo_t, hi_t = self.taps[k]
                ws = []
                for t in range(lo_t, hi_t + 2):  # taps cover [lo_t, hi_t + 1]
                    w = jnp.where(offs[k] == t, 1.0 - fracs[k], 0.0) + \
                        jnp.where(offs[k] == t - 1, fracs[k], 0.0)
                    ws.append(w)
                wstacks.append(ws)

            def rec(k, starts):
                if k == d:
                    leaf = jax.lax.dynamic_slice(v_pad, starts, self.state_shape)
                    return leaf[..., None]  # broadcast over the action-chunk axis
                lo_t, hi_t = self.taps[k]
                acc = None
                for i, t in enumerate(range(lo_t, hi_t + 2)):
                    start_k = base[k] + (t - lo_t)
                    term = wstacks[k][i] * rec(k + 1, starts + (start_k,))
                    acc = term if acc is None else acc + term
                return acc

            total = rec(0, ()) + cost
            total = jnp.broadcast_to(total, self.state_shape + (self.chunk,))
            m = jnp.min(total, axis=-1)
            a = jnp.argmin(total, axis=-1).astype(jnp.int32) + a_offset
            better = m < best_v  # strict: earlier chunk wins ties (MATLAB min)
            return (jnp.where(better, m, best_v),
                    jnp.where(better, a, best_a),
                    a_offset + self.chunk), None

        init = (jnp.full(self.state_shape, jnp.inf, jnp.float32),
                jnp.zeros(self.state_shape, jnp.int32),
                jnp.asarray(0, jnp.int32))
        (values_new, argmin, _), _ = jax.lax.scan(
            chunk_step, init, (self.off_res, self.frac, self.base, self.cost)
        )
        return BackupResult(values_new, argmin)


def build_stencil_backup(
    plan: InterpPlan,
    stage_cost,
    *,
    action_chunk: Optional[int] = None,
    max_taps_per_axis: int = 64,
) -> StencilBackup:
    """Analyze a plan's tap geometry and build the stencil operator.

    Host-side, once per problem. Raises if any axis needs more than
    ``max_taps_per_axis`` residual taps (the stencil would degenerate into a
    dense sweep — use the gather backup or a smaller ``action_chunk``).
    """
    d = plan.ndim
    q_shape = plan.query_shape
    state_shape = q_shape[:-1]
    n_actions = q_shape[-1]
    if action_chunk is None:
        # default: narrow enough that control-induced drift stays small
        action_chunk = n_actions if n_actions <= 64 else 32
    if n_actions % action_chunk:
        raise ValueError(
            f"action axis {n_actions} not divisible by chunk {action_chunk}"
        )
    n_chunks = n_actions // action_chunk

    lo_np = [np.asarray(l) for l in plan.lo]
    fr_np = [np.asarray(f).astype(np.float32) for f in plan.frac]

    offs, bases, taps, pads = [], [], [], []
    for k in range(d):
        lo = lo_np[k]
        # cell index of the query's own source cell along axis k
        idx_shape = [1] * lo.ndim
        idx_shape[k] = lo.shape[k]
        if lo.shape[k] == 1:
            # plan doesn't vary along its own axis k (degenerate but legal):
            # offsets are measured from cell 0
            idx = np.zeros(idx_shape, np.int64)
        else:
            idx = np.arange(lo.shape[k], dtype=np.int64).reshape(idx_shape)
        off = lo.astype(np.int64) - idx          # true tap offset per query

        if lo.shape[-1] > 1:  # varies with the action -> chunk + base shift
            off_c = _chunk_axis(off, n_chunks, action_chunk)  # (C, ..., chunk)
            red_axes = tuple(range(1, off_c.ndim))
            bmin = off_c.min(axis=red_axes)
            bmax = off_c.max(axis=red_axes)
            base_k = ((bmin + bmax) // 2).astype(np.int64)    # (C,)
            res = off_c - base_k.reshape((-1,) + (1,) * (off_c.ndim - 1))
        else:
            off_c = np.broadcast_to(off[None], (n_chunks,) + off.shape)
            base_k = np.zeros(n_chunks, np.int64)
            res = off_c
        t_lo, t_hi = int(res.min()), int(res.max())
        if t_hi - t_lo + 2 > max_taps_per_axis:
            raise ValueError(
                f"axis {k}: {t_hi - t_lo + 2} taps exceed max_taps_per_axis="
                f"{max_taps_per_axis}; shrink action_chunk or use the gather backup"
            )
        glob_min = int(off_c.min() + 0)  # global band (for padding)
        glob_max = int(off_c.max())
        pads.append((-min(glob_min, 0), max(glob_max, 0) + 1))
        taps.append((t_lo, t_hi))
        offs.append(jnp.asarray(res, jnp.int32))
        # base as slice start into the padded table: pad_lo + base
        bases.append(base_k + pads[k][0])

    # residual base -> adjust: slice start for tap t is base + (t - t_lo);
    # ensure start >= 0: base + t_lo >= 0 given pad_lo >= -(glob_min) and
    # base_k + t_lo >= glob_min.
    base = jnp.asarray(np.stack([b + taps[k][0] for k, b in enumerate(bases)],
                                axis=1), jnp.int32)  # (C, d), start of tap t_lo

    fr_c = []
    for k in range(d):
        f = fr_np[k]
        if f.shape[-1] > 1:
            fr_c.append(jnp.asarray(_chunk_axis(f, n_chunks, action_chunk)))
        else:
            fr_c.append(jnp.asarray(np.broadcast_to(f[None], (n_chunks,) + f.shape)))

    cost = np.asarray(stage_cost, np.float32)
    cost = np.broadcast_to(cost, q_shape)
    cost_c = jnp.asarray(_chunk_axis(cost, n_chunks, action_chunk))

    # taps in the operator are relative: rec() slices start at base (= tap
    # t_lo position), so re-center taps at 0 for the slice arithmetic while
    # keeping the weight comparison in residual-offset space.
    return StencilBackup(
        off_res=tuple(offs),
        frac=tuple(fr_c),
        base=base,
        cost=cost_c,
        grid_shape=plan.grid_shape,
        state_shape=state_shape,
        taps=tuple(taps),
        pad=tuple(pads),
        chunk=action_chunk,
        n_actions=n_actions,
    )
