"""Pallas TPU kernel: shear-gather Bellman backup, fully VMEM-fused.

The XLA shear-gather path (``ops/sheargather.py``) bottoms out at ~3e9
evals/s on the full Kirk workload: its profile is one third layout copies
(XLA materializes every per-(chunk, delta, corner) leaf slice as a retiling
``copy``), one third loop fusions, one third per-chunk min/argmin reduces —
the select-chain never fuses end-to-end. This kernel runs the identical
algorithm with every intermediate VMEM-resident:

* the 2^d corner tables are still gathered ONCE per sweep on the XLA side
  (table-sized gather, ~0.8 ms for Kirk) and phase-split along upsampled
  axes (see sheargather: lattice upsampling keeps shear slopes <= 1);
* per action chunk, XLA pre-slices each (corner, relative-phase) WINDOW
  into a stacked array W[c, slot, R, L] — static slices, so the kernel's
  grid can block over chunks while all in-kernel offsets stay
  chunk-independent: pair (d0, d1) reads slot
  ``corner*(u0*u1) + (d0%u0)*u1 + (d1%u1)`` at offset (d0//u0, d1//u1);
* the kernel (grid = one step per chunk, sequential on TPU) stages the
  n_pairs x 4 leaf slices in VMEM scratch, then for each of the chunk's
  actions: one combined-band-index compare per pair, 4 masked accumulates,
  the multilinear corner-weight combine (same product/sum order as
  ops/backup.py), stage-cost add, and a strict-< first-min update of the
  output block (revisited across grid steps — MATLAB tie-break preserved
  across chunks AND actions, test/Dynamic_Solver.m:209).

2-D only (the Kirk family shape); build falls back with ValueError
otherwise. Parity: same weight algebra as the gather oracle; as with the
XLA shear path, FMA-contraction choices may flip exact f32 ties by 1 ulp.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backup import BackupResult
from .interp import InterpPlan
from .pallas_backup6 import _round_up
from .sheargather import ShearBandError, build_sheargather_backup

__all__ = ["PallasShearBackup", "build_pallas_shear_backup"]

# leaf-scratch VMEM budget (the pallas_call sets vmem_limit_bytes=64MB;
# leave room for the W window + query blocks + outputs)
_SCRATCH_BUDGET = 40 * 1024 * 1024


@jax.tree_util.register_pytree_node_class
class PallasShearBackup:
    """Callable fused shear-gather backup (2-D state grids)."""

    def __init__(self, plan: InterpPlan, stage_cost, *,
                 action_chunk: int = 50, max_band: int = 24,
                 cost_terms=None, interpret: bool | None = None):
        # max_band is looser than the XLA path's default 9: runtime cost
        # here tracks the per-action LIVE pair count (flat ~9 on Kirk as
        # the chunk grows), not the full band; scratch is compacted to
        # the staged (live-for-some-action) pairs.
        #
        # cost_terms: optional (state_cost (S0, S1), action_cost (du,))
        # separable split of ``stage_cost``. The full (C, chunk, S0p, S1p)
        # cost stack is the largest single HBM stream of the sweep (53MB
        # on full Kirk); when the stage cost factors as state + action the
        # kernel re-adds the two small parts instead — verified BITWISE
        # against ``stage_cost`` at build (f32 adds of identical operands
        # in the identical association are deterministic).
        sg = build_sheargather_backup(plan, stage_cost,
                                      action_chunk=action_chunk,
                                      max_band=max_band)
        if len(sg.grid_shape) != 2:
            raise ValueError("pallas_shear supports 2-D state grids only")
        self.grid_shape = sg.grid_shape
        self.state_shape = sg.state_shape
        self.t_shape = sg.t_shape
        self.n_band = sg.n_band
        self.upsample = sg.upsample
        self.chunk = sg.chunk
        self.n_actions = sg.n_actions
        self.n_chunks = sg.n_actions // sg.chunk
        self.corner_idx = sg.corner_idx
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)

        S0, S1 = self.state_shape
        self.S0p = _round_up(S0, 8)
        self.S1p = _round_up(S1, 128)
        nb0, nb1 = self.n_band
        u0, u1 = self.upsample
        self.n_slots = 4 * u0 * u1
        # window extents: per-pair offsets (d0//u0, d1//u1) + padded state
        self.R_w = (nb0 - 1) // u0 + self.S0p
        self.L_w = _round_up((nb1 - 1) // u1 + self.S1p, 128)

        # phase-view padding so every window slice is in bounds
        t0, t1 = self.t_shape
        self.view_rows = {}
        self.view_cols = {}
        for p0 in range(u0):
            self.view_rows[p0] = (t0 - p0 + u0 - 1) // u0
        for p1 in range(u1):
            self.view_cols[p1] = (t1 - p1 + u1 - 1) // u1
        self.vr_pad = max(max(
            (int(ws[0]) + q0) // u0 + self.R_w
            for ws in sg.win_start for q0 in range(u0)),
            max(self.view_rows.values()))
        self.vc_pad = max(max(
            (int(ws[1]) + q1) // u1 + self.L_w
            for ws in sg.win_start for q1 in range(u1)),
            max(self.view_cols.values()))
        # per-(chunk, slot) window origins in the padded phase views, and
        # which absolute phase each (corner, relative-phase) slot reads
        self.win_origin = []      # [c][slot] = (row0, col0)
        self.slot_phase = []      # [c][slot] = (abs_p0, abs_p1)
        for ws in sg.win_start:
            ws0, ws1 = int(ws[0]), int(ws[1])
            oc, pc = [], []
            for corner in itertools.product((0, 1), repeat=2):
                for q0 in range(u0):
                    for q1 in range(u1):
                        f0, f1 = ws0 + q0, ws1 + q1
                        oc.append((f0 // u0, f1 // u1))
                        pc.append(corner + (f0 % u0, f1 % u1))
            self.win_origin.append(tuple(oc))
            self.slot_phase.append(tuple(pc))
        self.win_origin = tuple(self.win_origin)
        self.slot_phase = tuple(self.slot_phase)

        # device arrays: (C, chunk, S0p, S1p); band-index pairs combined
        C, ch = self.n_chunks, self.chunk

        def dev(a):
            # (C, s0, chunk, s1) -> (C, chunk, S0p, S1p), edge-padded
            a = np.moveaxis(np.asarray(a), -2, 1)
            return np.pad(a, ((0, 0), (0, 0), (0, self.S0p - S0),
                              (0, self.S1p - S1)), mode="edge")

        self.state_cost = None
        self.action_cost = None
        self.cost = None
        if cost_terms is not None:
            s_c = np.asarray(cost_terms[0], np.float32)
            a_c = np.asarray(cost_terms[1], np.float32)
            if s_c.shape != (S0, S1) or a_c.shape != (self.n_actions,):
                raise ValueError("cost_terms shapes must be (S0, S1), (du,)")
            recomposed = s_c[:, :, None] + a_c[None, None, :]
            full = np.broadcast_to(
                np.asarray(stage_cost, np.float32),
                (S0, S1, self.n_actions))
            if not np.array_equal(recomposed, full):
                raise ValueError(
                    "cost_terms do not recompose stage_cost bitwise")
            self.state_cost = jnp.asarray(np.pad(
                s_c, ((0, self.S0p - S0), (0, self.S1p - S1)), mode="edge"))
            self.action_cost = jnp.asarray(
                a_c.reshape(self.n_chunks, self.chunk))

        j0 = np.asarray(sg.j_idx[0], np.int32)
        j1 = np.asarray(sg.j_idx[1], np.int32)
        jj = j0 * nb1 + j1
        # static per-action pair liveness (union over chunks, so it stays
        # chunk-independent for the grid): dead pairs' masks are all-zero
        # for that action — skipping them is bitwise-identical and cuts
        # the pair FMA work ~2x on Kirk (mean 9.35 of 20 pairs live)
        self.live_pairs = tuple(
            tuple(int(v) for v in np.unique(jj[:, :, a, :]))
            for a in range(ch))
        # compact scratch slots: only pairs live for >= 1 action get a
        # (pair, corner) leaf staged
        self.staged = tuple(int(v) for v in np.unique(jj))
        self.pair_slot = {p: i for i, p in enumerate(self.staged)}
        # fail loudly at BUILD when the leaf scratch cannot fit VMEM
        # (the loose max_band admits wide bands only because runtime cost
        # tracks LIVE pairs; a geometry that stages too many live pairs
        # must fall back to a smaller chunk / the stencil, not die inside
        # Mosaic at first invocation)
        scratch_bytes = len(self.staged) * 4 * self.S0p * self.S1p * 4
        if scratch_bytes > _SCRATCH_BUDGET:
            raise ShearBandError(
                f"{len(self.staged)} staged band pairs need "
                f"{scratch_bytes >> 20} MB of leaf scratch "
                f"(budget {_SCRATCH_BUDGET >> 20} MB); use a smaller "
                "action_chunk or the banded stencil")
        self.jj = jnp.asarray(dev(jj).astype(np.int32))
        self.f0 = jnp.asarray(dev(np.asarray(sg.frac[0], np.float32)))
        self.f1 = jnp.asarray(dev(np.asarray(sg.frac[1], np.float32)))
        if self.state_cost is None:
            self.cost = jnp.asarray(dev(np.asarray(sg.cost, np.float32)))

    # pytree: arrays as leaves (traced jit argument — the jj/frac/cost
    # stacks must not become compile-payload constants, NOTES.md)
    traced_argument = True
    _LEAF_FIELDS = ("corner_idx", "jj", "f0", "f1", "cost",
                    "state_cost", "action_cost")
    _AUX_FIELDS = ("grid_shape", "state_shape", "t_shape", "n_band",
                   "upsample", "chunk", "n_actions", "n_chunks", "interpret",
                   "S0p", "S1p", "n_slots", "R_w", "L_w", "view_rows",
                   "view_cols", "vr_pad", "vc_pad", "win_origin",
                   "slot_phase", "live_pairs", "staged")

    def tree_flatten(self):
        return (tuple(getattr(self, f) for f in self._LEAF_FIELDS),
                tuple(
                    tuple(sorted(v.items())) if isinstance(v, dict) else v
                    for v in (getattr(self, f) for f in self._AUX_FIELDS)))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        for f, v in zip(cls._AUX_FIELDS, aux):
            if f in ("view_rows", "view_cols"):
                v = dict(v)
            setattr(obj, f, v)
        obj.pair_slot = {p: i for i, p in enumerate(obj.staged)}
        for f, v in zip(cls._LEAF_FIELDS, leaves):
            setattr(obj, f, v)
        return obj

    def _kernel(self, w_ref, jj_ref, f0_ref, f1_ref, cost_ref,
                out_v, out_a, leaves):
        self._kernel_impl(w_ref, jj_ref, f0_ref, f1_ref,
                          lambda a: cost_ref[0, a], out_v, out_a, leaves)

    def _kernel_sep(self, w_ref, jj_ref, f0_ref, f1_ref, sc_ref, ac_ref,
                    out_v, out_a, leaves):
        # separable cost: state block + per-action scalar, re-added with
        # the build-verified association (bitwise == the full cost stack)
        c = pl.program_id(0)
        self._kernel_impl(w_ref, jj_ref, f0_ref, f1_ref,
                          lambda a: sc_ref[:, :] + ac_ref[c, a],
                          out_v, out_a, leaves)

    def _kernel_impl(self, w_ref, jj_ref, f0_ref, f1_ref, cost_of,
                     out_v, out_a, leaves):
        nb0, nb1 = self.n_band
        u0, u1 = self.upsample
        c = pl.program_id(0)

        # stage the per-pair, per-corner leaf windows in scratch (compact
        # slots: pairs live for at least one action only)
        for si, pair in enumerate(self.staged):
            d0, d1 = pair // nb1, pair % nb1
            r0, c0 = d0 // u0, d1 // u1
            for corner in range(4):
                slot = corner * (u0 * u1) + (d0 % u0) * u1 + (d1 % u1)
                leaves[si * 4 + corner, :, :] = \
                    w_ref[0, slot, r0:r0 + self.S0p,
                          c0:c0 + self.S1p]

        best_v = None
        best_a = None
        for a in range(self.chunk):
            jj = jj_ref[0, a]
            acc = [None] * 4
            for pair in self.live_pairs[a]:
                # select + add (exact copy: exactly one pair matches per
                # query; zeros add exactly, and non-matching lanes stay
                # 0.0 even for non-finite table entries — an m*leaf FMA
                # form measured the same speed but turns inf into NaN).
                # Pairs outside the action's static live set (never
                # matched by any cell in any chunk) are skipped. (A
                # bilinear-combine-then-mask form measured 1.4% slower.)
                m = jj == pair
                si = self.pair_slot[pair]
                for corner in range(4):
                    t = jnp.where(m, leaves[si * 4 + corner, :, :], 0.0)
                    acc[corner] = t if acc[corner] is None \
                        else acc[corner] + t
            f0, f1 = f0_ref[0, a], f1_ref[0, a]
            # gather-oracle corner order/products (ops/backup.py)
            tot = ((1.0 - f0) * (1.0 - f1)) * acc[0] \
                + ((1.0 - f0) * f1) * acc[1] \
                + (f0 * (1.0 - f1)) * acc[2] \
                + (f0 * f1) * acc[3] \
                + cost_of(a)
            a_idx = c * self.chunk + a
            if best_v is None:
                best_v = tot
                best_a = jnp.full(tot.shape, a_idx, jnp.int32)
            else:
                better = tot < best_v          # strict: first min wins
                best_v = jnp.where(better, tot, best_v)
                best_a = jnp.where(better, jnp.int32(a_idx), best_a)

        @pl.when(c == 0)
        def _init():
            out_v[:, :] = best_v
            out_a[:, :] = best_a

        @pl.when(c > 0)
        def _combine():
            prev_v = out_v[:, :]
            prev_a = out_a[:, :]
            better = best_v < prev_v           # strict across chunks
            out_v[:, :] = jnp.where(better, best_v, prev_v)
            out_a[:, :] = jnp.where(better, best_a, prev_a)

    def __call__(self, values: jax.Array) -> BackupResult:
        d = 2
        u0, u1 = self.upsample
        n0, n1 = self.grid_shape
        v_flat = values.reshape(-1)

        # all 4 corner tables in ONE row-gather (per-INDEX cost dominates
        # TPU gathers — 4 separate takes measured 5.5x slower; bitwise-
        # identical elements), then phase-split + pad
        offs = [c0 * n1 + c1 for c0, c1 in itertools.product((0, 1),
                                                             repeat=d)]
        vp = jnp.pad(v_flat, (0, max(offs)))
        v4 = jnp.stack([jax.lax.dynamic_slice(vp, (o,), (v_flat.shape[0],))
                        for o in offs], axis=-1)      # (cells, 4)
        g = jnp.take(v4, self.corner_idx, axis=0)     # (T_cells, 4)
        views = {}
        for ci, corner in enumerate(itertools.product((0, 1), repeat=d)):
            t = g[:, ci].reshape(self.t_shape)
            for p0 in range(u0):
                for p1 in range(u1):
                    v = t[p0::u0, p1::u1]
                    views[corner + (p0, p1)] = jnp.pad(
                        v, ((0, self.vr_pad - v.shape[0]),
                            (0, self.vc_pad - v.shape[1])))

        # per-chunk stacked windows: static slices, chunk-independent
        # in-kernel offsets (relative-phase slot layout)
        wins = []
        for ci in range(self.n_chunks):
            slots = []
            for slot in range(self.n_slots):
                r0, c0 = self.win_origin[ci][slot]
                src = views[self.slot_phase[ci][slot]]
                slots.append(jax.lax.slice(
                    src, (r0, c0), (r0 + self.R_w, c0 + self.L_w)))
            wins.append(jnp.stack(slots))
        W = jnp.stack(wins)          # (C, n_slots, R_w, L_w)

        qspec = pl.BlockSpec((1, self.chunk, self.S0p, self.S1p),
                             lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((1, self.n_slots, self.R_w, self.L_w),
                         lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec, qspec, qspec,
        ]
        if self.state_cost is not None:
            kernel = self._kernel_sep
            inputs = (self.jj, self.f0, self.f1,
                      self.state_cost, self.action_cost)
            in_specs += [
                pl.BlockSpec((self.S0p, self.S1p), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.n_chunks, self.chunk), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
            ]
        else:
            kernel = self._kernel
            inputs = (self.jj, self.f0, self.f1, self.cost)
            in_specs.append(qspec)
        out = pl.pallas_call(
            kernel,
            grid=(self.n_chunks,),
            interpret=self.interpret,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((self.S0p, self.S1p), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.S0p, self.S1p), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((self.S0p, self.S1p), jnp.float32),
                jax.ShapeDtypeStruct((self.S0p, self.S1p), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((len(self.staged) * 4, self.S0p, self.S1p),
                           jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(W, *inputs)
        S0, S1 = self.state_shape
        return BackupResult(out[0][:S0, :S1], out[1][:S0, :S1])


def build_pallas_shear_backup(plan: InterpPlan, stage_cost,
                              **kw) -> PallasShearBackup:
    return PallasShearBackup(plan, stage_cost, **kw)
