"""Pallas TPU kernel: fused Bellman backup for the 6-D attitude grid.

The full-attitude solve (attitude-control/Solver_attitude.m:261-300) is the
workload the XLA stencil cannot compile at scale: its unrolled tap tree is
O(prod per-axis taps) HLO (~4^6 dynamic-slice leaves) and crashes the TPU
worker near 1e6 cells, while the rolled variant hits pathological Mosaic/XLA
compile times (NOTES.md, round 1). This kernel replaces the whole backup —
6-D multilinear interpolation of J_{k+1} at every (state, action) query,
fused stage-cost add, fused min/argmin over the 27 torque combos with MATLAB
first-minimum tie-breaking (Solver_attitude.m:384-411) — with one Pallas
program whose size is O(row taps + lane taps), independent of dimensionality.

Layout (the crux): flatten the state grid to 2-D
    rows  = the omega cells   (n0*n1*n2),
    lanes = the Euler cells   (n3*n4*n5, padded to 128),
so the value table is a (NW, NE) matrix — VMEM-resident when it fits
(<= _VMEM_TABLE_BUDGET), otherwise HBM-resident with per-tile tap windows
DMA'd into double-buffered VMEM scratch (``table_hbm``; the DMA cost hides
under the 27-lane-delta accumulate, measured FASTER than VMEM residency at
the flagship size and the only mode that runs past ~11M cells). The
attitude dynamics factorize over exactly this split (build_full,
models/attitude.py):

* omega' depends only on (omega, u)      -> per-(row, action) queries; a
  next-state row lands a *bounded* number of flat rows away (drift
  h*max|wdot| vs cell size), so the 8 omega-corner reads are a small static
  set of ROW shifts realized as aligned-window sublane rolls;
* euler' depends only on (omega, euler)  -> per-(row, lane) queries,
  action-INDEPENDENT; the 8 Euler-corner reads are a small static set of
  flat LANE shifts (pltpu.roll along lanes), shared by all 27 actions.

Per row-tile the kernel computes, for each live flat row-offset D, the
lane interpolation of the shifted rows. When every lane axis's (lo, frac)
depends only on its OWN coordinate (+ rows) — pos-att's channels — this
runs as SEPARABLE per-axis lerp passes
    A_D = lerp_ax3(lerp_ax4(lerp_ax5( V[rows + D] )))
(O(sum taps) FMAs; exact because shifted intermediates carry the right
weights, and cross-boundary rolls pair only with zero weights). When the
lane fracs COUPLE across lane axes — the attitude Euler queries, whose
quaternion step mixes all three angles — separable passes would evaluate
axis k's weight at the other axes' shifted cells (measured 8e-4 deviation
from the oracle), so the kernel keeps the joint-combo accumulation
    A_D[r, c] = sum_{lane combos e} W_e(r, c) * roll(V[rows + D], e)[r, c].
A_D is reused by every action; then for each action a
    tot_a = sum_D Ww_{a,D}(r) * A_D + cost_u[a]
with per-row scalar weights, and chains strict-< min/argmin over the flat
C-order action index (= the reference's chained 3-axis argmin,
Solver_attitude.m:400-409; equivalence proven in ops/backup.py). Reads that
a roll wraps past a row boundary belong to taps whose multilinear weight is
identically zero there (corner reads with weight point at lo/lo+1, always
in-bounds per axis), so they contribute exactly 0 — the flat-shift trick of
ops/stencil.py's rolled mode, now at VPU cost.

The stage cost rides along factorized (SURVEY.md §7: never materialize the
S x A tensor): Qw|w|^2 per row + Qq|q_vec|^2 per lane + R|u|^2 per action
(calculate_J_current_state_fix_shaped, Solver_attitude.m:315-342). The
row+lane parts are added once after the argmin (a shared constant per state
cannot change the winner).
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

__all__ = ["PallasBackup6D", "PermutedRowLaneBackup", "build_pallas_backup_6d",
           "LaneRecompute", "RecomputePlan"]


def _affine_locate(coord, start, step, n, edge):
    """Uniform-axis locate: (lo, frac) from an affine index map.

    The lane-recompute twin of :func:`ocdp_tpu.ops.interp.axis_locate`,
    restricted to UNIFORM (linspace) axes so it needs no grid-value gather —
    Mosaic-lowerable and therefore usable inside the kernel. Must be the
    ONE locate both the tap-liveness pass (XLA) and the kernel (Mosaic)
    evaluate: measured bit-identical between the two lowerings on this
    toolchain (NOTES.md round 4). Differs from the searchsorted-based
    ``axis_locate`` by <= 1 ulp of frac at cell boundaries (linspace values
    are not exactly affine in f32); the liveness pass admits BOTH corners
    of every touched cell, so a boundary lo flip costs only an
    ~ulp-weighted tap, never a missing one.
    """
    t = (jnp.asarray(coord, jnp.float32) - jnp.float32(start)) \
        * jnp.float32(1.0 / step)
    lo = jnp.clip(jnp.floor(t), 0.0, float(n - 2))
    fr = t - lo
    if edge == "clamp":
        fr = jnp.clip(fr, 0.0, 1.0)
    return lo.astype(jnp.int32), fr


@jax.tree_util.register_pytree_node_class
class LaneRecompute:
    """In-kernel lane-query recompute spec (the 24 B/cell lever).

    Stored-plan mode keeps six (NW, NE) f32/int32 lane arrays — 24 B/cell,
    the dominant HBM term at envelope scales (6.3 GB at 262M cells, the
    round-3 wall). This spec replaces them with their GENERATORS: per-ROW
    features (the three omega values, 12 B/row), per-LANE features (the
    four kirk-q components, 16 B/lane), and a traceable ``fn`` mapping a
    (rows-tile, lanes) feature block to the lane-axis query coordinates —
    for attitude, the reference's quaternion Euler step + renormalize +
    Euler readback (Solver_attitude.m:413-506), built on the
    Mosaic-lowerable :mod:`ocdp_tpu.ops.kernelmath` trig. The kernel
    evaluates ``fn`` + :func:`_affine_locate` once per row tile, shared by
    all actions and row shifts.

    ``fn`` must be a hashable-equatable callable (e.g. a frozen dataclass)
    so backups built from equal configs hit the jit cache.
    """

    def __init__(self, fn, row_feats, lane_feats, axis_starts, axis_steps,
                 axis_sizes, edge: str):
        if edge not in ("extrapolate", "clamp"):
            raise ValueError(f"unknown edge policy {edge!r}")
        self.fn = fn
        self.row_feats = tuple(jnp.asarray(r, jnp.float32).reshape(-1)
                               for r in row_feats)
        self.lane_feats = tuple(jnp.asarray(f, jnp.float32).reshape(-1)
                                for f in lane_feats)
        self.axis_starts = tuple(float(s) for s in axis_starts)
        self.axis_steps = tuple(float(s) for s in axis_steps)
        self.axis_sizes = tuple(int(n) for n in axis_sizes)
        self.edge = edge

    def coords(self, rf, lf):
        """Lane coordinates for broadcastable row/lane feature blocks."""
        return self.fn(rf, lf)

    def locate(self, k, coord):
        return _affine_locate(coord, self.axis_starts[k], self.axis_steps[k],
                              self.axis_sizes[k], self.edge)

    def tree_flatten(self):
        return ((self.row_feats, self.lane_feats),
                (self.fn, self.axis_starts, self.axis_steps,
                 self.axis_sizes, self.edge))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.row_feats, obj.lane_feats = leaves
        (obj.fn, obj.axis_starts, obj.axis_steps, obj.axis_sizes,
         obj.edge) = aux
        return obj


@jax.tree_util.register_pytree_node_class
class RecomputePlan:
    """Flat interpolation plan whose LANE queries live as a
    :class:`LaneRecompute` spec instead of stored (lo, frac) arrays.

    ``lo``/``frac`` carry only the ROW axes (length ``row_axes``), in the
    flat (NW, 1, A) layout; ``spec`` generates the lane axes in-kernel.
    Duck-types the :class:`~ocdp_tpu.ops.interp.InterpPlan` surface the
    engines/backups read (``grid_shape``, ``query_shape``, ``ndim``).
    """

    def __init__(self, lo, frac, spec: LaneRecompute, grid_shape,
                 row_axes: int):
        self.lo = tuple(lo)
        self.frac = tuple(frac)
        self.spec = spec
        self.grid_shape = tuple(grid_shape)
        self.row_axes = int(row_axes)
        if len(self.lo) != self.row_axes or len(self.frac) != self.row_axes:
            raise ValueError("RecomputePlan carries exactly the row axes")
        if len(spec.axis_sizes) != len(self.grid_shape) - self.row_axes:
            raise ValueError("spec lane-axis count mismatch")

    @property
    def ndim(self) -> int:
        return len(self.grid_shape)

    @property
    def query_shape(self) -> tuple:
        nw = int(np.prod(self.grid_shape[:self.row_axes]))
        ne = int(np.prod(self.grid_shape[self.row_axes:]))
        return (nw, ne, self.lo[0].shape[-1])

    def tree_flatten(self):
        return ((self.lo, self.frac, self.spec),
                (self.grid_shape, self.row_axes))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.lo, obj.frac, obj.spec = leaves
        obj.grid_shape, obj.row_axes = aux
        return obj


def auto_row_tile(NEp: int) -> int:
    """The measured-default row tile for a lane width (ONE copy — the halo
    engines share it). Mosaic spills scale with the (T, NEp) tile
    footprint; T=32 at NEp=1024 compiles but larger products crash the
    compile helper (register-spill VMEM exhaustion, NOTES.md). Keep
    T*NEp at or under that budget, floor 8 (the f32 sublane count),
    cap 16: a measured tile sweep (round 5, NOTES) has the flagship
    11^3x10^3 grid fastest at T=16 (2.76 vs 2.91 ms/sweep at 32) and the
    envelope grids already at the T=8 floor — the 32K-element target
    overshoots the sweet spot when NEp is narrow. (The pos-att rowlane
    wrapper tunes its own tile.)"""
    return min(16, max(8, (32 * 1024 // NEp) // 8 * 8))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# problems whose (rows x lanes) table exceeds this build their lane arrays
# and tap liveness on the device (see PallasBackup6D.__init__)
_DEVICE_BUILD_MIN_ELEMS = 8_000_000


def _corner_live_sets(axis_offs, axis_fracs):
    """Exact jointly-live tap combinations across a group of axes.

    A combo (t_0..t_{k-1}) is live iff some query element's multilinear
    corner reaches it with nonzero weight on EVERY axis (weight = 1-frac at
    the lo corner, frac at the hi corner). One encode pass + one
    ``np.unique`` over the elements — NOT a scan per candidate combo, which
    took ~9 minutes at the 49.8M-cell envelope (NOTES.md). Returns
    ``(per_axis_taps, combos)``; per-axis taps are those some live combo
    references (the kernel builds weight terms only for these).
    """
    k = len(axis_offs)
    base = [int(o.min()) for o in axis_offs]
    span = [int(o.max()) - b + 1 for o, b in zip(axis_offs, base)]
    bits_needed = int(np.sum(np.ceil(np.log2(np.maximum(span, 2))))) + 2 * k
    dtype = np.int32 if bits_needed < 31 else np.int64
    # in-place accumulation: these arrays are table-sized (NW x NE) — each
    # avoided temporary is hundreds of MB at the envelope scales
    enc = np.zeros(np.broadcast_shapes(*(a.shape for a in
                                         (*axis_offs, *axis_fracs))), dtype)
    for o, b, s in zip(axis_offs, base, span):
        np.multiply(enc, s, out=enc)
        enc += o
        enc -= b
    # 2 liveness bits per axis: bit0 = lo corner has weight, bit1 = hi.
    # In f32, (1-frac)==0 iff frac==1 and frac is always finite here.
    for fr in axis_fracs:
        np.left_shift(enc, 2, out=enc)
        enc |= np.not_equal(fr, np.float32(1.0))
        hi = np.not_equal(fr, np.float32(0.0)).astype(np.int8)
        np.left_shift(hi, 1, out=hi)
        enc |= hi
    return _decode_live(np.unique(enc).tolist(), base, span, k)


def _decode_live(enc_values, base, span, k):
    """Expand present encode values into the live corner-combo set."""
    combos = set()
    for e in enc_values:
        bits = [(e >> (2 * (k - 1 - i))) & 3 for i in range(k)]
        rest = e >> (2 * k)
        offs = []
        for s in reversed(span):
            rest, o = divmod(rest, s)
            offs.append(o)
        offs = offs[::-1]
        for corner in itertools.product((0, 1), repeat=k):
            if all((b >> c) & 1 for c, b in zip(corner, bits)):
                combos.add(tuple(o + b + c for o, b, c
                                 in zip(offs, base, corner)))
    combos = sorted(combos)
    taps = [sorted({c[i] for c in combos}) for i in range(k)]
    return taps, combos


def _lane_offs_j(lane_lo, lane_iota):
    """Traced per-lane-axis offset arrays (lo - own-axis index)."""
    return [lo.astype(jnp.int32)[..., 0] - it
            for lo, it in zip(lane_lo, lane_iota)]


def _lane_live_device(lane_lo, lane_fr, lane_iota):
    """Device-side twin of :func:`_corner_live_sets` for the lane group:
    the encode runs as one jitted dispatch and only a bincount (a few KB)
    comes back to the host for decoding."""
    k = len(lane_lo)

    def minmax(los):
        o = _lane_offs_j(los, lane_iota)
        return (jnp.stack([x.min() for x in o]),
                jnp.stack([x.max() for x in o]))

    mins, maxs = jax.jit(minmax)(tuple(lane_lo))
    base = [int(v) for v in np.asarray(mins)]
    span = [int(hi) - b + 1 for hi, b in zip(np.asarray(maxs), base)]
    bits = int(np.sum(np.ceil(np.log2(np.maximum(span, 2))))) + 2 * k
    nbins = int(np.prod(span)) << (2 * k)
    if bits >= 31 or nbins > (1 << 24):
        raise ValueError(
            f"lane tap encode needs {bits} bits / {nbins} bins — offsets "
            "reach too far for the row/lane kernel; use the stencil backup")

    def count(los, frs):
        o = _lane_offs_j(los, lane_iota)
        enc = None
        for x, b, s in zip(o, base, span):
            t = x - b
            enc = t if enc is None else enc * s + t
        for fr in frs:
            f0 = fr.astype(jnp.float32)[..., 0]
            bv = (f0 != 1.0).astype(jnp.int32) \
                | ((f0 != 0.0).astype(jnp.int32) << 1)
            enc = (enc << 2) | bv
        return jnp.bincount(enc.reshape(-1), length=nbins)

    n_rows = max(a.shape[0] for a in lane_lo)
    n_elems = n_rows * max(a.shape[1] for a in lane_lo)
    # row-chunking requires every array DENSE over rows in the flat layout;
    # broadcast (1, NE, 1) axes (row-independent lane queries) can't be
    # row-sliced — those keep the one-shot encode
    chunkable = all(a.ndim == 3 and a.shape[0] == n_rows
                    for a in (*lane_lo, *lane_fr))
    if n_elems <= 200_000_000 or not chunkable:
        counts = jax.jit(count)(tuple(lane_lo), tuple(lane_fr))
    else:
        # past ~200M elements the one-shot encode crashes the TPU compile
        # helper — accumulate the bincount over row blocks instead (the
        # last block overlaps backward; double-counting cannot change
        # which bins are NONZERO, the only thing decoded)
        B = max(1, 100_000_000 // max(a.shape[1] for a in lane_lo))

        def count_block(los, frs, r0):
            sl = tuple(jax.lax.dynamic_slice_in_dim(a, r0, B, 0)
                       for a in los)
            sf = tuple(jax.lax.dynamic_slice_in_dim(a, r0, B, 0)
                       for a in frs)
            return count(sl, sf)

        fn = jax.jit(count_block)
        r0s = list(range(0, n_rows - B + 1, B))
        if r0s[-1] + B < n_rows:
            r0s.append(n_rows - B)
        counts = None
        for r0 in r0s:
            c = fn(tuple(lane_lo), tuple(lane_fr), jnp.asarray(r0, jnp.int32))
            counts = c if counts is None else counts + c
    vals = np.nonzero(np.asarray(counts))[0].tolist()
    return _decode_live(vals, base, span, k)


def _lane_live_recompute(spec: "LaneRecompute", lane_strides, NW, NE):
    """Tap liveness for lane-recompute mode: the same encode/bincount as
    :func:`_lane_live_device`, with (lo, frac) REGENERATED per row block
    from the spec — nothing table-sized ever exists. Both corners of every
    touched cell are admitted (no frac-against-{0,1} pruning): the kernel
    re-evaluates the identical fn/locate, but a Mosaic-vs-XLA ulp at an
    exact cell boundary may flip lo by one; admitting both corners bounds
    that to an ~ulp-weighted extra tap instead of a missing one."""
    k = len(spec.axis_sizes)

    def block_offs(r0, B):
        rf = [jax.lax.dynamic_slice_in_dim(r, r0, B, 0)[:, None] for r in
              (jnp.asarray(x) for x in spec.row_feats)]
        lf = [f[None, :] for f in (jnp.asarray(x) for x in spec.lane_feats)]
        coords = spec.coords(rf, lf)
        offs = []
        for ax, c in enumerate(coords):
            lo, _ = spec.locate(ax, c)
            iota = ((jnp.arange(NE, dtype=jnp.int32)
                     // lane_strides[ax]) % spec.axis_sizes[ax])[None, :]
            offs.append(lo - iota)
        return offs

    B = max(1, min(NW, 100_000_000 // max(NE, 1)))
    r0s = list(range(0, NW, B))

    @jax.jit
    def minmax(r0):
        o = block_offs(r0, B)
        return (jnp.stack([x.min() for x in o]),
                jnp.stack([x.max() for x in o]))

    mins = maxs = None
    for r0 in r0s:
        r0 = min(r0, NW - B)
        lo_, hi_ = minmax(jnp.asarray(r0, jnp.int32))
        mins = lo_ if mins is None else jnp.minimum(mins, lo_)
        maxs = hi_ if maxs is None else jnp.maximum(maxs, hi_)
    base = [int(v) for v in np.asarray(mins)]
    span = [int(hi) - b + 1 for hi, b in zip(np.asarray(maxs), base)]
    bits = int(np.sum(np.ceil(np.log2(np.maximum(span, 2))))) + 2 * k
    nbins = int(np.prod(span)) << (2 * k)
    if bits >= 31 or nbins > (1 << 24):
        raise ValueError(
            f"lane tap encode needs {bits} bits / {nbins} bins — offsets "
            "reach too far for the row/lane kernel; use the stencil backup")

    @jax.jit
    def count(r0):
        o = block_offs(r0, B)
        enc = None
        for x, b, s in zip(o, base, span):
            t = x - b
            enc = t if enc is None else enc * s + t
        enc = (enc << (2 * k)) | ((1 << (2 * k)) - 1)   # both corners live
        return jnp.bincount(enc.reshape(-1), length=nbins)

    counts = None
    for r0 in r0s:
        c = count(jnp.asarray(min(r0, NW - B), jnp.int32))
        counts = c if counts is None else counts + c
    vals = np.nonzero(np.asarray(counts))[0].tolist()
    return _decode_live(vals, base, span, k)


def _lane_arrays_device(lane_lo, lane_fr, lane_iota, full_shape,
                        NW, NE, NWp, NEp, consume=False):
    """Device-side twin of the host ``lane_full`` fill: padded (NWp, NEp)
    off/frac arrays built per AXIS in jitted dispatches, same pad semantics
    (lane pads duplicate lane 0, row pads duplicate the edge row).
    ``full_shape`` is the pre-flatten broadcast target — the grid's state
    shape for full plans, ``(NW, NE)`` for flat ones.

    ``consume=True`` explicitly ``.delete()``s each plan axis's lo/frac
    buffers right after its padded copies are built, so peak HBM is the
    plan + ONE axis's copies instead of plan + ALL copies — the former
    envelope wall. (Donation cannot do this: XLA input-output aliasing
    requires exactly matching shapes and the padded outputs never match —
    tried, discarded with a warning.) The caller's plan arrays are INVALID
    afterwards — opt in only when the plan is about to be dropped
    (solve_full's flat path swaps in a PlanShape immediately)."""

    def pad2(a):
        if NEp > NE:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:, :1], (NW, NEp - NE))], 1)
        if NWp > NW:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (NWp - NW, NEp))], 0)
        return a

    def build_one(lo, fr, iota):
        off = _lane_offs_j([lo], [iota])[0]
        off2 = jnp.broadcast_to(off, full_shape).reshape(NW, NE)
        fr2 = jnp.broadcast_to(fr.astype(jnp.float32)[..., 0],
                               full_shape).reshape(NW, NE)
        return pad2(off2), pad2(fr2)

    fn = jax.jit(build_one)
    offs_out, frs_out = [], []
    for lo, fr, iota in zip(lane_lo, lane_fr, lane_iota):
        o, f = fn(lo, fr, iota)
        if consume:
            jax.block_until_ready((o, f))
            lo.delete()
            fr.delete()
        offs_out.append(o)
        frs_out.append(f)
    return tuple(offs_out), tuple(frs_out)


@jax.tree_util.register_pytree_node_class
class PallasBackup6D:
    """Callable fused backup for row/lane-separable 6-D problems.

    ``row_axes`` state axes (default 3) form the flat row index; queries
    along them must not vary with the lane axes. The remaining state axes
    form the flat lane index; queries along them must not vary with the
    action. The attitude ``build_full`` plan satisfies both by construction.
    """

    def __init__(self, plan: InterpPlan, cost_terms, *, row_axes: int = 3,
                 row_tile: int | None = None, interpret: bool | None = None,
                 max_flat_taps: int = 40, row_pad_to: int | None = None,
                 row_delta_group: int = 2, table_hbm: bool | None = None,
                 consume_plan: bool = False, argmin_dtype=jnp.int32,
                 device_build: bool | None = None,
                 live_sets: tuple | None = None,
                 cost_act_traced: bool = False,
                 carry_padded: bool = False,
                 digit_slice: int | None = None,
                 analyze_only: bool = False,
                 track_argmin: bool = True):
        d = plan.ndim
        q_shape = plan.query_shape
        # in-kernel-recomputed lane queries (RecomputePlan): no lane plan
        # arrays exist; the kernel regenerates (lo, frac) per row tile from
        # the spec's row/lane features (see LaneRecompute)
        lane_rec = plan.spec if isinstance(plan, RecomputePlan) else None
        if lane_rec is not None and plan.row_axes != row_axes:
            raise ValueError(
                f"RecomputePlan was built for row_axes={plan.row_axes}, "
                f"got row_axes={row_axes}")
        # track_argmin=False: min-only sweeps — the argmin compare/select
        # chain and the out_a stores drop out of the kernel (argmin output
        # is zeros). Correct whenever the caller keeps only the LAST
        # sweep's argmin (both engines do): run sweeps 0..n-2 min-only and
        # the final sweep with a tracking kernel. Roofline lever measured
        # round 5 (scripts/roofline.py / NOTES.md).
        self.track_argmin = bool(track_argmin)
        self.argmin_dtype = np.dtype(argmin_dtype)
        if np.issubdtype(self.argmin_dtype, np.integer) and \
                np.iinfo(self.argmin_dtype).max < q_shape[-1] - 1:
            raise ValueError(
                f"argmin_dtype {self.argmin_dtype} cannot index "
                f"{q_shape[-1]} actions")
        # FLAT plans carry their per-axis lo/frac in (rows, lanes, actions)
        # layout — (NW, 1, A) for row axes, (NW, NE, 1) for lane axes — so
        # no array ever exists in the d-dimensional broadcast shape. This is
        # how envelope-scale plans are born ON DEVICE: a 6-D f32 array with
        # small trailing dims pays ~9.5x TPU tile padding (T(8,128) on the
        # last two dims), which alone overflows HBM at 27^3x18^3.
        self.flat = len(q_shape) != d + 1
        if self.flat and len(q_shape) != 3:
            raise ValueError("flat plans must have (rows, lanes, A) arrays")
        state_shape = plan.grid_shape if self.flat else q_shape[:-1]
        if len(state_shape) != d:
            raise ValueError("plan query shape mismatch")
        self.state_shape = state_shape
        self.n_actions = q_shape[-1]
        nr, nc = row_axes, d - row_axes
        self.NW = int(np.prod(state_shape[:nr]))
        self.NE = int(np.prod(state_shape[nr:]))
        if self.flat and (q_shape[0] != self.NW or q_shape[1] != self.NE):
            raise ValueError(
                f"flat plan rows/lanes {q_shape[:2]} do not match the "
                f"row_axes={row_axes} split of grid {state_shape}")
        self.NEp = _round_up(self.NE, 128)
        if row_tile is None:
            row_tile = auto_row_tile(self.NEp)   # see the helper's rationale
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)
        self.row_delta_group = row_delta_group
        # None = auto per sweep: tables beyond _VMEM_TABLE_BUDGET stay in
        # HBM and the kernel DMAs (T+8)-row tap windows into VMEM scratch
        # (double-buffered) instead of holding the whole table resident —
        # this lifts the single-chip envelope past the scoped-VMEM wall
        # (19^3x14^3's 82MB table crashed the VMEM-resident compile).
        self.table_hbm = table_hbm
        # Big problems build lane arrays + tap liveness ON DEVICE as jitted
        # dispatches: the host path pays ~25s of first-touch page faults per
        # table-sized numpy allocation on this platform plus a full off/frac
        # transfer through the TPU tunnel (NOTES.md). Plan arrays are passed
        # as jit ARGUMENTS, never closures — table-sized closure constants
        # blow the remote-compile payload limit.
        # device_build: overridable for tests — the consume_plan path must
        # be exercisable in the fast CPU lane (ADVICE r3), not only at >8M
        # cells on hardware
        if device_build is None:
            device_build = (not self.interpret
                            and self.NW * self.NE > _DEVICE_BUILD_MIN_ELEMS)
        self._device_build = device_build

        # --- tap analysis -------------------------------------------------
        row_strides = [int(np.prod(state_shape[k + 1:nr], dtype=np.int64))
                       for k in range(nr)]
        lane_strides = [int(np.prod(state_shape[k + 1:], dtype=np.int64))
                        for k in range(nr, d)]

        w_off, w_frac = [], []
        for k in range(nr):
            lo = np.asarray(plan.lo[k])
            fr = np.asarray(plan.frac[k], np.float32)
            lane_dims = lo.shape[1:2] if self.flat else lo.shape[nr:d]
            lane_dims_f = fr.shape[1:2] if self.flat else fr.shape[nr:d]
            if any(s > 1 for s in lane_dims) or \
               any(s > 1 for s in lane_dims_f):
                raise ValueError(
                    f"row axis {k} query varies along lane axes — "
                    "not row/lane separable; use the stencil/gather backup")
            if self.flat:
                idx = ((np.arange(self.NW, dtype=np.int32)
                        // row_strides[k]) % state_shape[k])[:, None]
                off = lo[:, 0, :].astype(np.int32) - idx
                fr2 = fr[:, 0, :]
            else:
                idx = np.arange(state_shape[k], dtype=np.int32).reshape(
                    (1,) * k + (-1,) + (1,) * (d - k))
                off = np.broadcast_to(
                    lo.astype(np.int32) - idx,
                    state_shape[:nr] + (1,) * nc + (self.n_actions,)
                ).reshape(self.NW, self.n_actions)
                fr2 = np.broadcast_to(
                    fr, state_shape[:nr] + (1,) * nc + (self.n_actions,)
                ).reshape(self.NW, self.n_actions)
            w_off.append(np.broadcast_to(off,
                                         (self.NW, self.n_actions)))
            w_frac.append(np.broadcast_to(fr2,
                                          (self.NW, self.n_actions)))

        # lane off/frac stay BROADCAST VIEWS here: materializing (NW, NE)
        # copies costs several full passes per array at envelope scales; the
        # padded device arrays below are filled in ONE pass each instead.
        # Per-axis lane iotas: own-axis grid index as a function of the flat
        # lane position (flat plans) or a broadcast arange (full plans).
        e_off, e_frac = [], []
        lane_lo, lane_fr, lane_iota = [], [], []
        # SEPARABLE lane interpolation (one lerp pass per lane axis, O(sum
        # taps) instead of O(prod taps) joint combos) is exact ONLY when
        # each lane axis's (lo, frac) is independent of the OTHER lane
        # axes' coordinates — true for pos-att (x' = f(x, rows),
        # theta' = f(theta, rows)) but NOT for the 6-D attitude Euler
        # queries, whose quaternion step couples all three angles. Detected
        # from the plan's broadcast shapes; flat plans are dense (NW, NE)
        # and treated as coupled.
        lane_separable = not self.flat
        for k in range(nr, d) if lane_rec is None else ():
            lo_d, fr_d = plan.lo[k], plan.frac[k]
            if lo_d.shape[-1] > 1 or fr_d.shape[-1] > 1:
                raise ValueError(
                    f"lane axis {k} query varies with the action — "
                    "not row/lane separable; use the stencil/gather backup")
            if not self.flat:
                for j in range(nr, d):
                    if j != k and (lo_d.shape[j] > 1 or fr_d.shape[j] > 1):
                        lane_separable = False
            if self.flat:
                iota = ((np.arange(self.NE, dtype=np.int32)
                         // lane_strides[k - nr]) % state_shape[k])[None, :]
            else:
                iota = np.arange(state_shape[k], dtype=np.int32).reshape(
                    (1,) * k + (-1,) + (1,) * (d - 1 - k))
            if self._device_build:
                lane_lo.append(lo_d)
                lane_fr.append(fr_d)
                lane_iota.append(jnp.asarray(iota))
                continue
            lo = np.asarray(lo_d)
            fr = np.asarray(fr_d, np.float32)
            e_off.append(lo.astype(np.int32, copy=False)[..., 0] - iota)
            e_frac.append(fr[..., 0])

        w_taps, row_combos = _corner_live_sets(w_off, w_frac)
        if lane_rec is not None:
            lane_separable = False     # joint combos (coupled by default)
            e_taps, lane_combos = _lane_live_recompute(
                lane_rec, lane_strides, self.NW, self.NE)
        elif self._device_build:
            e_taps, lane_combos = _lane_live_device(lane_lo, lane_fr,
                                                    lane_iota)
        else:
            e_taps, lane_combos = _corner_live_sets(e_off, e_frac)
        if live_sets is not None:
            # SUPERSET tap structure shared across several problems so each
            # one's backup has an IDENTICAL treedef — the stacked-channel EP
            # solve (models/pos_att.solve_ep) shard_maps ONE traced program
            # over per-channel leaf stacks, which requires static aux
            # equality. Taps/combos a given problem never reaches carry
            # exactly-zero weights at every (row, lane, action) element, so
            # values and argmin are unchanged (0-contribution addends).
            # Validated as a superset so a stale union fails loudly.
            u_w_taps, u_row_combos, u_e_taps, u_lane_combos = live_sets
            for k in range(nr):
                if not set(w_taps[k]) <= set(u_w_taps[k]):
                    raise ValueError(
                        f"live_sets row taps axis {k} {u_w_taps[k]} do not "
                        f"cover this plan's {tuple(w_taps[k])}")
            if not {tuple(c) for c in row_combos} <= \
                    {tuple(c) for c in u_row_combos}:
                raise ValueError("live_sets row combos do not cover this "
                                 "plan's live combos")
            for k in range(d - nr):
                if not set(e_taps[k]) <= set(u_e_taps[k]):
                    raise ValueError(
                        f"live_sets lane taps axis {k} {u_e_taps[k]} do not "
                        f"cover this plan's {tuple(e_taps[k])}")
            if not {tuple(c) for c in lane_combos} <= \
                    {tuple(c) for c in u_lane_combos}:
                raise ValueError("live_sets lane combos do not cover this "
                                 "plan's live combos")
            w_taps, row_combos = u_w_taps, u_row_combos
            e_taps, lane_combos = u_e_taps, u_lane_combos
        self.row_combos = tuple(row_combos)    # flat row offs
        self.lane_combos = tuple(lane_combos)  # flat lane offs
        self.lane_separable = lane_separable
        if analyze_only:
            # tap-analysis pass only (union_live_sets input): stop before
            # any padded device array is built. The resulting object is
            # NOT callable — it exists to donate its tap/combo structure
            # to a union rebuild (models/pos_att.build_ep_rowlane_backups'
            # two-pass build; halves the high-res all-channel build cost).
            self.w_taps = tuple(tuple(t) for t in w_taps)
            self.e_taps = tuple(tuple(t) for t in e_taps)
            return

        # Action-digit factorization: when row axis k's (off, frac) depend
        # only on digit k of the C-order action index (true for attitude —
        # u_k enters only axis k's dynamics), the action phase contracts
        # tap axes one digit at a time: 3*digits^(axes) FMAs instead of
        # actions * row_combos (243 vs 729 at 27 actions).
        self.action_digits = None
        self.digit_slice = None
        if digit_slice is not None:
            # This kernel computes ONE fixed-d0 digit slice of a digit-
            # factorized action set (A_full = m^3, this slice = m^2 actions
            # with digits (d0, *, *)) — the action-sharded halo6 engine's
            # per-group kernel. The factorized contraction's B/C partials
            # depend only on digits 1..2, so running it here (local d0 = 0
            # maps to column 0 — correct: axis-0 columns are all equal
            # within a slice) reproduces the full single-chip kernel's
            # per-action rounding BITWISE (the generic per-combo order does
            # not — measured ~4e-7 rel).
            if nr != 3:
                raise ValueError("digit_slice requires 3 row axes")
            m = int(digit_slice)
            if self.n_actions != m * m:
                raise ValueError(
                    f"digit_slice m={m} does not match "
                    f"{self.n_actions} actions")
            for arrs in (w_off, w_frac):
                if not np.all(np.asarray(arrs[0])
                              == np.asarray(arrs[0])[:, :1]):
                    raise ValueError(
                        "digit_slice: axis-0 queries vary within the slice "
                        "(digit 0 is supposed to be fixed)")
            if self._detect_action_digits(w_off[1:], w_frac[1:], 2) != m:
                raise ValueError(
                    "digit_slice: axes 1-2 are not digit-factorized")
            self.action_digits = m
            self.digit_slice = m
        elif nr >= 1 and live_sets is None:
            # (under live_sets the digit decision could differ per problem
            # — e.g. edge-padded action columns break it — so EP-stacked
            # backups uniformly use the generic action phase)
            digits = self._detect_action_digits(w_off, w_frac, nr)
            if digits is not None:
                self.action_digits = digits
        if len(self.row_combos) > max_flat_taps or \
           len(self.lane_combos) > max_flat_taps:
            raise ValueError(
                f"{len(self.row_combos)} row x {len(self.lane_combos)} lane "
                f"flat taps exceed max_flat_taps={max_flat_taps}")
        self.row_deltas = tuple(sum(t * s for t, s in zip(c, row_strides))
                                for c in self.row_combos)
        self.lane_deltas = tuple(sum(t * s for t, s in zip(c, lane_strides))
                                 for c in self.lane_combos)
        self.lane_axis_strides = tuple(lane_strides)
        self.d_min = min(self.row_deltas)
        self.d_max = max(self.row_deltas)
        self.w_taps = tuple(tuple(t) for t in w_taps)
        self.e_taps = tuple(tuple(t) for t in e_taps)

        # --- padded device-side inputs ----------------------------------
        self.row_tile = row_tile
        self.NWp = _round_up(self.NW, row_tile)
        if row_pad_to is not None:
            # row-sharded engines pad further so NWp divides evenly into
            # per-device blocks of whole tiles (parallel/halo6.py)
            if row_pad_to < self.NWp or row_pad_to % row_tile:
                raise ValueError(
                    f"row_pad_to={row_pad_to} must be a multiple of "
                    f"row_tile={row_tile} and >= {self.NWp}")
            self.NWp = row_pad_to

        def pad_rows(a, fill_edge=True):
            if a.shape[0] == self.NWp:
                return a
            pad = self.NWp - a.shape[0]
            mode = "edge" if fill_edge else "constant"
            return np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1), mode=mode)

        def pad_lanes(a):
            if a.shape[1] == self.NEp:
                return a
            # duplicate lane 0 so pad-lane arithmetic stays finite
            pad = a[:, :1].repeat(self.NEp - a.shape[1], axis=1)
            return np.concatenate([a, pad], axis=1)

        def lane_full(src, dtype):
            """(NWp, NEp) array filled from a state-shaped broadcast view:
            at most one contiguous materialization + one 2-D strided copy
            (numpy's 6-D fancy assignment paths are ~10x slower)."""
            out = np.empty((self.NWp, self.NEp), dtype)
            if self.flat:
                src2 = np.broadcast_to(src, (self.NW, self.NE))
            else:
                src2 = np.broadcast_to(src, state_shape).reshape(
                    self.NW, self.NE)
            out[:self.NW, :self.NE] = src2
            if self.NE < self.NEp:       # dup lane 0: finite arithmetic
                out[:self.NW, self.NE:] = out[:self.NW, :1]
            if self.NW < self.NWp:       # edge rows
                out[self.NW:] = out[self.NW - 1]
            return out

        self.w_off_j = tuple(jnp.asarray(pad_rows(o).astype(np.int32))
                             for o in w_off)
        self.w_frac_j = tuple(jnp.asarray(pad_rows(f)) for f in w_frac)
        if lane_rec is not None:
            # recompute mode: lane plan arrays never exist; the kernel's
            # inputs are the spec's tiny per-row / per-lane feature vectors
            # (padded like every other row/lane array: edge rows, lane 0)
            self.e_off_j, self.e_frac_j = (), ()

            def pad_rf(r):
                r = r[:, None]
                if self.NWp > self.NW:
                    r = jnp.concatenate(
                        [r, jnp.broadcast_to(r[-1:],
                                             (self.NWp - self.NW, 1))], 0)
                return r

            def pad_lf(f):
                f = f[None, :]
                if self.NEp > self.NE:
                    f = jnp.concatenate(
                        [f, jnp.broadcast_to(f[:, :1],
                                             (1, self.NEp - self.NE))], 1)
                return f

            self.lane_rf_j = tuple(pad_rf(r) for r in lane_rec.row_feats)
            self.lane_lf_j = tuple(pad_lf(f) for f in lane_rec.lane_feats)
            self.lane_rec_meta = (lane_rec.fn, lane_rec.axis_starts,
                                  lane_rec.axis_steps, lane_rec.axis_sizes,
                                  lane_rec.edge)
        elif self._device_build:
            self.e_off_j, self.e_frac_j = _lane_arrays_device(
                lane_lo, lane_fr, lane_iota,
                (self.NW, self.NE) if self.flat else state_shape,
                self.NW, self.NE, self.NWp, self.NEp,
                consume=consume_plan)
            self.lane_rf_j, self.lane_lf_j = (), ()
            self.lane_rec_meta = None
            if consume_plan:
                # the caller's plan lane buffers are DELETED now; nothing
                # below this point may touch `plan` — enforced structurally
                plan = None  # noqa: F841
        else:
            self.e_off_j = tuple(jnp.asarray(lane_full(o, np.int32))
                                 for o in e_off)
            self.e_frac_j = tuple(jnp.asarray(lane_full(f, np.float32))
                                  for f in e_frac)
            self.lane_rf_j, self.lane_lf_j = (), ()
            self.lane_rec_meta = None

        # --- factorized stage cost --------------------------------------
        # Terms factor into: row-only, lane-only, action-only (the 6-D
        # attitude split), plus two COUPLED buckets the stacked-channel EP
        # problem needs (models/pos_att.py solve_ep): row x action (per-
        # channel action costs incl. +inf padding of short action sets —
        # affects the argmin, contracted in the action phase) and
        # row x lane (per-channel lane state costs — argmin-neutral, added
        # after it like c_row/c_lane). lane x action coupling stays
        # unsupported (would force a table-sized per-action weight).
        c_row = np.zeros(self.NW, np.float32)
        c_lane = np.zeros(self.NE, np.float32)
        c_act = np.zeros(self.n_actions, np.float32)
        c_rowact = None
        c_rowlane = None
        terms = (list(cost_terms) if isinstance(cost_terms, (tuple, list))
                 else [cost_terms])
        nd_t = 3 if self.flat else d + 1
        for term in terms:
            t = np.asarray(term, np.float32)
            if t.ndim != nd_t:
                t = t.reshape((1,) * (nd_t - t.ndim) + t.shape)
            if self.flat:
                row_dep, lane_dep = t.shape[0] > 1, t.shape[1] > 1
            else:
                row_dep = any(s > 1 for s in t.shape[:nr])
                lane_dep = any(s > 1 for s in t.shape[nr:d])
            act_dep = t.shape[-1] > 1
            if lane_dep and act_dep:
                raise ValueError(
                    "cost term couples the lane and action groups — "
                    "not factorizable for the 6-D kernel")
            if act_dep and (row_dep or cost_act_traced):
                # cost_act_traced: per-action costs ride the TRACED
                # row x action bucket instead of the static c_act
                # immediates, so problems with different action costs
                # (e.g. +inf-padded short action sets) share one treedef
                shape = (self.NW, 1, self.n_actions) if self.flat \
                    else state_shape[:nr] + (1,) * nc + (self.n_actions,)
                add = np.broadcast_to(t, shape).reshape(self.NW,
                                                        self.n_actions)
                c_rowact = add.copy() if c_rowact is None else c_rowact + add
            elif row_dep and lane_dep:
                add = lane_full(t[..., 0], np.float32)
                c_rowlane = add if c_rowlane is None else c_rowlane + add
            elif act_dep:
                c_act += t.reshape(-1) if self.flat else np.broadcast_to(
                    t, (1,) * d + (self.n_actions,)).reshape(self.n_actions)
            elif lane_dep:
                shape = (1, self.NE, 1) if self.flat \
                    else (1,) * nr + state_shape[nr:] + (1,)
                c_lane += np.broadcast_to(t, shape).reshape(self.NE)
            else:
                shape = (self.NW, 1, 1) if self.flat \
                    else state_shape[:nr] + (1,) * (nc + 1)
                c_row += np.broadcast_to(t, shape).reshape(self.NW)
        self.c_row_j = jnp.asarray(pad_rows(c_row[:, None]))
        self.c_lane_j = jnp.asarray(pad_lanes(c_lane[None, :]))
        self.c_rowact_j = () if c_rowact is None \
            else (jnp.asarray(pad_rows(c_rowact)),)
        self.c_rowlane_j = () if c_rowlane is None \
            else (jnp.asarray(c_rowlane),)
        # per-action scalars become kernel immediates (tiny, host-known)
        self.c_act = tuple(float(x) for x in c_act)

        # Padded layout [pad_top zeros; NW real; ... zeros]; real row r's
        # tap D reads padded row r + pad_top + D. Each tap is realized as an
        # 8-ALIGNED (T+8)-row dynamic slice of the VMEM-resident table plus
        # a sub-8 sublane roll — NOT one big rolled window per tap, whose
        # (T+span)-row temporaries stack-OOM VMEM at 27 taps (measured:
        # 66MB demand vs the 16MB budget at 11^3x10^3).
        self.pad_top = max(-self.d_min, 0)
        aligned_max = ((self.d_max + self.pad_top) // 8) * 8
        self.pad_bot = max(aligned_max + 8 - self.pad_top, 0)

        self.carry_padded = bool(carry_padded)
        if self.carry_padded:
            # Padded-carry mode: the engine's scan carry IS the padded
            # (pad_top + NWp + pad_bot, NEp) table and the kernel writes
            # the NEXT padded table directly (pad tiles emit zeros, rows
            # past NW are re-zeroed so edge-arg garbage cannot compound
            # across sweeps under expansive extrapolation weights). The
            # per-sweep jnp.pad copy — 4 B/cell of extra peak HBM, ~2 GB
            # at the 512M-cell scale — never exists; this is the envelope
            # lever past the 439M-cell wall. Pads round up to whole row
            # tiles so every output tile is purely real or purely pad, and
            # pad_top stays a multiple of 8 so the aligned-slice row math
            # shifts exactly (see aligned_rem).
            if row_tile % 8:
                raise ValueError("carry_padded requires 8-aligned row_tile")
            self.pad_top = _round_up(self.pad_top, row_tile)
            aligned_max = ((self.d_max + self.pad_top) // 8) * 8
            self.pad_bot = _round_up(max(aligned_max + 8 - self.pad_top, 0),
                                     row_tile)

            def repad(a):
                a = jnp.asarray(a)
                top = jnp.broadcast_to(a[:1], (self.pad_top,) + a.shape[1:])
                bot = jnp.broadcast_to(a[-1:], (self.pad_bot,) + a.shape[1:])
                return jnp.concatenate([top, a, bot], 0)

            # per-row sweep inputs gain the same top/bot pad rows so arg
            # tiles stay 1:1 with output tiles (content is edge-duplicated;
            # pad tiles never read it — they are predicated off)
            for f in ("w_off_j", "w_frac_j", "e_off_j", "e_frac_j",
                      "lane_rf_j", "c_rowact_j", "c_rowlane_j"):
                setattr(self, f,
                        tuple(repad(a) for a in getattr(self, f)))
            self.c_row_j = repad(self.c_row_j)

    @staticmethod
    def _detect_action_digits(w_off, w_frac, nr):
        """Detect a C-order digit decomposition A = m^nr where row axis k's
        (off, frac) columns depend only on digit k. Returns m or None."""
        A = w_off[0].shape[1]
        m = round(A ** (1.0 / nr))
        if m**nr != A or m < 2:
            return None
        for k in range(nr):
            stride = m ** (nr - 1 - k)
            for a in range(A):
                rep = (a // stride) % m * stride  # canonical column per digit
                if not (np.array_equal(w_off[k][:, a], w_off[k][:, rep])
                        and np.array_equal(w_frac[k][:, a],
                                           w_frac[k][:, rep])):
                    return None
        return m

    def _win_slots(self) -> int:
        """DMA window buffers in HBM-table mode: the current row-delta
        group plus one prefetched group (double buffering)."""
        return min(len(self.row_deltas), 2 * self.row_delta_group)

    # ------------------------------------------------------------- kernel
    def _kernel(self, hbm, carry, v_ref, *refs):
        nr, nc = len(self.w_off_j), len(self.e_off_j)
        it = iter(refs)
        w_off = [next(it) for _ in range(nr)]
        w_frac = [next(it) for _ in range(nr)]
        e_off = [next(it) for _ in range(nc)]
        e_frac = [next(it) for _ in range(nc)]
        rf = [next(it) for _ in range(len(self.lane_rf_j))]
        c_row = next(it)
        c_ra = next(it) if self.c_rowact_j else None
        c_rl = next(it) if self.c_rowlane_j else None
        lf = [next(it) for _ in range(len(self.lane_lf_j))]
        c_lane = next(it)
        out_v, out_a = next(it), next(it)
        a_scr, we_scr, bc_scr = next(it), next(it), next(it)
        if hbm:
            win_scr, win_sem = next(it), next(it)

        T, NE = self.row_tile, self.NEp
        row0 = pl.multiple_of(pl.program_id(0) * T, T)

        # Every multi-use (T, NE) intermediate stages through VMEM SCRATCH:
        # keeping them live as SSA values makes Mosaic's register allocator
        # spill (measured: 66-133MB of spill slots at the flagship size —
        # the compile-crash signature) while fori_loop + dynamic-roll
        # variants hit pathological Mosaic compile times. Static unroll
        # with scratch staging is the shape that both compiles (~90s) and
        # runs.

        def compute():
            if self.lane_rec_meta is not None:
                # lane-recompute mode: regenerate each lane axis's (off, frac)
                # for this row tile from the per-row/per-lane features — the
                # quaternion-step/readback math runs ONCE per tile, shared by
                # every action and row shift; 24 B/cell of stored plan never
                # exists (see LaneRecompute). Same fn + locate as the liveness
                # pass — measured bit-identical across the XLA and Mosaic
                # lowerings of kernelmath's trig on this toolchain.
                fn, starts, steps, sizes, edge = self.lane_rec_meta
                # the enclosing nc counts e_off_j REFS (zero in recompute
                # mode — no stored lane arrays); the true lane-axis count
                # lives in the spec. Kept branch-local: compute() must not
                # shadow the enclosing names.
                nc_r = len(sizes)
                coords = fn([r[...] for r in rf], [f[0:1, :] for f in lf])
                # rec-branch locals (e_off/e_frac name the enclosing
                # _kernel refs, which compute() must not shadow)
                e_off_r, e_frac_r = [], []
                for k, c in enumerate(coords):
                    lo, frv = _affine_locate(c, starts[k], steps[k], sizes[k],
                                             edge)
                    iota = (jax.lax.broadcasted_iota(jnp.int32, (T, NE), 1)
                            // self.lane_axis_strides[k]) % sizes[k]
                    e_off_r.append(lo - iota)
                    e_frac_r.append(frv)
                e_w = []
                for k in range(nc_r):
                    ws = {}
                    for t in self.e_taps[k]:
                        ws[t] = jnp.where(e_off_r[k] == t,
                                          1.0 - e_frac_r[k], 0.0) \
                            + jnp.where(e_off_r[k] == t - 1,
                                        e_frac_r[k], 0.0)
                    e_w.append(ws)
            else:
                # per-axis lane tap weights, shared across combos/passes
                e_w = []
                for k in range(nc):
                    ws = {}
                    off, fr = e_off[k][...], e_frac[k][...]
                    for t in self.e_taps[k]:
                        ws[t] = jnp.where(off == t, 1.0 - fr, 0.0) \
                            + jnp.where(off == t - 1, fr, 0.0)
                    e_w.append(ws)

            if self.lane_separable:
                # stage the per-axis weights in scratch (each is reused by
                # every row shift); slot map axis k, tap t -> we_scr row
                e_slot = []
                slot = 0
                for k in range(nc):
                    ws = {}
                    for t in self.e_taps[k]:
                        we_scr[slot, :, :] = e_w[k][t]
                        ws[t] = slot
                        slot += 1
                    e_slot.append(ws)
            else:
                # we_scr[i] = joint lane-combo weight product. Joint combos are
                # REQUIRED when a lane axis's frac depends on the other lane
                # axes (the attitude Euler queries): a separable pass would
                # evaluate axis k's weight at the other axes' SHIFTED cells —
                # measured 8e-4 deviation from the oracle, a different
                # operator, not rounding.
                for i, combo in enumerate(self.lane_combos):
                    w = None
                    for k, t in enumerate(combo):
                        w = e_w[k][t] if w is None else w * e_w[k][t]
                    we_scr[i, :, :] = w

            # a_scr[j] = lane-interpolated value rows for each flat row shift.
            # Separable plans run one lerp pass per lane axis (sum over that
            # axis's taps of weight * lane-roll by tap*stride) — O(sum taps)
            # ~ 6 FMA+roll per row shift instead of O(prod taps) joint combos;
            # exact because each axis's weights depend only on its own digit
            # (+ rows), so shifted intermediates carry the right weights. The
            # flat-shift zero-weight trick holds per axis (a live tap keeps
            # every digit in range), so pad/cross-boundary rolls only pair
            # with zero weights at real lanes. Passes stage through a_scr[j]
            # to bound Mosaic live ranges. Coupled plans (attitude) keep the
            # joint-combo accumulate, processed in row-shift PAIRS so each
            # we_scr slot is read once per pair (halves the dominant scratch
            # traffic).
            nj = len(self.row_deltas)
            G = self.row_delta_group

            def aligned_rem(j):
                shift = self.row_deltas[j] + self.pad_top
                aligned = (shift // 8) * 8
                if carry:
                    # carry coords: the tile's table row == its output row,
                    # so the pad_top bias drops out (pad_top % 8 == 0 keeps
                    # the slice 8-aligned and rem unchanged)
                    aligned -= self.pad_top
                return aligned, shift % 8

            if hbm:
                # Table in HBM: each tap window is DMA'd into a VMEM slot; the
                # NEXT group's windows prefetch while the current one computes
                # (the 27-lane-delta accumulate is ample cover for a
                # (T+8, NEp) copy).
                nslots = self._win_slots()

                def win_dma(j):
                    aligned, _ = aligned_rem(j)
                    return pltpu.make_async_copy(
                        v_ref.at[pl.ds(row0 + aligned, T + 8), :],
                        win_scr.at[j % nslots],
                        win_sem.at[j % nslots])

                for j in range(min(G, nj)):
                    win_dma(j).start()

            def load_rows(j):
                aligned, rem = aligned_rem(j)
                if hbm:
                    win_dma(j).wait()
                    sub = win_scr[j % nslots, :, :]
                else:
                    sub = v_ref[pl.ds(row0 + aligned, T + 8), :]
                return pltpu.roll(sub, (T + 8) - rem, 0)[:T, :] if rem \
                    else sub[:T, :]

            for j0 in range(0, nj, G):
                group = range(j0, min(j0 + G, nj))
                if hbm:
                    for j in range(j0 + G, min(j0 + 2 * G, nj)):
                        win_dma(j).start()
                rows_g = [load_rows(j) for j in group]
                if self.lane_separable:
                    for gi, j in enumerate(group):
                        cur = rows_g[gi]
                        if nc == 0:
                            a_scr[j, :, :] = cur
                            continue
                        for k in range(nc - 1, -1, -1):  # innermost first
                            stride = self.lane_axis_strides[k]
                            acc = None
                            for t in self.e_taps[k]:
                                dl = (t * stride) % NE
                                sh = pltpu.roll(cur, (-t * stride) % NE, 1) \
                                    if dl else cur
                                term = we_scr[e_slot[k][t], :, :] * sh
                                acc = term if acc is None else acc + term
                            a_scr[j, :, :] = acc
                            cur = a_scr[j, :, :]
                else:
                    accs = [None] * len(rows_g)
                    for i, dlane in enumerate(self.lane_deltas):
                        w = we_scr[i, :, :]
                        for gi, rows in enumerate(rows_g):
                            lane = pltpu.roll(rows, (-dlane) % NE, 1) \
                                if dlane % NE else rows
                            term = w * lane
                            accs[gi] = term if accs[gi] is None \
                                else accs[gi] + term
                    for gi, j in enumerate(group):
                        a_scr[j, :, :] = accs[gi]

            # per-axis row tap weights: (T, n_actions) each
            w_w = []
            for k in range(nr):
                ws = {}
                off, fr = w_off[k][...], w_frac[k][...]
                for t in self.w_taps[k]:
                    ws[t] = jnp.where(off == t, 1.0 - fr, 0.0) \
                        + jnp.where(off == t - 1, fr, 0.0)
                w_w.append(ws)

            if self.action_digits and nr == 3:
                best_v, best_a = self._action_phase_factorized(w_w, a_scr, bc_scr,
                                                               T, NE, c_ra)
            else:
                best_v, best_a = self._action_phase_generic(w_w, a_scr, T, NE, nr,
                                                            c_ra)
            vals_out = best_v + c_row[...] + c_lane[0:1, :] \
                + (c_rl[...] if c_rl is not None else 0.0)
            if carry and self.NWp != self.NW:
                # rows past NW hold edge-duplicated-arg garbage; in carry
                # mode they persist sweep-to-sweep and extrapolation
                # weights can be expansive (|1-f|+|f| > 1), so unzeroed
                # garbage would compound to inf and poison real rows
                # through 0-weight taps (0 * inf = NaN). Re-zero each sweep.
                riota = jax.lax.broadcasted_iota(jnp.int32, (T, NE), 0) \
                    + (row0 - self.pad_top)
                rmask = riota < self.NW
                vals_out = jnp.where(rmask, vals_out, 0.0)
                best_a = jnp.where(rmask, best_a, 0)
            out_v[:, :] = vals_out
            # argmin is written in the (possibly narrow) argmin_dtype — at
            # envelope grids the int32 per-sweep output alone is GBs (the
            # round-3 262M-cell OOM); uint8 at <= 256 actions quarters it
            out_a[:, :] = best_a.astype(self.argmin_dtype)

        if not carry:
            compute()
            return
        # padded-carry dispatch: tiles are purely real or purely pad
        # (pads are rounded to whole row tiles); pad tiles only zero
        # their outputs — they never read the table, whose bounds the
        # real tiles' aligned windows already cover
        nt_top = self.pad_top // T
        i0 = pl.program_id(0)
        is_real = jnp.logical_and(i0 >= nt_top,
                                  i0 < nt_top + self.NWp // T)
        pl.when(is_real)(compute)

        @pl.when(jnp.logical_not(is_real))
        def _zero_pad_tile():
            out_v[:, :] = jnp.zeros((T, NE), jnp.float32)
            out_a[:, :] = jnp.zeros((T, NE), self.argmin_dtype)

    def _action_phase_generic(self, w_w, a_scr, T, NE, nr, c_ra=None):
        """27 actions x |row_combos| accumulation (any action structure)."""
        best_v = None
        best_a = None
        for a in range(self.n_actions):
            tot = None
            for j, combo in enumerate(self.row_combos):
                w = None
                for k, t in enumerate(combo):
                    col = w_w[k][t][:, a:a + 1]          # (T, 1)
                    w = col if w is None else w * col
                term = w * a_scr[j, :, :]
                tot = term if tot is None else tot + term
            if self.c_act[a]:
                tot = tot + self.c_act[a]
            if c_ra is not None:
                tot = tot + c_ra[:, a:a + 1]   # row x action cost column
            if best_v is None:
                best_v = tot
                best_a = jnp.zeros((T, NE), jnp.int32)
            elif not self.track_argmin:
                # min-only sweep: same where-min (NOT jnp.minimum — that
                # would propagate NaN where the reference's min ignores
                # it, ops/backup.py), minus the argmin select chain
                best_v = jnp.where(tot < best_v, tot, best_v)
            else:
                better = tot < best_v        # strict: first minimum wins
                best_v = jnp.where(better, tot, best_v)
                best_a = jnp.where(better, jnp.int32(a), best_a)
        return best_v, best_a

    def _bc_layout(self):
        """Scratch slot maps for the factorized action phase."""
        m = self.action_digits
        t0s = sorted({c[0] for c in self.row_combos})
        t01s = sorted({c[:2] for c in self.row_combos})
        b_slot = {}
        for (t0, t1) in t01s:
            for d2 in range(m):
                b_slot[(t0, t1, d2)] = len(b_slot)
        c_slot = {}
        for t0 in t0s:
            for d1 in range(m):
                for d2 in range(m):
                    c_slot[(t0, d1, d2)] = len(b_slot) + len(c_slot)
        return t0s, t01s, b_slot, c_slot

    @property
    def bc_slots(self) -> int:
        if not (self.action_digits and len(self.w_taps) == 3):
            return 1
        _, _, b_slot, c_slot = self._bc_layout()
        return len(b_slot) + len(c_slot)

    def _action_phase_factorized(self, w_w, a_scr, bc_scr, T, NE,
                                 c_ra=None):
        """Digit-factorized contraction: axis k's weight depends only on
        action digit k (C-order a = (a0*m + a1)*m + a2), so tap axes
        contract one digit at a time — ~3*m^3 FMAs instead of
        A * |row_combos| (243 vs 729 for the attitude 27-action set).
        Partial contractions stage through scratch (see we_scr note)."""
        m = self.action_digits
        jidx = {c: j for j, c in enumerate(self.row_combos)}
        t0s, t01s, b_slot, c_slot = self._bc_layout()

        def col(k, t, digit):
            a = digit * m ** (2 - k)      # canonical action with digit k
            return w_w[k][t][:, a:a + 1]

        for (t0, t1) in t01s:
            for d2 in range(m):
                acc = None
                for t2 in self.w_taps[2]:
                    j = jidx.get((t0, t1, t2))
                    if j is None:
                        continue
                    term = col(2, t2, d2) * a_scr[j, :, :]
                    acc = term if acc is None else acc + term
                bc_scr[b_slot[(t0, t1, d2)], :, :] = acc
        for t0 in t0s:
            for d1 in range(m):
                for d2 in range(m):
                    acc = None
                    for t1 in self.w_taps[1]:
                        s = b_slot.get((t0, t1, d2))
                        if s is None:
                            continue
                        term = col(1, t1, d1) * bc_scr[s, :, :]
                        acc = term if acc is None else acc + term
                    bc_scr[c_slot[(t0, d1, d2)], :, :] = acc
        best_v = None
        best_a = None
        for a in range(self.n_actions):
            d0, rem = divmod(a, m * m)
            d1, d2 = divmod(rem, m)
            tot = None
            for t0 in t0s:
                s = c_slot.get((t0, d1, d2))
                if s is None:
                    continue
                term = col(0, t0, d0) * bc_scr[s, :, :]
                tot = term if tot is None else tot + term
            if self.c_act[a]:
                tot = tot + self.c_act[a]
            if c_ra is not None:
                tot = tot + c_ra[:, a:a + 1]   # row x action cost column
            if best_v is None:
                best_v = tot
                best_a = jnp.zeros((T, NE), jnp.int32)
            elif not self.track_argmin:
                best_v = jnp.where(tot < best_v, tot, best_v)
            else:
                better = tot < best_v        # strict: first minimum wins
                best_v = jnp.where(better, tot, best_v)
                best_a = jnp.where(better, jnp.int32(a), best_a)
        return best_v, best_a

    # pytree protocol: arrays are leaves so the whole backup can ride
    # through jit/scan as an ARGUMENT — its ~MBs of off/frac tables must
    # never become compile-payload constants (NOTES.md: remote-compile
    # HTTP 413 at ~50MB; exactly what killed the XLA stencil at scale).
    traced_argument = True   # engines must pass this backup as a jit ARG

    # VMEM-resident tables beyond this auto-switch to the HBM/DMA path.
    # Measured on a v5e: the flagship 6.3MB table runs 1.7x FASTER
    # HBM-resident (3.2 vs 5.5 ms/sweep — VMEM residency evidently costs
    # Mosaic scheduling slack), while the pos-att rowlane 1.2MB table is
    # ~6% faster VMEM-resident (DMA issue overhead at trivial tile
    # compute). 4MB splits the two anchors; it is a performance threshold,
    # not a correctness one (both paths are bitwise-equal), and keeps every
    # large table clear of the 100MB scoped-VMEM compile wall.
    _VMEM_TABLE_BUDGET = 4 * 1024 * 1024

    _LEAF_FIELDS = ("w_off_j", "w_frac_j", "e_off_j", "e_frac_j",
                    "lane_rf_j", "c_row_j", "c_rowact_j", "c_rowlane_j",
                    "lane_lf_j", "c_lane_j")
    _AUX_FIELDS = ("state_shape", "n_actions", "NW", "NE", "NEp", "NWp",
                   "row_tile", "interpret", "row_combos", "lane_combos",
                   "row_deltas", "lane_deltas", "lane_axis_strides",
                   "lane_separable", "d_min", "d_max",
                   "w_taps", "e_taps", "c_act", "pad_top", "pad_bot",
                   "action_digits", "row_delta_group", "table_hbm",
                   "argmin_dtype", "lane_rec_meta", "carry_padded",
                   "digit_slice", "track_argmin")

    def tree_flatten(self):
        return (tuple(getattr(self, f) for f in self._LEAF_FIELDS),
                tuple(getattr(self, f) for f in self._AUX_FIELDS))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        for f, v in zip(cls._AUX_FIELDS, aux):
            setattr(obj, f, v)
        for f, v in zip(cls._LEAF_FIELDS, leaves):
            setattr(obj, f, v)
        return obj

    @property
    def sweep_args(self) -> tuple:
        """Device arrays in ``_sweep_padded`` order: the leading
        ``len(sweep_args) - n_replicated_args`` are PER-ROW (sharded
        engines pass device-local row slices of exactly these); the
        trailing ``n_replicated_args`` are per-lane/replicated."""
        return (*self.w_off_j, *self.w_frac_j, *self.e_off_j,
                *self.e_frac_j, *self.lane_rf_j, self.c_row_j,
                *self.c_rowact_j, *self.c_rowlane_j,
                *self.lane_lf_j, self.c_lane_j)

    @property
    def n_replicated_args(self) -> int:
        """Trailing :attr:`sweep_args` entries that are NOT per-row arrays
        (lane feature vectors + c_lane) — sharded engines replicate these."""
        return 1 + len(self.lane_lf_j)

    def _sweep_padded(self, v2p: jax.Array, args, nwp: int,
                      carry: bool = False):
        """One backup sweep over ``nwp`` (padded) output rows.

        ``v2p`` is the (pad_top + nwp + pad_bot, NEp) padded value window;
        ``args`` are (local slices of) :attr:`sweep_args` with ``nwp``
        rows each (``c_lane`` excepted). Returns ``(vals, argm)`` of shape
        (nwp, NEp) — callers slice/reshape.

        ``carry``: padded-carry mode — ``nwp`` counts the FULL carry rows
        (pad_top + NWp + pad_bot), args carry the same pad rows, and the
        output IS the next sweep's ``v2p`` (pad tiles emit zeros).
        """
        import functools

        T, NE = self.row_tile, self.NEp
        grid = (nwp // T,)
        hbm = self.table_hbm
        if hbm is None:
            table_bytes = 4 * int(v2p.shape[0]) * int(v2p.shape[1])
            hbm = table_bytes > self._VMEM_TABLE_BUDGET

        def tile2(a):
            return pl.BlockSpec((T, a.shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        table_spec = pl.BlockSpec(memory_space=pl.ANY) if hbm \
            else pl.BlockSpec(memory_space=pltpu.VMEM)
        n_rep = self.n_replicated_args
        in_specs = [table_spec]
        in_specs += [tile2(a) for a in args[:-n_rep]]
        # lane feats + c_lane: whole-array VMEM residents (a few KB each)
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_rep

        n_we = max(sum(len(t) for t in self.e_taps), 1) \
            if self.lane_separable else len(self.lane_deltas)
        scratch_shapes = [
            pltpu.VMEM((len(self.row_deltas), T, NE), jnp.float32),
            pltpu.VMEM((n_we, T, NE), jnp.float32),
            pltpu.VMEM((self.bc_slots, T, NE), jnp.float32),
        ]
        if hbm:
            nslots = self._win_slots()
            scratch_shapes += [
                pltpu.VMEM((nslots, T + 8, NE), jnp.float32),
                pltpu.SemaphoreType.DMA((nslots,)),
            ]

        return pl.pallas_call(
            functools.partial(self._kernel, hbm, carry),
            grid=grid,
            interpret=self.interpret,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((T, NE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, NE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nwp, NE), jnp.float32),
                jax.ShapeDtypeStruct((nwp, NE), self.argmin_dtype),
            ],
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                # Mosaic's default scoped-vmem budget is 16MB; the resident
                # table + the A/We/BC scratch stages need more on v5e
                # (128MB physical VMEM) at the 11^3x10^3 flagship size
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(v2p, *args)

    # ---------------------------------------------- padded-carry surface
    @property
    def carry_rows(self) -> int:
        """Row count of the padded-carry table (carry_padded mode)."""
        return self.pad_top + self.NWp + self.pad_bot

    def pad_carry(self, values: jax.Array) -> jax.Array:
        """State-shaped values -> the initial padded carry table."""
        v2 = values.reshape(self.NW, self.NE)
        return jnp.pad(v2, ((self.pad_top,
                             self.NWp - self.NW + self.pad_bot),
                            (0, self.NEp - self.NE)))

    def sweep_carry(self, v2p: jax.Array):
        """One sweep in padded-carry mode: ``v2p -> (v2p', argmin_padded)``.

        The returned values array IS the next sweep's carry (pad rows
        re-zeroed in-kernel) — no per-sweep pad/slice copies, the envelope
        lever past the 439M-cell single-chip wall (engine integration:
        value_iteration_finite).
        """
        if not self.carry_padded:
            raise ValueError("backup was not built with carry_padded=True")
        return self._sweep_padded(v2p, self.sweep_args, self.carry_rows,
                                  carry=True)

    def unpad_values(self, v2p: jax.Array) -> jax.Array:
        """Carry table -> FLAT (NW, NE) values. Deliberately NOT reshaped
        to the d-D state shape: a d-D array with small trailing dims pays
        ~8x TPU tile padding the moment it materializes as a jit OUTPUT —
        measured: exactly this output buffer (not the sweep loop) was the
        439M-cell round-4 envelope wall. Callers reshape on the HOST."""
        return v2p[self.pad_top:self.pad_top + self.NW, :self.NE]

    def unpad_argmin(self, argm: jax.Array) -> jax.Array:
        return argm[self.pad_top:self.pad_top + self.NW, :self.NE]

    def __call__(self, values: jax.Array) -> BackupResult:
        if self.carry_padded:
            out = self.sweep_carry(self.pad_carry(values))
            return BackupResult(
                self.unpad_values(out[0]).reshape(self.state_shape),
                self.unpad_argmin(out[1]).reshape(self.state_shape))
        # rows layout: [pad_top zeros; NW real; (NWp-NW)+pad_bot zeros]
        v2 = values.reshape(self.NW, self.NE)
        v2 = jnp.pad(v2, ((self.pad_top,
                           self.NWp - self.NW + self.pad_bot),
                          (0, self.NEp - self.NE)))
        out = self._sweep_padded(v2, self.sweep_args, self.NWp)
        vals = out[0][:self.NW, :self.NE].reshape(self.state_shape)
        args_out = out[1][:self.NW, :self.NE].reshape(self.state_shape)
        return BackupResult(vals, args_out)


def build_pallas_backup_6d(plan: InterpPlan, cost_terms, **kw) -> PallasBackup6D:
    return PallasBackup6D(plan, cost_terms, **kw)


def union_live_sets(backups) -> tuple:
    """Superset ``(w_taps, row_combos, e_taps, lane_combos)`` covering every
    given :class:`PallasBackup6D` — rebuild each with ``live_sets=`` this to
    give them all one treedef (the EP-stacking requirement; see
    ``__init__``). Per-axis taps are re-derived from the unioned combos so
    the pair stays self-consistent."""
    def combo_union(field):
        s = set()
        for b in backups:
            s |= {tuple(c) for c in getattr(b, field)}
        return tuple(sorted(s))

    row_combos = combo_union("row_combos")
    lane_combos = combo_union("lane_combos")
    nr = len(backups[0].w_taps)
    ncl = len(backups[0].e_taps)
    w_taps = tuple(tuple(sorted({c[k] for c in row_combos}))
                   for k in range(nr))
    e_taps = tuple(tuple(sorted({c[k] for c in lane_combos}))
                   for k in range(ncl))
    return (w_taps, row_combos, e_taps, lane_combos)


@jax.tree_util.register_pytree_node_class
class PermutedRowLaneBackup:
    """Row/lane kernel behind a state-axis permutation.

    Problems whose NATURAL axis order is not row/lane-separable often are
    under a permutation — pos-att channels (x, v, theta, omega) become
    separable as rows=(v, omega) (the action-coupled axes), lanes=
    (x, theta) (pos-att/Solver_pos_att.m:299-328: x' = x + h v,
    theta' = theta + h omega depend on no control). Wraps a
    :class:`PallasBackup6D` built on the permuted plan; transposes the
    value table in and the results back out (state-sized copies, trivial
    next to the backup itself).
    """

    traced_argument = True

    def __init__(self, plan: InterpPlan, cost_terms, perm, *, row_axes: int,
                 **kw):
        d = plan.ndim
        if sorted(perm) != list(range(d)):
            raise ValueError(f"perm {perm} is not a permutation of 0..{d-1}")
        self.perm = tuple(perm)
        self.inv = tuple(self.perm.index(k) for k in range(d))
        ap = self.perm + (d,)          # action axis stays last

        def t(a):
            a = jnp.asarray(a)
            if a.ndim != d + 1:
                a = a.reshape((1,) * (d + 1 - a.ndim) + a.shape)
            return jnp.transpose(a, ap)

        plan_p = InterpPlan(
            lo=tuple(t(plan.lo[k]) for k in self.perm),
            frac=tuple(t(plan.frac[k]) for k in self.perm),
            grid_shape=tuple(plan.grid_shape[k] for k in self.perm),
        )
        terms = (list(cost_terms) if isinstance(cost_terms, (tuple, list))
                 else [cost_terms])
        self.bk = PallasBackup6D(plan_p, [t(c) for c in terms],
                                 row_axes=row_axes, **kw)

    def __call__(self, values: jax.Array) -> BackupResult:
        res = self.bk(jnp.transpose(values, self.perm))
        return BackupResult(jnp.transpose(res.values, self.inv),
                            jnp.transpose(res.argmin, self.inv))

    def tree_flatten(self):
        return (self.bk,), (self.perm, self.inv)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.perm, obj.inv = aux
        obj.bk = leaves[0]
        return obj
