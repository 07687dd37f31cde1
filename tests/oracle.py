"""Independent numpy oracle for multilinear interpolation + Bellman backups.

Deliberately written loop/brute-force style (no shared code with ocdp_tpu) so
the tests cross-check two independent implementations of the MATLAB
``griddedInterpolant`` 'linear'/'linear-extrapolation' semantics and the
first-min tie-break of ``min(..., [], dim)``.
"""

import itertools

import numpy as np


def interp_point(values, axes, point):
    """Multilinear interpolation of ``values`` at one point, with linear
    extrapolation outside the grid (edge-cell slope), float64."""
    d = len(axes)
    los, fracs = [], []
    for k in range(d):
        g = np.asarray(axes[k], dtype=np.float64)
        x = float(point[k])
        i = int(np.searchsorted(g, x, side="right")) - 1
        i = min(max(i, 0), len(g) - 2)
        frac = (x - g[i]) / (g[i + 1] - g[i])
        los.append(i)
        fracs.append(frac)
    out = 0.0
    for corner in itertools.product((0, 1), repeat=d):
        w = 1.0
        idx = []
        for k in range(d):
            w *= fracs[k] if corner[k] else (1.0 - fracs[k])
            idx.append(los[k] + corner[k])
        out += w * float(values[tuple(idx)])
    return out


def interp_many(values, axes, points):
    """points: (n, d) array -> (n,) interpolated values."""
    return np.array([interp_point(values, axes, p) for p in np.asarray(points)])


def bellman_backup(values, axes, next_states, stage_cost):
    """Brute-force backup.

    next_states: (*state_shape, n_actions, d) query coordinates.
    stage_cost:  (*state_shape, n_actions).
    Returns (new_values, argmin) with first-min tie-break.
    """
    state_shape = stage_cost.shape[:-1]
    n_actions = stage_cost.shape[-1]
    new_v = np.zeros(state_shape, dtype=np.float64)
    arg = np.zeros(state_shape, dtype=np.int64)
    for s in itertools.product(*(range(n) for n in state_shape)):
        best = np.inf
        best_a = 0
        for a in range(n_actions):
            q = interp_point(values, axes, next_states[s + (a,)])
            tot = q + float(stage_cost[s + (a,)])
            if tot < best:  # strict: first minimum wins ties
                best = tot
                best_a = a
        new_v[s] = best
        arg[s] = best_a
    return new_v, arg
