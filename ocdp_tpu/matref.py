"""Read MATLAB classdef (MCOS) objects saved by the reference — obj_1.mat.

The reference's regression artifact ``test/obj_1.mat`` stores a solved
``Dynamic_Solver`` *object* (``save`` of a classdef instance, MATLAB ≥R2008a
MCOS serialization). ``scipy.io.loadmat`` surfaces it only as an opaque
``__function_workspace__`` byte blob — but that blob is itself a MAT5 data
stream (element stream without the 128-byte file header), whose single
variable is a struct holding the ``FileWrapper__`` cell with every property
value of every serialized object, in classdef property-declaration order.

This module re-wraps the blob with a synthetic MAT5 header, parses it with
scipy's MAT5 reader, and maps the property cell back to names using the
classdef's declared property order (test/Dynamic_Solver.m:4-45):

    A B H R Q N S C x_min x_max u_min u_max dx du u_star J_star
    X1_mesh X2_mesh s_r ...

For obj_1.mat the interesting payloads are ``J_star``/``u_star`` — the
(35, 35, 130) per-stage value/policy stacks of the golden N=130, dx=35,
du=100 run (test/obj_1.txt) that ``compare_data`` regression-checks
(test/Dynamic_Solver.m:266-280). Stage layout (run loop, :86-102): slice
``k_s = N-k`` (1-based) is written at sweep ``k``, so slice N (index -1) is
the untouched terminal zeros and slice 1 (index 0) is the fully-iterated
table.
"""

from __future__ import annotations

import io

import numpy as np

__all__ = ["load_mcos_property_cell", "load_dynamic_solver_golden"]

_SYNTH_HEADER = (
    b"MATLAB 5.0 MAT-file, re-wrapped __function_workspace__".ljust(116)
    + b"\x00" * 8      # subsystem data offset (none)
    + b"\x00\x01"      # version
    + b"IM"            # little-endian indicator
)


def load_mcos_property_cell(path: str) -> np.ndarray:
    """Return the MCOS ``FileWrapper__`` cell array of ``path``.

    The cell's layout (MATLAB serialization, stable across releases we care
    about): element 0 is the metadata blob (class/property name tables),
    trailing elements are the property values of all serialized objects in
    declaration order, and the final element is a nested cell.
    """
    import scipy.io as sio
    from scipy.io.matlab._mio5 import MatFile5Reader

    m = sio.loadmat(path)
    if "__function_workspace__" not in m:
        raise ValueError(f"{path} holds no serialized MATLAB objects")
    blob = m["__function_workspace__"].tobytes()
    # blob[:8] = mini-header (endian tag); the MAT5 element stream starts at 8
    stream = io.BytesIO(_SYNTH_HEADER + blob[8:])
    reader = MatFile5Reader(stream)
    reader.initialize_read()
    stream.seek(128)
    hdr, _ = reader.read_var_header()
    workspace = reader.read_var_array(hdr)
    return workspace["MCOS"][0, 0][0]["arr"]


# Dynamic_Solver classdef property order (test/Dynamic_Solver.m:4-45; the
# saved object predates the s_r/u_star_idx/F/3D-mesh properties — its 2017
# revision, cf. test/Dynamic_Solver.asv:20-40 — matching its 21-element
# FileWrapper cell: [0] metadata blob, [1] empty defaults slot, [2:20] the
# 18 property values in declaration order, [20] trailing nested cell).
_DS_PROPS = (
    "A", "B", "H", "R", "Q", "N", "S", "C",
    "x_min", "x_max", "u_min", "u_max", "dx", "du",
    "u_star", "J_star", "X1_mesh", "X2_mesh",
)
_DS_HEAP_START = 2


def load_dynamic_solver_golden(path: str) -> dict:
    """Extract the golden ``Dynamic_Solver`` run from ``obj_1.mat``.

    Returns a dict with the constructor scalars (N, dx, du, ranges, A, B, Q,
    R) and the solved stacks ``J_star``/``u_star`` as float64 ``(dx, dx, N)``
    arrays in the reference's stage layout (see module docstring).
    """
    cell = load_mcos_property_cell(path)
    vals = {}
    for i, name in enumerate(_DS_PROPS):
        v = np.asarray(cell[i + _DS_HEAP_START, 0])
        if v.size == 1:
            v = v.reshape(()).item()
        vals[name] = v
    for key in ("N", "dx", "du"):
        vals[key] = int(vals[key])
    # sanity: the golden run's recorded parameterization (test/obj_1.txt)
    if vals["J_star"].shape != (vals["dx"], vals["dx"], vals["N"]):
        raise ValueError(
            f"unexpected J_star shape {vals['J_star'].shape} for "
            f"dx={vals['dx']} N={vals['N']} — property order mismatch?")
    return vals
