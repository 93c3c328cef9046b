"""ctypes bindings to the native C++ setup/IO library (csrc/fem_setup.cpp).

The reference's host layer is C++ (deal.II DoF tables, DataOut); here the
O(n_dofs) host-side table construction and VTK output have native
implementations, auto-built with ``make -C csrc`` on first use and falling
back to numpy transparently when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["get_lib", "element_dof_map", "boundary_mask", "write_vtr", "available"]

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "build" / "libfemsetup.so"
_lib = None
_tried = False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # always invoke make: its mtime check is cheap and guarantees the
        # loaded binary matches fem_setup.cpp (a stale committed/copied .so
        # would load fine via CDLL and only fail at call time)
        subprocess.run(
            ["make", "-C", str(_CSRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.element_dof_map.argtypes = [ctypes.c_int64] * 4 + [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        ]
        lib.boundary_mask.argtypes = [ctypes.c_int64] * 3 + [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        ]
        lib.dof_multiplicity.argtypes = [ctypes.c_int64] * 4 + [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        ]
        lib.write_vtr.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_char_p,
        ]
        lib.write_vtr.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def element_dof_map(mx: int, my: int, mz: int, p: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((mx * my * mz, (p + 1) ** 3), dtype=np.int32)
    lib.element_dof_map(mx, my, mz, p, out)
    return out


def boundary_mask(nx: int, ny: int, nz: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(nx * ny * nz, dtype=np.uint8)
    lib.boundary_mask(nx, ny, nz, out)
    return out.astype(bool)


def write_vtr(path, xs, ys, zs, values, field_name="solution") -> bool:
    """Write a VTK rectilinear-grid file; returns False if native lib is
    unavailable (caller should use the Python fallback in utils/vtk.py)."""
    lib = get_lib()
    if lib is None:
        return False
    xs = np.ascontiguousarray(xs, dtype=np.float64)
    ys = np.ascontiguousarray(ys, dtype=np.float64)
    zs = np.ascontiguousarray(zs, dtype=np.float64)
    values = np.ascontiguousarray(values, dtype=np.float64)
    rc = lib.write_vtr(
        str(path).encode(),
        xs.size,
        ys.size,
        zs.size,
        xs,
        ys,
        zs,
        values,
        str(field_name).encode(),
    )
    return rc == 0
