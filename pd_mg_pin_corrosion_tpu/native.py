"""ctypes bindings for the native runtime library (native/pdcorr_native.cpp).

Builds the shared library on first use (g++ via the Makefile) and caches it;
every entry point has a NumPy fallback so the framework runs without a
toolchain. Covers the host-side runtime hot paths that are native C++ in the
reference: VTK ASCII serialization, the AMR cell-list neighbor build
(grid.cpp:660-808), and Voronoi grain assignment (grains.cpp:56-70).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "native")


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    nd = _native_dir()
    so = os.path.join(nd, "libpdcorr_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", nd], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain / build failure -> fallback
            print(f"[native] build skipped ({type(e).__name__}); "
                  "using NumPy fallbacks", file=sys.stderr)
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        print(f"[native] load failed ({e}); using NumPy fallbacks",
              file=sys.stderr)
        return None

    lib.fmt_doubles.restype = ctypes.c_int64
    lib.fmt_doubles.argtypes = [ctypes.POINTER(ctypes.c_double),
                                ctypes.c_int64, ctypes.c_char_p]
    lib.fmt_vec3.restype = ctypes.c_int64
    lib.fmt_vec3.argtypes = [ctypes.POINTER(ctypes.c_double),
                             ctypes.c_int64, ctypes.c_char_p]
    lib.fmt_ints.restype = ctypes.c_int64
    lib.fmt_ints.argtypes = [ctypes.POINTER(ctypes.c_int64),
                             ctypes.c_int64, ctypes.c_char_p]
    lib.cell_list_neighbors_2d.restype = ctypes.c_int64
    lib.voronoi_assign.restype = None
    _LIB = lib
    return _LIB


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


# ---------------------------------------------------------------------------
# ASCII serialization
# ---------------------------------------------------------------------------

def fmt_scalar_block(vals: np.ndarray) -> str:
    """One '%.9g' value per 10-space-indented line."""
    vals = np.ascontiguousarray(vals, np.float64)
    lib = get_lib()
    if lib is None:
        return "\n".join("          " + ("%.9g" % v) for v in vals) + "\n"
    buf = ctypes.create_string_buffer(32 * len(vals) + 1)
    n = lib.fmt_doubles(_dptr(vals), len(vals), buf)
    return buf.raw[:n].decode()


def fmt_vec3_block(vals: np.ndarray) -> str:
    vals = np.ascontiguousarray(vals, np.float64)
    assert vals.shape[1] == 3
    lib = get_lib()
    if lib is None:
        return "\n".join(
            "          " + " ".join("%.9g" % v for v in row) for row in vals
        ) + "\n"
    buf = ctypes.create_string_buffer(96 * len(vals) + 1)
    n = lib.fmt_vec3(_dptr(vals), len(vals), buf)
    return buf.raw[:n].decode()


def fmt_int_block(vals: np.ndarray) -> str:
    vals = np.ascontiguousarray(vals, np.int64)
    lib = get_lib()
    if lib is None:
        return "\n".join("          %d" % v for v in vals) + "\n"
    buf = ctypes.create_string_buffer(32 * len(vals) + 1)
    n = lib.fmt_ints(vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                     len(vals), buf)
    return buf.raw[:n].decode()


# ---------------------------------------------------------------------------
# AMR cell-list neighbor search
# ---------------------------------------------------------------------------

def cell_list_neighbors_2d(pos, node_type, dx_local, delta_local, grid_level):
    """Padded neighbor arrays for an unstructured 2D grid, or None if the
    native library is unavailable (caller falls back to the Python builder)."""
    lib = get_lib()
    if lib is None:
        return None

    N = len(node_type)
    pos = np.ascontiguousarray(pos, np.float64)
    node_type = np.ascontiguousarray(node_type, np.uint8)
    dx_local = np.ascontiguousarray(dx_local, np.float64)
    delta_local = np.ascontiguousarray(delta_local, np.float64)
    grid_level = np.ascontiguousarray(grid_level, np.int32)

    counts = np.zeros(N, np.int32)
    null_i = np.zeros(1, np.int32)
    null_d = np.zeros(1, np.float64)

    def call(mode, K, nbr_idx, nbr_dist, nbr_evec, nbr_vol):
        return lib.cell_list_neighbors_2d(
            _dptr(pos),
            node_type.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _dptr(dx_local), _dptr(delta_local),
            grid_level.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(N), ctypes.c_int32(mode), ctypes.c_int32(K),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nbr_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _dptr(nbr_dist), _dptr(nbr_evec), _dptr(nbr_vol))

    kmax = int(call(0, 0, null_i, null_d, null_d, null_d))
    K = max(8, ((kmax + 7) // 8) * 8)

    nbr_idx = np.tile(np.arange(N, dtype=np.int32)[:, None], (1, K))
    nbr_dist = np.ones((N, K))
    nbr_evec = np.zeros((N, K, 2))
    nbr_vol = np.zeros((N, K))
    call(1, K, nbr_idx, nbr_dist, nbr_evec, nbr_vol)
    return nbr_idx, nbr_dist, nbr_evec, nbr_vol


# ---------------------------------------------------------------------------
# Voronoi
# ---------------------------------------------------------------------------

def voronoi_assign(pos: np.ndarray, seeds: np.ndarray):
    """Nearest-seed index per point, or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float64)
    seeds = np.ascontiguousarray(seeds, np.float64)
    out = np.zeros(len(pos), np.int32)
    lib.voronoi_assign(_dptr(pos), ctypes.c_int64(len(pos)),
                       ctypes.c_int(pos.shape[1]), _dptr(seeds),
                       ctypes.c_int64(len(seeds)),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
