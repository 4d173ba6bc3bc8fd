"""ctypes bindings for the native host-side layout engine (csrc/layout.cpp).

Native counterpart of the reference's redistribution + packed-storage
utilities (ref: src/util/util.hpp:56-230, src/matrix/structure.h:34-59).
Auto-builds with make on first use if a toolchain is present; every entry
point has a numpy fallback so the framework works without the .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "_native", "liblayout.so")
_SRC = os.path.join(os.path.dirname(_DIR), "csrc")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_LIB):
        try:
            subprocess.run(["make", "-C", _SRC], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i64 = ctypes.c_int64
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    for name, argtypes in [
        ("block_to_cyclic_f32", [fp, fp, i64, i64, i64, i64, i64]),
        ("cyclic_to_block_f32", [fp, fp, i64, i64, i64, i64, i64]),
        ("pack_upper_f32", [fp, fp, i64]),
        ("unpack_upper_f32", [fp, fp, i64]),
        ("pack_lower_f32", [fp, fp, i64]),
        ("unpack_lower_f32", [fp, fp, i64]),
        ("transpose_f32", [fp, fp, i64, i64]),
    ]:
        getattr(lib, name).argtypes = argtypes
        getattr(lib, name).restype = None
    return lib


def available() -> bool:
    return _lib() is not None


def _f32c(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x), dtype=np.float32)


# -- block-cyclic redistribution (ScaLAPACK-interchange layout) -------------

def _cyclic_params(m, n, pr, pc, bb):
    lm = -(-m // (pr * bb)) * bb
    ln = -(-n // (pc * bb)) * bb
    return lm, ln


def block_to_cyclic(a, pr: int, pc: int, bb: int = 1) -> np.ndarray:
    """(m, n) global -> (pr*pc, lm, ln) per-process block-cyclic panels
    (ref: block_to_cyclic_rect, util.hpp:101-133; bb=1 is the reference's
    pure-cyclic layout)."""
    a = _f32c(a)
    m, n = a.shape
    lm, ln = _cyclic_params(m, n, pr, pc, bb)
    out = np.zeros((pr * pc, lm, ln), np.float32)
    lib = _lib()
    if lib is not None:
        lib.block_to_cyclic_f32(a, out.reshape(-1), m, n, pr, pc, bb)
        return out
    # numpy fallback
    for r in range(m):
        pi, lr = (r // bb) % pr, (r // (pr * bb)) * bb + r % bb
        for c in range(n):
            pj, lc = (c // bb) % pc, (c // (pc * bb)) * bb + c % bb
            out[pi * pc + pj, lr, lc] = a[r, c]
    return out


def cyclic_to_block(panels, m: int, n: int, pr: int, pc: int,
                    bb: int = 1) -> np.ndarray:
    """Inverse of block_to_cyclic (ref: cyclic_to_block_*, util.hpp:166-230)."""
    panels = _f32c(panels)
    out = np.zeros((m, n), np.float32)
    lib = _lib()
    if lib is not None:
        lib.cyclic_to_block_f32(panels.reshape(-1), out, m, n, pr, pc, bb)
        return out
    for r in range(m):
        pi, lr = (r // bb) % pr, (r // (pr * bb)) * bb + r % bb
        for c in range(n):
            pj, lc = (c // bb) % pc, (c // (pc * bb)) * bb + c % bb
            out[r, c] = panels[pi * pc + pj, lr, lc]
    return out


# -- packed triangular storage (checkpoint export at half the bytes) --------

def pack_triangle(a, upper: bool = True) -> np.ndarray:
    """Dense (n, n) -> packed 1-D triangle, n(n+1)/2 floats, using the
    reference's packed offsets (ref: structure.h:39 upper x(x+1)/2+y;
    structure.h:59 lower)."""
    a = _f32c(a)
    n = a.shape[0]
    out = np.empty(n * (n + 1) // 2, np.float32)
    lib = _lib()
    if lib is not None:
        (lib.pack_upper_f32 if upper else lib.pack_lower_f32)(a, out, n)
        return out
    iu = np.triu_indices(n) if upper else np.tril_indices(n)
    order = np.lexsort((iu[0], iu[1]))  # column-major packed: (col, row)
    return a[iu][order].astype(np.float32)


def unpack_triangle(packed, n: int, upper: bool = True) -> np.ndarray:
    packed = _f32c(packed)
    out = np.zeros((n, n), np.float32)
    lib = _lib()
    if lib is not None:
        (lib.unpack_upper_f32 if upper else lib.unpack_lower_f32)(packed, out, n)
        return out
    iu = np.triu_indices(n) if upper else np.tril_indices(n)
    order = np.lexsort((iu[0], iu[1]))  # column-major packed order
    out[iu[0][order], iu[1][order]] = packed
    return out


def transpose(a) -> np.ndarray:
    """Blocked native transpose (host leg of the export path)."""
    a = _f32c(a)
    m, n = a.shape
    lib = _lib()
    if lib is None:
        return np.ascontiguousarray(a.T)
    out = np.empty((n, m), np.float32)
    lib.transpose_f32(a, out, m, n)
    return out
