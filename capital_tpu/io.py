"""Checkpoint / interchange IO for distributed factors.

The reference has NO checkpointing (SURVEY §5.4): matrices regenerate from
seeds (ref: structure.hpp:80-85) and that reproducibility mechanism is kept
here (matrix.py generators are key-deterministic). This module adds what the
reference lacks:

  * save/load of triangular factors in PACKED form — n(n+1)/2 floats, half
    the bytes of dense — using the native layout engine (native.py /
    csrc/layout.cpp), with the reference's packed offset convention
    (ref: src/matrix/structure.h:39,59) so files are interchangeable with
    packed-storage consumers.
  * block-cyclic export for ScaLAPACK-style interchange
    (ref: util.hpp:56-133 layout).
  * .npz container with shape/uplo/dtype metadata.
"""

from __future__ import annotations

import numpy as np

from capital_tpu import native


def save_factor(path: str, r, *, upper: bool = True, meta: dict | None = None):
    """Save a triangular factor packed (half the dense bytes)."""
    arr = np.asarray(r, dtype=np.float32)
    n = arr.shape[0]
    packed = native.pack_triangle(arr, upper=upper)
    np.savez_compressed(
        path, packed=packed, n=n, upper=upper, **(meta or {})
    )


def load_factor(path: str) -> tuple[np.ndarray, dict]:
    """Load a packed factor back to dense; returns (array, metadata)."""
    with np.load(path) as z:
        n = int(z["n"])
        upper = bool(z["upper"])
        dense = native.unpack_triangle(z["packed"], n, upper=upper)
        meta = {k: z[k] for k in z.files if k not in ("packed", "n", "upper")}
    return dense, meta


def export_block_cyclic(a, pr: int, pc: int, bb: int = 32) -> np.ndarray:
    """(m, n) -> (pr*pc, lm, ln) block-cyclic panels (ScaLAPACK layout;
    ref: block_to_cyclic_rect, util.hpp:101-133)."""
    return native.block_to_cyclic(np.asarray(a, np.float32), pr, pc, bb)


def import_block_cyclic(panels, m: int, n: int, pr: int, pc: int,
                        bb: int = 32) -> np.ndarray:
    return native.cyclic_to_block(panels, m, n, pr, pc, bb)
