"""Cyclic-workspace cholinv: the distributed recursion with ZERO
resharding slices between levels.

The block-sharded `cholinv.factor` materializes each level's distributed
sub-operands with a `lax.slice` + sharding constraint — a resharding
copy (1-3 ms each at n=32k) on real meshes, because a window of a
block-sharded array lives on a device SUBSET. This variant keeps the
workspace in the block-CYCLIC physical layout (parallel/cyclic.py),
under which every recursion window is the same static local rectangle
on every device — the reference's `_restrict_` pointer-view economics
(ref: src/matrix/matrix.hpp:171-180) recovered on TPU:

  * operand windows feed the summa gathers with in-kernel local slices
    (cyclic.gemm_window / trmm_window / syrk_window — no resharding
    collectives, no full-window HBM copies);
  * write-backs are per-device local dynamic_update_slices
    (cyclic.update_window — the `_derestrict_` half);
  * triangular structure is clipped in GLOBAL coordinates on the
    permuted layout via in-kernel index maps (cyclic.read_window_tri);
  * the base case gathers its (bc, bc) cyclic window, unpermutes the
    replicated copy locally (no extra comm — the data is already
    replicated), and runs the standard `_base_case` placement policies.

The layout transform is paid ONCE at entry/exit (to_cyclic/from_cyclic —
ref: util::block_to_cyclic, util.hpp:56-133); everything between is
window arithmetic. Same schedule, knobs and numerics as cholinv._rec
(equivalence-tested on the virtual mesh); requires a square slice and
bc % d == 0 (tile tb = bc/d keeps every recursion offset aligned).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid
from capital_tpu.matrix import DistMatrix
from capital_tpu.algs import cholinv as _ci
from capital_tpu.parallel import cyclic


def _base_case(grid: Grid, w, ri, off: int, n: int, cfg, tb: int):
    with tracing.phase("CI::factor_diag"):
        blk_cyc = cyclic.read_window(grid, w, (off, off, n, n), tb=tb)
        # unpermute the replicated copy to global order (local take on
        # replicated data — zero collectives beyond the gather the
        # block-sharded base case also pays)
        pr = jnp.asarray(np.argsort(cyclic._perm(n, grid.d1, tb)))
        pc = jnp.asarray(np.argsort(cyclic._perm(n, grid.d2, tb)))
        rep = grid.constrain(blk_cyc, P(None, None))
        blk = jnp.take(jnp.take(rep, pr, axis=0), pc, axis=1)
        rb, rib = _ci._base_case(grid, blk, cfg)
        rb = cyclic.to_cyclic(grid, rb, tb=tb)
        rib = cyclic.to_cyclic(grid, rib, tb=tb)
        w = cyclic.update_window(grid, w, rb, (off, off, n, n), tb=tb)
        ri = cyclic.update_window(grid, ri, rib, (off, off, n, n), tb=tb)
    return w, ri


def _rec(grid: Grid, carry, off: int, n: int, bc: int, cfg, top: bool,
         tb: int):
    w, ri = carry
    if n <= bc:
        return _base_case(grid, w, ri, off, n, cfg, tb)

    n1 = max(bc, n >> cfg.split)
    n2 = n - n1
    mid = off + n1
    nc = cfg.summa_chunks

    w, ri = _rec(grid, (w, ri), off, n1, bc, cfg, False, tb)

    # TRSM step: R12 = R11^{-T} A12 (ref: cholinv.hpp:116-123)
    with tracing.phase("CI::trsm"):
        r12 = cyclic.trmm_window(grid, ri, w, side="L", uplo="U",
                                 trans_a=True,
                                 a_window=(off, off, n1, n1),
                                 b_window=(off, mid, n1, n2),
                                 num_chunks=nc, tb=tb)
    w = cyclic.update_window(grid, w, r12, (off, mid, n1, n2), tb=tb)

    # Schur update: A22 <- A22 - R12^T R12 (ref: cholinv.hpp:131-134)
    with tracing.phase("CI::tmu"):
        a22 = cyclic.read_window(grid, w, (mid, mid, n2, n2), tb=tb)
        s = cyclic.syrk_window(grid, w, c=a22, alpha=-1.0, beta=1.0,
                               a_window=(off, mid, n1, n2),
                               num_chunks=nc, tb=tb)
    w = cyclic.update_window(grid, w, s, (mid, mid, n2, n2), tb=tb)

    w, ri = _rec(grid, (w, ri), mid, n2, bc, cfg, False, tb)

    if cfg.complete_inv or not top:
        # R12inv = -R11inv R12 R22inv (ref: cholinv.hpp:147-156)
        with tracing.phase("CI::inv"):
            t = cyclic.trmm_window(grid, ri, w, side="R", uplo="U",
                                   a_window=(mid, mid, n2, n2),
                                   b_window=(off, mid, n1, n2),
                                   num_chunks=nc, tb=tb)
            r12inv = cyclic.trmm_window(grid, ri, t, side="L", uplo="U",
                                        alpha=-1.0,
                                        a_window=(off, off, n1, n1),
                                        num_chunks=nc, tb=tb)
        ri = cyclic.update_window(grid, ri, r12inv, (off, mid, n1, n2),
                                  tb=tb)
    return w, ri


def factor(grid: Grid, a, cfg: "_ci.Config" = None, tb: int | None = None):
    """(R, Rinv) like cholinv.factor, via the cyclic workspace. Returns
    standard-layout arrays (the transform runs once each way)."""
    cfg = cfg or _ci.Config()
    if isinstance(a, DistMatrix):
        a = a.data
    n = a.shape[0]
    bc = cfg.base_dim(grid, n)
    if not grid.is_square:
        raise ValueError("cholinv_cyclic needs a square (d x d) slice")
    if tb is None:
        if bc % grid.d1:
            raise ValueError(f"need d | bc for tile alignment: "
                             f"bc={bc} d={grid.d1}")
        tb = bc // grid.d1
    w = cyclic.to_cyclic(grid, a, tb=tb)
    ri = grid.constrain(jnp.zeros_like(a), grid.slice_spec)  # zeros: layout-free
    w, ri = _rec(grid, (w, ri), 0, n, bc, cfg, True, tb)
    r = jnp.triu(cyclic.from_cyclic(grid, w, tb=tb))
    rinv = cyclic.from_cyclic(grid, ri, tb=tb)
    return (grid.constrain(r, grid.slice_spec),
            grid.constrain(rinv, grid.slice_spec))
