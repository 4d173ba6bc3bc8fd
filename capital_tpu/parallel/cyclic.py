"""Block-cyclic workspace layout: zero-copy distributed windows.

The reference reads recursion-level sub-operands through pointer-offset
views (`_restrict_`, ref: src/matrix/matrix.hpp:171-180) — possible
because its matrices are block-CYCLIC distributed (ref:
src/util/util.hpp:56-133): every rank owns an even share of EVERY aligned
window, so a window is a local offset, never a message. Under this
framework's default block sharding (P('y','x') on the global array) a
window [r0, r0+h) lives on a SUBSET of devices, so `summa` operands must
be materialized by a resharding slice — 1-3 ms per recursion level at
n=32k on a real mesh.

This module provides the cyclic layout as a first-class alternative:

  physical layout (tile tb, mesh (d1, d2)): global row-tile g_t lives on
  device row g_t % d1 at local tile g_t // d1 (and columns likewise on
  d2). The physical array is still a plain jax.Array sharded P('y','x');
  only the row/column ORDER is permuted.

  A window aligned to (tb*d1, tb*d2) is then the SAME local rectangle
  [r0/d1 : r0/d1 + h/d1) x [c0/d2 : c0/d2 + w/d2) on every device — a
  static lax.slice of the local block inside shard_map, zero collectives
  (the TPU build of `_restrict_`).

`gemm_window` runs the summa schedule directly on such windows. The
K-ordering of the two chunk-gathers is the device-interleaved cyclic
order on both sides — identical interleavings on square slices
(d1 == d2), so the contraction is exact; the output inherits the cyclic
layout of its row/column windows, closing the loop for in-workspace
recursion updates (`update_window`).

Index maps for structure masks (triangular clipping in global
coordinates on a physically permuted array) come from `global_rows` /
`global_cols`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from capital_tpu.grid import Grid
from capital_tpu.ops.precision import dot as _pdot

TB = 128  # tile side; 128 = MXU/lane native


def _perm(n: int, d: int, tb: int = TB) -> np.ndarray:
    """Physical index -> global index map for one dimension (length n):
    physical position (dev * (n/d) + local) holds global element
    ((local//tb)*d + dev)*tb + local%tb."""
    if d <= 1:
        return np.arange(n)
    nb = n // d
    dev = np.arange(n) // nb
    loc = np.arange(n) % nb
    return (loc // tb * d + dev) * tb + loc % tb


def _check(grid: Grid, shape, tb: int):
    m, n = shape
    if m % (tb * grid.d1) or n % (tb * grid.d2):
        raise ValueError(
            f"cyclic layout needs {tb}*d | (m, n): shape={shape} "
            f"d1={grid.d1} d2={grid.d2} tb={tb}")


def to_cyclic(grid: Grid, a, tb: int = TB):
    """Standard (global-order) array -> cyclic physical layout, sharded
    P('y','x') (the device-side build of ref: util::block_to_cyclic_rect,
    util.hpp:56-133; paid once per workspace, not once per window)."""
    _check(grid, a.shape, tb)
    pr = jnp.asarray(_perm(a.shape[0], grid.d1, tb))
    pc = jnp.asarray(_perm(a.shape[1], grid.d2, tb))
    out = jnp.take(jnp.take(a, pr, axis=0), pc, axis=1)
    return grid.constrain(out, grid.slice_spec)


def from_cyclic(grid: Grid, phys, tb: int = TB):
    """Inverse transform (ref: util::cyclic_to_block_rect,
    util.hpp:166-230)."""
    _check(grid, phys.shape, tb)
    pr = np.argsort(_perm(phys.shape[0], grid.d1, tb))
    pc = np.argsort(_perm(phys.shape[1], grid.d2, tb))
    out = jnp.take(jnp.take(phys, jnp.asarray(pr), axis=0),
                   jnp.asarray(pc), axis=1)
    return grid.constrain(out, grid.slice_spec)


def global_rows(grid: Grid, m: int, tb: int = TB) -> np.ndarray:
    """global_rows(grid, m)[p] = global row held at physical row p (for
    structure masks in global coordinates on the permuted array)."""
    return _perm(m, grid.d1, tb)


def global_cols(grid: Grid, n: int, tb: int = TB) -> np.ndarray:
    return _perm(n, grid.d2, tb)


def _win_check(grid: Grid, shape, window, tb: int, axis_div):
    r0, c0, h, w = window
    dr, dc = axis_div
    for off, ext, d, name in ((r0, h, dr, "rows"), (c0, w, dc, "cols")):
        if off % (tb * d) or ext % (tb * d):
            raise ValueError(
                f"cyclic window {name} must align to tb*d={tb * d}: "
                f"window={window}")
    if r0 + h > shape[0] or c0 + w > shape[1]:
        raise ValueError(f"window {window} exceeds shape {shape}")


def _local_slice(blk, window, d1: int, d2: int):
    """The zero-copy local view: global window offsets divided by the
    mesh (the `_restrict_` pointer offset, ref: matrix.hpp:171-180)."""
    r0, c0, h, w = window
    return lax.slice(blk, (r0 // d1, c0 // d2),
                     (r0 // d1 + h // d1, c0 // d2 + w // d2))


def gemm_window(grid: Grid, a, b, *, a_window=None, b_window=None,
                num_chunks: int = 1, tb: int = TB):
    """C = A[a_window] @ B[b_window] on cyclic-layout operands; the result
    is cyclic over (a_window rows, b_window cols).

    The windows are sliced PER DEVICE inside the shard_map kernel —
    static local slices, no resharding collective — then the standard
    2.5D summa schedule runs (z K-slice, chunked row/col gathers, depth
    psum). Gathered K panels interleave tiles by device; identical
    interleavings on both sides need d1 == d2 (square slice)."""
    if not grid.is_square:
        raise ValueError("cyclic gemm_window needs a square (d x d) slice")
    if a_window is None:
        a_window = (0, 0, *a.shape)
    if b_window is None:
        b_window = (0, 0, *b.shape)
    _win_check(grid, a.shape, a_window, tb, (grid.d1, grid.d2))
    _win_check(grid, b.shape, b_window, tb, (grid.d1, grid.d2))
    if a_window[3] != b_window[2]:
        raise ValueError(f"K mismatch: {a_window} @ {b_window}")
    d1, d2 = grid.d1, grid.d2
    ax_z, ax_y, ax_x = grid.ax_z, grid.ax_y, grid.ax_x

    def kern(a_blk, b_blk):
        a_sub = _local_slice(a_blk, a_window, d1, d2)
        b_sub = _local_slice(b_blk, b_window, d1, d2)
        if ax_z is not None:
            z = lax.axis_index(ax_z)
            cdepth = lax.axis_size(ax_z)
            kc_a = a_sub.shape[1] // cdepth
            kc_b = b_sub.shape[0] // cdepth
            a_sub = lax.dynamic_slice_in_dim(a_sub, z * kc_a, kc_a, 1)
            b_sub = lax.dynamic_slice_in_dim(b_sub, z * kc_b, kc_b, 0)
        chunks = num_chunks
        while a_sub.shape[1] % chunks or b_sub.shape[0] % chunks:
            chunks -= 1
        ka = a_sub.shape[1] // chunks
        kb = b_sub.shape[0] // chunks
        part = None
        for i in range(chunks):
            a_c = lax.slice_in_dim(a_sub, i * ka, (i + 1) * ka, axis=1)
            b_c = lax.slice_in_dim(b_sub, i * kb, (i + 1) * kb, axis=0)
            a_k = lax.all_gather(a_c, ax_x, axis=1, tiled=True)
            b_k = lax.all_gather(b_c, ax_y, axis=0, tiled=True)
            p = _pdot(a_k, b_k)
            part = p if part is None else part + p
        if ax_z is not None:
            part = lax.psum(part, ax_z)
        return part.astype(a_blk.dtype)

    f = jax.shard_map(kern, mesh=grid.mesh,
                      in_specs=(grid.slice_spec, grid.slice_spec),
                      out_specs=grid.slice_spec)
    return f(a, b)


def read_window(grid: Grid, phys, window, tb: int = TB):
    """Materialize a cyclic window as its own cyclic-layout array (local
    slices only — per-device, no collective)."""
    _win_check(grid, phys.shape, window, tb, (grid.d1, grid.d2))
    d1, d2 = grid.d1, grid.d2

    f = jax.shard_map(lambda blk: _local_slice(blk, window, d1, d2),
                      mesh=grid.mesh, in_specs=grid.slice_spec,
                      out_specs=grid.slice_spec)
    return f(phys)


def update_window(grid: Grid, phys, val, window, tb: int = TB):
    """Write a cyclic-layout value into a window of the cyclic workspace
    (per-device local dynamic_update_slice — the in-place half of
    `_derestrict_`, ref: matrix.hpp:176-180)."""
    _win_check(grid, phys.shape, window, tb, (grid.d1, grid.d2))
    r0, c0, h, w = window
    d1, d2 = grid.d1, grid.d2

    def kern(blk, v):
        return lax.dynamic_update_slice(blk, v, (r0 // d1, c0 // d2))

    f = jax.shard_map(kern, mesh=grid.mesh,
                      in_specs=(grid.slice_spec, grid.slice_spec),
                      out_specs=grid.slice_spec)
    return f(phys, val)


def _kern_global_index(ax, d: int, tb: int, length: int):
    """In-kernel (1, length) global-index row for a local cyclic extent:
    local position l on device with axis index i holds global index
    (l//tb * d + i) * tb + l%tb. Used for structure masks in GLOBAL
    coordinates on physically permuted windows."""
    l = lax.broadcasted_iota(jnp.int32, (1, length), 1)
    i = lax.axis_index(ax) if ax is not None and d > 1 else 0
    return (l // tb * d + i) * tb + l % tb


def read_window_tri(grid: Grid, phys, window, uplo: str = "U",
                    tb: int = TB):
    """Materialize a cyclic window with its OPPOSITE triangle zeroed —
    triangular clipping in window-global coordinates on the permuted
    layout (the serialize-with-structure step, ref: serialize.hpp:12-150,
    as one local masked slice per device)."""
    _win_check(grid, phys.shape, window, tb, (grid.d1, grid.d2))
    r0, c0, h, w = window
    d1, d2 = grid.d1, grid.d2
    ax_y, ax_x = grid.ax_y, grid.ax_x

    def kern(blk):
        sub = _local_slice(blk, window, d1, d2)
        rows = _kern_global_index(ax_y, d1, tb, sub.shape[0])  # (1, h/d1)
        cols = _kern_global_index(ax_x, d2, tb, sub.shape[1])  # (1, w/d2)
        if uplo == "U":
            keep = rows.T <= cols
        else:
            keep = rows.T >= cols
        return jnp.where(keep, sub, jnp.zeros((), sub.dtype))

    f = jax.shard_map(kern, mesh=grid.mesh, in_specs=grid.slice_spec,
                      out_specs=grid.slice_spec)
    return f(phys)


def trmm_window(grid: Grid, a, b, *, side: str = "L", uplo: str = "U",
                trans_a: bool = False, alpha: float = 1.0,
                a_window=None, b_window=None, num_chunks: int = 1,
                tb: int = TB):
    """Distributed triangular multiply on cyclic-layout windows (the
    summa.trmm schedule with the serialize step replaced by local masked
    window reads). The triangular operand window is read+masked locally
    (read_window_tri), transposed via the standard pairwise block
    exchange when trans_a (summa.transpose works unchanged on cyclic
    layouts — the (y,x)<->(x,y) partner owns the transposed cyclic
    block), then contracted with the other operand's ZERO-COPY in-kernel
    window by gemm_window."""
    from capital_tpu.parallel import summa as _summa

    if a_window is None:
        a_window = (0, 0, *a.shape)
    t = read_window_tri(grid, a, a_window, uplo=uplo, tb=tb)
    if trans_a:
        t = _summa.transpose(grid, t)
    if side == "L":
        out = gemm_window(grid, t, b, b_window=b_window,
                          num_chunks=num_chunks, tb=tb)
    else:
        out = gemm_window(grid, b, t, a_window=b_window,
                          num_chunks=num_chunks, tb=tb)
    if alpha != 1.0:
        out = alpha * out
    return out


def syrk_window(grid: Grid, a, *, c=None, alpha: float = 1.0,
                beta: float = 0.0, a_window=None, num_chunks: int = 1,
                tb: int = TB):
    """C = alpha * A[win]^T A[win] + beta * C on cyclic layouts (the
    summa.syrk grid-transpose schedule, window edition)."""
    from capital_tpu.parallel import summa as _summa

    if a_window is None:
        a_window = (0, 0, *a.shape)
    aw = read_window(grid, a, a_window, tb=tb)
    at = _summa.transpose(grid, aw)
    out = gemm_window(grid, at, aw, num_chunks=num_chunks, tb=tb)
    if alpha != 1.0:
        out = alpha * out
    if c is not None and beta != 0.0:
        out = out + beta * c
    return out
