"""Triangle-aware TRMM kernels: multiply by an upper-triangular factor
computing only the nonzero tile pairs (~half the MXU flops of a masked dot).

The reference's local trmm delegates to MKL cblas_dtrmm, which skips the
zero triangle (ref: src/blas/interface.hpp:54-75); XLA has no trmm, so
`jnp.dot(triu(U), B)` pays the full gemm flops. These kernels restore the
2x saving with the same lookup-table pattern as ops/pallas_syrk.py: the
sequential grid dimension enumerates only the (i, k) tile pairs inside the
triangle via scalar-prefetched index tables, accumulating each output tile
in f32 VMEM scratch across its run of k steps.

Covered cases (U always the upper-triangular operand, mask applied to the
diagonal tiles in VMEM):

  side='L'             C = triu(U) @ B        pairs k >= i
  side='L', trans_a    C = triu(U)^T @ B      pairs k <= i  (the cholinv
                                              TRSM step's R11inv^T A12 —
                                              no transpose materialized,
                                              the contraction runs on
                                              dimension 0 of the stored U)
  side='R'             C = B @ triu(U)        pairs k <= j  (Q = A Rinv —
                                              the CholeskyQR formQ flop
                                              sink, m >> n)
  side='R', trans_a    C = B @ triu(U)^T      pairs k >= j  (the QDWH
                                              Halley step's X Rinv Rinv^T
                                              second multiply — the U tile
                                              is transposed in VMEM, one
                                              512^2 shuffle per pair step)

Lower-triangular callers use the masked-dot fallback (no algorithm in this
framework multiplies by a lower factor on a hot path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sides, tuned on v5e (tile sweep 2026-08-17: 512/512 beats 256/256 by
# ~12% on the m>>n side='R' shape and ~11% on the trans side='L' shape;
# 128-wide tiles lose ~20%). Shapes not divisible by a tile fall back to
# the masked dot, so small operands are unaffected by the larger default.
_T = 512   # triangular-operand tile (output tile side for the L cases)
_MC = 512  # row chunk of the rectangular operand (side='R' output rows)


def _mask_diag_triu(u_tile, is_diag):
    """Zero the strictly-lower entries of a diagonal tile (triangular
    clipping inside the tile; off-diagonal tiles pass through)."""
    t = u_tile.shape[0]
    row = lax.broadcasted_iota(jnp.int32, (t, u_tile.shape[1]), 0)
    col = lax.broadcasted_iota(jnp.int32, (t, u_tile.shape[1]), 1)
    keep = jnp.logical_or(jnp.logical_not(is_diag), row <= col)
    return jnp.where(keep, u_tile, jnp.zeros_like(u_tile))


def _tile_dot(a, b, contract_dim0: bool, prec_=lax.Precision.HIGHEST):
    """f32-accumulated MXU product; contract_dim0 contracts dimension 0 of
    `a` against dimension 0 of `b` (the transposed-operand case). prec_
    sets the f32 MXU pass count — 6 (HIGHEST), 3 (HIGH, software-lowered:
    Mosaic can't) or 1 (DEFAULT); bf16 inputs run at native rate."""
    from capital_tpu.ops.pallas_dot import tile_dot

    return tile_dot(a, b, contract_dim0=contract_dim0, prec=prec_)


def _make_kernel(contract_dim0: bool, write_pred, prec_):
    """write_pred(k, o, nt) -> bool: is this the LAST pair of output tile
    o's accumulation run (the step at which acc is flushed)?"""

    def kern(to_ref, tk_ref, first_ref, u_ref, b_ref, out_ref, acc):
        p = pl.program_id(1)

        @pl.when(first_ref[p] == 1)
        def _():
            acc[:] = jnp.zeros_like(acc)

        is_diag = to_ref[p] == tk_ref[p]
        u = _mask_diag_triu(u_ref[:], is_diag)
        if contract_dim0:
            acc[:] += _tile_dot(u, b_ref[:], True, prec_)
        else:
            # side='L': U-tile @ B-panel; side='R': B-panel @ U-tile — the
            # caller orders (u_ref, b_ref) so this is always lhs @ rhs
            acc[:] += _tile_dot(u, b_ref[:], False, prec_)

        @pl.when(write_pred(tk_ref[p], to_ref[p], pl.num_programs(1)))
        def _():
            out_ref[:] = acc[:].astype(out_ref.dtype)

    return kern


def _pairs(nt: int, lower_k: bool):
    """(o, k) tile pairs, o-major. lower_k: k <= o (else k >= o). The
    'first' flag marks the start of each o-run for acc zeroing."""
    out = []
    for o in range(nt):
        ks = range(0, o + 1) if lower_k else range(o, nt)
        for idx, k in enumerate(ks):
            out.append((o, k, 1 if idx == 0 else 0))
    to = jnp.asarray(np.array([p[0] for p in out], np.int32))
    tk = jnp.asarray(np.array([p[1] for p in out], np.int32))
    first = jnp.asarray(np.array([p[2] for p in out], np.int32))
    return to, tk, first, len(out)


def trmm_upper(u: jax.Array, b: jax.Array, *, side: str = "L",
               trans_a: bool = False, interpret: bool = False,
               t: int | None = None, mc: int | None = None,
               matmul_precision=None, u_window=None,
               b_window=None) -> jax.Array:
    """Triangle-aware multiply by upper-triangular U (see module doc).
    Shapes: side='L': U (n,n), B (n,m) -> (n,m); side='R': B (m,n), U (n,n)
    -> (m,n). Falls back to a masked dot for tile-ragged shapes.
    t / mc override the triangular / rectangular tile sides (autotuning).
    On-chip sweep defaults: 512/512 f32; 512/2048 bf16, whose ~1.4 us
    1-pass steps are dominated by per-step grid overhead at mc=512 (the
    2^19 x 4096 side='R' formQ shape runs 84.2 vs 100.8 ms).
    matmul_precision overrides the f32 MXU pass count (None honors the
    active `jax.default_matmul_precision`, defaulting to 6-pass HIGHEST —
    the same policy as every XLA dot in the framework, ops/precision.py).

    u_window=(r0, c0, n) / b_window=(r0, c0, h, w): operate on a square /
    rectangular WINDOW of a larger array without materializing the slice —
    the offsets fold into the BlockSpec index maps, so only the window's
    blocks are ever fetched from HBM. This is how cholinv's recursion runs
    its trmms directly against the full workspace buffers (each lax.slice
    a pallas operand needs is otherwise a real copy — ~20 ms of the
    n=32768 profile). Offsets must be tile-aligned; misaligned windows
    fall back to an explicit slice."""
    if matmul_precision is None:
        from capital_tpu.ops.precision import prec

        matmul_precision = prec()
    if t is None:
        t = _T
    if mc is None:
        # bf16 prefers the longer chunk, but only when it divides the
        # rectangular extent AND the window offset along the chunked axis —
        # a non-dividing mc would push the call onto the ragged full-dot
        # fallback (see syrk_upper)
        if b_window is not None:
            ext = b_window[3] if side == "L" else b_window[2]
            off = b_window[1] if side == "L" else b_window[0]
        else:
            ext = b.shape[1] if side == "L" else b.shape[0]
            off = 0
        mc = _MC
        if b.dtype == jnp.bfloat16:
            for cand in (2048, 1024):
                if ext % cand == 0 and off % cand == 0:
                    mc = cand
                    break
        from capital_tpu.ops.pallas_dot import canonicalize as _canon

        if (side == "R" and trans_a and b.dtype == jnp.float32
                and _canon(matmul_precision) == lax.Precision.HIGH):
            # this layout carries an in-VMEM transposed U tile; with the
            # software 3-pass hi/lo splits the 512-chunk stack overruns
            # the 16M scoped-vmem limit by ~244K — halve the row chunk
            mc = 256
    return _trmm_upper_impl(u, b, side=side, trans_a=trans_a,
                            interpret=interpret, prec_=matmul_precision,
                            _T=t, _MC=mc, u_window=u_window,
                            b_window=b_window)


def _materialize(x, window):
    if window is None:
        return x
    r0, c0, h, w = window
    return lax.slice(x, (r0, c0), (r0 + h, c0 + w))


def _trmm_upper_impl(u, b, *, side, trans_a, interpret, prec_, _T, _MC,
                     u_window=None, b_window=None):
    # window geometry (offsets in elements, folded into index maps below)
    ur0, uc0, n = u_window if u_window is not None else (0, 0, u.shape[0])
    if b_window is not None:
        br0, bc0, bh, bw = b_window
    else:
        br0, bc0, (bh, bw) = 0, 0, b.shape
    m = bw if side == "L" else bh
    # b's blocking: side='L' rows are T-tiles / cols are MC-chunks;
    # side='R' rows are MC-chunks / cols are T-tiles
    b_rblk, b_cblk = (_T, _MC) if side == "L" else (_MC, _T)
    ragged = (n % _T or m % _MC
              or ur0 % _T or uc0 % _T or br0 % b_rblk or bc0 % b_cblk)
    if ragged:
        u = _materialize(u, (ur0, uc0, n, n) if u_window else None)
        b = _materialize(b, b_window)
        # bf16 keeps its native 1-pass semantics in the fallback too
        fbp = (lax.Precision.DEFAULT if b.dtype == jnp.bfloat16 else prec_)
        t = jnp.triu(u)
        if trans_a and side == "L":
            return lax.dot_general(
                t, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=fbp).astype(b.dtype)
        if trans_a:  # side='R': B @ U^T, contract col dims
            return lax.dot_general(
                b, t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=fbp).astype(b.dtype)
        lhs, rhs = (t, b) if side == "L" else (b, t)
        return jnp.dot(lhs, rhs, preferred_element_type=jnp.float32,
                       precision=fbp).astype(b.dtype)

    # static block offsets of the windows
    ubr, ubc = ur0 // _T, uc0 // _T
    bbr, bbc = br0 // b_rblk, bc0 // b_cblk

    nt = n // _T
    if side == "L" and not trans_a:
        # C[i,j] = sum_{k>=i} U[i,k] B[k,j]; o-runs end at k == nt-1
        to, tk, first, npairs = _pairs(nt, lower_k=False)
        grid = (m // _MC, npairs)
        u_spec = pl.BlockSpec(
            (_T, _T), lambda j, p, to, tk, f: (ubr + to[p], ubc + tk[p]),
            memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec(
            (_T, _MC), lambda j, p, to, tk, f: (bbr + tk[p], bbc + j),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((_T, _MC), lambda j, p, to, tk, f: (to[p], j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, m), b.dtype)
        acc_shape = (_T, _MC)
        write_pred = lambda k, o, _np: k == nt - 1
        contract0 = False
        operands = (u, b)
    elif side == "L" and trans_a:
        # C[i,j] = sum_{k<=i} U[k,i]^T B[k,j]; o-runs end at k == o
        to, tk, first, npairs = _pairs(nt, lower_k=True)
        grid = (m // _MC, npairs)
        u_spec = pl.BlockSpec(
            (_T, _T), lambda j, p, to, tk, f: (ubr + tk[p], ubc + to[p]),
            memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec(
            (_T, _MC), lambda j, p, to, tk, f: (bbr + tk[p], bbc + j),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((_T, _MC), lambda j, p, to, tk, f: (to[p], j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, m), b.dtype)
        acc_shape = (_T, _MC)
        write_pred = lambda k, o, _np: k == o
        contract0 = True
        operands = (u, b)
    elif side == "R" and not trans_a:
        # side='R': C[i,j] = sum_{k<=j} B[i,k] U[k,j]; o enumerates j
        to, tk, first, npairs = _pairs(nt, lower_k=True)
        grid = (m // _MC, npairs)
        u_spec = pl.BlockSpec(
            (_MC, _T), lambda i, p, to, tk, f: (bbr + i, bbc + tk[p]),
            memory_space=pltpu.VMEM)  # B row panel (b_window offsets)
        b_spec = pl.BlockSpec(
            (_T, _T), lambda i, p, to, tk, f: (ubr + tk[p], ubc + to[p]),
            memory_space=pltpu.VMEM)  # U tile (u_window offsets)
        out_spec = pl.BlockSpec((_MC, _T), lambda i, p, to, tk, f: (i, to[p]),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((m, n), b.dtype)
        acc_shape = (_MC, _T)
        write_pred = lambda k, o, _np: k == o
        contract0 = False
        operands = (b, u)
    else:
        # side='R', trans_a: C[i,j] = sum_{k>=j} B[i,k] U[j,k]; o
        # enumerates j, the U tile is fetched at (o, k) and transposed in
        # VMEM (one _T^2 shuffle per pair step, small next to the dot)
        to, tk, first, npairs = _pairs(nt, lower_k=False)
        grid = (m // _MC, npairs)
        u_spec = pl.BlockSpec(
            (_MC, _T), lambda i, p, to, tk, f: (bbr + i, bbc + tk[p]),
            memory_space=pltpu.VMEM)  # B row panel (b_window offsets)
        b_spec = pl.BlockSpec(
            (_T, _T), lambda i, p, to, tk, f: (ubr + to[p], ubc + tk[p]),
            memory_space=pltpu.VMEM)  # U tile (u_window offsets)
        out_spec = pl.BlockSpec((_MC, _T), lambda i, p, to, tk, f: (i, to[p]),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((m, n), b.dtype)
        acc_shape = (_MC, _T)
        write_pred = lambda k, o, np_: k == np_ - 1
        contract0 = False
        operands = (b, u)

    if side == "R":
        # kernel computes lhs @ rhs with (lhs, rhs) = (B-panel, U-tile):
        # mask must apply to the SECOND ref. Use a dedicated body.
        flush_last = trans_a  # o-runs end at k==nt-1 (trans) / k==o

        def kern(to_ref, tk_ref, first_ref, bp_ref, u_ref, out_ref, acc):
            p = pl.program_id(1)

            @pl.when(first_ref[p] == 1)
            def _():
                acc[:] = jnp.zeros_like(acc)

            u_t = _mask_diag_triu(u_ref[:], to_ref[p] == tk_ref[p])
            if trans_a:
                u_t = u_t.T
            acc[:] += _tile_dot(bp_ref[:], u_t, False, prec_)

            done = (tk_ref[p] == nt - 1 if flush_last
                    else tk_ref[p] == to_ref[p])

            @pl.when(done)
            def _():
                out_ref[:] = acc[:].astype(out_ref.dtype)
    else:
        kern = _make_kernel(contract0, write_pred, prec_)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[u_spec, b_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM(acc_shape, jnp.float32)],
    )
    esz = b.dtype.itemsize
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(m) * n * (n + _T),  # ~2·m·n²/2
            bytes_accessed=int(m) * n * esz * 2 + n * n * esz,
            transcendentals=0,
        ),
    )(to, tk, first, *operands)
