"""Triangle-aware Gram kernel: G = A^T A computing only upper tiles.

The Gram matrix is THE cost of CholeskyQR (ref: the local _syrk the
reference delegates to MKL dsyrk, src/blas/interface.hpp:77-97 — BLAS syrk
also skips half the flops; XLA has no syrk, so jnp.dot(A.T, A) computes all
n^2). This kernel restores the 2x saving on the MXU:

  grid = (num upper tile pairs, num row chunks); the pair index is mapped
  to tile coordinates (i, j), i <= j, via scalar-prefetched lookup tables,
  so the BlockSpec index maps can route the right column panels of A into
  VMEM. The row-chunk dimension is sequential on TPU: each step accumulates
  A_chunk[:, iT:(i+1)T]^T @ A_chunk[:, jT:(j+1)T] into the (i, j) output
  tile in f32, writing the transposed value into (j, i) at the final chunk
  so the caller gets a full symmetric matrix.

Inputs may be f32 (contracted with HIGHEST precision) or bf16 (native MXU
rate, f32 accumulation). Only profitable when m >> n (the compute-bound
regime); callers fall back to a plain dot otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 512   # column tile (output tile side)
_MC = 512  # row chunk
# On-chip tile sweep (v5e): 512/512 beats 256/1024 by ~5% on both the
# tall-skinny Gram (2^19 x 1024) and square Schur (16384^2) regimes;
# t*mc = 1024*512 and anything larger overflow VMEM at compile.
# VMEM: 2 input blocks (MC*T*4) + 2 output tiles (T^2*4) + 2 f32 acc,
# all double-buffered by the pipeline: ~2*(2*1M) + 2*(2*1M) + 2*1M ~ 10M


_FOLD = 32  # chunks per first-level accumulator


def _kernel(prec_, ti_ref, tj_ref, ai_ref, aj_ref, g_ref, gt_ref, acc, acc2):
    """One (pair, chunk) step. ai/aj: (MC, T) column panels of this chunk;
    g/gt: (T, T) output tiles at (i, j) and (j, i); acc/acc2: two-level f32
    accumulation — folding every _FOLD chunks into acc2 bounds the
    sequential-add error at ~(nc/_FOLD + _FOLD)*eps instead of nc*eps.
    (Kahan compensation is cancelled by the platform's fast-math flags;
    plain two-level summation is not.)"""
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        acc2[:] = jnp.zeros_like(acc2)

    from capital_tpu.ops.pallas_dot import tile_dot

    # dim-0 contraction (A_i^T A_j); tile_dot handles the bf16 "Bad lhs
    # type" transpose and the software HIGH (3-pass) lowering
    acc[:] += tile_dot(ai_ref[:], aj_ref[:], contract_dim0=True, prec=prec_)

    @pl.when(jnp.logical_and((c + 1) % _FOLD == 0, c != nc - 1))
    def _():
        acc2[:] += acc[:]
        acc[:] = jnp.zeros_like(acc)

    @pl.when(c == nc - 1)
    def _():
        total = acc2[:] + acc[:]
        g_ref[:] = total.astype(g_ref.dtype)
        gt_ref[:] = total.T.astype(gt_ref.dtype)


def syrk_upper(a: jax.Array, out_dtype=jnp.float32,
               interpret: bool = False, t: int | None = None,
               mc: int | None = None, matmul_precision=None,
               a_window=None) -> jax.Array:
    """Full symmetric G = A^T A, computed as upper tiles only (~half the
    MXU flops of a plain dot for n >> t).

    t/mc override the output-tile side and row-chunk length. On-chip sweep
    defaults: 512/512 for f32 (anything bigger overflows VMEM with the
    hi/lo 3-pass splits live); 512/1024 for bf16, whose 1-pass steps are
    so short (~1.4 us) that the per-step grid overhead dominates at
    mc=512 — the longer chunk amortizes it (83.5 vs 101 ms on the
    2^19 x 4096 Gram).
    matmul_precision overrides the f32 MXU pass count (None honors the
    active `jax.default_matmul_precision`, defaulting to 6-pass HIGHEST —
    the same policy as every XLA dot in the framework, ops/precision.py).

    a_window=(r0, c0, h, w): Gram of a rectangular WINDOW of a larger
    array without materializing the slice — the offsets fold into the
    BlockSpec index maps (see trmm_upper's u_window/b_window note)."""
    if matmul_precision is None:
        from capital_tpu.ops.precision import prec

        matmul_precision = prec()
    if a_window is not None:
        ar0, ac0, m, n = a_window
    else:
        ar0, ac0, (m, n) = 0, 0, a.shape
    if t is None:
        t = _T
    if mc is None:
        # bf16 prefers the longer chunk, but only when it divides m and
        # the window row offset — otherwise the ragged fallback below
        # would silently replace the kernel with a full dot (measured as
        # a 1.9x cholinv regression when every sub-2048 recursion block
        # went ragged)
        mc = 1024 if (a.dtype == jnp.bfloat16 and m % 1024 == 0
                      and ar0 % 1024 == 0) else _MC
    if n % t or m % mc or ar0 % mc or ac0 % t:
        if a_window is not None:
            a = lax.slice(a, (ar0, ac0), (ar0 + m, ac0 + n))
        # ragged shapes: plain dot (still correct, no triangle saving);
        # bf16 keeps its native 1-pass semantics
        fb_prec = (lax.Precision.DEFAULT if a.dtype == jnp.bfloat16
                   else matmul_precision)
        return jnp.dot(a.T, a, preferred_element_type=jnp.float32,
                       precision=fb_prec).astype(out_dtype)
    abr, abc = ar0 // mc, ac0 // t  # static window block offsets
    nt = n // t
    pairs = [(i, j) for i in range(nt) for j in range(nt) if i <= j]
    ti = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    tj = jnp.asarray(np.array([p[1] for p in pairs], np.int32))
    nc = m // mc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ti, tj lookup tables
        grid=(len(pairs), nc),
        in_specs=[
            pl.BlockSpec((mc, t), lambda p, c, ti, tj: (abr + c, abc + ti[p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, t), lambda p, c, ti, tj: (abr + c, abc + tj[p]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, t), lambda p, c, ti, tj: (ti[p], tj[p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, t), lambda p, c, ti, tj: (tj[p], ti[p]),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((t, t), jnp.float32),
                        pltpu.VMEM((t, t), jnp.float32)],
    )
    g, gt = pl.pallas_call(
        functools.partial(_kernel, matmul_precision),
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), out_dtype),
            jax.ShapeDtypeStruct((n, n), out_dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(m) * n * (n + t),  # ~2·m·n²/2
            bytes_accessed=int(m) * n * a.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(ti, tj, a, a)
    # g holds the upper tiles, gt the mirrored lower tiles (the diagonal
    # tiles land in both, identically); stitch them into the full symmetric
    # matrix with one elementwise select.
    row_t = lax.broadcasted_iota(jnp.int32, (n, n), 0) // t
    col_t = lax.broadcasted_iota(jnp.int32, (n, n), 1) // t
    return jnp.where(row_t <= col_t, g, gt)
