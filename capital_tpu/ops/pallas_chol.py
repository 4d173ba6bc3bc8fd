"""Fused blocked Cholesky + triangular inverse as a single Pallas TPU kernel.

This is the TPU-native replacement for the reference's base-case kernel pair
LAPACKE_dpotrf + LAPACKE_dtrtri (ref: src/lapack/interface.hpp:30-66, called
from cholinv's base-case policies at src/alg/cholesky/cholinv/policy.h:190-205)
— the hot leaf of the recursive cholinv schedule. The reference runs the two
LAPACK calls back-to-back on a replicated block; here both factorizations are
fused into ONE kernel that keeps the whole block resident in VMEM:

    chol_inv_pallas(A) -> (R, Rinv)   with A = R^T R, R upper-triangular.

Schedule (one kernel invocation, fori_loop over B=128 panels):

  per panel k:
    1. micro-factorization of the diagonal B x B block: a rank-1-update
       Cholesky loop on the VPU that SIMULTANEOUSLY accumulates E = R_kk^{-T}
       by applying the same elimination operators to the identity (Gauss-
       Jordan fusion — replaces a separate trtri of the diagonal block).
    2. full-width row-slab P = E @ M[kB:kB+B, :] on the MXU. Because columns
       < kB of the Schur-updated M are already eliminated to zero, P comes
       out as [0 | R_kk | R_{k,k+1:}] directly — no masking needed.
    3. trailing update M <- M - P^T P (MXU). This eliminates row/col block k
       of M in the same pass that forms the Schur complement.
    4. inverse assembly (left-looking blocked trtri, fused):
       Rinv[:, kB:kB+B] = -(Rinv @ R[:, kB:kB+B]) @ E^T, then the diagonal
       block is overwritten with R_kk^{-1} = E^T.

Full-width slabs trade ~6x redundant MXU flops for static shapes and zero
HBM traffic between the four factorization phases; for base-case sizes
(n <= 1024, 12 MB VMEM for the three n^2 f32 buffers) this wins against
XLA's multi-pass cholesky-expander + two triangular solves.

Numerics: all arithmetic in float32 (inputs upcast); the rank-1 micro-loop
guards sqrt with a max(eps) clamp identical in spirit to LAPACK's info>0
behavior (garbage-in propagates NaN-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# MXU-native panel width.
_B = 128


def _micro_chol_inv(m_kk):
    """(R_kk, E = R_kk^{-T}) of one B x B SPD block via B rank-1 updates.

    Right-looking unblocked Cholesky: at step j the pivot row r_j =
    M[j,:]/sqrt(M[j,j]) is recorded into R and eliminated from M by
    M -= outer(r_j, r_j). The same left elimination operator applied to an
    identity accumulates E with E_final = R^{-T} (since R^{-T} A R^{-1} = I).
    All ops are (B, B) VPU outer products — no MXU, no dynamic shapes.
    """
    b = m_kk.shape[0]
    # 2D index planes (TPU: no 1D iota / 1D vector layouts). Pivot row/column
    # extraction is done by masked reductions — Mosaic has no dynamic_slice
    # on values, and (b,b) VPU reduces are ~free next to the MXU slabs.
    idx_lane = lax.broadcasted_iota(jnp.int32, (1, b), 1)  # column index, (1,b)
    idx_sub = lax.broadcasted_iota(jnp.int32, (b, 1), 0)   # row index,    (b,1)

    def body(j, carry):
        m, r, e = carry
        is_row_j = (idx_sub == j).astype(jnp.float32)   # (b,1)
        is_col_j = (idx_lane == j).astype(jnp.float32)  # (1,b)
        mrow = jnp.sum(m * is_row_j, axis=0, keepdims=True)   # pivot row (1,b)
        mcol = jnp.sum(m * is_col_j, axis=1, keepdims=True)   # pivot col (b,1) = row^T (M symmetric)
        d2 = jnp.sum(mrow * is_col_j, axis=1, keepdims=True)  # (1,1)
        dinv = lax.rsqrt(jnp.maximum(d2, jnp.float32(1e-30)))
        rj_row = jnp.where(idx_lane >= j, mrow * dinv, 0.0)  # (1,b)
        rj_col = jnp.where(idx_sub >= j, mcol * dinv, 0.0)   # (b,1)
        r = r + is_row_j * rj_row
        # eliminate: two-sided rank-1 update of M (broadcast outer product)
        m = m - rj_col * rj_row
        # accumulate E <- T_j E: row j scales by 1/d; rows i>j subtract rj[i] * new row j
        erow = jnp.sum(e * is_row_j, axis=0, keepdims=True) * dinv  # (1,b)
        sub = jnp.where(idx_sub > j, rj_col, 0.0)  # (b,1) multipliers
        e = jnp.where(idx_sub == j, erow, e - sub * erow)
        return m, r, e

    _, r_kk, e = lax.fori_loop(
        0, b, body,
        (m_kk, jnp.zeros((b, b), jnp.float32), jnp.eye(b, dtype=jnp.float32)),
    )
    return r_kk, e


def _kernel(a_ref, r_ref, rinv_ref, m_ref):
    n = a_ref.shape[0]
    nb = n // _B

    m_ref[:] = a_ref[:].astype(jnp.float32)
    r_ref[:] = jnp.zeros((n, n), jnp.float32)
    rinv_ref[:] = jnp.zeros((n, n), jnp.float32)

    def step(k, _):
        off = pl.multiple_of(k * _B, _B)
        m_kk = m_ref[pl.ds(off, _B), pl.ds(off, _B)]
        r_kk, e = _micro_chol_inv(m_kk)
        del r_kk  # E @ M_kk below IS R_kk (E = R_kk^{-T}, M_kk = R_kk^T R_kk)

        # row slab P = E @ M[k-block, :]  ->  [0 | R_kk | R_{k,>k}]  (MXU)
        m_rows = m_ref[pl.ds(off, _B), :]
        p = jnp.dot(e, m_rows, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
        r_ref[pl.ds(off, _B), :] = p

        # trailing update M <- M - P^T P eliminates row/col block k and
        # forms the Schur complement of everything below-right.
        # dot_general contracts P's row axis directly — no transpose relayout.
        ptp = lax.dot_general(
            p, p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        m_ref[:] = m_ref[:] - ptp

        # inverse assembly (left-looking): Rinv[:, k] = -(Rinv @ R[:, k]) E^T
        r_col = r_ref[:, pl.ds(off, _B)]
        t = jnp.dot(rinv_ref[:], r_col, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
        c = lax.dot_general(  # -t @ e^T, contracting both second axes
            -t, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        rinv_ref[:, pl.ds(off, _B)] = c
        # diagonal block: Rinv_kk = E^T (c's rows in this band are zero —
        # rinv's row band k was still empty when t was formed)
        rinv_ref[pl.ds(off, _B), pl.ds(off, _B)] = e.T
        return 0

    lax.fori_loop(0, nb, step, 0)


@functools.partial(jax.jit, static_argnames=("lower", "interpret"))
def chol_inv_pallas(a: jax.Array, lower: bool = False, interpret: bool = False):
    """(R, Rinv) with A = R^T R (upper). See module docstring.

    n must be a multiple of 128; callers pad (matrix.py pads SPD operands
    with an identity diagonal so chol of the padded block is well-posed).
    """
    n = a.shape[-1]
    if n % _B:
        raise ValueError(f"chol_inv_pallas needs 128 | n, got n={n}")
    out_dtype = a.dtype
    a32 = a.astype(jnp.float32)

    r, rinv = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * n**3), bytes_accessed=int(12 * n * n), transcendentals=n
        ),
        interpret=interpret,
    )(a32)

    r = jnp.triu(r).astype(out_dtype)
    rinv = jnp.triu(rinv).astype(out_dtype)
    if lower:
        return r.T, rinv.T
    return r, rinv
