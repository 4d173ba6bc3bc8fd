"""Partial-pivoting panel-LU leaf as ONE Pallas TPU kernel.

The LU panel factorization (algs/lu.py) is the one sequential-by-nature
stage of the schedule: nb pivot decisions, each a data-dependent argmax.
Expressed as a lax.fori_loop of XLA ops, every elimination step costs
~10 small kernel launches (~45 us measured on a v5e) — 16384 steps at
n=16384 made the panel the factorization's dominant cost (round-4/5
profile). This kernel runs an ENTIRE ib-wide strip's elimination in one
launch with the strip resident in VMEM: the per-step cost drops from
launch overhead to a few VPU passes over (ib, mm).

Reference analog: the LAPACK getrf panel the reference would have called
through its lapack engine (ref: src/lapack/interface.hpp:30-88 — MKL gets
the panel loop fused in native code for free; this is the TPU-native way
to the same fusion).

Design (per leaf of the recursive panel, see algs/lu.py:_panel_lu_jax):

  * The (mm, ib) strip is processed TRANSPOSED as (ib, mm): lanes = mm
    rows (128-aligned, no pad waste), sublanes = ib columns.
  * NO physical row swaps inside the kernel (Mosaic has no dynamic-lane
    shuffles): elimination is pivoting-by-masking — a `done` lane mask
    marks rows already chosen as pivots; step c picks the argmax |.| lane
    among ~done, scales the active rows' column c into multipliers, and
    rank-1-updates sublanes > c. Arithmetic is IDENTICAL to the swapped
    elimination (the update touches exactly the not-yet-pivoted rows), so
    factors match LAPACK's to rounding, and the pivot SEQUENCE matches
    exactly up to |.|-ties.
  * The swap-sequence bookkeeping LAPACK reports (pivots[c] = row swapped
    with c, in current ordering) is reconstructed in-kernel with two
    lane-masked permutation vectors (pj: position -> original row, invp:
    its inverse), so the caller gets LAPACK-convention (pj, pivots) plus
    the unswapped factored strip; one XLA gather by pj outside the kernel
    produces the physically-swapped strip.

All index extraction uses 2D masked reductions (TPU: no 1D layouts, no
dynamic-lane value slicing — same idiom as ops/pallas_chol.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kern(valid_ref, t_ref, ot_ref, pj_ref, piv_ref, done_ref, invp_ref):
    # Structure notes, all measured the hard way:
    #  * elimination state lives in VMEM refs, NOT loop carries — Mosaic
    #    materializes carries as vector registers, and (1, mm) i32
    #    carries become hundreds of vreg operands that fail to lower;
    #  * the step loop is PYTHON-UNROLLED so every row index is static:
    #    step c reads/writes only rows c (the pivot row) and c+1..ib (the
    #    updated block) — the fori_loop version rewrote the full (ib, mm)
    #    strip every step, ~2x the VPU work;
    #  * per-step scalars (pivot index/value, swap positions) are 0-d
    #    reductions, never (1, 1) vectors — a vector-element broadcast
    #    compare costs a scalar-register round trip per use;
    #  * rows past `valid` (bucket padding) start `done`, so they never
    #    win the argmax and their pj entries stay identity.
    ib, mm = ot_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, (1, mm), 1)
    pcol = lax.broadcasted_iota(jnp.int32, (1, ib), 1)

    sub = lax.broadcasted_iota(jnp.int32, (ib, 1), 0)
    valid = valid_ref[0]
    ot_ref[...] = t_ref[...]
    pj_ref[...] = lane
    invp_ref[...] = lane
    done_ref[...] = (lane >= valid).astype(jnp.int32)
    piv_ref[...] = jnp.zeros((1, ib), jnp.int32)

    # fori_loop (NOT a Python unroll): Mosaic allocates a scoped-VMEM
    # stack slot per live intermediate, and an unrolled body held ~8
    # (ib, mm) values live (measured: a (64, 24576) leaf requested
    # 49.7M of the 16M scoped limit); the loop body keeps ~3.
    def step(c, _):
        t = ot_ref[...]
        done = done_ref[...] != 0
        is_row_c = (sub == c).astype(t.dtype)                # (ib, 1)
        col = jnp.sum(t * is_row_c, axis=0, keepdims=True)   # strip[:, c]
        cand = jnp.where(done, -jnp.inf, jnp.abs(col))
        mx = jnp.max(cand)                                   # scalar
        p = jnp.min(jnp.where(cand == mx, lane, mm))         # scalar
        is_p = lane == p                                     # (1, mm)
        pivval = jnp.sum(jnp.where(is_p, col, 0.0))          # scalar
        safe = jnp.where(pivval == 0.0, jnp.float32(1.0), pivval)
        lvec = jnp.where(done | is_p, 0.0, col / safe)       # multipliers
        u = jnp.sum(jnp.where(is_p, t, 0.0), axis=1, keepdims=True)
        t = t - jnp.where(sub > c, u, 0.0) * lvec            # rank-1
        newrow = jnp.where(done | is_p, col, lvec)
        ot_ref[...] = t * (1.0 - is_row_c) + is_row_c * newrow
        done_ref[...] = (done | is_p).astype(jnp.int32)
        # LAPACK swap bookkeeping: pivot row p (original index) currently
        # sits at position cur; swap positions c <-> cur.
        pj = pj_ref[...]
        invp = invp_ref[...]
        cur = jnp.sum(jnp.where(is_p, invp, 0))              # scalar
        pj_c = jnp.sum(jnp.where(lane == c, pj, 0))          # scalar
        pj_cur = jnp.sum(jnp.where(lane == cur, pj, 0))      # scalar
        pj_ref[...] = jnp.where(lane == c, pj_cur,
                                jnp.where(lane == cur, pj_c, pj))
        invp_ref[...] = jnp.where(lane == pj_c, cur,
                                  jnp.where(lane == pj_cur, c, invp))
        piv_ref[...] = piv_ref[...] + jnp.where(pcol == c, cur, 0)
        return 0

    lax.fori_loop(0, ib, step, 0)


# Strip heights are padded up to a bucket so the recursion's many leaves
# (every (panel, level) pair has a distinct mm) share a handful of kernel
# shapes: at n=32768 there are hundreds of leaves but only ~8 bucketed
# shapes — a big Mosaic compile-count cut. Padding rows start `done`
# in-kernel, so they are arithmetic no-ops (cost: one extra in/out pass
# over <= bucket rows per leaf).
_BUCKET = 4096


@functools.partial(jax.jit, static_argnames=("interpret",))
def getrf_leaf_pallas(strip: jax.Array, interpret: bool = False):
    """Pivoted LU of an (mm, ib) f32 strip, diagonal at local row c for
    column c. Returns (lu (mm, ib) row-swapped, pj (mm,) with
    out = in[pj], pivots (ib,) LAPACK swap targets)."""
    mm, ib = strip.shape
    mm_pad = mm + (-mm) % _BUCKET
    t = strip.T
    if mm_pad != mm:
        t = jnp.pad(t, ((0, 0), (0, mm_pad - mm)))
    valid = jnp.full((1,), mm, jnp.int32)
    ot, pj, piv = pl.pallas_call(
        _kern,
        out_shape=(
            jax.ShapeDtypeStruct((ib, mm_pad), t.dtype),
            jax.ShapeDtypeStruct((1, mm_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, ib), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, mm_pad), jnp.int32),   # done mask
            pltpu.VMEM((1, mm_pad), jnp.int32),   # inverse permutation
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(valid, t)
    return (jnp.take(ot.T[:mm], pj[0, :mm], axis=0), pj[0, :mm],
            piv[0])
