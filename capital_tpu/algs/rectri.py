"""Recursive distributed triangular-matrix inversion.

The reference's rectri is half-implemented: only the deepest-level local
trtri runs; the recursive combine is a commented-out sketch
(ref: src/alg/inverse/rectri/rectri.hpp:61-100). Completed here.

Schedule (for lower-triangular L; upper is the transpose-dual):

    inv([[L11,   0  ],     =  [[L11inv,                0     ],
         [L21,  L22 ]])        [-L22inv L21 L11inv,  L22inv ]]

i.e. recurse on both diagonal blocks, then ONE block gemm chain for the
off-diagonal (two summa gemms). The reference's grid-coarsening idea —
split the c x d x d grid into 8 sub-cubes so both halves recurse on smaller
grids concurrently (ref: rectri.hpp:28-59) — is subsumed on TPU: both
diagonal-block recursions are independent XLA subgraphs over the same mesh
and the compiler overlaps them; no communicator surgery needed.

Workspace style like cholinv: X is one full-size buffer updated in place.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid, AXIS_X, AXIS_Y
from capital_tpu.matrix import DistMatrix
from capital_tpu.ops import lapack
from capital_tpu.parallel import summa


@dataclass(frozen=True)
class Config:
    """(ref: rectri::info {split, bc_mult_dim, dir}, rectri.h:14-28)"""

    split: int = 1
    bc_mult: int = 0
    min_bc: int = 128
    base_method: str = "auto"
    summa_impl: str = "shard_map"

    def base_dim(self, grid: Grid, n: int) -> int:
        bc = max(self.min_bc, grid.d1 * grid.c) << self.bc_mult
        return min(bc, n)


def _base_trtri(grid: Grid, t, lower: bool, cfg: Config):
    """Replicated leaf trtri (ref: the local _trtri the reference does run,
    rectri.hpp:66-68)."""
    t_rep = grid.constrain(t, P(None, None))
    inv = lapack.trtri(t_rep, lower=lower)
    return grid.constrain(inv, grid.slice_spec)


def _rec(grid: Grid, carry, off: int, n: int, bc: int, lower: bool, cfg: Config):
    t, x = carry  # t: input triangle (read-only), x: inverse being built
    end = off + n
    if n <= bc:
        with tracing.phase("RT::base"):
            tracing.record("trtri_base", flops=n**3 / 3.0)
            blk = jax.lax.slice(t, (off, off), (end, end))
            inv = _base_trtri(grid, blk, lower, cfg)
            x = jax.lax.dynamic_update_slice(x, inv, (off, off))
            return t, x

    n1 = max(bc, n >> cfg.split)
    mid = off + n1

    t, x = _rec(grid, (t, x), off, n1, bc, lower, cfg)
    t, x = _rec(grid, (t, x), mid, n - n1, bc, lower, cfg)

    with tracing.phase("RT::combine"):
        x11 = jax.lax.slice(x, (off, off), (mid, mid))
        x22 = jax.lax.slice(x, (mid, mid), (end, end))
        if lower:
            # X21 = -L22inv L21 L11inv (ref: the commented combine sketch,
            # rectri.hpp:70-100)
            l21 = jax.lax.slice(t, (mid, off), (end, mid))
            u = summa.gemm(grid, l21, x11, impl=cfg.summa_impl)
            x21 = summa.gemm(grid, x22, u, alpha=-1.0, impl=cfg.summa_impl)
            x = jax.lax.dynamic_update_slice(x, x21, (mid, off))
        else:
            # X12 = -U11inv U12 U22inv
            u12 = jax.lax.slice(t, (off, mid), (mid, end))
            u = summa.gemm(grid, u12, x22, impl=cfg.summa_impl)
            x12 = summa.gemm(grid, x11, u, alpha=-1.0, impl=cfg.summa_impl)
            x = jax.lax.dynamic_update_slice(x, x12, (off, mid))
    return t, x


def invert(grid: Grid, t, lower: bool = True, cfg: Config = Config()):
    """X = T^{-1} for triangular T (n, n) sharded P('y','x')."""
    if isinstance(t, DistMatrix):
        t = t.data
    t = jnp.tril(t) if lower else jnp.triu(t)
    n = t.shape[0]
    bc = cfg.base_dim(grid, n)
    x = grid.constrain(jnp.zeros_like(t), grid.slice_spec)
    _, x = _rec(grid, (t, x), 0, n, bc, lower, cfg)
    return grid.constrain(x, grid.slice_spec)
