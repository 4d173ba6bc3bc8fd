"""Distributed triangular solve (TRSM) by diagonal-block inversion.

The reference declared this and left it as static_assert(0, "not
implemented") (ref: src/alg/trsm/diaginvert/diaginvert.hpp:9); the component
name "diaginvert" records the intended schedule, completed here:

    invert the diagonal blocks (rectri), then block forward/back
    substitution where each panel update is a summa GEMM:

      L X = B (lower, left):   X_i = D_i^{-1} (B_i - sum_{j<i} L_ij X_j)
      U X = B (upper, left):   X_i = D_i^{-1} (B_i - sum_{j>i} U_ij X_j)

Communication-avoiding in the same sense as cholinv's TRSM step: the only
collectives are the summa gathers/psums of the panel gemms, and all
triangular-inverse compute happens once up front.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid, AXIS_X, AXIS_Y
from capital_tpu.matrix import DistMatrix
from capital_tpu.algs import rectri
from capital_tpu.parallel import summa


@dataclass(frozen=True)
class Config:
    """Panel width nb governs the substitution granularity; the nested
    rectri config governs the diagonal-block inversions."""

    nb: int = 1024
    tri: rectri.Config = field(default_factory=rectri.Config)

    def panel(self, n: int) -> int:
        return min(self.nb, n)


def solve(grid: Grid, a, b, *, side: str = "L", lower: bool = True,
          cfg: Config = Config()):
    """X with op: L X = B (side='L') or X L = B (side='R').

    a: triangular (n, n); b: (n, m) for side L, (m, n) for side R; both
    sharded P('y','x') (ref signature: diaginvert::solve(L, X, B),
    diaginvert.h:15-17).
    """
    if isinstance(a, DistMatrix):
        a = a.data
    if isinstance(b, DistMatrix):
        b = b.data
    if side == "R":
        # X A = B  <=>  A^T X^T = B^T: transpose-reduce to the left case.
        xt = solve(grid, summa.transpose(grid, a, impl=cfg.tri.summa_impl),
                   summa.transpose(grid, b, impl=cfg.tri.summa_impl),
                   side="L", lower=not lower, cfg=cfg)
        return summa.transpose(grid, xt, impl=cfg.tri.summa_impl)

    n = a.shape[0]
    nb = cfg.panel(n)
    num_p = -(-n // nb)
    impl = cfg.tri.summa_impl

    # 1. invert every diagonal block in one pass (the "diaginvert" idea)
    with tracing.phase("TRSM::diaginvert"):
        dinv = []
        for i in range(num_p):
            s, e = i * nb, min((i + 1) * nb, n)
            blk = jax.lax.slice(a, (s, s), (e, e))
            dinv.append(rectri.invert(grid, blk, lower=lower, cfg=cfg.tri))

    # 2. block substitution (forward for lower, backward for upper)
    order = range(num_p) if lower else range(num_p - 1, -1, -1)
    x = grid.constrain(jnp.zeros_like(b), grid.slice_spec)
    with tracing.phase("TRSM::substitute"):
        for i in order:
            s, e = i * nb, min((i + 1) * nb, n)
            rhs = jax.lax.slice(b, (s, 0), (e, b.shape[1]))
            js = range(i) if lower else range(num_p - 1, i, -1)
            for j in js:
                sj, ej = j * nb, min((j + 1) * nb, n)
                a_ij = jax.lax.slice(a, (s, sj), (e, ej))
                x_j = jax.lax.slice(x, (sj, 0), (ej, x.shape[1]))
                rhs = summa.gemm(grid, a_ij, x_j, c=rhs, alpha=-1.0, beta=1.0,
                                 impl=impl)
            x_i = summa.gemm(grid, dinv[i], rhs, impl=impl)
            x = jax.lax.dynamic_update_slice(x, x_i, (s, 0))
    return x
