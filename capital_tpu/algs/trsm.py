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

The substitution is a single `lax.scan` over row panels: the carry is the
(masked-triangular-zeroed) X workspace, and each step does one full-width
panel gemm `B_i - A[i,:] @ X` — blocks of X not yet computed are zero, and
blocks of A on the wrong side of the diagonal are zero, so the masked
full-width product equals the triangular partial sum. Trace size is
O(1) in the panel count (the reference's intended loop would have been
runtime-iterated too; a Python-unrolled version at n=65536/nb=1024 would
trace ~2,080 gemms).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import lax
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

    def panel(self, grid: Grid, n: int) -> int:
        """Largest panel <= nb that divides n and satisfies summa's
        divisibility (d | nb for the panel gemms, d*c | nb for the
        diagonal-block gemm contraction)."""
        nb = min(self.nb, n)
        step = grid.d1 * grid.c
        while nb > step and (n % nb or nb % step):
            nb -= step if nb % step == 0 else nb % step
        if n % nb:
            nb = n  # no valid panel split: solve as a single panel
        return nb


def solve(grid: Grid, a, b, *, side: str = "L", lower: bool = True,
          unit_diag: bool = False, cfg: Config = Config()):
    """X with op: L X = B (side='L') or X L = B (side='R').

    a: triangular (n, n); b: (n, m) for side L, (m, n) for side R; both
    sharded P('y','x') (ref signature: diaginvert::solve(L, X, B),
    diaginvert.h:15-17).

    unit_diag=True reads only the strict triangle of `a` and takes the
    diagonal as ones — so a packed LU workspace (L strict-lower, U upper,
    algs/lu.py) feeds BOTH substitutions directly, no dense L/U unpack
    (the in-place discipline of ref: cholinv.hpp:87-165)."""
    if isinstance(a, DistMatrix):
        a = a.data
    if isinstance(b, DistMatrix):
        b = b.data
    if side == "R":
        # X A = B  <=>  A^T X^T = B^T: transpose-reduce to the left case.
        xt = solve(grid, summa.transpose(grid, a, impl=cfg.tri.summa_impl),
                   summa.transpose(grid, b, impl=cfg.tri.summa_impl),
                   side="L", lower=not lower, unit_diag=unit_diag, cfg=cfg)
        return summa.transpose(grid, xt, impl=cfg.tri.summa_impl)

    n, m = a.shape[0], b.shape[1]
    # the panel gemms contract the RHS's column dim over the mesh slice:
    # pad a too-narrow RHS (e.g. a single right-hand side on a d>=2
    # grid) up to the divisibility unit and slice back after the scan
    unit = max(grid.d, 1) * max(grid.c, 1)
    m_pad = (-m) % unit
    if m_pad:
        b = jnp.pad(b, ((0, 0), (0, m_pad)))
        m += m_pad
    nb = cfg.panel(grid, n)
    num_p = n // nb
    impl = cfg.tri.summa_impl

    # mask the wrong triangle so the full-width panel gemm in the scan sees
    # zeros where the substitution sum must not reach (plus an implicit
    # unit diagonal for packed-LU operands)
    if unit_diag:
        eye = jnp.eye(n, dtype=a.dtype)
        a = (jnp.tril(a, -1) if lower else jnp.triu(a, 1)) + eye
    else:
        a = jnp.tril(a) if lower else jnp.triu(a)

    # 1. invert every diagonal block up front (the "diaginvert" idea) and
    # stack them into ONE (num_p, nb, nb) array for the scan. The loop here
    # is over panels of the trace-static panel count only for the slicing;
    # each inversion is the distributed rectri.
    with tracing.phase("TRSM::diaginvert"):
        dinv = jnp.stack([
            rectri.invert(grid, jax.lax.slice(a, (i * nb, i * nb),
                                              ((i + 1) * nb, (i + 1) * nb)),
                          lower=lower, cfg=cfg.tri)
            for i in range(num_p)
        ])
        dinv = grid.constrain(dinv, P(None, grid.ax_y, grid.ax_x))

    # 2. block substitution as one lax.scan over row panels (forward for
    # lower, backward for upper via reverse=True)
    a_rows = grid.constrain(a.reshape(num_p, nb, n),
                            P(None, grid.ax_y, grid.ax_x))
    b_rows = grid.constrain(b.reshape(num_p, nb, m),
                            P(None, grid.ax_y, grid.ax_x))
    offs = jnp.arange(num_p, dtype=jnp.int32) * nb
    x0 = grid.constrain(jnp.zeros_like(b), grid.slice_spec)

    # scan bodies trace once: record the whole substitution's cost here
    # (num_p panel gemms of (nb x n)@(n x m) + num_p (nb x nb)@(nb x m))
    p = max(grid.num_devices, 1)
    tracing.record(
        "trsm.substitute",
        flops=2.0 * num_p * (nb * n * m + nb * nb * m) / p,
        comm_bytes=num_p * tracing.psum_bytes(
            nb * m * a.dtype.itemsize / max(grid.d1 * grid.d2, 1), grid.c),
        msgs=3 * num_p,
    )

    def body(x, inp):
        a_row, b_i, d_i, off = inp
        with tracing.phase("TRSM::substitute"):
            rhs = summa.gemm(grid, a_row, x, c=b_i, alpha=-1.0, beta=1.0,
                             impl=impl)
            x_i = summa.gemm(grid, d_i, rhs, impl=impl)
        x = lax.dynamic_update_slice(x, x_i, (off, 0))
        return grid.constrain(x, grid.slice_spec), None

    x, _ = lax.scan(body, x0, (a_rows, b_rows, dinv, offs),
                    reverse=not lower)
    if m_pad:
        x = lax.slice(x, (0, 0), (n, m - m_pad))
    return x
