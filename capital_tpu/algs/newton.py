"""Newton-Schulz iterative matrix inversion, distributed.

The reference's newton component documents this intent but does not compile
(invalid constructor syntax at ref: src/alg/inverse/newton/newton.h:16-18;
bench driver uses nonexistent types, ref: bench/inverse/newton.cpp:9,16).
Its algorithm (ref: src/alg/inverse/newton/newton.hpp:19-53):

    X_0    = I / ||A||_inf        (row-sum allreduce + max allreduce)
    X_{k+1} = 2 X_k - X_k A X_k   (two summa GEMMs per sweep, alpha=-1 beta=2)

completed here as a lax.while_loop over distributed summa gemms — the
convergence test the reference sketched (residual vs identity,
newton.hpp:39-46) becomes the loop condition.

For SPD A the scaled-identity start converges; for general nonsingular A we
use the standard guaranteed start X_0 = A^T / (||A||_1 ||A||_inf)
(Pan & Schreiber). Convergence is quadratic once ||I - X A|| < 1.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid, AXIS_X, AXIS_Y
from capital_tpu.matrix import DistMatrix
from capital_tpu.parallel import summa


@dataclass(frozen=True)
class Config:
    """(ref: newton::pack {tol, max_iter}, newton.h:10-19)"""

    tol: float = 1e-6
    max_iter: int = 50
    spd: bool = False  # A symmetric positive-definite: use I/||A||_inf start
    summa_impl: str = "gspmd"


def _fro2(grid: Grid, x) -> jax.Array:
    return jnp.sum(jnp.square(x.astype(jnp.float32)))


def invert(grid: Grid, a, cfg: Config = Config()):
    """X ~= A^{-1}; returns (X, iters, final residual ||I - X A||_F/sqrt(n)).

    a: global (n, n) array sharded P('y','x') (or DistMatrix).
    """
    if isinstance(a, DistMatrix):
        a = a.data
    n = a.shape[0]
    eye = jnp.eye(n, dtype=a.dtype)

    # ||A||_inf = max row sum; ||A||_1 = max col sum. The reference computes
    # the row sums with a row-comm allreduce + slice max-allreduce
    # (newton.hpp:20-35); XLA's reductions over the sharded array compile to
    # the same psum/pmax tree.
    norm_inf = jnp.max(jnp.sum(jnp.abs(a), axis=1))
    if cfg.spd:
        x0 = eye / norm_inf.astype(a.dtype)
    else:
        norm_1 = jnp.max(jnp.sum(jnp.abs(a), axis=0))
        x0 = (a.T / (norm_1 * norm_inf)).astype(a.dtype)
    x0 = grid.constrain(x0, grid.slice_spec)

    tol2 = jnp.float32(cfg.tol) ** 2 * n  # tol on ||.||_F / sqrt(n)

    def residual(x):
        # ||I - X A||^2 (one summa gemm; ref: intermediate = X*A,
        # newton.hpp:39-46)
        xa = summa.gemm(grid, x, a, impl=cfg.summa_impl)
        return _fro2(grid, eye - xa), xa

    def cond(carry):
        _, _, k, r2 = carry
        return jnp.logical_and(k < cfg.max_iter, r2 > tol2)

    def body(carry):
        x, xa, k, _ = carry
        # X <- 2X - X A X  ==  X(2I - A X): one more gemm with the cached
        # X A product (ref: summa with alpha=-1, beta=2, newton.hpp:47-53)
        x_new = summa.gemm(grid, xa, x, c=x, alpha=-1.0, beta=2.0,
                           impl=cfg.summa_impl)
        r2, xa_new = residual(x_new)
        return x_new, xa_new, k + 1, r2

    with tracing.phase("NS::iterate"):
        r2_0, xa0 = residual(x0)
        x, _, iters, r2 = lax.while_loop(cond, body, (x0, xa0, 0, r2_0))
    return x, iters, jnp.sqrt(r2 / n)
