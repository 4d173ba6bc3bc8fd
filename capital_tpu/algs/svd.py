"""Full SVD via QDWH: polar decomposition + symmetric eigensolver.

QDWH-SVD (Nakatsukasa & Higham, SIAM J. Sci. Comput. 35(3), 2013):

    A = U_p H          (QDWH polar, algs/polar.py)
    H = V diag(s) V^T  (spectral divide-and-conquer, algs/eigh.py)
    A = (U_p V) diag(s) V^T

Both stages are compositions of this framework's own engines — Gram psums,
distributed cholinv, summa triangular multiplies — so the SVD inherits the
communication-avoiding schedules and the Pallas triangle kernels end to
end (ref: the same substrate the reference's cacqr/cholinv ride,
cacqr.hpp:75-120 + cholinv.hpp:87-165; the reference itself has no SVD —
this is the capability rung its own papers' lineage builds next).

Deterministic exact-rank-deficiency note: H is PSD; tiny negative rounding
eigenvalues are clamped to 0 and their singular vectors are still returned
(they span the numerical null space).

Layouts (mirrors polar's dispatch):
  * '2d' square-ish A slice-sharded;
  * '1d' tall-skinny A row-sharded; the n x n eigenproblem of H runs on
    the same mesh viewed as a slice (or replicated when n <= eig.base_n).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid, ALL_AXES
from capital_tpu.matrix import DistMatrix
from capital_tpu.algs import eigh as _eigh
from capital_tpu.algs import polar as _polar
from capital_tpu.ops.precision import dot as _pdot
from capital_tpu.parallel import summa


@dataclass(frozen=True)
class Config:
    """polar: the QDWH engine for the A = U_p H stage.
    eig:   the divide-and-conquer engine for H's eigendecomposition."""

    polar: _polar.Config = field(default_factory=lambda: _polar.Config())
    eig: _eigh.Config = field(default_factory=lambda: _eigh.Config())




def svd(grid: Grid, a, cfg: Config = Config(), layout: str = "auto"):
    """A = U diag(s) V^T for (m, n) A with m >= n, distributed.

    Returns (U (m, n), s descending (n,), V (n, n)); U and V have
    orthonormal columns. U keeps A's layout ('1d' row-sharded or '2d'
    slice-sharded); V is slice-sharded.
    """
    if isinstance(a, DistMatrix):
        a = a.data
    m, n = a.shape
    if m < n:
        raise ValueError(f"svd needs m >= n, got {a.shape}")
    layout = _polar._resolve_layout(grid, a, layout)

    with tracing.phase("SVD::polar"):
        up, h = _polar.polar_jit(grid, a, cfg.polar, layout=layout)
    with tracing.phase("SVD::eigh"):
        if layout == "1d" or n <= cfg.eig.resolve_base_n(grid):
            # n x n H: replicated base solve when small, else re-shard onto
            # the slice for the distributed eigensolver
            h2 = grid.constrain(h, grid.slice_spec)
        else:
            h2 = h
        w, v = _eigh.eigh(grid, h2, cfg.eig)
    with tracing.phase("SVD::rotate"):
        # descending singular values; clamp PSD rounding negatives
        order = np.arange(n - 1, -1, -1)
        s = jnp.maximum(jnp.take(w, jnp.asarray(order)), 0.0)
        v = jnp.take(v, jnp.asarray(order), axis=1)
        v = grid.constrain(v, grid.slice_spec)
        if layout == "1d":
            # row-sharded U_p times replicated V: local gemm per row block
            def kern(u_blk, v_rep):
                return _pdot(u_blk, v_rep).astype(u_blk.dtype)

            u = jax.shard_map(kern, mesh=grid.mesh,
                              in_specs=(P(ALL_AXES, None), P(None, None)),
                              out_specs=P(ALL_AXES, None),
                              check_vma=False)(
                up, grid.constrain(v, P(None, None)))
            u = grid.constrain(u, P(ALL_AXES, None))
        else:
            u = summa.gemm(grid, up, v, impl=cfg.polar.chol.summa_impl)
    return u, s.astype(a.dtype), v


def svd_partial(grid: Grid, a, k: int, cfg: Config = Config(),
                layout: str = "auto"):
    """Top-k truncated SVD, deterministic: A ≈ U_k diag(s_k) V_k^T.

    The polar factor is computed in full (it is the iteration itself),
    but H's eigenproblem is solved only for its top-k invariant block
    (eigh.eigh_partial — one bisected sign + one split instead of the
    full spectrum), and only k columns of U are ever formed. Complements
    apps/rsvd.py: rSVD samples the range (fast, randomized, accuracy
    set by the oversampled gap); this path is deterministic with the
    partial eigensolver's 1e-6-class residuals (BENCH_LOCAL.md).

    Returns (U (m, k), s descending (k,), V (n, k))."""
    if isinstance(a, DistMatrix):
        a = a.data
    m, n = a.shape
    if m < n:
        raise ValueError(f"svd_partial needs m >= n, got {a.shape}")
    if not 1 <= k <= n:
        raise ValueError(f"need 1 <= k <= n, got k={k}, n={n}")
    layout = _polar._resolve_layout(grid, a, layout)
    with tracing.phase("SVD::polar"):
        up, h = _polar.polar_jit(grid, a, cfg.polar, layout=layout)
    with tracing.phase("SVD::eigh"):
        w, v = _eigh.eigh_partial(grid, grid.constrain(h, grid.slice_spec),
                                  k, cfg.eig, which="top")
    with tracing.phase("SVD::rotate"):
        order = np.arange(k - 1, -1, -1)
        s = jnp.maximum(jnp.take(w, jnp.asarray(order)), 0.0)
        v = jnp.take(v, jnp.asarray(order), axis=1)
        if layout == "1d":
            def kern(u_blk, v_rep):
                return _pdot(u_blk, v_rep).astype(u_blk.dtype)

            u = jax.shard_map(kern, mesh=grid.mesh,
                              in_specs=(P(ALL_AXES, None), P(None, None)),
                              out_specs=P(ALL_AXES, None),
                              check_vma=False)(
                up, grid.constrain(v, P(None, None)))
            u = grid.constrain(u, P(ALL_AXES, None))
        else:
            u = summa.gemm(grid, up, v, impl="gspmd")
    return u, s.astype(a.dtype), v


def singular_values(grid: Grid, a, cfg: Config = Config(),
                    layout: str = "auto"):
    """s(A) descending without forming U or V: s = eig(H) from the polar
    factor, solved values-only (eigh.eigvalsh — no rotation gemm, no
    cross-split vector corrections)."""
    if isinstance(a, DistMatrix):
        a = a.data
    layout = _polar._resolve_layout(grid, a, layout)
    with tracing.phase("SVD::polar"):
        _, h = _polar.polar_jit(grid, a, cfg.polar, layout=layout)
    with tracing.phase("SVD::eigh"):
        w = _eigh.eigvalsh(grid, grid.constrain(h, grid.slice_spec), cfg.eig)
    n = a.shape[1]
    order = jnp.asarray(np.arange(n - 1, -1, -1))
    return jnp.maximum(jnp.take(w, order), 0.0).astype(a.dtype)
