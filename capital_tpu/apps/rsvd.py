"""Distributed randomized SVD / PCA built on the framework's own schedules.

No reference counterpart (like apps/als.py, this is an application layer
showing the library's primitives composing into a production workload);
the algorithm is the standard Halko–Martinsson–Tropp randomized range
finder [arXiv:0909.4061], with every dense building block drawn from this
framework:

  * range sketch Y = A @ Omega           — row-local MXU gemm (no comm),
  * orthonormalization of tall-skinny Y  — CholeskyQR2 (`cacqr.factor_1d`,
    the communication-avoiding QR this library exists for: one psum per
    sweep),
  * subspace/power iteration             — A^T Q via the `apply_q(trans=
    True)` psum kernel (the apply_QT the reference left as assert(0),
    cacqr.hpp:284),
  * core factorization B = Q^T A         — same psum kernel,
  * small (l x l)-class SVD of B         — replicated, jnp.linalg.svd.

Communication: 2(q+1) psums of (l x l) Grams + (q+1) psums of the (l x n)
projections — O(l * (l+n)) words per device independent of m, the same
communication-avoiding shape as CholeskyQR2 itself. Everything else is
row-local MXU work.

Sharding: A is (m, n) row-sharded over the FULL mesh (the 1D/extreme-
aspect-ratio layout, SURVEY §5.7); Omega, B, R and the core SVD are
replicated (l = k + oversample is small by construction).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from capital_tpu import tracing
from capital_tpu.grid import Grid, ALL_AXES
from capital_tpu.matrix import DistMatrix
from capital_tpu.algs import cacqr
from capital_tpu.ops import blas
from capital_tpu.ops.precision import dot as _pdot


@dataclass(frozen=True)
class Config:
    """k: target rank. oversample: extra sketch columns (l = k + oversample
    — HMT recommend 5-10). power_iters: subspace-iteration passes q; each
    adds two m*n*l-flop products and one CholeskyQR2, and sharpens the
    spectral decay as sigma^(2q+1) (use 1-2 for slowly-decaying spectra).
    qr: config of the nested CholeskyQR2 orthogonalizer."""

    k: int = 64
    oversample: int = 8
    power_iters: int = 1
    qr: cacqr.Config = field(default_factory=lambda: cacqr.Config(num_iter=2))

    @property
    def l(self) -> int:
        return self.k + self.oversample


def _orth_replicated(z):
    """CholeskyQR2 of a small REPLICATED (n, l) block — local, two sweeps.
    (The distributed sweeps use cacqr.factor_1d; this is its degenerate
    single-shard case for the n x l intermediate of the power iteration.)"""
    def sweep(y):
        g = _pdot(y.T, y, preferred_element_type=jnp.float32)
        r = jax.lax.linalg.cholesky(g)  # lower L, G = L L^T
        yq = jax.lax.linalg.triangular_solve(
            r, y.astype(jnp.float32), left_side=False, lower=True,
            transpose_a=True)
        return yq.astype(y.dtype)

    return sweep(sweep(z))


def rsvd(grid: Grid, a, cfg: Config = Config()):
    """Rank-k truncated SVD: A ~= U @ diag(s) @ Vt.

    a: (m, n) row-sharded over the full mesh (m >> l; n must fit
    replicated, the same assumption as the CholeskyQR2 Gram path).
    Returns (U, s, Vt): U (m, k) sharded like A; s (k,) and Vt (k, n)
    replicated. For bf16/f16 storage the factors come back in f32 (see the
    mixed-precision note below); accumulation is always f32.
    """
    if isinstance(a, DistMatrix):
        a = a.data
    m, n = a.shape
    l = min(cfg.l, n)
    if cfg.k > n:
        raise ValueError(f"rank k={cfg.k} exceeds n={n}")

    # Mixed precision: the wide (m-row) operands stay in A's storage dtype
    # (that's where the bandwidth is); every skinny l-column intermediate —
    # the sketch, Q, projections — is held in f32, because CholeskyQR's
    # conditioning budget is cond^2 < 1/eps and bf16's eps ~ 8e-3 would cap
    # the sketch at cond ~ 10 (real sketches of noisy data sit at 1e3-1e5).
    work = (jnp.float32 if a.dtype in (jnp.bfloat16, jnp.float16)
            else a.dtype)

    p = max(grid.num_devices, 1)
    tracing.record(
        "rsvd.sketch+power",
        flops=2.0 * m * n * l * (2 * cfg.power_iters + 2) / p,
        comm_bytes=tracing.psum_bytes(4.0 * l * n, p) * (cfg.power_iters + 1),
        msgs=2 * (cfg.power_iters + 1),
    )

    # Range sketch: one deterministic replicated Gaussian test matrix.
    omega = jax.random.normal(jax.random.key(0x5EED), (n, l), jnp.float32)
    with tracing.phase("RSVD::sketch"):
        y = blas.gemm(a, omega.astype(a.dtype)).astype(work)  # row-local
    with tracing.phase("RSVD::orth"):
        q, _ = cacqr.factor_1d(grid, y, cfg.qr)

    # Subspace iteration: Q <- orth(A @ orth(A^T Q)), q times.
    for _ in range(cfg.power_iters):
        with tracing.phase("RSVD::power"):
            z = cacqr.apply_q(grid, a, q, trans=True, cfg=cfg.qr,
                              layout="1d", out_dtype=work)  # A^T Q psum
            z = _orth_replicated(z)
            y = blas.gemm(a, z.astype(a.dtype)).astype(work)  # row-local
        with tracing.phase("RSVD::orth"):
            q, _ = cacqr.factor_1d(grid, y, cfg.qr)

    # Core factorization and small SVD: B = Q^T A (l x n, replicated).
    with tracing.phase("RSVD::core"):
        b = cacqr.apply_q(grid, q, a, trans=True, cfg=cfg.qr, layout="1d",
                          out_dtype=work)
        u_s, s, vt = jnp.linalg.svd(b.astype(jnp.float32),
                                    full_matrices=False)
        u = blas.gemm(q, u_s[:, : cfg.k].astype(q.dtype))  # row-local
    return u, s[: cfg.k], vt[: cfg.k]


def pca(grid: Grid, a, cfg: Config = Config()):
    """Principal components of row-sharded (m, n) data: returns
    (components (k, n), explained_variance (k,), mean (n,)).

    Column-centers A (one psum-sized mean), then takes the rank-k rSVD;
    explained variance = s^2 / (m - 1)."""
    if isinstance(a, DistMatrix):
        a = a.data
    m = a.shape[0]
    mean = jnp.mean(a.astype(jnp.float32), axis=0)
    centered = (a.astype(jnp.float32) - mean).astype(a.dtype)
    from jax.sharding import PartitionSpec as P

    centered = grid.constrain(centered, P(ALL_AXES, None))
    _, s, vt = rsvd(grid, centered, cfg)
    return vt, (s * s) / max(m - 1, 1), mean
