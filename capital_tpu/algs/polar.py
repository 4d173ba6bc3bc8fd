"""QDWH polar decomposition, distributed (A = U H).

The reference stops at Cholesky/QR factorizations; the canonical
communication-avoiding *companions* to CholeskyQR2 and recursive cholinv in
the dense linear-algebra literature are the QR/Cholesky-based polar
decomposition (QDWH — dynamically weighted Halley iteration, Nakatsukasa,
Bai & Gygi, SIAM J. Sci. Comput. 2010; Nakatsukasa & Higham, SIAM J. Sci.
Comput. 2013) and the spectral divide-and-conquer eigensolver/SVD built on
it (algs/eigh.py, algs/svd.py). They are the natural capability extension
of exactly the machinery this framework already has — every QDWH step is
one Gram + one cholinv + two triangular multiplies, i.e. the same calls as
one CholeskyQR sweep (ref: the cacqr sweep shape, cacqr.hpp:5-29) — so they
ride the same summa/cacqr/cholinv engines and the same Pallas triangle
kernels, distributed over the same meshes.

Algorithm: X_0 = A / alpha with alpha >= sigma_max(A) (Frobenius bound);
given a lower bound l_0 <= sigma_min(X_0), iterate

    X_{k+1} = X_k (b_k/c_k) + (a_k - b_k/c_k) X_k (I + c_k X_k^T X_k)^{-1}

with the dynamically weighted Halley coefficients (a_k, b_k, c_k) driven by
the scalar recurrence on l_k. The map sends every singular value to 1
cubically: <= 6 iterations for l_0 >= 1e-16. The (I + c X^T X)^{-1} solve
is the framework's own cholinv: Z = I + c X^T X is SPD, and
X Z^{-1} = X Rinv Rinv^T — two triangular multiplies against the explicit
inverse factor (the whole point of computing R^{-1} alongside R).

The weight recurrence depends only on the STATIC knob l0, so all
coefficients are Python floats computed at trace time: the iteration count
and every weight are compile-time constants — no data-dependent control
flow inside jit (the TPU requirement), no convergence polling.

Numerical envelope (f32): the Cholesky-variant QDWH step is backward
stable when c_k is moderate; c_0 ~ l0^{-4/3} means f32 storage wants
l0 >= ~1e-5 (cond(A) <= ~1e5). A final Newton-Schulz polish step
(cfg.ns_polish) contracts the accumulated orthogonality drift
quadratically — measured: U^T U - I at ~1e-6 f32 after polish. For harder
spectra run under jax.enable_x64() (the framework is f64-clean end to end,
tests/test_f64.py).

Layouts mirror cacqr's dispatch (ref: cacqr.hpp:229-244):
  * '2d' — A sharded P('y','x') on the slice; Gram via summa.syrk
    (distributed cholinv for the n x n solve);
  * '1d' — tall-skinny A row-sharded over the full mesh; Gram via one
    psum (cacqr.gram_1d), Z factored replicated, updates device-local.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid, ALL_AXES
from capital_tpu.matrix import DistMatrix
from capital_tpu.ops import blas, lapack
from capital_tpu.ops.precision import dot as _pdot
from capital_tpu.algs import cacqr as _cacqr
from capital_tpu.algs import cholinv as _cholinv
from capital_tpu.parallel import summa


@dataclass(frozen=True)
class Config:
    """Knobs of the QDWH iteration.

    l0:        static lower bound on sigma_min(A)/||A||_F. Smaller = more
               iterations + a harder first Cholesky; f32 wants >= ~1e-5.
               None -> dtype default (1e-5 f32 / 1e-12 f64).
    max_iter:  cap on QDWH iterations. None -> derived from the weight
               recurrence (first k with 1 - l_k below the dtype's
               convergence floor, +1 safety; <= 6 for l0 >= 1e-16).
    ns_polish: Newton-Schulz polishing steps after the QDWH sweep
               (X <- 1.5 X - 0.5 X (X^T X)): each squares the
               orthogonality error of the near-orthogonal iterate,
               scrubbing f32 rounding drift for one Gram + one gemm.
    qr_switch: iterations with c_k above this run the QR-variant step via a
               stacked CholeskyQR2 of [sqrt(c) X; I] instead of the plain
               Z-solve (Nakatsukasa-Higham switch the same way at c_k=100).
               At large c_k, Z = I + c X^T X is not even *representable*
               accurately in f32 (cond(Z) ~ c_k swamps the +I), but the
               CQR2 step only needs the stacked factor to come out with
               orthonormal columns — which its second pass guarantees
               regardless of Z's rounding, and Q2 = R1inv R2inv stays upper
               triangular so the update remains trmm-shaped. Measured at
               cond(A)=1e4 f32: reconstruction 3.3e-4 -> 8.6e-7, factor
               error 1.7e-3 -> 7.2e-6, for ~2x the cost of the 1-2 early
               steps only (c_k falls below 100 by iteration 2).
    compute_h: also return H = U^T A (symmetrized). False skips the final
               gemm (eigh only needs U).
    chol:      nested cholinv config (the Z-solve engine).
    """

    l0: float | None = None
    max_iter: int | None = None
    ns_polish: int = 1
    qr_switch: float = 100.0
    compute_h: bool = True
    chol: _cholinv.Config = field(default_factory=lambda: _cholinv.Config())

    def resolve_l0(self, dtype) -> float:
        if self.l0 is not None:
            return float(self.l0)
        return 1e-12 if dtype == jnp.float64 else 1e-5


def qdwh_weights(l0: float, dtype, max_iter: int | None = None):
    """The (a_k, b_k, c_k) schedule from the scalar l-recurrence
    (Nakatsukasa-Bai-Gygi dynamic weighting), as Python floats.

    Stops when l has converged to 1 at the dtype's resolution (one extra
    Halley step of safety), so the unrolled iteration count is minimal for
    the declared conditioning."""
    eps = float(jnp.finfo(dtype).eps)
    floor = 10.0 * eps
    out = []
    l = float(l0)
    cap = max_iter if max_iter is not None else 12
    for _ in range(cap):
        l2 = l * l
        d = (4.0 * (1.0 - l2) / (l2 * l2)) ** (1.0 / 3.0)
        a = math.sqrt(1.0 + d) + 0.5 * math.sqrt(
            max(8.0 - 4.0 * d + 8.0 * (2.0 - l2) / (l2 * math.sqrt(1.0 + d)),
                0.0))
        b = (a - 1.0) ** 2 / 4.0
        c = a + b - 1.0
        out.append((a, b, c))
        l = l * (a + b * l2) / (1.0 + c * l2)
        if max_iter is None and 1.0 - l < floor:
            break
    return out


def _gram_eps(dtype) -> float:
    """Effective rounding unit of a Gram computed at the ACTIVE matmul
    precision: the sCQR shift must cover the Gram's error, which for f32
    storage depends on the MXU pass count (HIGHEST ~ f32 eps; HIGH's
    3-pass bf16 lowering is ~8x coarser; DEFAULT is bf16 eps). Too small
    a shift NaNs the pass-1 Cholesky at tight l0 (measured: n=8192 sign
    at HIGH with 20*eps_f32*(1+c) — every split NaN'd and the eigensolver
    silently fell back to the replicated dense base)."""
    eps = float(jnp.finfo(dtype).eps)
    if dtype == jnp.float32:
        from jax import lax as _lax

        from capital_tpu.ops.pallas_dot import canonicalize
        from capital_tpu.ops.precision import prec

        p = canonicalize(prec())
        if p == _lax.Precision.HIGH:
            eps *= 8.0
        elif p == _lax.Precision.DEFAULT:
            eps = float(jnp.finfo(jnp.bfloat16).eps)
    return eps


def _halley_step_2d(grid: Grid, x, a, b, c, chol_cfg):
    """X <- (b/c) X + (a - b/c) X (I + c X^T X)^{-1}, slice-sharded."""
    n = x.shape[1]
    eye = grid.constrain(jnp.eye(n, dtype=x.dtype), grid.slice_spec)
    z = summa.syrk(grid, x, c=eye, alpha=c, beta=1.0,
                   impl=chol_cfg.summa_impl)
    _, rinv = _cholinv.factor(grid, z, chol_cfg)
    y = summa.trmm(grid, rinv, x, side="R", uplo="U",
                   impl=chol_cfg.summa_impl)
    y = summa.trmm(grid, rinv, y, side="R", uplo="U", trans_a=True,
                   impl=chol_cfg.summa_impl)
    return ((b / c) * x + (a - b / c) * y).astype(x.dtype)


def _cqr2_step_2d(grid: Grid, x, a, b, c, chol_cfg):
    """QR-variant Halley step via stacked CholeskyQR2 of [sqrt(c) X; I]:
    X <- (b/c) X + ((a - b/c)/sqrt(c)) Q1 Q2^T with [Q1; Q2] the
    orthonormal factor of the stack. Algebraically identical to the
    Z-solve, numerically anchored to the stack (cond ~ sqrt(c_k)) instead
    of Z (cond ~ c_k): see Config.qr_switch."""
    n = x.shape[1]
    sc = math.sqrt(c)
    impl = chol_cfg.summa_impl
    # pass 1: Gram of the stack IS Z; Q1 = sqrt(c) X R1inv, Q2 = R1inv.
    # The +delta*I is the shifted-CholeskyQR regularization (Fukaya et al.
    # 2020): cond(Z) ~ c_k can exceed 1/eps for tight l0 (the sign-function
    # use, algs/eigh.py), where an unshifted Cholesky returns NaN. The
    # stack's identity block keeps sigma_min >= 1, so the shifted pass-1
    # factor has cond ~ sqrt(delta) = O(sqrt(eps*c)) and pass 2 restores
    # orthonormality of the TRUE stack to working accuracy.
    delta = 20.0 * _gram_eps(x.dtype) * (1.0 + c)
    eye = grid.constrain(jnp.eye(n, dtype=x.dtype), grid.slice_spec)
    z = summa.syrk(grid, x, c=eye, alpha=c, beta=1.0 + delta, impl=impl)
    _, r1inv = _cholinv.factor(grid, z, chol_cfg)
    q1 = summa.trmm(grid, r1inv, (sc * x).astype(x.dtype), side="R",
                    uplo="U", impl=impl)
    q2 = grid.constrain(jnp.triu(r1inv), grid.slice_spec)
    # pass 2: re-Gram the near-orthonormal stack, correct both halves
    g2 = summa.syrk(grid, q1, impl=impl)
    g2 = summa.syrk(grid, q2, c=g2, beta=1.0, impl=impl)
    _, r2inv = _cholinv.factor(grid, g2, chol_cfg)
    q1 = summa.trmm(grid, r2inv, q1, side="R", uplo="U", impl=impl)
    # W = R1inv R2inv is upper triangular: the Q1 Q2^T product stays a trmm
    w = summa.trmm(grid, r2inv, q2, side="R", uplo="U", impl=impl)
    y = summa.trmm(grid, jnp.triu(w), q1, side="R", uplo="U", trans_a=True,
                   impl=impl)
    return ((b / c) * x + ((a - b / c) / sc) * y).astype(x.dtype)


def _zsolve_1d(grid: Grid, x, cscale, cfg: Config, delta: float = 0.0):
    """(Z, Rinv of Z) for Z = (1 + delta) I + c X^T X, replicated; X
    row-sharded. delta > 0 is the shifted-CholeskyQR regularization used
    by the stacked-CQR2 step (see _cqr2_step_2d) — the plain Halley solve
    runs unshifted (c <= qr_switch keeps Z well-conditioned there)."""
    n = x.shape[1]
    g = _cacqr.gram_1d(grid, x, "allreduce", kernel="auto")
    z = cscale * g.astype(jnp.promote_types(g.dtype, jnp.float32)) \
        + (1.0 + delta) * jnp.eye(n, dtype=jnp.promote_types(g.dtype,
                                                             jnp.float32))
    z = z.astype(x.dtype)
    _, rinv = lapack.chol_inv(z, lower=False, platform=grid.platform)
    return z, rinv


def _apply_zinv_1d(grid: Grid, x, rinv):
    """X Rinv Rinv^T with X row-sharded, Rinv replicated (local trmms —
    the Pallas triangle kernel inside the per-device scope)."""
    def kern(x_blk, t_rep):
        y = blas.trmm(t_rep, x_blk, side="R", uplo="U",
                      platform=grid.platform)
        return blas.trmm(t_rep, y, side="R", uplo="U", trans_a=True,
                         platform=grid.platform)

    f = jax.shard_map(kern, mesh=grid.mesh,
                      in_specs=(P(ALL_AXES, None), P(None, None)),
                      out_specs=P(ALL_AXES, None), check_vma=False)
    return f(x, rinv)


def _halley_step_1d(grid: Grid, x, a, b, c, cfg: Config):
    _, rinv = _zsolve_1d(grid, x, c, cfg)
    y = _apply_zinv_1d(grid, x, rinv)
    return grid.constrain(((b / c) * x + (a - b / c) * y).astype(x.dtype),
                          P(ALL_AXES, None))


def _cqr2_step_1d(grid: Grid, x, a, b, c, cfg: Config):
    """1D-layout QR-variant Halley step (see _cqr2_step_2d): stacked
    CholeskyQR2 of [sqrt(c) X; I] with X row-sharded and the n x n half
    replicated — two Gram psums, everything else row-local."""
    n = x.shape[1]
    sc = math.sqrt(c)
    row_spec = P(ALL_AXES, None)
    # pass 1: the stack's Gram IS Z = I + c X^T X (+ the sCQR shift, see
    # _cqr2_step_2d)
    delta = 20.0 * _gram_eps(x.dtype) * (1.0 + c)
    _, r1inv = _zsolve_1d(grid, x, c, cfg, delta=delta)
    q2 = jnp.triu(r1inv)

    def scale_trmm(x_blk, t_rep):
        return blas.trmm(t_rep, (sc * x_blk).astype(x_blk.dtype), side="R",
                         uplo="U", platform=grid.platform)

    q1 = jax.shard_map(scale_trmm, mesh=grid.mesh,
                       in_specs=(row_spec, P(None, None)),
                       out_specs=row_spec, check_vma=False)(x, r1inv)
    # pass 2: re-Gram the near-orthonormal stack, correct both halves
    g2 = _cacqr.gram_1d(grid, q1, "allreduce", kernel="auto")
    g2 = blas.syrk(q2, c=g2, beta=1.0, platform=grid.platform)
    _, r2inv = lapack.chol_inv(g2.astype(x.dtype), lower=False,
                               platform=grid.platform)
    # W = R1inv R2inv is upper triangular; Y = Q1 (Q2 R2inv)^T = Q1 W^T
    w = jnp.triu(blas.trmm(r2inv, q2, side="R", uplo="U",
                           platform=grid.platform))

    def finish(x_blk, q1_blk, r2_rep, w_rep):
        q1c = blas.trmm(r2_rep, q1_blk, side="R", uplo="U",
                        platform=grid.platform)
        y = blas.trmm(w_rep, q1c, side="R", uplo="U", trans_a=True,
                      platform=grid.platform)
        return ((b / c) * x_blk
                + ((a - b / c) / sc) * y).astype(x_blk.dtype)

    f = jax.shard_map(finish, mesh=grid.mesh,
                      in_specs=(row_spec, row_spec, P(None, None),
                                P(None, None)),
                      out_specs=row_spec, check_vma=False)
    return grid.constrain(f(x, q1, r2inv, w), row_spec)


def _ns_polish(grid: Grid, x, layout: str, cfg: Config):
    """One Newton-Schulz sweep X <- 1.5 X - 0.5 X (X^T X): quadratic
    orthogonality contraction on a near-orthogonal iterate."""
    if layout == "1d":
        g = _cacqr.gram_1d(grid, x, "allreduce", kernel="auto")

        def kern(x_blk, g_rep):
            return (1.5 * x_blk - 0.5 * _pdot(x_blk, g_rep).astype(
                x_blk.dtype)).astype(x_blk.dtype)

        f = jax.shard_map(kern, mesh=grid.mesh,
                          in_specs=(P(ALL_AXES, None), P(None, None)),
                          out_specs=P(ALL_AXES, None), check_vma=False)
        return f(x, g)
    g = summa.syrk(grid, x, impl=cfg.chol.summa_impl)
    xg = summa.gemm(grid, x, g, impl=cfg.chol.summa_impl)
    return grid.constrain((1.5 * x - 0.5 * xg).astype(x.dtype),
                          grid.slice_spec)


def _resolve_layout(grid: Grid, x, layout: str) -> str:
    if layout != "auto":
        return layout
    m, n = x.shape
    if grid.num_devices == 1:
        return "2d"
    from capital_tpu.validate import _is_row_sharded
    if _is_row_sharded(x) or m >= 4 * n:
        return "1d"
    return "2d"


def polar(grid: Grid, a, cfg: Config = Config(), layout: str = "auto"):
    """A = U H: U with orthonormal columns (m x n, m >= n), H symmetric
    positive semidefinite (n x n). Returns (U, H), or just U when
    cfg.compute_h=False.

    layout: '2d' (slice-sharded, distributed Gram/cholinv), '1d'
    (row-sharded tall-skinny, replicated n x n solves), 'auto'.
    """
    if isinstance(a, DistMatrix):
        a = a.data
    m, n = a.shape
    if m < n:
        raise ValueError(f"polar needs m >= n, got {a.shape}")
    layout = _resolve_layout(grid, a, layout)

    # alpha >= sigma_max: Frobenius bound. Traced scalar; weights are static.
    alpha = jnp.sqrt(jnp.sum(jnp.square(a.astype(jnp.float32))))
    x = (a / alpha.astype(a.dtype)).astype(a.dtype)

    l0 = cfg.resolve_l0(a.dtype)
    schedule = qdwh_weights(l0, a.dtype, cfg.max_iter)
    esz = jnp.dtype(a.dtype).itemsize
    with tracing.phase("POLAR::qdwh"):
        tracing.record(
            "qdwh",
            flops=len(schedule) * (2.0 * m * n * n + 2.0 * n**3 / 3.0
                                   + 2.0 * m * n * n) / grid.num_devices,
            comm_bytes=len(schedule) * tracing.psum_bytes(
                n * n * esz, grid.num_devices),
            msgs=len(schedule),
        )
        for (wa, wb, wc) in schedule:
            # large c_k: Z = I + c X^T X is not representable accurately in
            # the working dtype — take the QR-variant (stacked CQR2) step
            if wc > cfg.qr_switch:
                if layout == "1d":
                    x = _cqr2_step_1d(grid, x, wa, wb, wc, cfg)
                else:
                    x = _cqr2_step_2d(grid, x, wa, wb, wc, cfg.chol)
            elif layout == "1d":
                x = _halley_step_1d(grid, x, wa, wb, wc, cfg)
            else:
                x = _halley_step_2d(grid, x, wa, wb, wc, cfg.chol)
    with tracing.phase("POLAR::polish"):
        for _ in range(cfg.ns_polish):
            x = _ns_polish(grid, x, layout, cfg)

    if not cfg.compute_h:
        return x

    with tracing.phase("POLAR::formH"):
        if layout == "1d":
            h = _cacqr.apply_q(grid, x, a, trans=True, layout="1d",
                               out_dtype=jnp.promote_types(a.dtype,
                                                           jnp.float32))
            h = h.astype(a.dtype)
            h = 0.5 * (h + h.T)
        else:
            h = summa.syrk2(grid, x, a, impl=cfg.chol.summa_impl)
            ht = summa.transpose(grid, h, impl=cfg.chol.summa_impl)
            h = grid.constrain(0.5 * (h + ht), grid.slice_spec)
    return x, h.astype(a.dtype)


# jit-wrapped entry: the sweep is pure traced JAX (weights are trace-time
# constants). Compiled, XLA liveness-analyzes the whole iteration — eager
# dispatch holds ~5 live (m, n) iterates and OOMs 16-GB HBM at
# 2^18 x 2048 f32, where the compiled sweep peaks at ~3.
polar_jit = jax.jit(polar, static_argnames=("grid", "cfg", "layout"))
