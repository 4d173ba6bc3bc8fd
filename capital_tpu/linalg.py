"""High-level solver API on top of the factorization engine.

The reference stops at factorizations (no solve/lstsq entry points — its
TRSM is a stub, src/alg/trsm/diaginvert/diaginvert.hpp:9). A user switching
from it still needs the standard endpoints, so this module provides them,
built from the framework's own schedules:

  spd_solve:  A x = b for SPD A      — cholinv once, then two triangular
              multiplies with the *explicit inverse* (the whole point of
              computing R^{-1} alongside R: solves become GEMMs, no
              back-substitution chain).
  lstsq:      min ||A x - b||_2 for tall-skinny A — CholeskyQR2 + R^{-1}
              application (x = R^{-1} Q^T b).
  inv:        A^{-1} for SPD A       — Rinv Rinv^T.
  pinv:       Moore-Penrose pseudo-inverse — QDWH-SVD with a relative
              rank cutoff (algs/svd.py).
  cond:       spectral condition number — singular values only.
  spd_sqrt:   principal square root (and inverse square root) of an SPD
              matrix — eigh-based V f(Λ) V^T (algs/eigh.py).

All distributed, jit-friendly, and validated in tests against dense oracles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from capital_tpu.grid import Grid, ALL_AXES
from capital_tpu.matrix import DistMatrix
from capital_tpu.algs import cacqr, cholinv
from capital_tpu.ops import blas
from capital_tpu.parallel import summa


def _arr(x):
    return x.data if isinstance(x, DistMatrix) else x


def spd_solve(grid: Grid, a, b, cfg: cholinv.Config | None = None,
              refine: int = 0, factor=None):
    """x = A^{-1} b for SPD A ((n, n) sharded on the slice; b (n, k)).

    A = R^T R  =>  x = R^{-1} (R^{-T} b): two summa TRMMs against the
    explicit inverse — communication-avoiding in the same way the
    reference's TRSM step is (cholinv.hpp:116-123).

    refine: number of iterative-refinement sweeps
        x <- x + R^{-1} R^{-T} (b - A x), with the residual gemm pinned to
    HIGHEST matmul precision. Each sweep costs three n²k-class products —
    negligible next to the n³ factorization for k << n — and contracts the
    solve error by ~kappa(A)·eps_factor, so a factorization computed at
    the fast 3-pass 'high' precision (or reused in bf16) recovers
    HIGHEST-class solve residuals in 1-2 sweeps. Classic Wilkinson mixed-
    precision refinement; the reference has no solve path at all (its TRSM
    is a stub, diaginvert.hpp:9).

    factor: optional precomputed (R, Rinv) pair — reuse one factorization
    across many right-hand sides."""
    a, b = _arr(a), _arr(b)
    vec = b.ndim == 1
    if vec:
        b = b[:, None]  # numpy convention: 1-D in, 1-D out (see solve)
    cfg = cfg or cholinv.Config(summa_impl="gspmd")
    if factor is None:
        _, rinv = cholinv.factor(grid, a, cfg)
    else:
        _, rinv = factor

    def apply_inv(v):
        y = summa.trmm(grid, rinv, v, side="L", uplo="U", trans_a=True,
                       impl=cfg.summa_impl)
        return summa.trmm(grid, rinv, y, side="L", uplo="U",
                          impl=cfg.summa_impl)

    x = apply_inv(b)
    for _ in range(refine):
        # the residual must be computed MORE accurately than the factor
        # or refinement stalls; pin its gemm to 6-pass f32
        with jax.default_matmul_precision("highest"):
            res = b - summa.gemm(grid, a, x, impl=cfg.summa_impl)
        x = x + apply_inv(res)
    return x[:, 0] if vec else x


def inv(grid: Grid, a, cfg: cholinv.Config | None = None):
    """A^{-1} for SPD A: Rinv Rinv^T (one extra summa gemm after cholinv)."""
    a = _arr(a)
    cfg = cfg or cholinv.Config(summa_impl="gspmd")
    _, rinv = cholinv.factor(grid, a, cfg)
    rinv_t = summa.transpose(grid, jnp.triu(rinv), impl=cfg.summa_impl)
    return summa.gemm(grid, jnp.triu(rinv), rinv_t, impl=cfg.summa_impl)


def pinv(grid: Grid, a, rcond: float | None = None, cfg=None,
         layout: str = "auto"):
    """Moore-Penrose pseudo-inverse A^+ ((n, m) for (m, n) A, m >= n) via
    QDWH-SVD: A^+ = V diag(1/s) U^T with singular values below
    rcond * s_max treated as exactly 0 (numpy.linalg.pinv semantics;
    rcond default: n * eps of the working dtype)."""
    from capital_tpu.algs import svd as _svd

    a = _arr(a)
    m, n = a.shape
    cfg = cfg or _svd.Config()
    u, s, v = _svd.svd(grid, a, cfg, layout=layout)
    if rcond is None:
        rcond = n * float(jnp.finfo(a.dtype).eps)
    cut = rcond * s[0]
    sinv = jnp.where(s > cut, 1.0 / jnp.maximum(s, jnp.finfo(s.dtype).tiny),
                     0.0).astype(a.dtype)
    # A^+ = (V diag(1/s)) U^T — scale the small factor, one distributed gemm
    vs = grid.constrain(v * sinv[None, :], grid.slice_spec)
    if u.shape[0] == u.shape[1]:
        uT = summa.transpose(grid, u, impl="gspmd")
        return summa.gemm(grid, vs, uT, impl="gspmd")
    # tall-skinny 1d: keep the big factor row-sharded — compute the
    # row-sharded (A^+)^T = U (V diag(1/s))^T and hand back its (lazy)
    # transpose, sharded over columns
    from capital_tpu.ops.precision import dot as _pdot

    up = _pdot(u, vs.T).astype(a.dtype)
    return grid.constrain(up, P(ALL_AXES, None)).T


def cond(grid: Grid, a, cfg=None, layout: str = "auto"):
    """Spectral condition number s_max / s_min via QDWH-SVD singular
    values (values-only path: no U/V rotation gemm, no eigenvector
    corrections — svd.singular_values)."""
    from capital_tpu.algs import svd as _svd

    a = _arr(a)
    cfg = cfg or _svd.Config()
    s = _svd.singular_values(grid, a, cfg, layout=layout)
    return (s[0] / s[-1]).astype(jnp.float32)


def funm_spd(grid: Grid, a, fn, cfg=None, clamp_min: float = 0.0):
    """f(A) = V f(Λ) V^T for symmetric A via the distributed eigensolver
    (the generic spectral-function primitive; `fn` maps the eigenvalue
    vector elementwise, in f32). Eigenvalues are clamped to >= clamp_min
    first — pass -inf to disable (indefinite operands with an fn defined
    on the whole line)."""
    from capital_tpu.algs import eigh as _eigh

    a = _arr(a)
    cfg = cfg or _eigh.Config()
    w, v = _eigh.eigh(grid, a, cfg)
    w = jnp.maximum(w.astype(jnp.float32), clamp_min)
    f = fn(w)
    vf = grid.constrain(v * f.astype(a.dtype)[None, :], grid.slice_spec)
    vt = summa.transpose(grid, v, impl="gspmd")
    out = summa.gemm(grid, vf, vt, impl="gspmd")
    # exact symmetry (the product is symmetric up to rounding)
    outT = summa.transpose(grid, out, impl="gspmd")
    return grid.constrain(0.5 * (out + outT), grid.slice_spec)


def spd_sqrt(grid: Grid, a, cfg=None, inverse: bool = False):
    """Principal square root A^{1/2} (or inverse square root A^{-1/2}) of
    an SPD matrix: funm_spd with f = sqrt / rsqrt. The whitening/
    preconditioning primitive (e.g. ZCA) the factor stack enables."""
    tiny = jnp.finfo(jnp.float32).tiny
    fn = ((lambda w: jax.lax.rsqrt(jnp.maximum(w, tiny))) if inverse
          else jnp.sqrt)
    return funm_spd(grid, a, fn, cfg=cfg)


def logm_spd(grid: Grid, a, cfg=None):
    """Principal matrix logarithm of an SPD matrix (funm_spd with log)."""
    tiny = jnp.finfo(jnp.float32).tiny
    return funm_spd(grid, a, lambda w: jnp.log(jnp.maximum(w, tiny)),
                    cfg=cfg)


def powm_spd(grid: Grid, a, p: float, cfg=None):
    """A^p for SPD A and real p (funm_spd with the real power)."""
    tiny = jnp.finfo(jnp.float32).tiny
    return funm_spd(grid, a, lambda w: jnp.power(jnp.maximum(w, tiny), p),
                    cfg=cfg)


def solve(grid: Grid, a, b, method: str = "auto", refine: int = 2,
          cfg: cholinv.Config | None = None, polar_cfg=None,
          factor_dtype=None):
    """x = A^{-1} b for GENERAL square A ((n, n) slice-sharded; b (n, k)).

    The reference factors only SPD (cholinv) and tall-skinny (cacqr)
    operands; a general solver is the natural completion, built
    TPU-natively from the same engines:

    method='normal' (default for `auto`): factor the SPD Gram A^T A with
        cholinv and refine on the TRUE residual,
            x <- x + (A^T A)^{-1} A^T (b - A x),
        residual gemm pinned to HIGHEST. Cost: one n^3/3-class factor + 2
        gemms per sweep. Stable while cond(A)^2 * eps_factor < 1 (f32
        HIGHEST factor: cond(A) up to ~1e3; each sweep contracts the
        error by ~cond^2 * eps).
    method='lu': P A = L U with EXACT partial pivoting (algs/lu.py:
        replicated-panel factorization + summa Schur updates — the
        pivoting's per-row message traffic, the reason CALU invented
        tournament pivoting, vanishes when the skinny panel is replicated)
        + two TRSM substitutions + refinement sweeps. 2n^3/3 flops, the
        backward-stable general route; cond-robust where the normal
        equations square the conditioning.
    method='polar': A = U H (QDWH), x = H^{-1} (U^T b) via spd_solve on
        the polar factor — cond(H) = cond(A), so this holds to
        cond ~ 1e5-class f32 at ~6x the normal-equation cost.

    factor_dtype (method='lu' only): factor a downcast copy of A (e.g.
        jnp.bfloat16 — 1.8x the f32 factor rate on the MXU) and refine
        the solve against the ORIGINAL A at f32-faithful precision — the
        Wilkinson low-precision-factor recipe already proven for SPD
        operands in spd_solve. CAVEAT, measured (BENCH_LOCAL.md): LU's
        partial-pivoting element growth times bf16 eps makes the bf16
        factors too inaccurate for the refinement to contract at
        n >= ~16k on random operands — the sweeps stall at 1e-1-class
        residuals. Use for small n or well-conditioned structured A;
        the f32 factor is the production route.
    """
    a, b = _arr(a), _arr(b)
    vec = b.ndim == 1
    if vec:
        # numpy convention: 1-D b in, 1-D x out. Returning (n, 1) here
        # is a correctness trap — `a @ x - b` then BROADCASTS to (n, n)
        # and the user's residual check silently measures nonsense.
        b = b[:, None]
    cfg = cfg or cholinv.Config(summa_impl="gspmd")
    impl = cfg.summa_impl
    if method == "auto":
        method = "normal"
    if method == "polar":
        from capital_tpu.algs import polar as _polar

        pcfg = polar_cfg or _polar.Config(chol=cfg)
        u, h = _polar.polar_jit(grid, a, pcfg, layout="2d")
        utb = summa.gemm(grid, summa.transpose(grid, u, impl=impl), b,
                         impl=impl)
        xp = spd_solve(grid, h, utb, cfg=cfg, refine=refine)
        return xp[:, 0] if vec else xp
    if method == "lu":
        from capital_tpu.algs import lu as _lu

        wsrc = a if factor_dtype is None else a.astype(factor_dtype)
        w, perm, _ = _lu.factor(grid, wsrc, _lu.Config(summa_impl=impl))
        if w.dtype != a.dtype:
            w = w.astype(a.dtype)  # substitutions at operand precision
        x = _lu.solve_factored(grid, w, perm, b)
        for _ in range(refine):
            with jax.default_matmul_precision("highest"):
                res = b - summa.gemm(grid, a, x, impl=impl)
            x = x + _lu.solve_factored(grid, w, perm, res)
        return x[:, 0] if vec else x
    if method != "normal":
        raise ValueError(f"unknown solve method {method!r}")

    at = summa.transpose(grid, a, impl=impl)
    with jax.default_matmul_precision("highest"):
        gram = summa.gemm(grid, at, a, impl=impl)
    _, rinv = cholinv.factor(grid, gram, cfg)

    def apply_pinv(v):
        atv = summa.gemm(grid, at, v, impl=impl)
        y = summa.trmm(grid, rinv, atv, side="L", uplo="U", trans_a=True,
                       impl=impl)
        return summa.trmm(grid, rinv, y, side="L", uplo="U", impl=impl)

    x = apply_pinv(b)
    for _ in range(refine):
        with jax.default_matmul_precision("highest"):
            res = b - summa.gemm(grid, a, x, impl=impl)
        x = x + apply_pinv(res)
    return x[:, 0] if vec else x


# Pade-13 coefficients of exp (Higham 2005, the scipy/LAPACK table)
_EXPM_B13 = (
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0,
    670442572800.0, 33522128640.0, 1323241920.0, 40840800.0,
    960960.0, 16380.0, 182.0, 1.0,
)


def expm(grid: Grid, a, cfg: cholinv.Config | None = None,
         solve_refine: int = 2):
    """Matrix exponential e^A for square A (slice-sharded), by
    scaling-and-squaring with the degree-13 Pade approximant (Higham,
    SIAM J. Matrix Anal. 26(4), 2005 — the scipy.linalg.expm algorithm),
    distributed: six summa gemms for the powers/polynomials, one general
    `solve` for the Pade quotient, s squaring gemms. The scaling exponent
    s comes from the 1-norm (one host sync — the same host-orchestration
    tier as the eigensolver's shifts)."""
    a = _arr(a)
    n = a.shape[0]
    if a.shape != (n, n):
        raise ValueError(f"expm needs a square matrix, got {a.shape}")
    cfg = cfg or cholinv.Config(summa_impl="gspmd")
    impl = cfg.summa_impl
    theta13 = 5.371920351148152
    norm1 = float(jnp.max(jnp.sum(jnp.abs(a.astype(jnp.float32)), axis=0)))
    import math as _math

    s = max(0, int(_math.ceil(_math.log2(max(norm1, 1e-30) / theta13)))) \
        if norm1 > theta13 else 0
    x = (a / jnp.asarray(2.0**s, a.dtype)).astype(a.dtype)

    def mm(p, q):
        return summa.gemm(grid, p, q, impl=impl)

    b = _EXPM_B13
    eye = grid.constrain(jnp.eye(n, dtype=x.dtype), grid.slice_spec)
    x2 = mm(x, x)
    x4 = mm(x2, x2)
    x6 = mm(x2, x4)
    w1 = b[13] * x6 + b[11] * x4 + b[9] * x2
    w2 = b[7] * x6 + b[5] * x4 + b[3] * x2 + b[1] * eye
    u = mm(x, mm(x6, w1) + w2)
    z1 = b[12] * x6 + b[10] * x4 + b[8] * x2
    v = mm(x6, z1) + b[6] * x6 + b[4] * x4 + b[2] * x2 + b[0] * eye
    # r13 = (V - U)^{-1} (V + U); V - U is well-conditioned for the
    # scaled operand (||X|| <= theta13)
    r = solve(grid, v - u, v + u, method="normal", refine=solve_refine,
              cfg=cfg)
    r = grid.constrain(r.astype(a.dtype), grid.slice_spec)
    for _ in range(s):
        r = mm(r, r)
    return r


def slogdet_spd(grid: Grid, a, cfg: cholinv.Config | None = None,
                factor=None):
    """(sign=1, log|det A|) for SPD A: 2 * sum(log diag R) from the
    cholinv factor (reusable via factor=(R, Rinv))."""
    a = _arr(a)
    cfg = cfg or cholinv.Config(summa_impl="gspmd")
    r = (factor or cholinv.factor(grid, a, cfg))[0]
    d = jnp.diagonal(r).astype(jnp.float32)
    return jnp.float32(1.0), 2.0 * jnp.sum(jnp.log(jnp.maximum(
        d, jnp.finfo(jnp.float32).tiny)))


def nearest_orthogonal(grid: Grid, a, cfg=None, layout: str = "auto"):
    """The orthogonal matrix closest to A in Frobenius norm = A's polar
    factor U (Fan-Hoffman; the Procrustes primitive). One QDWH sweep."""
    from capital_tpu.algs import polar as _polar

    import dataclasses

    cfg = cfg or _polar.Config()
    if cfg.compute_h:
        cfg = dataclasses.replace(cfg, compute_h=False)
    a = _arr(a)
    # resolve 'auto' eagerly: inside the jitted sweep tracers carry no
    # committed sharding for _resolve_layout to inspect
    layout = _polar._resolve_layout(grid, a, layout)
    return _polar.polar_jit(grid, a, cfg, layout=layout)


def nearest_psd(grid: Grid, a, cfg=None):
    """The symmetric positive-semidefinite matrix closest to A in
    Frobenius norm (Higham 1988): X = (B + H)/2 with B = (A + A^T)/2 and
    H the polar hermitian factor of B. One QDWH sweep + a transpose."""
    from capital_tpu.algs import polar as _polar

    cfg = cfg or _polar.Config()
    a = _arr(a)
    at = summa.transpose(grid, a, impl="gspmd")
    b = grid.constrain(0.5 * (a + at), grid.slice_spec)
    _, h = _polar.polar_jit(grid, b, cfg, layout="2d")
    x = grid.constrain(0.5 * (b + h), grid.slice_spec)
    xt = summa.transpose(grid, x, impl="gspmd")
    return grid.constrain(0.5 * (x + xt), grid.slice_spec)


def lstsq(grid: Grid, a, b, cfg: cacqr.Config | None = None,
          refine: int = 0, method: str = "cqr2"):
    """min ||A x - b||_2 for tall-skinny A ((m, n) row-sharded over the full
    mesh, m >> n; b (m, k) sharded likewise). x is (n, k) replicated.

    CholeskyQR2 gives Q (row-sharded) and R (replicated):
    x = R^{-1} Q^T b — the Q^T b product is one psum over the mesh
    (apply_QT, which the reference left unimplemented).

    method: 'cqr2' (CholeskyQR2 — the fast MXU path, cond(A) <= ~1e5 f32)
    or 'tsqr' (Householder tree QR, algs/tsqr.py — unconditionally
    stable; use for ill-conditioned design matrices).

    refine: iterative-refinement sweeps on the normal-equations residual:
        x <- x + R^{-1} Q^T (b - A x), residual gemm pinned to HIGHEST.
    Each sweep is two mnk-class products (row-local; one psum for Q^T r) —
    cheap next to the 4mn² factorization for k << n."""
    a, b = _arr(a), _arr(b)
    vec = b.ndim == 1
    if vec:
        b = b[:, None]  # numpy convention: 1-D in, 1-D out (see solve)
    cfg = cfg or cacqr.Config(num_iter=2)
    if method == "tsqr":
        from capital_tpu.algs import tsqr as _tsqr

        q, r = _tsqr.factor(grid, a)
    elif method == "cqr2":
        q, r = cacqr.factor_1d(grid, a, cfg)
    else:
        raise ValueError(f"unknown lstsq method {method!r}")

    def solve_r(rhs):
        # R is small and replicated — local triangular solve
        return jax.lax.linalg.triangular_solve(
            jnp.triu(r).astype(jnp.float32), rhs.astype(jnp.float32),
            left_side=True, lower=False)

    x = solve_r(cacqr.apply_q(grid, q, b, trans=True, cfg=cfg, layout="1d"))
    for _ in range(refine):
        with jax.default_matmul_precision("highest"):
            from capital_tpu.ops.precision import dot as _pdot

            res = b - _pdot(a, x.astype(a.dtype)).astype(a.dtype)
        x = x + solve_r(
            cacqr.apply_q(grid, q, res, trans=True, cfg=cfg, layout="1d"))
    x = x.astype(a.dtype)
    return x[:, 0] if vec else x
