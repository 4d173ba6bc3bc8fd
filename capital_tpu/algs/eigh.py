"""Symmetric eigensolver: spectral divide-and-conquer on QDWH polar.

The reference's capability frontier is factorizations (Cholesky, QR); the
canonical next rung in the communication-avoiding literature — built from
EXACTLY the kernels this framework already has — is the QDWH-based spectral
divide-and-conquer eigensolver (Nakatsukasa & Higham, SIAM J. Sci. Comput.
35(3), 2013): every step is Gram + cholinv + triangular multiplies, so the
whole eigensolver rides the summa engine, the Pallas triangle kernels and
the distributed cholinv schedule (ref: the same substrate as cacqr.hpp +
cholinv.hpp), distributed over the same meshes.

Algorithm (QDWH-eig):
  1. pick a shift sigma inside the spectrum (median of the diagonal,
     bisection-safeguarded on the Gershgorin interval);
  2. U = polar factor of A - sigma I. For symmetric argument U = sign(A -
     sigma I): a symmetric involution whose +1/-1 eigenspaces are the
     invariant subspaces above/below sigma (tests/test_polar.py asserts the
     involution property);
  3. P = (I + U)/2 is the spectral projector onto eigenvalues > sigma;
     k = round(trace(P)) = (n + trace(U))/2 eigenvalues lie above sigma;
  4. split: draw Gaussian G, orthonormalize Y = [P G_1 | (I-P) G_2]
     (k and n-k columns — the two ranges are exact orthogonal
     complements, so Y is well-conditioned) by CholeskyQR2 → orthogonal
     V = [V1 V2]; rotate B = V^T A V, which is block-diagonal up to the
     polar backward error;
  5. recurse on B_11 (k x k) and B_22, gluing eigenvectors back through V;
  6. base case: blocks <= cfg.base_n are gathered replicated and handed to
     the local dense eigensolver on every device — the ReplicateCommComp
     placement (ref: cholinv base-case policy.h:160-224).

Shapes are data-dependent (k comes from the spectrum), so the recursion is
host-orchestrated: each level runs two jit-compiled stages with k as a
static shape — stage 1 (polar + trace) and stage 2 (split + rotate). This
mirrors how the reference drives its recursion from the host rank program
(cholinv.hpp:87-165); per-level compiles are amortized by the n^3 polar
work, and repeated solves at the same (n, k) hit jax's jit cache.

Eigenvalues return ascending (numpy.linalg.eigh convention); backward
error is O(eps ||A||) in the working dtype — f32 residuals land at the
1e-6||A|| class, f64 at 1e-14 (tests/test_eigh.py, both oracle-checked).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid
from capital_tpu.matrix import DistMatrix
from capital_tpu.algs import cholinv as _cholinv
from capital_tpu.algs import polar as _polar
from capital_tpu.parallel import summa


@dataclass(frozen=True)
class Config:
    """Knobs of the divide-and-conquer eigensolver.

    base_n:      blocks at or below this are solved replicated by the local
                 dense eigensolver (every device redundantly — the
                 ReplicateCommComp placement, ref: policy.h:160-224).
                 None -> platform default: 2048 on TPU (the measured
                 D&C-vs-dense crossover, BENCH_LOCAL.md), 256 elsewhere.
    shift_tries: bisection safeguard steps when a shift lands outside the
                 spectrum (each retry costs one polar — rare in practice).
    cluster_rel: blocks whose Gershgorin interval is narrower than
                 cluster_rel * ||A|| are declared converged clusters
                 (eigenvalues = diagonal, eigenvectors = identity) instead
                 of being split further. None -> 40 * dtype eps.
    min_split:   reject shifts splitting off fewer than this fraction of a
                 block (a lopsided split wastes a full polar); bisect
                 instead.
    sign_l0:     l0 handed to the sign-function QDWH. None -> 10 * dtype
                 eps. This must sit at the dtype's resolution, NOT polar's
                 general-purpose 1e-5 default: eigenvalues within l0 * ||A -
                 sigma I||_F of the shift get sign values short of +-1,
                 leaking across the split — at a dense (Wigner-class)
                 spectrum the nearest gap is ~width/n, and l0=1e-5 cost
                 3 decades of eigenpair residual at n=8192 (3.8e-3 vs
                 3.5e-6 measured on-chip). The tighter l0 adds 1-2 QDWH
                 iterations (the early ones via the stacked-CQR2 step).
    off_tol:     accept a split only if the rotated off-diagonal coupling
                 ||B21||_F <= off_tol * ||A||_F; larger means the invariant
                 subspaces leaked (shift in a cluster / rank-deficient
                 splitting basis) and the shift is retried.
    polar:       nested QDWH config (the sign-function engine). Its `chol`
                 member is the cholinv schedule used for every Z-solve.
    seed:        base PRNG seed for the splitting Gaussians (counter-based,
                 deterministic across meshes — same property as the
                 reference's coordinate-seeded distributions,
                 structure.hpp:80-85).
    """

    base_n: int | None = None
    shift_tries: int = 4
    cluster_rel: float | None = None
    min_split: float = 0.05
    sign_l0: float | None = None
    off_tol: float = 1e-3
    # first-order cross-split eigenvector correction at glue time (see
    # _glue): recovers the coupling each accepted split discarded for
    # ~15% extra flops per level. On by default; the knob exists for
    # apples-to-apples ablation.
    correct_splits: bool = True
    # eigh_partial: residual-augmented Rayleigh-Ritz sweeps after the
    # child solve (_rr_refine) — O(n^2 k) gemms that recover the split
    # coupling the one-sided extraction cannot otherwise correct (the full
    # solver's cross-split correction needs the complement's eigenbasis,
    # which partial never computes).
    partial_refine: int = 2
    # eigh_partial: storage dtype for the sign PROBES and the split
    # rotation (e.g. 'bfloat16'). The QDWH sign iterates are the peak
    # live set (~3 n^2 buffers) — at n=32768 f32 they exceed 16-GB HBM,
    # while bf16 probes fit; a probe only needs the eigenvalue COUNT and
    # the split only an approximate invariant subspace, and the
    # partial_refine Rayleigh-Ritz sweeps re-extract eigenpairs against
    # the FULL-precision operand. None -> operand dtype.
    probe_dtype: str | None = None
    polar: _polar.Config = field(
        default_factory=lambda: _polar.Config(compute_h=False))
    seed: int = 7

    def resolve_cluster_rel(self, dtype) -> float:
        if self.cluster_rel is not None:
            return float(self.cluster_rel)
        return 40.0 * float(jnp.finfo(dtype).eps)

    def resolve_base_n(self, grid: Grid) -> int:
        if self.base_n is not None:
            return int(self.base_n)
        return 2048 if grid.platform in ("tpu", "axon") else 256

    def resolved(self, grid: Grid) -> "Config":
        """Config with base_n pinned to its platform value."""
        import dataclasses

        if self.base_n is not None:
            return self
        return dataclasses.replace(self, base_n=self.resolve_base_n(grid))

    def sign_polar_cfg(self, dtype) -> _polar.Config:
        """The polar config for sign(A - sigma I): cfg.polar with l0
        pinned to the sign resolution (see sign_l0) and at least two
        Newton-Schulz polish sweeps (each squares the involution error of
        U; one sweep costs 3n^3 — ~2% of the sign computation — and the
        split coupling it scrubs is the eigensolver's accuracy floor)."""
        import dataclasses

        l0 = self.sign_l0 if self.sign_l0 is not None else \
            10.0 * float(jnp.finfo(dtype).eps)
        return dataclasses.replace(self.polar, l0=l0,
                                   ns_polish=max(self.polar.ns_polish, 2))


def _spec(grid: Grid) -> P:
    return grid.slice_spec


# --------------------------------------------------------------------------
# jit stages (k, n static; cached by shape across recursion levels)
# --------------------------------------------------------------------------


def _split_align(grid: Grid) -> int:
    """Size multiple at which the summa shard_map/cholinv fast paths are
    happy: MXU tiles (128) x every mesh-divisibility the engines check."""
    out = 128
    for m in (grid.c * grid.d1, grid.c * grid.d2):
        out = out * m // math.gcd(out, m)
    return out


def _embed(grid: Grid, a, npad: int, diag: float):
    """blkdiag(A, diag * I) of size npad — EXACTLY decoupled padding that
    lets the aligned fast engines run on data-dependent block sizes. The
    pad block never leaves the jit stage that created it: callers slice
    the top-left n x n back out, so no pad eigenvalue enters the
    recursion (and zero/identity pads don't inflate any operand norm)."""
    n = a.shape[0]
    if npad == n:
        return a
    pad_rows = jnp.concatenate(
        [jnp.zeros((npad - n, n), a.dtype),
         diag * jnp.eye(npad - n, dtype=a.dtype)], axis=1)
    top = jnp.concatenate([a, jnp.zeros((n, npad - n), a.dtype)], axis=1)
    return grid.constrain(jnp.concatenate([top, pad_rows], axis=0),
                          _spec(grid))


@partial(jax.jit, static_argnames=("grid", "cfg"))
@partial(jax.jit, static_argnames=("grid", "cfg"))
def _stage_sign(grid: Grid, a, sigma, cfg: Config):
    """U = sign(A - sigma I) via QDWH polar; returns (U, trace(U)).

    Unaligned n runs the polar on blkdiag(A - sigma I, 0): sign() of a
    block-diagonal is block-diagonal, so the top-left slice is exact, and
    a zero pad adds nothing to ||.||_F (QDWH's alpha) or to the Z-solves
    (their pad diagonal is exactly 1).

    jitted: the QDWH sweep dispatched eagerly holds ~5 live (n, n)
    iterates (polar.py's polar_jit note) — at n=32768 that alone is the
    16-GB HBM; compiled, XLA's liveness analysis peaks at ~3 and the
    bf16-probe frontier run fits. One compile per (n, dtype), reused
    across all counting probes and recursion levels."""
    n = a.shape[0]
    shifted = grid.constrain(
        a - sigma.astype(a.dtype) * jnp.eye(n, dtype=a.dtype), _spec(grid))
    npad = -(-n // _split_align(grid)) * _split_align(grid)
    u = _polar.polar(grid, _embed(grid, shifted, npad, 0.0),
                     cfg.sign_polar_cfg(a.dtype), layout="2d")
    u = grid.constrain(u[:n, :n], _spec(grid))
    # re-symmetrize: sign(symmetric) is symmetric; the iteration's rounding
    # drift is cheap to scrub and keeps the projector ranges orthogonal
    u = grid.constrain(0.5 * (u + u.T), _spec(grid))
    return u, jnp.trace(u.astype(jnp.float32))


@partial(jax.jit, static_argnames=("grid", "cfg", "k"))
def _stage_split(grid: Grid, a, u, key, cfg: Config, k: int):
    """Given U = sign(A - sigma I) with k eigenvalues above sigma, build the
    orthogonal [V1 V2] and rotate: returns (B11, B22, V, offdiag_norm).

    The plain gemms run under the gspmd partitioner (any shape); only the
    CQR2 orthonormalization — Gram + cholinv + trmm — wants alignment, and
    gets it from an identity-embedded operand (CQR2 of blkdiag(Y, I) is
    blkdiag(CQR2(Y), I) exactly)."""
    n = a.shape[0]
    g = jax.random.normal(key, (n, n), dtype=a.dtype)
    g = grid.constrain(g, _spec(grid))
    ug = summa.gemm(grid, u, g, impl="gspmd")
    # columns of P+ G land in range(P+), of P- G in range(P-): exact
    # orthogonal complements, so [Y1 Y2] is full-rank and CQR2-friendly
    y = 0.5 * jnp.concatenate(
        [(g + ug)[:, :k], (g - ug)[:, k:]], axis=1).astype(a.dtype)
    y = grid.constrain(y, _spec(grid))
    v = _orthonormalize_2d(grid, y, cfg.polar.chol)
    av = summa.gemm(grid, a, v, impl="gspmd")
    b = summa.gemm(grid, grid.constrain(v.T, _spec(grid)), av, impl="gspmd")
    b = grid.constrain(b, _spec(grid))
    b11 = grid.constrain(0.5 * (b[:k, :k] + b[:k, :k].T), _spec(grid))
    b22 = grid.constrain(0.5 * (b[k:, k:] + b[k:, k:].T), _spec(grid))
    e21 = grid.constrain(b[k:, :k], _spec(grid))
    off = jnp.linalg.norm(e21.astype(jnp.float32))
    return b11, b22, v, e21, off


def _orthonormalize_2d(grid: Grid, y, chol_cfg: _cholinv.Config):
    """Shifted CholeskyQR3 of a slice-sharded square operand: passes of
    Gram -> cholinv -> trmm (the cacqr sweep shape, ref: cacqr.hpp:75-120,
    on the 2d layout). Unaligned operands are identity-embedded to the
    engine alignment and sliced back.

    The first pass shifts the Gram by O(eps ||Y||^2) I (Fukaya et al.,
    shifted CholeskyQR3, SIAM J. Sci. Comput. 42(1), 2020): the splitting
    operand [P+ G1 | P- G2] is a projected square Gaussian whose condition
    number has a heavy tail, and an unshifted first Cholesky dies (NaN)
    when cond(Y)^2 overflows the working precision. The shift keeps the
    factor finite; two further unshifted passes restore orthogonality to
    working accuracy."""
    impl = chol_cfg.summa_impl
    n = y.shape[0]
    npad = -(-n // _split_align(grid)) * _split_align(grid)
    q = _embed(grid, y, npad, 1.0)
    eps = float(jnp.finfo(y.dtype).eps)
    for p in range(3):
        # The Gram + Cholesky chain is the conditioning-critical part:
        # at ambient 'high'/'default' matmul precision its coarser
        # rounding NaNs the pass-1 factorization of the heavy-tailed
        # splitting operand (measured at n=8192), so pin it to HIGHEST;
        # the O(n^3) trmm application below keeps the ambient speed.
        with jax.default_matmul_precision("highest"):
            gram = summa.syrk(grid, q, impl=impl)
            if p == 0:
                shift = (20.0 * eps * jnp.trace(gram.astype(jnp.float32))
                         ).astype(gram.dtype)
                gram = gram + shift * jnp.eye(npad, dtype=gram.dtype)
                gram = grid.constrain(gram, _spec(grid))
            _, rinv = _cholinv.factor(grid, gram, chol_cfg)
        q = summa.trmm(grid, rinv, q, side="R", uplo="U", impl=impl)
    if npad != n:
        q = q[:n, :n]
    return grid.constrain(q, _spec(grid))


@partial(jax.jit, static_argnames=("grid",))
def _diag_and_bounds(grid: Grid, a):
    """(diag, Gershgorin lo, hi) of a slice-sharded symmetric matrix."""
    d = jnp.diagonal(a).astype(jnp.float32)
    radii = jnp.sum(jnp.abs(a.astype(jnp.float32)), axis=1) - jnp.abs(d)
    return d, jnp.min(d - radii), jnp.max(d + radii)


@partial(jax.jit, static_argnames=("grid",))
def _base_eigh(grid: Grid, a):
    """Replicated dense base case (ReplicateCommComp placement): every
    device redundantly eig-solves the gathered block."""
    rep = grid.constrain(a, P(None, None))
    w, v = jnp.linalg.eigh(rep)
    return w, grid.constrain(v, _spec(grid))


@partial(jax.jit, static_argnames=("grid", "k", "correct"))
def _glue(grid: Grid, v, v1, v2, w1, w2, e21, mu, k: int,
          correct: bool = True):
    """V @ blockdiag(V1, V2), plus the first-order cross-split eigenvector
    correction built from the coupling the split discarded.

    Accepting a split commits its off-diagonal block E as eigenpair
    residual (the accuracy floor the bench table documents). But once the
    CHILDREN have solved their blocks, standard first-order perturbation
    theory recovers it: with Etilde = V2^T E V1 the coupling in the child
    eigenbases,

        X1 <- X1 + X2 @ Theta,   X2 <- X2 - X1 @ Theta^T,
        Theta_ij = Etilde_ij * g / (g^2 + mu^2),  g = w1_j - w2_i,

    (Tikhonov-damped by mu ~ cluster_rel * ||A||, traced, so
    near-degenerate cross-pairs — whose mixing is harmless — do not blow
    up). The update is antisymmetric, so orthogonality degrades only at
    O(||Theta||^2). Cost: four gemms of child size — ~15% of a level.
    Measured effect is in BENCH_LOCAL.md.

    gspmd impl: the child blocks have data-dependent (unaligned) sizes."""
    left = summa.gemm(grid, v[:, :k], v1, impl="gspmd")
    right = summa.gemm(grid, v[:, k:], v2, impl="gspmd")
    if correct:
        et = summa.gemm(grid, grid.constrain(v2.T, _spec(grid)),
                        summa.gemm(grid, e21, v1, impl="gspmd"),
                        impl="gspmd").astype(jnp.float32)
        gap = w1[None, :].astype(jnp.float32) - w2[:, None].astype(
            jnp.float32)
        mu = mu.astype(jnp.float32)
        theta = (et * gap / (gap * gap + mu * mu)).astype(v.dtype)
        theta = grid.constrain(theta, _spec(grid))
        l2 = left + summa.gemm(grid, right, theta, impl="gspmd")
        right = right - summa.gemm(
            grid, left, grid.constrain(theta.T, _spec(grid)), impl="gspmd")
        left = l2
    return grid.constrain(jnp.concatenate([left, right], axis=1),
                          _spec(grid))


# --------------------------------------------------------------------------
# host-orchestrated recursion
# --------------------------------------------------------------------------


def _dbg(msg: str):
    """Per-level diagnostics (CAPITAL_EIGH_DEBUG=1): the D&C recursion is
    host-orchestrated, so plain prints are the honest trace of the actual
    shift/split decisions (the jit stages between them are opaque)."""
    import os

    if os.environ.get("CAPITAL_EIGH_DEBUG"):
        print(f"[eigh] {msg}", flush=True)


def _solve_block(grid: Grid, a, cfg: Config, scale: float, key):
    n = a.shape[0]
    if n <= cfg.base_n:
        return _base_eigh(grid, a)

    d, lo, hi = _diag_and_bounds(grid, a)
    lo_f, hi_f = float(lo), float(hi)
    if hi_f - lo_f <= cfg.resolve_cluster_rel(a.dtype) * scale:
        # converged cluster: the block is sigma I + O(eps ||A||); its
        # diagonal IS the eigenvalue list to backward-error accuracy
        return d.astype(a.dtype), grid.constrain(
            jnp.eye(n, dtype=a.dtype), _spec(grid))

    sigma = float(jnp.median(d))
    lo_b, hi_b = lo_f, hi_f
    for attempt in range(cfg.shift_tries + 1):
        u, tr = _stage_sign(grid, a, jnp.float32(sigma), cfg)
        tr_f = float(tr)
        if not math.isfinite(tr_f):
            # sigma landed (numerically) on an eigenvalue and the sign
            # iteration blew up: nudge off it
            sigma = sigma + max(0.05 * (hi_b - sigma), 1e-3 * (hi_f - lo_f))
            continue
        k = max(0, min(n, int(round((n + tr_f) / 2.0))))
        if k <= 0 or k >= n or (min(k, n - k) / n < cfg.min_split
                                and attempt < cfg.shift_tries):
            # shift landed outside (or at the edge of) the spectrum:
            # bisect the Gershgorin interval toward the crowded side
            if k > n // 2:  # almost everything above sigma -> move up
                lo_b = sigma
            else:
                hi_b = sigma
            sigma = 0.5 * (lo_b + hi_b)
            continue
        key, k1, k2, ksplit = jax.random.split(key, 4)
        b11, b22, v, e21, off = _stage_split(grid, a, u, ksplit, cfg, k)
        off_f = float(off)
        _dbg(f"n={n} try={attempt} sigma={sigma:.6g} k={k} "
             f"off={off_f:.3e} rel={off_f / scale:.3e}")
        if not math.isfinite(off_f) or off_f > cfg.off_tol * scale:
            # the invariant-subspace split failed (rank(P) mismatch from a
            # sigma inside a cluster, or a rank-deficient splitting basis):
            # retry with a moved shift
            sigma = sigma + max(0.1 * (hi_b - sigma), 1e-3 * (hi_f - lo_f))
            continue
        w1, v1 = _solve_block(grid, b11, cfg, scale, k1)
        w2, v2 = _solve_block(grid, b22, cfg, scale, k2)
        w = jnp.concatenate([w1, w2])
        mu = jnp.float32(cfg.resolve_cluster_rel(a.dtype) * scale)
        return w, _glue(grid, v, v1, v2, w1, w2, e21, mu, k,
                        correct=cfg.correct_splits)
    # pathological spectrum (no shift ever separated it cleanly): fall
    # back to the replicated dense solve whatever the size
    return _base_eigh(grid, a)


def count_above(grid: Grid, a, sigma: float, cfg: Config = Config()):
    """Number of eigenvalues of symmetric A strictly above sigma — spectrum
    slicing via one sign function: k = (n + trace(sign(A - sigma I))) / 2.

    One QDWH polar of cost O(n^3) (the same engine as a single eigh level);
    the building block behind eigh_partial's bisection. The reference has no
    spectral capability at all; this is the counting primitive of the
    QDWH-eig literature (Nakatsukasa & Higham 2013, sec. 3)."""
    if isinstance(a, DistMatrix):
        a = a.data
    cfg = cfg.resolved(grid)
    _, tr = _stage_sign(grid, a, jnp.float32(sigma), cfg)
    n = a.shape[0]
    return max(0, min(n, int(round((n + float(tr)) / 2.0))))


def eigvalsh(grid: Grid, a, cfg: Config = Config()):
    """Eigenvalues only (ascending). The cross-split eigenvector correction
    is skipped — it moves eigenVECTOR residuals only, never the values —
    so this is the cheapest full-spectrum call."""
    import dataclasses

    w, _ = eigh(grid, a, dataclasses.replace(cfg, correct_splits=False))
    return w


def _out_spec(grid: Grid, k: int) -> P:
    """Layout of an (n, k) eigenvector panel: keep the slice layout when k
    divides the column axis; otherwise shard rows only (k is user-chosen —
    any value is legal)."""
    return _spec(grid) if k % grid.d2 == 0 else P("y", None)


@partial(jax.jit, static_argnames=("grid", "k"))
def _stage_rr_basis(grid: Grid, a, x, k: int):
    """Device step 1 of a residual-augmented Rayleigh-Ritz sweep: the
    (n, 2k) basis candidate B = [X, R/||r_i||] with R = AX - X(X^T AX)
    the orthogonal-complement residual — exactly the leaked coupling the
    accepted split discarded. O(n^2 k) gemms."""
    acc = jnp.promote_types(a.dtype, jnp.float32)
    with jax.default_matmul_precision("highest"):
        y = jnp.matmul(a, x, preferred_element_type=acc)
        t0 = jnp.matmul(x.astype(acc).T, y, preferred_element_type=acc)
        r = y - jnp.matmul(x.astype(acc), t0, preferred_element_type=acc)
        cn = jnp.sqrt(jnp.sum(jnp.square(r), axis=0))
        rn = (r / jnp.maximum(cn, jnp.finfo(acc).tiny)[None, :]).astype(
            a.dtype)
    return grid.constrain(jnp.concatenate([x, rn], axis=1),
                          P(("z", "y", "x"), None))


@partial(jax.jit, static_argnames=("grid",))
def _stage_rr_project(grid: Grid, a, q):
    """T = Q^T A Q (2k x 2k, replicated)."""
    acc = jnp.promote_types(a.dtype, jnp.float32)
    with jax.default_matmul_precision("highest"):
        z = jnp.matmul(a, q, preferred_element_type=acc)
        t = jnp.matmul(q.astype(acc).T, z, preferred_element_type=acc)
    return grid.constrain(0.5 * (t + t.T), P(None, None))


@partial(jax.jit, static_argnames=("grid", "k"))
def _stage_rr_apply(grid: Grid, q, coef, k: int):
    acc = jnp.promote_types(q.dtype, jnp.float32)
    # highest: at the TPU ambient default (1-pass bf16) this rotation
    # would put a 1e-3-class error on the refined vectors — undoing the
    # whole sweep (measured on-chip before the pin)
    with jax.default_matmul_precision("highest"):
        xk = jnp.matmul(q, coef.astype(q.dtype),
                        preferred_element_type=acc).astype(q.dtype)
    return grid.constrain(xk, _out_spec(grid, k))


def _rr_refine(grid: Grid, a, x, k: int):
    """One residual-augmented Rayleigh-Ritz sweep: re-extract the top k
    Ritz pairs of A from span[X, residual].

    The basis is orthonormalized by replicated HOUSEHOLDER QR — it is rank-
    deficient BY CONSTRUCTION whenever X is near-invariant (residual
    columns are then pure noise), which a Gram-based orthonormalization
    cannot survive: Cholesky NaNs on the singular Gram, and whitening the
    measured f32 Gram amplifies its O(sqrt(n) eps) noise by 1/s_min —
    measured 2.5e-3 orthogonality at n=16384 k=256 before this was
    switched to Householder. Cost: O(n k^2) — trivial next to the O(n^3)
    signs. The projected (2k x 2k) problem is solved on the host in f64.
    Returns (w ascending (k,), X (n, k))."""
    b = _stage_rr_basis(grid, a, x, k)
    # replicated Householder QR (REPLICATED placement, the framework's
    # own base-case philosophy): the (n, 2k) basis is tiny next to the
    # n^2 operand, and measured on-chip the alternative — TSQR's QR
    # inside shard_map — hits a ~1000x-slow lowering on this platform at
    # these shapes (20.2 s vs 25 ms for a (2048, 256) basis), while the
    # replicated QR also handles n not divisible by the device count
    q = _stage_rr_qr_replicated(grid, b)
    t = np.asarray(_stage_rr_project(grid, a, q), np.float64)
    w2, u2 = np.linalg.eigh(t)
    coef = jnp.asarray(u2[:, -k:], x.dtype)
    return (jnp.asarray(w2[-k:].astype(np.float32)),
            _stage_rr_apply(grid, q, coef, k))


@partial(jax.jit, static_argnames=("grid",))
def _stage_rr_qr_replicated(grid: Grid, b):
    """Replicated Householder QR of the RR basis (the only path: TSQR's
    QR-inside-shard_map hits a ~1000x-slow lowering on this platform at
    (n, 2k) shapes, so the basis is orthonormalized replicated)."""
    rep = grid.constrain(b, P(None, None))
    with jax.default_matmul_precision("highest"):
        q, _ = jnp.linalg.qr(rep, mode="reduced")
    return grid.constrain(q, P(("z", "y", "x"), None))


def _sigma_quantile(grid: Grid, a, frac_above: float,
                    lo: float, hi: float) -> tuple[float, float, float]:
    """(sigma0, mu, s): initial shift with ~frac_above of the spectrum
    above it, from the first two spectral moments (trace A = sum lambda,
    ||A||_F^2 = sum lambda^2 — both one cheap reduction) and a Gaussian
    quantile model of the spectral density. Crude, but it starts the
    bisection INSIDE the spectrum near the wanted edge — the Gershgorin
    midpoint can sit far outside it (row-sum radii are loose), costing
    several O(n^3) sign probes just to find the spectrum. mu/s are
    returned so the probe loop can reuse the model slope."""
    import statistics

    n = a.shape[0]
    a32 = a.astype(jnp.float32)
    mu = float(jnp.trace(a32)) / n
    msq = float(jnp.sum(jnp.square(a32))) / n
    s = math.sqrt(max(msq - mu * mu, 1e-30))
    z = statistics.NormalDist().inv_cdf(min(max(1.0 - frac_above, 1e-6),
                                            1.0 - 1e-6))
    return min(max(mu + s * z, lo), hi), mu, s


@partial(jax.jit, static_argnames=("grid", "m", "k"))
def _partial_glue(grid: Grid, v, v1, order, m: int, k: int):
    """X = (V[:, :m] @ V1)[:, order] — jitted so the data-dependent m/k
    shapes go through GSPMD's padding instead of eager divisibility
    checks."""
    x = summa.gemm(grid, v[:, :m], v1, impl="gspmd")
    return grid.constrain(jnp.take(x, order, axis=1), _out_spec(grid, k))


def eigh_partial(grid: Grid, a, k: int, cfg: Config = Config(),
                 which: str = "top"):
    """k extremal eigenpairs without solving the full spectrum.

    Returns (w (k,) ascending, X (n, k) slice-sharded, columns matching w).
    which='top' gives the k algebraically largest eigenpairs, 'bottom' the
    k smallest.

    Schedule — ONE level of the spectral divide-and-conquer, stopped early:
      1. bisect sigma on the Gershgorin interval until the sign-function
         count m = #{lambda > sigma} lands in [k, ~6k] (each probe is one
         QDWH sign, the same cost as an eigh level's step 2 — counts are
         monotone in sigma so bisection converges; clustered spectra that
         plateau fall back to the closest m >= k seen);
      2. split once (the eigh machinery's CholeskyQR2 rotation) and recurse
         ONLY into the m x m invariant block that contains the wanted
         eigenvalues — the (n-m)-sized complement, which full eigh would
         solve to the bottom, is never touched;
      3. glue X = V[:, :m] @ V_child and keep the top (bottom) k columns.

    Cost: ~(probes + 1) sign functions + one CQR2 split + an m-sized child
    solve — for k << n this is a small multiple of ONE eigh level instead
    of the full log-depth recursion, and the peak live set never exceeds
    one level's. The committed split coupling (<= off_tol * ||A||_F, the
    same acceptance test as eigh) is the eigenpair-residual floor; the
    cross-split correction does not apply (the complement's eigenbasis is
    deliberately never computed).
    """
    if isinstance(a, DistMatrix):
        a = a.data
    n = a.shape[0]
    if a.shape != (n, n):
        raise ValueError(f"eigh_partial needs a square matrix, got {a.shape}")
    if not 1 <= k <= n:
        raise ValueError(f"need 1 <= k <= n, got k={k}, n={n}")
    if which == "bottom":
        # bottom-k of A = top-k of -A with values negated (vectors shared)
        w, x = eigh_partial(grid, grid.constrain(-a, _spec(grid)), k, cfg,
                            which="top")
        return -w[::-1], grid.constrain(x[:, ::-1], _out_spec(grid, k))
    if which != "top":
        raise ValueError(f"which must be 'top' or 'bottom', got {which!r}")
    cfg = cfg.resolved(grid)
    if k > n // 2 or n <= cfg.base_n:
        # k == n, or most of the spectrum wanted: the accept window
        # [k, m_max <= n/2] would be empty and every O(n^3) probe wasted
        # — the full solver is the right tool past half the spectrum
        w, v = (eigh(grid, a, cfg) if n > cfg.base_n
                else _base_eigh(grid, a))
        return w[-k:], grid.constrain(v[:, -k:], _out_spec(grid, k))

    # LOOSE sign resolution for the counting probes: a probe only needs
    # the COUNT (a miscount of the few near-sigma eigenvalues just shifts
    # m inside the wide accept window), and a loose l0 runs ~1/3 the QDWH
    # iterations. Only the ONE sign that feeds the split is recomputed
    # tight (below) — measured on-chip, loose splits leave 4e-4-class
    # coupling that even the RR refinement cannot fully repair (the
    # boundary columns' gaps are small), while tight splits + refinement
    # reach 1e-6.
    import dataclasses

    cfg_probe = cfg
    if cfg.partial_refine > 0 and cfg.sign_l0 is None:
        loose = max(1e-5, 10.0 * float(jnp.finfo(a.dtype).eps))
        cfg_probe = dataclasses.replace(cfg, sign_l0=loose)

    # Mixed-precision probes (cfg.probe_dtype): the sign iterates are the
    # peak live set; a bf16 probe operand fits n=32768 in 16-GB HBM where
    # f32 cannot, and the partial_refine sweeps below re-extract the
    # eigenpairs against the full-precision `a`.
    a_probe = a
    if (cfg.probe_dtype is not None
            and jnp.dtype(cfg.probe_dtype) != a.dtype):
        a_probe = grid.constrain(a.astype(cfg.probe_dtype), _spec(grid))

    key = jax.random.key(cfg.seed)
    scale = float(jnp.linalg.norm(a.astype(jnp.float32))) or 1.0
    d, lo, hi = _diag_and_bounds(grid, a)
    lo_b, hi_b = float(lo), float(hi)
    # wide accept window: every extra probe is an O(n^3) sign function,
    # while the child block solve is cheap up to a few k — trading window
    # tightness for probes is heavily one-sided (the child solve is
    # replicated-dense up to base_n anyway)
    m_max = min(max(n // 2, 1), max(6 * k, k + 128))
    tries = max(8, 2 * cfg.shift_tries)

    best = None  # (m, sigma, u) with the smallest m >= k seen
    sigma, _, s_model = _sigma_quantile(grid, a, min(3.0 * k, 0.5 * n) / n,
                                        lo_b, hi_b)
    probes: list[tuple[float, int]] = []
    for _ in range(tries):
        u, tr = _stage_sign(grid, a_probe, jnp.float32(sigma), cfg_probe)
        tr_f = float(tr)
        if not math.isfinite(tr_f):
            sigma = sigma + 1e-3 * (hi_b - lo_b or 1.0)
            continue
        m = max(0, min(n, int(round((n + tr_f) / 2.0))))
        _dbg(f"partial n={n} k={k} sigma={sigma:.6g} count={m}")
        if k <= m and (best is None or m < best[0]):
            best = (m, sigma, u)
        if k <= m <= m_max:
            break
        probes.append((sigma, m))
        # counts decrease as sigma increases
        if m > m_max:
            lo_b = sigma
        else:  # m < k
            hi_b = sigma
        if hi_b - lo_b <= 0:
            break
        # z-space secant: each probe is an O(n^3) sign function, so spend
        # host arithmetic to aim the next one. Counts map to Gaussian
        # quantiles z(m) = Phi^-1(1 - m/n); the local spectral density
        # makes sigma(z) nearly linear even where the global Gaussian
        # model is wrong (e.g. semicircle edges), so a secant through the
        # last two probes lands inside [k, m_max] in 1-2 steps where
        # midpoint bisection from the (very loose) Gershgorin bracket
        # needs many.
        sigma = 0.5 * (lo_b + hi_b)
        import statistics

        nd = statistics.NormalDist()

        def zof(cnt: int) -> float:
            return nd.inv_cdf(1.0 - min(max(cnt, 1), n - 1) / n)

        beta = None
        if len(probes) >= 2:
            (s1, m1), (s2, m2) = probes[-2], probes[-1]
            if zof(m2) != zof(m1):
                b = (s2 - s1) / (zof(m2) - zof(m1))
                beta = b if b > 0 else None
        if beta is None and probes:
            beta = s_model  # one probe: model slope through it
        if beta is not None and probes:
            s2, m2 = probes[-1]
            prop = s2 + beta * (zof(2 * k) - zof(m2))
            if lo_b < prop < hi_b:
                sigma = prop
    if best is None:
        # clustered top of the spectrum defeated the bisection entirely:
        # correct (if slow) fallback — full solve, slice the top k
        w, v = eigh(grid, a, cfg)
        return w[-k:], grid.constrain(v[:, -k:], _out_spec(grid, k))

    m, sigma, u = best
    if cfg_probe is not cfg:
        # recompute the accepted sign at the tight resolution for the
        # split; its count can shift by the few near-sigma eigenvalues
        u_t, tr_t = _stage_sign(grid, a_probe, jnp.float32(sigma), cfg)
        m_t = max(0, min(n, int(round((n + float(tr_t)) / 2.0))))
        if k <= m_t < n:
            u, m = u_t, m_t
        _dbg(f"partial tight recount m={m_t}")
    tracing.record(
        "eigh_partial",
        flops=18.0 * n**3 / grid.num_devices,
        comm_bytes=8 * tracing.psum_bytes(
            n * n * jnp.dtype(a.dtype).itemsize, grid.num_devices),
        msgs=8,
    )
    # with refinement on, a leakier split is acceptable: the RR sweeps
    # repair first-order coupling, so only catastrophically failed splits
    # (rank mismatch, NaN) are worth re-probing for
    accept_tol = cfg.off_tol * (10.0 if cfg.partial_refine > 0 else 1.0)
    for attempt in range(cfg.shift_tries + 1):
        key, kchild, ksplit = jax.random.split(key, 3)
        b11, _, v, _, off = _stage_split(grid, a_probe, u, ksplit, cfg, m)
        off_f = float(off)
        if math.isfinite(off_f) and off_f <= accept_tol * scale:
            break
        if attempt >= cfg.shift_tries:
            # no attempts left: don't burn a sign we cannot use; the
            # loop then exhausts into the full-eigh fallback below
            continue
        # leaked split (sigma numerically inside a cluster): nudge and
        # re-probe the sign
        sigma = sigma + max(0.1 * (float(hi) - sigma),
                            1e-3 * (float(hi) - float(lo)))
        u_new, tr = _stage_sign(grid, a_probe, jnp.float32(sigma), cfg)
        m_new = max(0, min(n, int(round((n + float(tr)) / 2.0))))
        if not (k <= m_new < n):
            continue  # nudged past the k-th eigenvalue: retry the old sign
        u, m = u_new, m_new
    else:
        w, v = eigh(grid, a, cfg)
        return w[-k:], grid.constrain(v[:, -k:], _out_spec(grid, k))

    w1, v1 = _solve_block(grid, b11, cfg, scale, kchild)
    order = np.argsort(np.asarray(w1, np.float64), kind="stable")[-k:]
    w = jnp.asarray(np.asarray(w1)[order])
    x = _partial_glue(grid, v, v1, jnp.asarray(order), m, k)
    for _ in range(cfg.partial_refine):
        w, x = _rr_refine(grid, a, x, k)
    return w, x


def eigh_gen(grid: Grid, a, b, cfg: Config = Config()):
    """Generalized symmetric-definite eigenproblem A x = lambda B x
    (A symmetric, B SPD, both (n, n) slice-sharded).

    The LAPACK sygst reduction, distributed: B = R^T R (cholinv — whose
    EXPLICIT R^{-1} makes the reduction two summa TRMMs instead of two
    triangular solves, the same design win as the solver API,
    ref: the simultaneous-inverse rationale of cholinv.hpp:147-156):

        C = R^{-T} A R^{-1}   (symmetric),  C y = lambda y,
        x = R^{-1} y.

    Returns (w ascending, X (n, n) with B-orthonormal columns:
    X^T B X = I)."""
    if isinstance(a, DistMatrix):
        a = a.data
    if isinstance(b, DistMatrix):
        b = b.data
    if a.shape != b.shape or a.shape[0] != a.shape[1]:
        raise ValueError(f"eigh_gen needs square same-shape A, B: "
                         f"{a.shape} vs {b.shape}")
    impl = cfg.polar.chol.summa_impl
    with tracing.phase("EIG::reduce"):
        _, rinv = _cholinv.factor(grid, b, cfg.polar.chol)
        # C = Rinv^T (A Rinv); re-symmetrize the rounding drift
        ar = summa.trmm(grid, rinv, a, side="R", uplo="U", impl=impl)
        c = summa.trmm(grid, rinv, ar, side="L", uplo="U", trans_a=True,
                       impl=impl)
        c = grid.constrain(0.5 * (c + c.T), _spec(grid))
    w, y = eigh(grid, c, cfg)
    with tracing.phase("EIG::backtransform"):
        x = summa.trmm(grid, rinv, y, side="L", uplo="U", impl=impl)
    return w, grid.constrain(x, _spec(grid))


def eigh(grid: Grid, a, cfg: Config = Config()):
    """Full symmetric eigendecomposition A = V diag(w) V^T, distributed.

    a: (n, n) symmetric, sharded on the grid slice (P('y','x')).
    Returns (w ascending (n,), V (n, n) slice-sharded, columns matching w).
    """
    if isinstance(a, DistMatrix):
        a = a.data
    n = a.shape[0]
    if a.shape != (n, n):
        raise ValueError(f"eigh needs a square matrix, got {a.shape}")
    cfg = cfg.resolved(grid)
    key = jax.random.key(cfg.seed)
    with tracing.phase("EIG::dnc"):
        esz = jnp.dtype(a.dtype).itemsize
        levels = max(1, math.ceil(math.log2(max(2, n / max(1, cfg.base_n)))))
        tracing.record(
            "eigh",
            flops=levels * 18.0 * n**3 / grid.num_devices,
            comm_bytes=levels * 8 * tracing.psum_bytes(
                n * n * esz, grid.num_devices),
            msgs=levels * 8,
        )
        scale = float(jnp.linalg.norm(a.astype(jnp.float32))) or 1.0
        w, v = _solve_block(grid, a, cfg, scale, key)
    # recursion emits blocks in shift order, not value order: sort
    order = np.argsort(np.asarray(w, np.float64), kind="stable")
    w = jnp.asarray(np.asarray(w)[order])
    v = grid.constrain(jnp.take(v, jnp.asarray(order), axis=1), _spec(grid))
    return w, v
