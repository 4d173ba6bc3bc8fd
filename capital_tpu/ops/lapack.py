"""Local factorization kernels: Cholesky + simultaneous triangular inverse.

Replaces the reference's LAPACKE wrappers _potrf/_trtri (ref:
src/lapack/engine.h:38-102, src/lapack/interface.hpp:30-88). The reference's
flagship algorithm computes the Cholesky factor R and R^{-1} *together*
(ref: cholinv.h:46-53); the base case is potrf followed by trtri on a
replicated block (ref: cholinv/policy.h:190-205). We fuse the pair:

  chol_inv(A) -> (R, Rinv)  with A = R^T R, R upper-triangular.

Two implementations, selected by `method`:
  * "xla"    — lax.linalg.cholesky + triangular_solve against I. Stock XLA;
               used as the correctness oracle and CPU fallback.
  * "pallas" — fused blocked Pallas kernel (ops/pallas_chol.py) that keeps
               the panel recursion in VMEM and does all updates on the MXU.
  * "auto"   — pallas on TPU, xla elsewhere.

geqrf/orgqr have no counterpart here on purpose: the reference wraps but
never calls them (SURVEY §2 — only potrf/trtri are used); our QR is
CholeskyQR2 which needs exactly chol_inv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _f32in(x):
    """Low-precision storage factors in f32 (neither XLA's expander nor CPU
    LAPACK has bf16 kernels, and the base case wants full accuracy)."""
    return x.astype(jnp.float32) if x.dtype in (jnp.bfloat16, jnp.float16) else x


def chol_inv_xla(a: jax.Array, lower: bool = False):
    """(R, Rinv) with A = R^T R (upper, default) or (L, Linv) with A = L L^T."""
    dt = a.dtype
    a = _f32in(a)
    L = lax.linalg.cholesky(a)  # lower
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    Linv = lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
    L, Linv = L.astype(dt), Linv.astype(dt)
    if lower:
        return L, Linv
    return jnp.swapaxes(L, -1, -2), jnp.swapaxes(Linv, -1, -2)


def potrf(a: jax.Array, lower: bool = False) -> jax.Array:
    """Cholesky factor only (ref: _potrf, lapack/interface.hpp:30-47)."""
    L = lax.linalg.cholesky(_f32in(a)).astype(a.dtype)
    return L if lower else jnp.swapaxes(L, -1, -2)


def trtri(t: jax.Array, lower: bool = False) -> jax.Array:
    """Triangular inverse (ref: _trtri, lapack/interface.hpp:49-66)."""
    t32 = _f32in(t)
    eye = jnp.eye(t32.shape[-1], dtype=t32.dtype)
    return lax.linalg.triangular_solve(
        t32, eye, left_side=True, lower=lower).astype(t.dtype)


def geqrf(a: jax.Array):
    """Householder QR, packed form (ref: _geqrf, lapack/interface.hpp:68-77).
    Returns (packed, tau): reflectors below the diagonal, R on and above,
    tau the reflector scales — LAPACK's own return convention. Batch dims
    supported. Call sites: the TSQR tree's local QRs (algs/tsqr.py)."""
    # jnp's "raw" mode IS geqrf (numpy convention returns the packed
    # factor transposed; swap back to LAPACK's (m, n) layout)
    h, tau = jnp.linalg.qr(a, mode="raw")
    return jnp.swapaxes(h, -1, -2), tau


def orgqr(packed: jax.Array, tau: jax.Array):
    """Explicit Q from geqrf's packed reflectors (ref: _orgqr, lapack/
    interface.hpp:79-88 — LAPACK's two-call geqrf/orgqr idiom). Returns
    the reduced (m, n) Q with orthonormal columns."""
    return lax.linalg.householder_product(packed, tau)


def qr(a: jax.Array):
    """Reduced QR via the geqrf/orgqr pair — the exact two-call LAPACK
    sequence the reference's lapack engine exposes (engine.h:38-102).
    Returns (Q (m, n), R (n, n)); batch dims supported."""
    packed, tau = geqrf(a)
    n = a.shape[-1]
    q = orgqr(packed, tau)
    r = jnp.triu(packed[..., :n, :])
    return q, r


def chol_inv(a: jax.Array, lower: bool = False, method: str = "auto",
             platform: str | None = None):
    """Fused Cholesky + triangular inverse. See module docstring.

    platform: where the computation will run (callers under jit pass the
    grid's platform — tracers carry no device info)."""
    if method == "auto":
        import os

        on_tpu = platform in ("tpu", "axon") if platform else _on_tpu(a)
        method = os.environ.get("CAPITAL_CHOL_METHOD") or (
            "pallas" if on_tpu else "xla"
        )
        # the Pallas kernel holds 4 n^2 f32 buffers in VMEM (16 MB): n=1024
        # is the ceiling; ragged or bigger blocks fall back to XLA
        n = a.shape[-1]
        if method == "pallas" and (n % 128 or n > 1024):
            method = "xla"
    if method == "xla":
        return chol_inv_xla(a, lower=lower)
    if method == "pallas":
        from capital_tpu.ops.pallas_chol import chol_inv_pallas

        return chol_inv_pallas(a, lower=lower)
    raise ValueError(f"unknown chol_inv method {method!r}")


def _on_tpu(x) -> bool:
    """True if x (or, for tracers, the default backend) lives on a TPU."""
    try:
        sh = getattr(x, "sharding", None)
        if sh is not None and sh.device_set:
            return next(iter(sh.device_set)).platform in ("tpu", "axon")
    except Exception:
        pass
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
