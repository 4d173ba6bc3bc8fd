"""Local (single-program) BLAS-3 semantics on the MXU.

Replaces the reference's strongly-typed arg-pack layer over MKL CBLAS
(ref: src/blas/engine.h:23-130, src/blas/interface.hpp:43-97): _gemm, _trmm,
_syrk. On TPU these are jnp.dot/dot_general — XLA tiles them onto the MXU and
fuses the alpha/beta/masking elementwise epilogues, so a hand-written kernel
would only lose to the compiler here. (The genuinely custom kernels live in
ops/pallas_chol.py.)

Conventions:
  * triangular operands are dense arrays; `uplo` selects the mask
    (the dense-over-packed decision is documented in matrix.py),
  * accumulation dtype is always float32 via preferred_element_type so
    bf16 inputs still accumulate exactly on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from capital_tpu.ops.precision import dot as _pdot


def _acc_dtype(x):
    return jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16, jnp.float32) else x.dtype


def _dot(a, b):
    return _pdot(a, b, preferred_element_type=_acc_dtype(a)).astype(a.dtype)


def gemm(a, b, *, c=None, alpha=1.0, beta=0.0, trans_a=False, trans_b=False):
    """C = alpha * op(A) op(B) + beta * C  (ref: ArgPack_gemm, engine.h:72-89)."""
    a = a.T if trans_a else a
    b = b.T if trans_b else b
    out = _dot(a, b)
    if alpha != 1.0:
        out = alpha * out
    if c is not None and beta != 0.0:
        out = out + beta * c
    return out


def _slice_window(x, window):
    if window is None:
        return x
    r0, c0, h, w = window
    return jax.lax.slice(x, (r0, c0), (r0 + h, c0 + w))


def trmm(a, b, *, side="L", uplo="U", trans_a=False, diag="N", alpha=1.0,
         method="auto", platform=None, a_window=None, b_window=None):
    """B = alpha * op(tri(A)) B (side=L) or alpha * B op(tri(A)) (side=R)
    (ref: ArgPack_trmm, engine.h:91-111).

    tri() masks A to its `uplo` triangle; diag='U' forces a unit diagonal.

    method='tri' uses the triangle-aware Pallas kernel (half the MXU flops
    — the dtrmm saving the reference gets from MKL, interface.hpp:54-75);
    'auto' picks it on TPU for the supported upper-triangular cases, with
    ONE measured exception: the bf16 tall-skinny side='R' formQ shape at
    narrow n (< 2048), where XLA's 1-pass gemm already runs near peak and
    fuses into the surrounding in-place row-chunk updates — a pallas_call
    boundary there costs +11% on the 2^22 x 1024 bf16 QR. Everywhere else
    tri wins; notably, demoting the SMALL square bf16 blocks of cholinv's
    recursion to dots measured 2.3x WORSE end-to-end (the lone fusions
    broke XLA's whole-workspace in-place aliasing), so no block-size gate.

    a_window/b_window=(r0, c0, h, w): operate on windows of larger arrays
    — the tri path folds offsets into the kernel's index maps (zero-copy);
    other paths slice explicitly. a_window must be square (A is the
    triangular operand)."""
    if a_window is not None and a_window[2] != a_window[3]:
        raise ValueError(f"triangular a_window must be square: {a_window}")
    a_n = a_window[2] if a_window is not None else a.shape[0]
    b_rows = b_window[2] if b_window is not None else b.shape[0]
    if method == "auto":
        import os

        from capital_tpu.ops.lapack import _on_tpu

        on_tpu = platform in ("tpu", "axon") if platform else _on_tpu(b)
        formq_like = (a.dtype == jnp.bfloat16 and side == "R"
                      and a_n < 2048 and b_rows > 4 * a_n)
        method = os.environ.get("CAPITAL_TRMM_METHOD") or (
            "tri" if on_tpu and not formq_like else "dot")
    if (method == "tri" and uplo == "U" and diag == "N"
            and a.dtype in (jnp.float32, jnp.bfloat16)):
        from capital_tpu.ops.pallas_trmm import trmm_upper

        uw = (a_window[0], a_window[1], a_window[2]) if a_window else None
        out = trmm_upper(a, b, side=side, trans_a=trans_a,
                         u_window=uw, b_window=b_window)
        return alpha * out if alpha != 1.0 else out
    a = _slice_window(a, a_window)
    b = _slice_window(b, b_window)
    t = jnp.triu(a) if uplo == "U" else jnp.tril(a)
    if diag == "U":
        n = a.shape[0]
        t = t - jnp.diag(jnp.diag(t)) + jnp.eye(n, dtype=a.dtype)
    if trans_a:
        t = t.T
    out = _dot(t, b) if side == "L" else _dot(b, t)
    if alpha != 1.0:
        out = alpha * out
    return out


def syrk(a, *, c=None, uplo="U", trans="T", alpha=1.0, beta=0.0,
         method="auto", platform=None, a_window=None):
    """C = alpha * A^T A + beta * C (trans='T') or alpha * A A^T + beta * C
    (ref: ArgPack_syrk, engine.h:113-130). Returns the full symmetric result;
    `uplo` only matters to callers that mask afterwards.

    method='tri' routes trans='T' through the triangle-aware Pallas Gram
    kernel (upper tiles only — the dsyrk flop halving the reference gets
    from MKL, interface.hpp:77-97); 'auto' picks it on TPU: always for
    f32, and for bf16 when n >= 2048 (measured on-chip: 29% over XLA's
    dot at n=4096; a wash at n=1024, where XLA's 1-pass gemm is already
    at 92% of peak and the kernel's short steps pay grid overhead).

    a_window=(r0, c0, h, w): Gram of a window of a larger array — the tri
    path folds the offsets into the kernel index maps (zero-copy)."""
    a_cols = a_window[3] if a_window is not None else a.shape[-1]
    if method == "auto":
        import os

        from capital_tpu.ops.lapack import _on_tpu

        on_tpu = platform in ("tpu", "axon") if platform else _on_tpu(a)
        dtype_ok = a.dtype == jnp.float32 or (
            a.dtype == jnp.bfloat16 and a_cols >= 2048)
        method = os.environ.get("CAPITAL_SYRK_METHOD") or (
            "tri" if on_tpu and dtype_ok else "dot")
    if (method == "tri" and trans == "T"
            and a.dtype in (jnp.float32, jnp.bfloat16)):
        from capital_tpu.ops.pallas_syrk import syrk_upper

        out = syrk_upper(a, out_dtype=a.dtype, a_window=a_window)
    else:
        a = _slice_window(a, a_window)
        out = _dot(a.T, a) if trans == "T" else _dot(a, a.T)
    if alpha != 1.0:
        out = alpha * out
    if c is not None and beta != 0.0:
        out = out + beta * c
    return out
