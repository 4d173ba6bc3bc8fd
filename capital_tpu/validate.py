"""Numerical validation oracles, computed distributed.

Re-design of the reference's test/ validators (ref: test/cholesky/
validate.hpp:7-49, test/qr/validate.hpp:7-52, test/inverse/validate.hpp:7-34
+ util::residual_local, util.hpp:25-53). Same acceptance criteria, same
"validate with the library's own distributed machinery" structure — but
wired into pytest instead of commented-out driver calls (the gap SURVEY §4
flags).

All functions return scalar relative Frobenius errors and are jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from capital_tpu.grid import Grid
from capital_tpu.parallel import summa


def _fro(x) -> jax.Array:
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    return jnp.sqrt(jnp.sum(jnp.square(x.astype(acc))))


def cholesky_residual(grid: Grid, a, r, impl: str = "shard_map",
                      chunks: int = 1, masked: bool = False) -> jax.Array:
    """||R^T R - A||_F / ||A||_F (ref: cholesky::validate::residual,
    test/cholesky/validate.hpp:7-49 — rebuild A via transpose + summa).

    chunks > 1 accumulates the squared norm over row panels of R^T R
    without ever materializing the n x n product — at n=32768 f32 the
    dense rebuild (A + R + product, 12 GB) plus temps exceeds HBM.
    masked=True promises r is already exactly upper-triangular (true for
    factor() outputs), skipping the 4-GB-class triu copy."""
    rm = r if masked else jnp.triu(r)
    if chunks > 1 and r.shape[0] % chunks == 0:
        from capital_tpu.ops.precision import dot_general as _pdg

        n = r.shape[0]
        nb = n // chunks

        def body(i, acc):
            cols = jax.lax.dynamic_slice(rm, (0, i * nb), (n, nb))
            # (R^T R)[i-th row panel, :] = rm[:, panel]^T @ rm
            prod = _pdg(cols, rm, (((0,), (0,)), ((), ())))
            a_pan = jax.lax.dynamic_slice(a, (i * nb, 0), (nb, n))
            d = prod.astype(jnp.float32) - a_pan.astype(jnp.float32)
            return acc + jnp.sum(d * d)

        num = jnp.sqrt(jax.lax.fori_loop(0, chunks, body, jnp.float32(0)))
        return num / _fro(a)
    rr = summa.syrk(grid, rm, impl=impl)
    return _fro(rr - a) / _fro(a)


def inverse_residual(grid: Grid, r, rinv, impl: str = "shard_map",
                     chunks: int = 1, masked: bool = False) -> jax.Array:
    """||R Rinv - I||_F / sqrt(n) (ref: inverse::validate::invoke,
    test/inverse/validate.hpp:7-34).

    chunks > 1: panel accumulation; masked=True skips the triu copies
    (see cholesky_residual)."""
    n = r.shape[0]
    rm = r if masked else jnp.triu(r)
    rim = rinv if masked else jnp.triu(rinv)
    if chunks > 1 and n % chunks == 0:
        from capital_tpu.ops.precision import dot as _pdot

        nb = n // chunks

        def body(i, acc):
            rows = jax.lax.dynamic_slice(rm, (i * nb, 0), (nb, n))
            prod = _pdot(rows, rim).astype(jnp.float32)
            # subtract the matching rows of I
            rr = i * nb + jax.lax.broadcasted_iota(jnp.int32, (nb, n), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (nb, n), 1)
            d = prod - (rr == cc).astype(jnp.float32)
            return acc + jnp.sum(d * d)

        num = jnp.sqrt(jax.lax.fori_loop(0, chunks, body, jnp.float32(0)))
        return num / jnp.sqrt(jnp.float32(n))
    prod = summa.trmm(grid, rm, rim, side="L", uplo="U", impl=impl)
    eye = jnp.eye(n, dtype=r.dtype)
    return _fro(prod - eye) / jnp.sqrt(jnp.float32(n))


def _is_row_sharded(q) -> bool:
    """True if q uses the full-mesh row-sharded (tall-skinny / 1D) layout.

    Only consulted OUTSIDE jit (tracers carry no committed sharding); jitted
    callers pass layout= explicitly."""
    from jax.sharding import PartitionSpec as P
    from capital_tpu.grid import ALL_AXES

    try:
        return q.sharding.spec == P(ALL_AXES, None)
    except AttributeError as exc:  # tracer: caller must disambiguate
        raise ValueError(
            "layout='auto' cannot inspect sharding under jit; pass "
            "layout='1d' (row-sharded) or layout='2d' (block-sharded)"
        ) from exc


def qr_orthogonality(grid: Grid, q, impl: str = "shard_map", layout: str = "auto") -> jax.Array:
    """||Q^T Q - I||_F / sqrt(n) (ref: qr::validate::orthogonality,
    test/qr/validate.hpp:7-32)."""
    from capital_tpu.algs.cacqr import gram_1d

    if layout == "auto":
        layout = "1d" if _is_row_sharded(q) else "2d"
    if layout == "1d":
        # kernel='auto' -> the two-level-accumulating Pallas syrk on TPU:
        # XLA's plain dot loses ~2 digits over 2^19-long contractions and a
        # validator must not dominate the quantity it measures
        g = gram_1d(grid, q, kernel="auto")
    else:
        g = summa.syrk(grid, q, impl=impl)
    n = g.shape[0]
    return _fro(g - jnp.eye(n, dtype=g.dtype)) / jnp.sqrt(jnp.float32(n))


def qr_residual(grid: Grid, a, q, r, impl: str = "shard_map", layout: str = "auto") -> jax.Array:
    """||Q R - A||_F / ||A||_F (ref: qr::validate::residual,
    test/qr/validate.hpp:34-52)."""
    from capital_tpu.ops import blas

    if layout == "auto":
        layout = "1d" if _is_row_sharded(q) else "2d"
    if layout == "1d":
        if grid.num_devices == 1:
            qr = blas.trmm(jnp.triu(r), q, side="R", uplo="U",
                           platform=grid.platform)
        else:
            # per-device local trmm (keeps the Pallas kernel inside the
            # shard scope; a global pallas_call would force replication)
            from jax.sharding import PartitionSpec as P

            from capital_tpu.grid import ALL_AXES

            rt = jnp.triu(r)

            def kern(q_blk, r_rep):
                return blas.trmm(r_rep, q_blk, side="R", uplo="U",
                                 platform=grid.platform)

            qr = jax.shard_map(kern, mesh=grid.mesh,
                               in_specs=(P(ALL_AXES, None), P(None, None)),
                               out_specs=P(ALL_AXES, None),
                               check_vma=False)(q, rt)
    else:
        qr = summa.trmm(grid, jnp.triu(r), q, side="R", uplo="U", impl=impl)
    return _fro(qr - a) / _fro(a)


def eig_residual(grid: Grid, a, w, v, chunks: int = 1) -> jax.Array:
    """||A V - V diag(w)||_F / ||A||_F on device, accumulated over column
    chunks of V (same residual family as the reference's validators,
    test/inverse/validate.hpp:7-34, applied to eigenpairs). Never
    materializes an (n, n) product or pulls operands to host — at the
    n >= 16384 shapes the eigensolver exists for, a host-side f64
    validator is 2 n^2 doubles of traffic and memory per candidate."""
    from capital_tpu.ops.precision import dot as _pd

    k = v.shape[1]
    chunks = max(1, min(chunks, k))
    while k % chunks:
        chunks -= 1
    kb = k // chunks

    def body(i, acc):
        vc = jax.lax.dynamic_slice(v, (0, i * kb), (v.shape[0], kb))
        wc = jax.lax.dynamic_slice(w, (i * kb,), (kb,))
        av = _pd(a, vc, preferred_element_type=jnp.float32)
        d = av - vc.astype(jnp.float32) * wc.astype(jnp.float32)[None, :]
        return acc + jnp.sum(d * d)

    num = jnp.sqrt(jax.lax.fori_loop(0, chunks, body, jnp.float32(0)))
    return num / _fro(a)
