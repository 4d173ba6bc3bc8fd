"""Fused Pallas Cholesky+inverse kernel vs the XLA oracle.

The kernel replaces the reference's base-case LAPACKE_dpotrf + LAPACKE_dtrtri
pair (ref: src/alg/cholesky/cholinv/policy.h:190-205); interpret mode is the
CPU-runnable stand-in for the TPU compile (SURVEY §4's fake-backend strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu.ops.lapack import chol_inv_xla
from capital_tpu.ops.pallas_chol import chol_inv_pallas


def _spd(n, key, dtype=jnp.float32):
    u = jax.random.uniform(key, (n, n), dtype=dtype, minval=-0.5, maxval=0.5)
    return (u + u.T) * 0.5 + n * jnp.eye(n, dtype=dtype)


@pytest.mark.parametrize("n", [128, 256, 512])
def test_residuals_match_xla_oracle(n):
    """Element-wise agreement with LAPACK-style output is not required (the
    fused elimination is a different valid rounding); the residual and
    inverse quality must match the XLA oracle's."""
    a = _spd(n, jax.random.key(0))
    r, rinv = chol_inv_pallas(a, interpret=True)
    r0, rinv0 = chol_inv_xla(a)

    def quality(r_, rinv_):
        res = jnp.linalg.norm(r_.T @ r_ - a) / jnp.linalg.norm(a)
        ortho = jnp.linalg.norm(r_ @ rinv_ - jnp.eye(n)) / jnp.sqrt(n)
        return float(res), float(ortho)

    res, ortho = quality(r, rinv)
    res0, ortho0 = quality(r0, rinv0)
    assert res < max(10 * res0, 1e-5), (res, res0)
    assert ortho < max(20 * ortho0, 1e-5), (ortho, ortho0)


def test_factorization_identities():
    n = 384
    a = _spd(n, jax.random.key(3))
    r, rinv = chol_inv_pallas(a, interpret=True)
    # A = R^T R
    err = jnp.linalg.norm(r.T @ r - a) / jnp.linalg.norm(a)
    assert err < 1e-5, err
    # R Rinv = I
    ortho = jnp.linalg.norm(r @ rinv - jnp.eye(n)) / jnp.sqrt(n)
    assert ortho < 1e-5, ortho
    # both outputs strictly upper triangular
    assert np.allclose(np.tril(np.asarray(r), -1), 0)
    assert np.allclose(np.tril(np.asarray(rinv), -1), 0)


def test_lower_variant():
    n = 128
    a = _spd(n, jax.random.key(7))
    l, linv = chol_inv_pallas(a, lower=True, interpret=True)
    err = jnp.linalg.norm(l @ l.T - a) / jnp.linalg.norm(a)
    assert err < 1e-5
    assert np.allclose(np.triu(np.asarray(l), 1), 0)


def test_rejects_unaligned():
    with pytest.raises(ValueError):
        chol_inv_pallas(jnp.eye(100), interpret=True)


def test_syrk_upper_interpret():
    """Triangle-aware Gram kernel vs dense oracle (interpret mode).

    ref: the dsyrk half-flop saving of src/blas/interface.hpp:77-97, which
    XLA's dot lacks."""
    from capital_tpu.ops.pallas_syrk import syrk_upper

    m, n = 4096, 512
    a = jax.random.uniform(jax.random.key(2), (m, n), minval=-0.5, maxval=0.5)
    g = syrk_upper(a, interpret=True)
    ref = a.T @ a
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), atol=2e-3)
    # symmetric output
    np.testing.assert_allclose(np.asarray(g), np.asarray(g).T, atol=0)


def test_syrk_upper_ragged_fallback():
    from capital_tpu.ops.pallas_syrk import syrk_upper

    a = jax.random.uniform(jax.random.key(3), (1000, 200))
    g = syrk_upper(a, interpret=True)  # falls back to plain dot
    np.testing.assert_allclose(np.asarray(g), np.asarray(a.T @ a), atol=2e-3)
