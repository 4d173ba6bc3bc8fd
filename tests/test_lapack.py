import jax
import jax.numpy as jnp
import numpy as np

from capital_tpu.ops import blas, lapack


def _spd(n, seed=0):
    a = np.asarray(jax.random.uniform(jax.random.key(seed), (n, n)) - 0.5)
    return jnp.asarray((a + a.T) / 2 + n * np.eye(n), dtype=jnp.float32)


def test_chol_inv_xla_upper():
    a = _spd(96)
    r, rinv = lapack.chol_inv_xla(a)
    an = np.asarray(a, dtype=np.float64)
    ref = np.linalg.cholesky(an).T
    np.testing.assert_allclose(np.asarray(r), ref, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(r) @ np.asarray(rinv), np.eye(96), atol=1e-5
    )
    assert np.allclose(np.asarray(r), np.triu(np.asarray(r)))


def test_chol_inv_xla_lower():
    a = _spd(64, seed=1)
    l, linv = lapack.chol_inv_xla(a, lower=True)
    np.testing.assert_allclose(
        np.asarray(l) @ np.asarray(l).T, np.asarray(a), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(l) @ np.asarray(linv), np.eye(64), atol=1e-5)


def test_potrf_trtri():
    a = _spd(32, seed=2)
    r = lapack.potrf(a)
    rinv = lapack.trtri(r, lower=False)
    np.testing.assert_allclose(np.asarray(r) @ np.asarray(rinv), np.eye(32), atol=1e-5)


def test_blas_gemm():
    a = jnp.asarray(np.random.RandomState(0).randn(16, 24), dtype=jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).randn(24, 8), dtype=jnp.float32)
    c = jnp.asarray(np.random.RandomState(2).randn(16, 8), dtype=jnp.float32)
    out = blas.gemm(a, b, c=c, alpha=2.0, beta=3.0)
    ref = 2.0 * np.asarray(a) @ np.asarray(b) + 3.0 * np.asarray(c)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_blas_trmm_unit_diag():
    a = jnp.asarray(np.random.RandomState(3).randn(12, 12), dtype=jnp.float32)
    b = jnp.asarray(np.random.RandomState(4).randn(12, 5), dtype=jnp.float32)
    out = blas.trmm(a, b, side="L", uplo="L", diag="U")
    t = np.tril(np.asarray(a))
    np.fill_diagonal(t, 1.0)
    np.testing.assert_allclose(np.asarray(out), t @ np.asarray(b), rtol=1e-5, atol=1e-5)


def test_blas_syrk():
    a = jnp.asarray(np.random.RandomState(5).randn(20, 10), dtype=jnp.float32)
    out = blas.syrk(a, trans="T")
    np.testing.assert_allclose(np.asarray(out), np.asarray(a).T @ np.asarray(a), rtol=1e-4, atol=1e-5)


def test_geqrf_orgqr_pair():
    """The two-call LAPACK idiom (ref: engine.h:38-102): geqrf's packed
    reflectors + orgqr reproduce the reduced QR; these are the local
    kernels the TSQR tree calls (algs/tsqr.py)."""
    import numpy as np

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((96, 32)).astype(np.float32))
    packed, tau = lapack.geqrf(a)
    assert packed.shape == (96, 32) and tau.shape == (32,)
    q = lapack.orgqr(packed, tau)
    r = jnp.triu(packed[:32, :])
    np.testing.assert_allclose(np.asarray(q @ r), np.asarray(a),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(32),
                               rtol=0, atol=1e-5)
    q2, r2 = lapack.qr(a)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=0)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=0)
