"""TSQR (algs/tsqr.py): Householder-quality orthogonality at any
conditioning — including where CholeskyQR2 fails — on distributed meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu.algs import tsqr


def _controlled(m, n, cond, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.geomspace(1.0, 1.0 / cond, n)
    return (u * s) @ v.T


def _check(a_np, q, r, ortho_tol=5e-7):
    m, n = a_np.shape
    q64 = np.asarray(q, np.float64)
    r64 = np.asarray(r, np.float64)
    assert np.allclose(r64, np.triu(r64))
    assert np.all(np.diag(r64) >= 0)  # canonical form
    og = np.linalg.norm(q64.T @ q64 - np.eye(n)) / np.sqrt(n)
    assert og < ortho_tol, og
    rec = np.linalg.norm(q64 @ r64 - a_np) / np.linalg.norm(a_np)
    assert rec < 1e-6, rec


def test_tsqr_well_conditioned(grid1d8):
    m, n = 2048, 96
    a_np = _controlled(m, n, cond=10.0)
    a = jax.device_put(np.asarray(a_np, np.float32), grid1d8.row1d)
    q, r = tsqr.factor(grid1d8, a)
    _check(a_np, q, r)


def test_tsqr_extreme_cond_where_cqr2_fails(grid1d8):
    # cond = 1e7: CholeskyQR's Gram has cond 1e14 — unfactorable in f32.
    # TSQR must still deliver eps-level orthogonality.
    m, n = 4096, 64
    a_np = _controlled(m, n, cond=1e7, seed=1)
    a = jax.device_put(np.asarray(a_np, np.float32), grid1d8.row1d)
    q, r = tsqr.factor(grid1d8, a)
    _check(a_np, q, r, ortho_tol=1e-6)


def test_tsqr_matches_numpy_r(grid1d8):
    # canonical R is unique: compare against numpy's, sign-fixed
    m, n = 1024, 32
    a_np = _controlled(m, n, cond=100.0, seed=2)
    a = jax.device_put(np.asarray(a_np, np.float32), grid1d8.row1d)
    _, r = tsqr.factor(grid1d8, a)
    qn, rn = np.linalg.qr(a_np)
    s = np.sign(np.diag(rn))
    rn = rn * s[:, None]
    np.testing.assert_allclose(np.asarray(r, np.float64), rn,
                               rtol=1e-4, atol=1e-5)


def test_tsqr_f64(grid1d8):
    with jax.enable_x64():
        m, n = 2048, 48
        a_np = _controlled(m, n, cond=1e12, seed=3)
        a = jax.device_put(a_np, grid1d8.row1d)
        q, r = tsqr.factor(grid1d8, a)
        q64, r64 = np.asarray(q), np.asarray(r)
        assert np.linalg.norm(q64.T @ q64 - np.eye(n)) / np.sqrt(n) < 1e-14
        assert np.linalg.norm(q64 @ r64 - a_np) / np.linalg.norm(a_np) < 1e-14


def test_tsqr_rejects_short_blocks(grid1d8):
    a = jnp.zeros((256, 64), jnp.float32)  # 32 rows/device < n
    with pytest.raises(ValueError):
        tsqr.factor(grid1d8, a)
