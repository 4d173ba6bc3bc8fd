"""QDWH-SVD (algs/svd.py) against numpy oracles: singular values,
orthogonality of both factors, reconstruction; 2d and 1d layouts.
"""

import jax
import numpy as np
import pytest

from capital_tpu.algs import cholinv, eigh, polar, svd


def _factored(m, n, s, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return (u * np.asarray(s)) @ v.T


def _cfg(base_n=128):
    chol = cholinv.Config(min_bc=64, base_method="xla")
    return svd.Config(
        polar=polar.Config(chol=chol),
        eig=eigh.Config(base_n=base_n,
                        polar=polar.Config(compute_h=False, chol=chol)))


def _check(a_np, u, s, v, *, rtol=5e-5):
    m, n = a_np.shape
    u64, v64 = np.asarray(u, np.float64), np.asarray(v, np.float64)
    s64 = np.asarray(s, np.float64)
    scale = np.linalg.norm(a_np, 2)
    assert np.all(np.diff(s64) <= 1e-6 * scale)  # descending
    assert np.all(s64 >= 0.0)
    s_true = np.linalg.svd(a_np, compute_uv=False)
    assert np.abs(s64 - s_true).max() <= rtol * scale
    assert np.linalg.norm(u64.T @ u64 - np.eye(n)) / np.sqrt(n) < 1e-5
    assert np.linalg.norm(v64.T @ v64 - np.eye(n)) / np.sqrt(n) < 1e-5
    rec = np.linalg.norm((u64 * s64) @ v64.T - a_np) / np.linalg.norm(a_np)
    assert rec <= rtol * np.sqrt(n), rec


def test_svd_square_2d(grid122):
    n = 256
    a_np = _factored(n, n, np.geomspace(1.0, 1e-2, n), seed=0)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    u, s, v = svd.svd(grid122, a, _cfg(), layout="2d")
    _check(a_np, u, s, v)


def test_svd_wide_spectrum_2d(grid122):
    # eigensolver actually splits: n > base_n
    n = 384
    a_np = _factored(n, n, np.linspace(3.0, 0.5, n), seed=1)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    u, s, v = svd.svd(grid122, a, _cfg(base_n=128), layout="2d")
    _check(a_np, u, s, v)


def test_svd_tall_skinny_1d(grid1d8):
    m, n = 2048, 128
    a_np = _factored(m, n, np.geomspace(2.0, 1e-2, n), seed=2)
    a = jax.device_put(np.asarray(a_np, np.float32), grid1d8.row1d)
    u, s, v = svd.svd(grid1d8, a, _cfg(), layout="1d")
    _check(a_np, u, s, v)


def test_singular_values_only(grid122):
    n = 128
    a_np = _factored(n, n, np.geomspace(1.0, 1e-1, n), seed=3)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    s = svd.singular_values(grid122, a, _cfg(), layout="2d")
    s_true = np.linalg.svd(a_np, compute_uv=False)
    assert np.abs(np.asarray(s, np.float64) - s_true).max() < 5e-5


def test_svd_f64(grid122):
    with jax.enable_x64():
        n = 192
        a_np = _factored(n, n, np.geomspace(1.0, 1e-6, n), seed=4)
        a = jax.device_put(a_np, grid122.sharding(grid122.slice_spec))
        u, s, v = svd.svd(grid122, a, _cfg(base_n=64), layout="2d")
        _check(a_np, u, s, v, rtol=1e-10)


def test_svd_rejects_wide(grid122):
    import jax.numpy as jnp
    with pytest.raises(ValueError):
        svd.svd(grid122, jnp.zeros((4, 8), jnp.float32))


def test_svd_partial_topk(grid122):
    """Deterministic truncated SVD (svd_partial) against the numpy oracle:
    top-k singular values, left/right subspace residual, orthonormality."""
    m, n, k = 768, 256, 16
    rng = np.random.default_rng(13)
    a_np = rng.standard_normal((m, n)).astype(np.float32)
    # plant a decaying spectrum so the top-k is well defined
    u0, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v0, _ = np.linalg.qr(rng.standard_normal((n, n)))
    sv = np.linspace(3.0, 0.5, n)
    a_np = (u0 * sv) @ v0.T
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(
                           jax.sharding.PartitionSpec(("z", "y", "x"), None)))
    u, s, v = svd.svd_partial(grid122, a, k, _cfg(), layout="1d")
    s64 = np.asarray(s, np.float64)
    s_true = np.linalg.svd(a_np, compute_uv=False)[:k]
    assert np.all(np.diff(s64) <= 1e-6)
    assert np.abs(s64 - s_true).max() < 3e-4 * s_true[0]
    u64, v64 = np.asarray(u, np.float64), np.asarray(v, np.float64)
    res = np.linalg.norm(a_np.astype(np.float64) @ v64 - u64 * s64)
    assert res / np.linalg.norm(a_np) < 1e-3, res
    assert np.linalg.norm(u64.T @ u64 - np.eye(k)) < 1e-4
    assert np.linalg.norm(v64.T @ v64 - np.eye(k)) < 1e-4
