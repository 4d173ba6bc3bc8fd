"""Randomized SVD / PCA application (apps/rsvd.py): recovered spectrum and
subspaces must match a dense f64 oracle on planted low-rank + noise data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu.apps import rsvd
from capital_tpu.algs import cacqr


def _planted(m, n, rank, noise=1e-3, seed=0):
    """A = U diag(s) V^T + noise, s geometric in [1, 10]."""
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, rank)))
    v, _ = np.linalg.qr(rng.standard_normal((n, rank)))
    s = np.geomspace(10.0, 1.0, rank)
    a = (u * s) @ v.T + noise * rng.standard_normal((m, n))
    return np.asarray(a, np.float32), s


def test_rsvd_recovers_planted_spectrum(grid1d8):
    m, n, rank = 2048, 256, 24
    a_np, s_true = _planted(m, n, rank)
    a = jax.device_put(a_np, grid1d8.row1d)
    cfg = rsvd.Config(k=rank, oversample=8, power_iters=1)
    u, s, vt = rsvd.rsvd(grid1d8, a, cfg)

    # singular values: rel error vs the planted spectrum
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=5e-3)

    # rank-k reconstruction error ~ optimal (noise floor)
    rec = np.asarray(u, np.float64) @ np.diag(np.asarray(s, np.float64)) \
        @ np.asarray(vt, np.float64)
    rel = np.linalg.norm(a_np - rec) / np.linalg.norm(a_np)
    s_full = np.linalg.svd(a_np.astype(np.float64), compute_uv=False)
    opt = np.linalg.norm(s_full[rank:]) / np.linalg.norm(s_full)
    assert rel < 1.5 * opt + 1e-6

    # U orthonormal (inherits CholeskyQR2 quality)
    utu = np.asarray(u, np.float64).T @ np.asarray(u, np.float64)
    assert np.linalg.norm(utu - np.eye(rank)) < 1e-5


def test_rsvd_power_iters_sharpen(grid1d8):
    """Slowly-decaying spectrum: q=2 must beat q=0 on the recovered tail."""
    m, n, rank = 2048, 192, 16
    rng = np.random.default_rng(3)
    # full-rank with slow decay: recovery quality depends on q
    u, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = 1.0 / np.arange(1, n + 1) ** 0.5
    a_np = np.asarray((u * s) @ v.T, np.float32)
    a = jax.device_put(a_np, grid1d8.row1d)

    errs = {}
    for q in (0, 2):
        _, sk, _ = rsvd.rsvd(grid1d8, a,
                             rsvd.Config(k=rank, oversample=6, power_iters=q))
        errs[q] = np.abs(np.asarray(sk) - s[:rank]).max()
    assert errs[2] < errs[0]


def test_rsvd_single_device():
    from capital_tpu.grid import Grid

    grid = Grid.square(c=1, d=1, devices=jax.devices("cpu")[:1])
    a_np, s_true = _planted(1024, 128, 12, seed=7)
    u, s, vt = rsvd.rsvd(grid, jnp.asarray(a_np),
                         rsvd.Config(k=12, oversample=6))
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=5e-3)


def test_pca_matches_numpy(grid1d8):
    m, n, k = 2048, 128, 8
    rng = np.random.default_rng(11)
    a_np = np.asarray(
        rng.standard_normal((m, k)) @ rng.standard_normal((k, n))
        + 0.01 * rng.standard_normal((m, n)) + rng.standard_normal(n),
        np.float32)
    a = jax.device_put(a_np, grid1d8.row1d)
    comps, var, mean = rsvd.pca(grid1d8, a, rsvd.Config(k=k, oversample=8,
                                                        power_iters=1))
    # oracle PCA
    c = a_np - a_np.mean(0)
    s_full = np.linalg.svd(c.astype(np.float64), compute_uv=False)
    var_true = s_full[:k] ** 2 / (m - 1)
    np.testing.assert_allclose(np.asarray(var), var_true, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(mean), a_np.mean(0), atol=1e-4)
    # components orthonormal
    cc = np.asarray(comps, np.float64)
    assert np.linalg.norm(cc @ cc.T - np.eye(k)) < 1e-5


def test_rsvd_bf16_storage(grid1d8):
    """bf16 storage with f32 accumulation still recovers the spectrum to
    bf16-class accuracy."""
    # noise keeps the l=24 sketch full-rank (CholeskyQR needs a
    # nonsingular Gram; an exactly-rank-16 A would make it singular)
    a_np, s_true = _planted(2048, 256, 16, noise=1e-3, seed=5)
    a = jax.device_put(jnp.asarray(a_np, jnp.bfloat16), grid1d8.row1d)
    _, s, _ = rsvd.rsvd(grid1d8, a, rsvd.Config(k=16, oversample=8))
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=3e-2)
