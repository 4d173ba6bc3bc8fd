"""Spectral divide-and-conquer eigensolver (algs/eigh.py) against numpy
oracles on distributed meshes, including the data-dependent-split padding
path and the cluster early-out.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu.algs import cholinv, eigh, polar


def _sym(n, vals, seed=0):
    """A = Q diag(vals) Q^T with a Haar-ish Q (f64 construction)."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return (q * np.asarray(vals)) @ q.T


def _cfg(base_n=128):
    return eigh.Config(
        base_n=base_n,
        polar=polar.Config(
            compute_h=False,
            chol=cholinv.Config(min_bc=64, base_method="xla")))


def _check(a_np, w, v, *, rtol=3e-5, ortho=1e-5):
    n = a_np.shape[0]
    w64 = np.asarray(w, np.float64)
    v64 = np.asarray(v, np.float64)
    scale = np.linalg.norm(a_np)
    # ascending order contract
    assert np.all(np.diff(w64) >= -1e-6 * scale)
    # eigenvalues against the oracle
    w_true = np.linalg.eigvalsh(a_np)
    assert np.abs(w64 - w_true).max() <= rtol * scale, (
        np.abs(w64 - w_true).max(), rtol * scale)
    # eigenpair residual + orthogonality (sign/degeneracy-proof checks)
    res = np.linalg.norm(a_np @ v64 - v64 * w64) / scale
    assert res <= rtol * np.sqrt(n), res
    og = np.linalg.norm(v64.T @ v64 - np.eye(n)) / np.sqrt(n)
    assert og <= ortho, og


def test_eigh_separated_spectrum(grid122):
    n = 512
    a_np = _sym(n, np.linspace(-1.0, 1.0, n), seed=0)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, v = eigh.eigh(grid122, a, _cfg())
    _check(a_np, w, v)


def test_eigh_unaligned_padding_path(grid122):
    # n = 320 is not a multiple of the 128 alignment: every stage runs via
    # the decoupled zero/identity embedding
    n = 320
    a_np = _sym(n, np.linspace(0.1, 3.0, n), seed=1)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, v = eigh.eigh(grid122, a, _cfg())
    _check(a_np, w, v)


def test_eigh_clustered(grid122):
    # two tight clusters + spread tail: exercises repeated eigenvalues and
    # lopsided shift retries
    n = 384
    vals = np.concatenate([np.full(128, -1.0), np.full(128, 1.0),
                           np.linspace(2.0, 3.0, 128)])
    a_np = _sym(n, vals, seed=2)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, v = eigh.eigh(grid122, a, _cfg())
    _check(a_np, w, v, rtol=1e-4)


def test_eigh_cluster_early_out(grid122):
    # sigma I + tiny noise: the Gershgorin cluster test must fire (no
    # polar at all) and return diagonal/identity
    n = 256
    rng = np.random.default_rng(3)
    e = rng.standard_normal((n, n)) * 1e-9
    a_np = 2.5 * np.eye(n) + (e + e.T) / 2
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, v = eigh.eigh(grid122, a, _cfg(base_n=64))
    assert np.allclose(np.asarray(w), 2.5, atol=1e-5)
    v64 = np.asarray(v, np.float64)
    assert np.linalg.norm(v64.T @ v64 - np.eye(n)) / np.sqrt(n) < 1e-6


def test_eigh_f64(grid122):
    with jax.enable_x64():
        n = 256
        a_np = _sym(n, np.linspace(-2.0, 2.0, n), seed=4)
        a = jax.device_put(a_np, grid122.sharding(grid122.slice_spec))
        w, v = eigh.eigh(grid122, a, _cfg(base_n=64))
        _check(a_np, w, v, rtol=1e-12, ortho=1e-13)


def test_eigh_on_25d_grid(grid222):
    n = 512
    a_np = _sym(n, np.linspace(0.5, 4.0, n), seed=5)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid222.sharding(grid222.slice_spec))
    w, v = eigh.eigh(grid222, a, _cfg())
    _check(a_np, w, v)


def test_eigh_rejects_nonsquare(grid122):
    a = jnp.zeros((8, 4), jnp.float32)
    with pytest.raises(ValueError):
        eigh.eigh(grid122, a)


def test_eigh_generalized(grid122):
    """A x = lambda B x against an f64 oracle built from the same
    reduction; X must be B-orthonormal."""
    n = 256
    rng = np.random.default_rng(9)
    s = rng.standard_normal((n, n))
    a_np = (s + s.T) / 2
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    b_np = (q * np.linspace(0.5, 2.0, n)) @ q.T  # SPD, cond 4
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    b = jax.device_put(np.asarray(b_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, x = eigh.eigh_gen(grid122, a, b, _cfg())

    # f64 oracle via the same (exact) reduction
    r = np.linalg.cholesky(b_np).T
    rinv = np.linalg.inv(r)
    c = rinv.T @ a_np @ rinv
    w_true = np.linalg.eigvalsh(c)
    scale = np.abs(w_true).max()
    assert np.abs(np.asarray(w, np.float64) - w_true).max() < 5e-4 * scale

    x64 = np.asarray(x, np.float64)
    # B-orthonormality
    btb = x64.T @ b_np @ x64
    assert np.linalg.norm(btb - np.eye(n)) / np.sqrt(n) < 2e-5
    # generalized eigenpair residual
    res = np.linalg.norm(a_np @ x64 - (b_np @ x64) * np.asarray(w, np.float64))
    assert res / np.linalg.norm(a_np) < 1e-3


def test_eigh_partial_top(grid122):
    """Top-k eigenpairs against the numpy oracle: values, eigenpair
    residual, orthonormal columns."""
    n, k = 384, 32
    a_np = _sym(n, np.linspace(-2.0, 2.0, n), seed=6)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, x = eigh.eigh_partial(grid122, a, k, _cfg(), which="top")
    w64 = np.asarray(w, np.float64)
    x64 = np.asarray(x, np.float64)
    assert w64.shape == (k,) and x64.shape == (n, k)
    w_true = np.linalg.eigvalsh(a_np)[-k:]
    scale = np.linalg.norm(a_np)
    assert np.all(np.diff(w64) >= -1e-6 * scale)
    assert np.abs(w64 - w_true).max() < 3e-5 * scale
    res = np.linalg.norm(a_np @ x64 - x64 * w64) / scale
    assert res < 2e-4, res
    og = np.linalg.norm(x64.T @ x64 - np.eye(k))
    assert og < 1e-5, og


def test_eigh_partial_bottom(grid122):
    n, k = 320, 24  # unaligned n: embedding path
    a_np = _sym(n, np.linspace(0.1, 5.0, n), seed=7)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, x = eigh.eigh_partial(grid122, a, k, _cfg(), which="bottom")
    w_true = np.linalg.eigvalsh(a_np)[:k]
    scale = np.linalg.norm(a_np)
    w64 = np.asarray(w, np.float64)
    assert np.all(np.diff(w64) >= -1e-6 * scale)
    assert np.abs(w64 - w_true).max() < 3e-5 * scale
    x64 = np.asarray(x, np.float64)
    res = np.linalg.norm(a_np @ x64 - x64 * w64) / scale
    assert res < 2e-4, res


def test_eigh_partial_k_equals_n_and_validation(grid122):
    n = 192
    a_np = _sym(n, np.linspace(1.0, 2.0, n), seed=8)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, x = eigh.eigh_partial(grid122, a, n, _cfg(base_n=64))
    assert np.asarray(w).shape == (n,)
    with pytest.raises(ValueError):
        eigh.eigh_partial(grid122, a, 0)
    with pytest.raises(ValueError):
        eigh.eigh_partial(grid122, a, 4, which="middle")


def test_count_above_and_eigvalsh(grid122):
    n = 256
    a_np = _sym(n, np.linspace(-1.0, 1.0, n), seed=10)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w_true = np.linalg.eigvalsh(a_np)
    # sigma between two well-separated interior eigenvalues
    sigma = 0.5 * (w_true[200] + w_true[201])
    assert eigh.count_above(grid122, a, float(sigma), _cfg()) == n - 201
    w = eigh.eigvalsh(grid122, a, _cfg())
    assert np.abs(np.asarray(w, np.float64) - w_true).max() \
        < 3e-5 * np.linalg.norm(a_np)


def test_eigh_partial_on_25d_grid(grid222):
    """Partial path on a c=2 2.5D mesh: same oracle contract as the
    flat-grid test (all stages — sign, split, child, TSQR refinement —
    ride the distributed engines)."""
    n, k = 256, 16
    a_np = _sym(n, np.linspace(-1.5, 1.5, n), seed=12)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid222.sharding(grid222.slice_spec))
    w, x = eigh.eigh_partial(grid222, a, k, _cfg(base_n=64), which="top")
    w_true = np.linalg.eigvalsh(a_np)[-k:]
    scale = np.linalg.norm(a_np)
    assert np.abs(np.asarray(w, np.float64) - w_true).max() < 3e-5 * scale
    x64 = np.asarray(x, np.float64)
    res = np.linalg.norm(a_np @ x64 - x64 * np.asarray(w, np.float64)) / scale
    assert res < 2e-4, res


def test_eigh_partial_indivisible_n(grid122):
    """n not divisible by the device count: the refinement's TSQR branch
    must fall back to replicated Householder QR instead of crashing in
    shard_map (review finding, round 4)."""
    n, k = 302, 12
    a_np = _sym(n, np.linspace(-2.0, 2.0, n), seed=14)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, x = eigh.eigh_partial(grid122, a, k, _cfg(base_n=96))
    w_true = np.linalg.eigvalsh(a_np)[-k:]
    assert np.abs(np.asarray(w, np.float64) - w_true).max() \
        < 1e-4 * np.linalg.norm(a_np)


def test_eigh_partial_k_beyond_half(grid122):
    """k > n/2 routes to the full solver (the bisection window would be
    empty and every O(n^3) probe wasted)."""
    n, k = 256, 200
    a_np = _sym(n, np.linspace(0.5, 3.0, n), seed=15)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    w, x = eigh.eigh_partial(grid122, a, k, _cfg())
    w_true = np.linalg.eigvalsh(a_np)[-k:]
    assert np.asarray(w).shape == (k,)
    assert np.abs(np.asarray(w, np.float64) - w_true).max() \
        < 1e-4 * np.linalg.norm(a_np)


def test_eigh_partial_bf16_probes(grid1):
    """Mixed-precision partial solve: bf16 sign probes + split (the
    n=32768 HBM-fit path) with Rayleigh-Ritz refinement re-extracting
    against the f32 operand recovers f32-class eigenpairs."""
    from capital_tpu import matrix

    n, k = 256, 16
    a = matrix.symmetric(grid1, n, jax.random.key(77), diag_shift=0.0).data
    cfg = eigh.Config(base_n=64, probe_dtype="bfloat16", partial_refine=2)
    w, x = eigh.eigh_partial(grid1, a, k, cfg, which="top")
    a64 = np.asarray(a, np.float64)
    x64 = np.asarray(x, np.float64)
    res = (np.linalg.norm(a64 @ x64 - x64 * np.asarray(w, np.float64))
           / np.linalg.norm(a64))
    assert res < 5e-4, res
    w_ref = np.linalg.eigvalsh(a64)[-k:]
    assert np.max(np.abs(np.sort(np.asarray(w, np.float64)) - w_ref)
                  / np.abs(w_ref)) < 1e-3
