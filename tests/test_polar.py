"""QDWH polar decomposition (algs/polar.py): U orthogonal, H SPD,
U H = A, against numpy/f64 oracles, on distributed meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu.algs import polar


def _controlled(n, cond, seed=0, m=None):
    """A = U diag(s) V^T with condition number `cond` (f64 construction)."""
    m = m or n
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.geomspace(1.0, 1.0 / cond, n)
    a = (u * s) @ v.T
    u_polar = u @ v.T  # exact polar factor
    return a, u_polar


def _ortho(u):
    u = np.asarray(u, np.float64)
    return np.linalg.norm(u.T @ u - np.eye(u.shape[1])) / np.sqrt(u.shape[1])


def test_qdwh_weight_schedule_converges():
    sched = polar.qdwh_weights(1e-5, jnp.float32)
    assert len(sched) <= 7
    # replay the scalar recurrence: every singular value in [l0, 1] must
    # be mapped to 1 at f32 resolution
    import math
    for s0 in (1e-5, 1e-3, 0.5, 1.0):
        s = s0
        for (a, b, c) in sched:
            s = s * (a + b * s * s) / (1.0 + c * s * s)
        assert abs(s - 1.0) < 1e-5, (s0, s)


def test_polar_square_2d(grid122):
    n = 256
    a_np, u_true = _controlled(n, cond=50.0)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    cfg = polar.Config(chol=polar._cholinv.Config(min_bc=64,
                                                  base_method="xla"))
    u, h = polar.polar(grid122, a, cfg, layout="2d")
    assert _ortho(u) < 5e-6
    u64 = np.asarray(u, np.float64)
    h64 = np.asarray(h, np.float64)
    # H symmetric PSD
    np.testing.assert_allclose(h64, h64.T, atol=1e-6)
    assert np.linalg.eigvalsh(h64).min() > -1e-5
    # reconstruction + agreement with the exact polar factor
    assert np.linalg.norm(u64 @ h64 - a_np) / np.linalg.norm(a_np) < 1e-5
    assert np.abs(u64 - u_true).max() < 1e-4


def test_polar_illconditioned(grid122):
    n = 192
    a_np, u_true = _controlled(n, cond=1e4, seed=1)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    cfg = polar.Config(chol=polar._cholinv.Config(min_bc=64,
                                                  base_method="xla"))
    u, h = polar.polar(grid122, a, cfg, layout="2d")
    assert _ortho(u) < 5e-6
    u64 = np.asarray(u, np.float64)
    assert np.linalg.norm(u64 @ np.asarray(h, np.float64) - a_np) \
        / np.linalg.norm(a_np) < 2e-5
    # the polar factor itself is conditioned by the smallest singular-value
    # gap; for cond=1e4 in f32 allow a looser factor-wise bar
    assert np.abs(u64 - u_true).max() < 5e-3


def test_polar_tall_skinny_1d(grid1d8):
    m, n = 2048, 128
    a_np, u_true = _controlled(n, cond=100.0, seed=2, m=m)
    a = jax.device_put(np.asarray(a_np, np.float32), grid1d8.row1d)
    u, h = polar.polar(grid1d8, a, layout="1d")
    assert _ortho(u) < 5e-6
    u64 = np.asarray(u, np.float64)
    assert np.linalg.norm(u64 @ np.asarray(h, np.float64) - a_np) \
        / np.linalg.norm(a_np) < 1e-5
    assert np.abs(u64 - u_true).max() < 1e-3


def test_polar_u_only(grid122):
    n = 128
    a_np, _ = _controlled(n, cond=10.0, seed=3)
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    cfg = polar.Config(compute_h=False,
                       chol=polar._cholinv.Config(min_bc=64,
                                                  base_method="xla"))
    u = polar.polar(grid122, a, cfg, layout="2d")
    assert _ortho(u) < 5e-6


def test_polar_f64(grid122):
    with jax.enable_x64():
        n = 128
        a_np, u_true = _controlled(n, cond=1e7, seed=4)
        a = jax.device_put(np.asarray(a_np, np.float64),
                           grid122.sharding(grid122.slice_spec))
        cfg = polar.Config(chol=polar._cholinv.Config(min_bc=64,
                                                      base_method="xla"))
        u, h = polar.polar(grid122, a, cfg, layout="2d")
        assert _ortho(u) < 1e-13
        u64, h64 = np.asarray(u), np.asarray(h)
        assert np.linalg.norm(u64 @ h64 - a_np) / np.linalg.norm(a_np) < 1e-12
        assert np.abs(u64 - u_true).max() < 1e-8


def test_polar_symmetric_is_involution(grid122):
    """For symmetric A, U is a symmetric involution (U^2 = I): the property
    the spectral divide-and-conquer eigensolver rides on."""
    n = 128
    rng = np.random.default_rng(5)
    s = rng.standard_normal((n, n))
    a_np = (s + s.T) / 2 + np.diag(np.linspace(-2, 2, n))
    a = jax.device_put(np.asarray(a_np, np.float32),
                       grid122.sharding(grid122.slice_spec))
    cfg = polar.Config(compute_h=False,
                       chol=polar._cholinv.Config(min_bc=64,
                                                  base_method="xla"))
    u = polar.polar(grid122, a, cfg, layout="2d")
    u64 = np.asarray(u, np.float64)
    np.testing.assert_allclose(u64, u64.T, atol=1e-5)
    assert np.linalg.norm(u64 @ u64 - np.eye(n)) / np.sqrt(n) < 1e-5
