"""Smoke tier: one tiny test per engine/path, `pytest -m smoke` green in
under two minutes on the 8-device virtual CPU mesh.

The full 200-test suite exceeds 9 minutes wall (each shard_map recursion
is a fresh XLA compile); CI and a fresh checkout need a sub-minute
"is it green?" answer. Every test here is an end-to-end factorize+validate
at n=128-256 with the cheapest config that still exercises the
distributed path (the reference has no test runner at all — SURVEY §4;
this tier is the fast half of the pytest strategy that replaces it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu import linalg, matrix, validate
from capital_tpu.parallel import summa

pytestmark = pytest.mark.smoke


def test_summa_gemm(grid222):
    a = matrix.rand(grid222, 128, 128, jax.random.key(0)).data
    b = matrix.rand(grid222, 128, 128, jax.random.key(1)).data
    c = summa.gemm(grid222, a, b)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(c), ref, rtol=1e-5, atol=1e-4)


def test_summa_ring_and_collect(grid222):
    a = matrix.rand(grid222, 128, 128, jax.random.key(2)).data
    b = matrix.rand(grid222, 128, 128, jax.random.key(3)).data
    c0 = summa.gemm(grid222, a, b)
    c1 = summa.gemm(grid222, a, b, impl="ring")
    c2 = summa.gemm(grid222, a, b, num_chunks=2, collect_chunks=2)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c2),
                               rtol=1e-6, atol=1e-5)


def test_cholinv(grid222):
    from capital_tpu.algs import cholinv

    a = matrix.symmetric(grid222, 256, jax.random.key(4)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla")
    r, rinv = cholinv.factor(grid222, a, cfg)
    assert float(validate.cholesky_residual(grid222, a, r)) < 5e-6
    assert float(validate.inverse_residual(grid222, r, rinv)) < 5e-6


def test_cholinv_layer_policy(grid222):
    from capital_tpu.algs import cholinv

    a = matrix.symmetric(grid222, 256, jax.random.key(5)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", base_policy="layer")
    r, _ = cholinv.factor(grid222, a, cfg)
    assert float(validate.cholesky_residual(grid222, a, r)) < 5e-6


def test_cacqr_1d(grid1d8):
    from capital_tpu.algs import cacqr

    a = matrix.tall_skinny(grid1d8, 1024, 64, jax.random.key(6)).data
    q, r = cacqr.factor_1d(grid1d8, a, cacqr.Config(num_iter=2))
    assert float(validate.qr_orthogonality(grid1d8, q, layout="1d")) < 5e-6


def test_cacqr_hybrid(grid_rect):
    from capital_tpu.algs import cacqr, cholinv

    a = matrix.tall_skinny(grid_rect, 512, 128, jax.random.key(7)).data
    cfg = cacqr.Config(num_iter=2, gram_policy="two_stage",
                       chol=cholinv.Config(min_bc=64, base_method="xla"))
    q, r = cacqr.factor_hybrid(grid_rect, a, cfg)
    assert float(validate.qr_orthogonality(grid_rect, q, layout="1d")) < 5e-6


def test_lu_solve(grid122):
    a = grid122.constrain(
        jax.random.normal(jax.random.key(8), (256, 256)), grid122.slice_spec)
    b = jax.random.normal(jax.random.key(9), (256, 8))
    x = linalg.solve(grid122, a, b, method="lu")
    res = float(jnp.linalg.norm(a @ x - b) / jnp.linalg.norm(b))
    assert res < 1e-5, res


def test_trsm(grid122):
    from capital_tpu.algs import rectri, trsm

    a = matrix.symmetric(grid122, 128, jax.random.key(10)).data
    t = jnp.tril(a)
    b = matrix.rand(grid122, 128, 16, jax.random.key(11)).data
    cfg = trsm.Config(nb=64, tri=rectri.Config(min_bc=32, base_method="xla"))
    x = trsm.solve(grid122, t, b, lower=True, cfg=cfg)
    res = float(jnp.linalg.norm(t @ x - b) / jnp.linalg.norm(b))
    assert res < 1e-4, res


def test_newton(grid122):
    from capital_tpu.algs import newton

    a = matrix.symmetric(grid122, 128, jax.random.key(12)).data
    x, iters, res = newton.invert(grid122, a,
                                  newton.Config(spd=True,
                                                summa_impl="shard_map"))
    assert float(res) < 1e-4


def test_tsqr(grid1d8):
    from capital_tpu.algs import tsqr

    a = matrix.tall_skinny(grid1d8, 512, 32, jax.random.key(13)).data
    q, r = tsqr.factor(grid1d8, a)
    assert float(validate.qr_orthogonality(grid1d8, q, layout="1d")) < 5e-6


def test_pallas_kernels_interpret(grid1):
    from capital_tpu.ops.pallas_chol import chol_inv_pallas
    from capital_tpu.ops.pallas_getrf import getrf_leaf_pallas
    from jax import lax

    u = jax.random.uniform(jax.random.key(14), (128, 128),
                           minval=-0.5, maxval=0.5)
    a = (u + u.T) * 0.5 + 128 * jnp.eye(128)
    r, rinv = chol_inv_pallas(a, interpret=True)
    assert float(jnp.linalg.norm(r.T @ r - a) / jnp.linalg.norm(a)) < 1e-5

    s = jax.random.normal(jax.random.key(15), (256, 16))
    lu_, pj, piv = getrf_leaf_pallas(s, interpret=True)
    ref, piv_ref, perm_ref = lax.linalg.lu(s)
    np.testing.assert_array_equal(np.asarray(pj), np.asarray(perm_ref))


def test_eigh_small(grid122):
    from capital_tpu.algs import eigh

    a = matrix.symmetric(grid122, 128, jax.random.key(16),
                         diag_shift=0.0).data
    w, v = eigh.eigh(grid122, a, eigh.Config(base_n=64))
    a64, v64 = np.asarray(a, np.float64), np.asarray(v, np.float64)
    res = (np.linalg.norm(a64 @ v64 - v64 * np.asarray(w, np.float64))
           / np.linalg.norm(a64))
    assert res < 1e-4, res
