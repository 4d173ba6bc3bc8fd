"""Newton-Schulz inverse, recursive triangular inverse, TRSM.

These complete what the reference left broken (newton does not compile,
ref: src/alg/inverse/newton/newton.h:16-18), half-done (rectri's combine is
a commented sketch, ref: src/alg/inverse/rectri/rectri.hpp:61-100) or
stubbed (trsm is static_assert(0), ref: src/alg/trsm/diaginvert/
diaginvert.hpp:9). Validation criterion ||A A^{-1} - I|| follows the
reference's inverse validator (ref: test/inverse/validate.hpp:7-34).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu.algs import newton, rectri, trsm
from capital_tpu.parallel import summa


def _spd(grid, n, seed=0):
    from capital_tpu import matrix

    return matrix.symmetric(grid, n, jax.random.key(seed)).data


def test_newton_spd(grid122):
    n = 256
    a = _spd(grid122, n)
    cfg = newton.Config(spd=True, tol=1e-6, summa_impl="shard_map")
    x, iters, res = newton.invert(grid122, a, cfg)
    assert float(res) < 1e-5, float(res)
    assert int(iters) < 50
    err = jnp.linalg.norm(a @ x - jnp.eye(n)) / jnp.sqrt(n)
    assert float(err) < 1e-4


def test_newton_general(grid122):
    n = 128
    key = jax.random.key(1)
    a = jax.random.uniform(key, (n, n), minval=-0.5, maxval=0.5) + n * jnp.eye(n)
    cfg = newton.Config(spd=False, tol=1e-6, summa_impl="gspmd")
    x, iters, res = newton.invert(grid122, a, cfg)
    assert float(res) < 1e-5


@pytest.mark.parametrize("lower", [True, False])
def test_rectri(grid122, lower):
    n = 256
    a = _spd(grid122, n, seed=2)
    t = jnp.tril(a) if lower else jnp.triu(a)
    cfg = rectri.Config(min_bc=64, base_method="xla")
    x = rectri.invert(grid122, t, lower=lower, cfg=cfg)
    err = jnp.linalg.norm(t @ x - jnp.eye(n)) / jnp.sqrt(n)
    assert float(err) < 1e-5, float(err)
    # inverse of a triangle is triangular with the same structure
    off = np.triu(np.asarray(x), 1) if lower else np.tril(np.asarray(x), -1)
    np.testing.assert_allclose(off, 0, atol=1e-6)


@pytest.mark.parametrize("lower", [True, False])
def test_trsm_left(grid122, lower):
    n, m = 256, 128
    a = _spd(grid122, n, seed=3)
    t = jnp.tril(a) if lower else jnp.triu(a)
    b = jax.random.uniform(jax.random.key(4), (n, m), minval=-1, maxval=1)
    cfg = trsm.Config(nb=64, tri=rectri.Config(min_bc=64, base_method="xla"))
    x = trsm.solve(grid122, t, b, side="L", lower=lower, cfg=cfg)
    err = jnp.linalg.norm(t @ x - b) / jnp.linalg.norm(b)
    assert float(err) < 1e-5, float(err)


def test_trsm_right(grid122):
    n, m = 128, 256
    a = _spd(grid122, n, seed=5)
    t = jnp.tril(a)
    b = jax.random.uniform(jax.random.key(6), (m, n), minval=-1, maxval=1)
    cfg = trsm.Config(nb=64, tri=rectri.Config(min_bc=64, base_method="xla"))
    x = trsm.solve(grid122, t, b, side="R", lower=True, cfg=cfg)
    err = jnp.linalg.norm(x @ t - b) / jnp.linalg.norm(b)
    assert float(err) < 1e-5, float(err)


def test_trsm_trace_is_panel_count_independent(grid122):
    """The substitution is one lax.scan over panels: top-level trace size
    must not grow with the panel count (the reference-scale n=65536/nb=1024
    case would otherwise unroll ~2,080 gemms)."""
    n, m = 512, 64
    key = jax.random.key(21)
    t = jnp.tril(jax.random.uniform(key, (n, n))) + n * jnp.eye(n)
    b = jax.random.uniform(jax.random.key(22), (n, m))
    cfg = trsm.Config(nb=64, tri=rectri.Config(min_bc=64, base_method="xla"))
    jaxpr = jax.make_jaxpr(
        lambda a_, b_: trsm.solve(grid122, a_, b_, cfg=cfg))(t, b)
    prims = [e.primitive.name for e in jaxpr.eqns]
    assert "scan" in prims
    # substitution gemms live inside the single scan, not unrolled at top
    # level: with 8 panels an unrolled version would have >= 36 top-level
    # shard_map gemms; the scan body has 2
    assert prims.count("shard_map") < 30
    x = trsm.solve(grid122, t, b, cfg=cfg)
    ref = np.linalg.solve(np.asarray(t, np.float64), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-4, atol=2e-4)


def test_trsm_unit_diag_packed_workspace(grid122):
    """unit_diag reads only the strict triangle (the packed-LU workspace
    convention): solving with a workspace whose diagonal/upper hold
    unrelated values equals solving with the explicit unit-lower L."""
    from capital_tpu import matrix
    from capital_tpu.algs import trsm

    n, k = 128, 8
    w = matrix.rand(grid122, n, n, jax.random.key(31)).data
    b = matrix.rand(grid122, n, k, jax.random.key(32)).data
    l = jnp.tril(w, -1) + jnp.eye(n, dtype=w.dtype)
    x0 = trsm.solve(grid122, l, b, lower=True)
    x1 = trsm.solve(grid122, w, b, lower=True, unit_diag=True)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                               rtol=1e-6, atol=1e-6)
