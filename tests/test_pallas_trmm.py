"""Triangle-aware Pallas TRMM vs f64 oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu.ops.pallas_trmm import trmm_upper


def _rand(shape, seed, dtype=jnp.float32):
    return jax.random.uniform(jax.random.key(seed), shape, minval=-1.0,
                              maxval=1.0).astype(dtype)


def _oracle(u, b, side, trans_a):
    u64 = np.triu(np.asarray(u, np.float64))
    b64 = np.asarray(b, np.float64)
    if side == "L":
        return (u64.T @ b64) if trans_a else (u64 @ b64)
    return (b64 @ u64.T) if trans_a else (b64 @ u64)


@pytest.mark.parametrize("side,trans_a", [("L", False), ("L", True),
                                          ("R", False), ("R", True)])
def test_trmm_upper_matches_oracle(side, trans_a):
    n, m = 512, 256
    u = _rand((n, n), 1)
    b = _rand((n, m) if side == "L" else (m, n), 2)
    out = trmm_upper(u, b, side=side, trans_a=trans_a, interpret=True,
                     t=256, mc=256)
    ref = _oracle(u, b, side, trans_a)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-6, atol=2e-5)


def test_trmm_upper_ignores_lower_garbage():
    """Only the upper triangle of U may contribute (the masked diagonal
    tile + skipped lower pairs)."""
    n, m = 512, 256
    u = _rand((n, n), 3)
    garbage = u + 1e6 * jnp.tril(jnp.ones((n, n)), k=-1)
    b = _rand((n, m), 4)
    out = trmm_upper(garbage, b, side="L", interpret=True, t=256, mc=256)
    ref = _oracle(u, b, "L", False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-6, atol=2e-5)


def test_trmm_upper_bf16():
    n, m = 512, 256
    u = _rand((n, n), 5, jnp.bfloat16)
    b = _rand((m, n), 6, jnp.bfloat16)
    out = trmm_upper(u, b, side="R", interpret=True, t=256, mc=256)
    ref = _oracle(u, b, "R", False)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               rtol=2e-2, atol=2e-2)


def test_trmm_upper_ragged_fallback():
    n, m = 320, 96  # not tile-aligned: masked-dot fallback
    u = _rand((n, n), 7)
    b = _rand((n, m), 8)
    out = trmm_upper(u, b, side="L", interpret=True)
    np.testing.assert_allclose(np.asarray(out), _oracle(u, b, "L", False),
                               rtol=2e-6, atol=2e-5)
    out_t = trmm_upper(u, b, side="L", trans_a=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_t), _oracle(u, b, "L", True),
                               rtol=2e-6, atol=2e-5)


def test_blas_trmm_tri_method_routes():
    """blas.trmm(method='tri') gives the same result as the masked dot."""
    from capital_tpu.ops import blas

    n, m = 512, 256
    u = _rand((n, n), 9)
    b = _rand((n, m), 10)
    d0 = blas.trmm(u, b, side="L", uplo="U", method="dot")
    # interpret-mode Pallas via the kernel directly (method='tri' compiles
    # for TPU; on CPU we exercise the same code path interpreted)
    d1 = trmm_upper(u, b, side="L", interpret=True, t=256, mc=256)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=2e-6, atol=2e-5)
