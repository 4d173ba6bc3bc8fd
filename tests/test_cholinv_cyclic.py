"""Cyclic-workspace cholinv (algs/cholinv_cyclic.py): the zero-resharding
recursion agrees with the block-sharded flagship on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu import matrix, validate
from capital_tpu.algs import cholinv, cholinv_cyclic


def _spd(grid, n, seed):
    return matrix.symmetric(grid, n, jax.random.key(seed)).data


def test_matches_block_sharded(grid122):
    n = 256
    a = _spd(grid122, n, 21)
    cfg = cholinv.Config(min_bc=64, base_method="xla")
    r0, ri0 = cholinv.factor(grid122, a, cfg)
    r1, ri1 = cholinv_cyclic.factor(grid122, a, cfg)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ri0), np.asarray(ri1),
                               rtol=1e-5, atol=1e-5)


def test_residuals_25d(grid222):
    n = 256
    a = _spd(grid222, n, 22)
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_chunks=2)
    r, rinv = cholinv_cyclic.factor(grid222, a, cfg)
    assert float(validate.cholesky_residual(grid222, a, r)) < 5e-6
    assert float(validate.inverse_residual(grid222, r, rinv)) < 5e-6


def test_jit(grid122):
    n = 128
    a = _spd(grid122, n, 23)
    cfg = cholinv.Config(min_bc=64, base_method="xla")
    f = jax.jit(lambda x: cholinv_cyclic.factor(grid122, x, cfg))
    r, rinv = f(a)
    assert float(validate.cholesky_residual(grid122, a, r)) < 5e-6
