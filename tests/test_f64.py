"""float64 path: the reference's MKL precision class (~1e-14 residuals).

TPU f64 is slow but available; on CPU (tests) it is native. Verifies the
framework carries f64 end-to-end without silently downcasting accumulation.
"""

import jax
import jax.numpy as jnp
import pytest



def test_cholinv_f64(grid122):
    with jax.enable_x64():
        from capital_tpu import validate
        from capital_tpu.algs import cholinv

        n = 256
        u = jax.random.uniform(jax.random.key(0), (n, n), dtype=jnp.float64,
                               minval=-0.5, maxval=0.5)
        a = (u + u.T) * 0.5 + n * jnp.eye(n, dtype=jnp.float64)
        a = jax.lax.with_sharding_constraint(
            a, grid122.sharding(grid122.slice_spec))
        cfg = cholinv.Config(min_bc=64, base_method="xla")
        r, rinv = cholinv.factor(grid122, a, cfg)
        assert r.dtype == jnp.float64
        res = float(validate.cholesky_residual(grid122, a, r))
        ores = float(validate.inverse_residual(grid122, r, rinv))
    assert res < 1e-13, res
    assert ores < 1e-13, ores


def test_cacqr_f64(grid_rect):
    with jax.enable_x64():
        from capital_tpu import validate
        from capital_tpu.algs import cacqr

        m, n = 4096, 128
        a = jax.random.uniform(jax.random.key(1), (m, n), dtype=jnp.float64,
                               minval=-0.5, maxval=0.5)
        from jax.sharding import PartitionSpec as P
        from capital_tpu.grid import ALL_AXES
        a = jax.lax.with_sharding_constraint(
            a, grid_rect.sharding(P(ALL_AXES, None)))
        q, r = cacqr.factor_1d(grid_rect, a, cacqr.Config(num_iter=2,
                                                          base_method="xla"))
        assert q.dtype == jnp.float64
        ortho = float(validate.qr_orthogonality(grid_rect, q, layout="1d"))
    assert ortho < 1e-13, ortho
