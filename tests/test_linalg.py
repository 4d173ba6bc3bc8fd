"""High-level solver API vs dense numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from capital_tpu import linalg, matrix
from capital_tpu.algs import cacqr, cholinv


def test_spd_solve(grid122):
    n, k = 256, 32
    a = matrix.symmetric(grid122, n, jax.random.key(0)).data
    b = matrix.rand(grid122, n, k, jax.random.key(1)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_impl="shard_map")
    x = linalg.spd_solve(grid122, a, b, cfg)
    res = np.linalg.norm(np.asarray(a) @ np.asarray(x) - np.asarray(b))
    res /= np.linalg.norm(np.asarray(b))
    assert res < 1e-5, res


def test_inv(grid122):
    n = 128
    a = matrix.symmetric(grid122, n, jax.random.key(2)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_impl="shard_map")
    ainv = linalg.inv(grid122, a, cfg)
    err = np.linalg.norm(np.asarray(a) @ np.asarray(ainv) - np.eye(n))
    assert err / np.sqrt(n) < 1e-4, err


def test_lstsq(grid_rect):
    m, n, k = 2048, 64, 8
    a = matrix.tall_skinny(grid_rect, m, n, jax.random.key(3)).data
    b = matrix.rand(grid_rect, m, k, jax.random.key(4),
                    spec=jax.sharding.PartitionSpec(("z", "y", "x"), None),
                    row_tile=grid_rect.num_devices).data
    cfg = cacqr.Config(num_iter=2, base_method="xla")
    x = linalg.lstsq(grid_rect, a, b, cfg)
    x0, *_ = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)
    np.testing.assert_allclose(np.asarray(x), x0, atol=1e-3)
