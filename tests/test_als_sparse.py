"""Bucketed-sparse ALS: regular bipartite observations, O(nnz k^2) updates."""

import jax
import jax.numpy as jnp
import numpy as np

from capital_tpu.apps import als


def test_index_structures_consistent(grid1):
    """The user-major and item-major views describe the same edge set."""
    users, items, s = 64, 16, 4
    data = als.synthetic_regular(grid1, users, items, s, jax.random.key(0))
    edges_u = {(u, int(i)) for u in range(users) for i in np.asarray(data.idx[u])}
    edges_i = {(int(u), i) for i in range(items) for u in np.asarray(data.idx_t[i])}
    assert edges_u == edges_i
    # exact regular degrees
    assert data.idx.shape == (users, s)
    assert data.idx_t.shape == (items, s * users // items)


def test_values_consistent_across_views(grid1):
    users, items, s = 32, 8, 3
    data = als.synthetic_regular(grid1, users, items, s, jax.random.key(1))
    # every (u, i, val) in the user view appears in the item view
    vals_u = {}
    for u in range(users):
        for j in range(s):
            vals_u[(u, int(data.idx[u, j]))] = float(data.val[u, j])
    for i in range(items):
        for t in range(data.idx_t.shape[1]):
            u = int(data.idx_t[i, t])
            key = (u, i)
            if key in vals_u:  # duplicates may differ in which round they hit
                np.testing.assert_allclose(float(data.val_t[i, t]),
                                           vals_u[key], rtol=1e-5)


def test_fit_sparse_recovers(grid1):
    users, items, s = 512, 128, 24
    data = als.synthetic_regular(grid1, users, items, s, jax.random.key(2),
                                 rank=6)
    cfg = als.Config(rank=12, lam=0.05, num_iters=8)
    u, v, err = jax.jit(
        lambda d: als.fit_sparse(grid1, d, cfg, items=items))(data)
    # planted noise floor is 0.05
    assert float(err) < 0.08, float(err)
    assert u.shape == (users, 12) and v.shape == (items, 12)
