"""ALS recommender (batched normal-equation Cholesky solves) on a virtual
mesh — the BASELINE.json application config."""

import jax
import jax.numpy as jnp

from capital_tpu.apps import als


def test_als_recovers_planted_factors(grid222):
    users, items, true_rank = 512, 256, 8
    r, m = als.synthetic_ratings(grid222, users, items, jax.random.key(0),
                                 rank=true_rank, density=0.3)
    cfg = als.Config(rank=16, lam=0.05, num_iters=8)
    u, v, err = jax.jit(lambda rr, mm: als.fit(grid222, rr, mm, cfg))(r, m)
    # planted noise floor is 0.05; ALS should get near it
    assert float(err) < 0.08, float(err)
    assert u.shape == (512, 16) and v.shape == (256, 16)


def test_als_progress(grid122):
    users, items = 256, 128
    r, m = als.synthetic_ratings(grid122, users, items, jax.random.key(1),
                                 rank=4, density=0.5)
    cfg1 = als.Config(rank=8, lam=0.05, num_iters=1)
    cfg5 = als.Config(rank=8, lam=0.05, num_iters=5)
    _, _, e1 = als.fit(grid122, r, m, cfg1)
    _, _, e5 = als.fit(grid122, r, m, cfg5)
    assert float(e5) <= float(e1) + 1e-6
