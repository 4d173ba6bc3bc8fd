"""ALS matrix-factorization recommender via batched normal-equation Cholesky.

The BASELINE.json config "ALS matrix-factorization recommender ... via
batched normal-equation Cholesky solves" — the serving-side application the
factorization engine exists for. No counterpart in the reference (it stops
at the factorizations); this is the framework's own capability.

Model: ratings R (users x items, observed entries masked), factors
U (users x k), V (items x k), ridge lambda. Alternating updates, each a
batch of k x k SPD normal-equation solves:

    per user u:  (V^T diag(m_u) V + lam*I) U_u = V^T (m_u * r_u)

TPU mapping:
  * users row-sharded over the full mesh (the tall axis — same layout as
    the tall-skinny QR path), V replicated (items x k is small),
  * the per-user Gramians for ALL users at once as one einsum
    ('ui,ik,il->ukl') — an MXU-batched contraction, no gather/scatter,
  * the solve as a vmapped Cholesky (XLA batches small potrf/solves well;
    k is 32-256 so the MXU tiles the whole batch),
  * item update is the transpose-dual with U replicated per shard via
    all_gather when items are sharded; here V is replicated so it is a
    psum of per-shard Gramian contributions.

Synthetic data generator included (zero-egress environment: MovieLens-scale
shapes, planted low-rank ground truth + noise + random observation mask).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from capital_tpu import tracing
from capital_tpu.grid import Grid, ALL_AXES
from capital_tpu.ops.precision import prec


@dataclass(frozen=True)
class Config:
    rank: int = 64
    lam: float = 0.1
    num_iters: int = 10


def synthetic_ratings(grid: Grid, users: int, items: int, key,
                      rank: int = 16, density: float = 0.05,
                      dtype=jnp.float32):
    """Planted low-rank ratings + Bernoulli(density) observation mask,
    users row-sharded over the full mesh."""
    pu = -(-users // grid.num_devices) * grid.num_devices
    ku, kv, km, kn = jax.random.split(key, 4)

    def gen():
        ut = jax.random.normal(ku, (pu, rank), dtype) / jnp.sqrt(rank)
        vt = jax.random.normal(kv, (items, rank), dtype) / jnp.sqrt(rank)
        r = ut @ vt.T + 0.05 * jax.random.normal(kn, (pu, items), dtype)
        m = (jax.random.uniform(km, (pu, items)) < density)
        live = (jnp.arange(pu) < users)[:, None]
        m = m & live
        return r * m, m.astype(dtype)

    sh = grid.sharding(P(ALL_AXES, None))
    r, m = jax.jit(gen, out_shardings=(sh, sh))()
    return r, m


def _solve_batch(g, b):
    """Solve G_i x_i = b_i for a batch of SPD k x k systems via Cholesky
    (the 'batched normal-equation Cholesky solve' of the north star)."""
    l = lax.linalg.cholesky(g)  # batched potrf
    y = lax.linalg.triangular_solve(l, b[..., None], left_side=True,
                                    lower=True)
    x = lax.linalg.triangular_solve(l, y, left_side=True, lower=True,
                                    transpose_a=True)
    return x[..., 0]


def _update_users(grid: Grid, r, m, v, lam):
    """U (sharded like R's rows) from fixed V (replicated): zero comm."""
    k = v.shape[1]
    eye = lam * jnp.eye(k, dtype=v.dtype)

    def kern(r_blk, m_blk):
        # per-user Gramians: G_u = sum_i m_ui v_i v_i^T  (one batched einsum)
        g = jnp.einsum("ui,ik,il->ukl", m_blk, v, v, precision=prec())
        b = jnp.einsum("ui,ik->uk", r_blk, v, precision=prec())
        return _solve_batch(g + eye, b)

    f = jax.shard_map(kern, mesh=grid.mesh,
                      in_specs=(P(ALL_AXES, None), P(ALL_AXES, None)),
                      out_specs=P(ALL_AXES, None))
    return f(r, m)


def _update_items(grid: Grid, r, m, u, lam):
    """V (replicated) from fixed U (row-sharded): per-shard Gramian
    contributions summed with one psum — the same communication shape as
    the tall-skinny Gram reduction (cacqr.gram_1d)."""
    k = u.shape[1]
    eye = lam * jnp.eye(k, dtype=u.dtype)

    def kern(r_blk, m_blk, u_blk):
        g = jnp.einsum("ui,uk,ul->ikl", m_blk, u_blk, u_blk, precision=prec())
        b = jnp.einsum("ui,uk->ik", r_blk, u_blk, precision=prec())
        g = lax.psum(g, ALL_AXES)
        b = lax.psum(b, ALL_AXES)
        return _solve_batch(g + eye, b)

    f = jax.shard_map(kern, mesh=grid.mesh,
                      in_specs=(P(ALL_AXES, None), P(ALL_AXES, None),
                                P(ALL_AXES, None)),
                      out_specs=P(None, None))
    return f(r, m, u)


def rmse(grid: Grid, r, m, u, v) -> jax.Array:
    """Observed-entry RMSE."""
    pred = jnp.einsum("uk,ik->ui", u, v, precision=prec())
    se = jnp.sum(jnp.square((pred - r) * m))
    cnt = jnp.sum(m)
    return jnp.sqrt(se / jnp.maximum(cnt, 1.0))


def fit(grid: Grid, r, m, cfg: Config = Config(), key=None):
    """Run ALS; returns (U, V, rmse_history). jit-friendly (fori_loop)."""
    users, items = r.shape
    key = jax.random.key(0) if key is None else key
    v0 = jax.random.normal(key, (items, cfg.rank), r.dtype) / jnp.sqrt(cfg.rank)

    def step(_, carry):
        u, v = carry
        with tracing.phase("ALS::users"):
            u = _update_users(grid, r, m, v, cfg.lam)
        with tracing.phase("ALS::items"):
            v = _update_items(grid, r, m, u, cfg.lam)
        return u, v

    u0 = jnp.zeros((users, cfg.rank), r.dtype)
    u0 = grid.constrain(u0, P(ALL_AXES, None))
    u, v = lax.fori_loop(0, cfg.num_iters, step, (u0, v0))
    return u, v, rmse(grid, r, m, u, v)
