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
from typing import NamedTuple
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


# ---------------------------------------------------------------------------
# bucketed-sparse path: regular bipartite observations, O(nnz k^2) updates
# ---------------------------------------------------------------------------

class SparseRatings(NamedTuple):
    """Fixed-width observation buckets on BOTH sides of the bipartite graph.

    idx  (U, s):  item ids rated by each user (s per user, exactly)
    val  (U, s):  the ratings
    idx_t (I, t): user ids rating each item (t = s*U/I per item, exactly)
    val_t (I, t): the same ratings, item-major
    """

    idx: jax.Array
    val: jax.Array
    idx_t: jax.Array
    val_t: jax.Array


def synthetic_regular(grid: Grid, users: int, items: int, s: int, key,
                      rank: int = 16, dtype=jnp.float32) -> SparseRatings:
    """Regular random bipartite ratings: s observations per user, s*U/I per
    item, built from s permutation rounds (round r: user u rates item
    pi_r[(u + h_r) mod I]). Both fixed-width index structures come from the
    permutations and their inverses — no ragged buckets, no scatter. A user
    may rate an item twice across rounds (double-counted observation);
    harmless for fitting. Requires I | U."""
    if users % items:
        raise ValueError("synthetic_regular needs items | users")
    kperm, kshift, ku, kv, kn = jax.random.split(key, 5)
    perms = jnp.stack([jax.random.permutation(k, items)
                       for k in jax.random.split(kperm, s)])  # (s, I)
    inv = jnp.argsort(perms, axis=1)                          # (s, I)
    shifts = jax.random.randint(kshift, (s,), 0, items)

    u_ids = jnp.arange(users)
    # user-major: idx[u, r] = perms[r, (u + h_r) % I]
    slot = (u_ids[:, None] + shifts[None, :]) % items          # (U, s)
    idx = perms[jnp.arange(s)[None, :], slot]

    # item-major: idx_t[i, r, m] = m*I + (inv[r, i] - h_r) % I
    reps = users // items
    base = (inv.T - shifts[None, :]) % items                   # (I, s)
    idx_t = (base[:, :, None] + items * jnp.arange(reps)[None, None, :])
    idx_t = idx_t.reshape(items, s * reps)

    # planted low-rank ratings + noise, evaluated at the edges
    ut = jax.random.normal(ku, (users, rank), dtype) / jnp.sqrt(rank)
    vt = jax.random.normal(kv, (items, rank), dtype) / jnp.sqrt(rank)
    del kn

    def noise(u, i):
        # cheap exact integer edge hash, bitwise identical from either view
        # (a float sin-hash differs across fusion contexts; per-edge
        # jax.random.fold_in would cost one key derivation per observation
        # — 27M at benchmark scale)
        h = (u.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
             + i.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
        h = h ^ (h >> 15)
        h = h * jnp.uint32(0x2C1B3C6D)
        h = h ^ (h >> 12)
        unit = (h >> 8).astype(jnp.float32) / jnp.float32(1 << 24)
        return (0.05 * (2.0 * unit - 1.0)).astype(dtype)

    def edge_vals(row_f, col_f, row_ids, col_idx, row_is_user, chunks=16):
        """val[r, s] = <row_f[r], col_f[col_idx[r, s]]> + noise(u, i),
        chunked so the (rows, s, k) gather never materializes whole. The
        noise hash is keyed (user, item) regardless of which side is the
        row so both views agree."""
        rows = col_idx.shape[0]
        nch = chunks
        while rows % nch:
            nch -= 1

        def one(args):
            rid, cix = args
            g = col_f[cix]                               # (chunk, s, k)
            v = jnp.einsum("rk,rsk->rs", row_f[rid], g, precision=prec())
            if row_is_user:
                return v + noise(rid[:, None], cix)
            return v + noise(cix, rid[:, None])

        rid = row_ids.reshape(nch, rows // nch)
        cix = col_idx.reshape(nch, rows // nch, -1)
        return jax.lax.map(one, (rid, cix)).reshape(col_idx.shape)

    val = edge_vals(ut, vt, u_ids, idx, row_is_user=True)
    val_t = edge_vals(vt, ut, jnp.arange(items), idx_t, row_is_user=False)
    return SparseRatings(idx=idx, val=val.astype(dtype),
                         idx_t=idx_t, val_t=val_t.astype(dtype))


def _solve_side(factors_other, idx, val, lam, rank, chunks: int = 8):
    """One ALS side: for each row, gather its bucket of other-side factors,
    form the k x k normal equations, batched-Cholesky solve. Chunked with
    lax.map so the (rows, bucket, k) gather never materializes whole."""
    rows = idx.shape[0]
    eye = lam * jnp.eye(rank, dtype=factors_other.dtype)
    nch = chunks
    while rows % nch:
        nch -= 1

    def one_chunk(args):
        idx_c, val_c = args
        f = factors_other[idx_c]                     # (chunk, s, k) gather
        g = jnp.einsum("usk,usl->ukl", f, f, precision=prec()) + eye
        b = jnp.einsum("us,usk->uk", val_c, f, precision=prec())
        return _solve_batch(g, b)

    idx_c = idx.reshape(nch, rows // nch, -1)
    val_c = val.reshape(nch, rows // nch, -1)
    out = jax.lax.map(one_chunk, (idx_c, val_c))
    return out.reshape(rows, rank)


def fit_sparse(grid: Grid, data: SparseRatings, cfg: Config = Config(),
               items: int | None = None):
    """ALS over bucketed-sparse observations: O(nnz * k^2) per side instead
    of the dense-mask O(U * I * k^2) — the update cost the reference-style
    dense formulation wastes by a factor of I/s. Returns (U, V, rmse)."""
    users = data.idx.shape[0]
    items = items or int(data.idx_t.shape[0])
    dtype = data.val.dtype
    v0 = jax.random.normal(jax.random.key(0), (items, cfg.rank),
                           dtype) / jnp.sqrt(cfg.rank)

    def step(_, carry):
        u, v = carry
        with tracing.phase("ALS::users"):
            u = _solve_side(v, data.idx, data.val, cfg.lam, cfg.rank)
        with tracing.phase("ALS::items"):
            v = _solve_side(u, data.idx_t, data.val_t, cfg.lam, cfg.rank)
        return u, v

    u0 = jnp.zeros((users, cfg.rank), dtype)
    u, v = lax.fori_loop(0, cfg.num_iters, step, (u0, v0))

    # observed-edge RMSE, chunked like the updates
    nch = 8
    while users % nch:
        nch -= 1

    def se_chunk(args):
        uc, ic, vc = args
        pred = jnp.einsum("uk,usk->us", uc, v[ic], precision=prec())
        return jnp.sum(jnp.square(pred - vc))

    se = jnp.sum(jax.lax.map(
        se_chunk,
        (u.reshape(nch, users // nch, cfg.rank),
         data.idx.reshape(nch, users // nch, -1),
         data.val.reshape(nch, users // nch, -1)),
    ))
    err = jnp.sqrt(se / data.val.size)
    return u, v, err


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
