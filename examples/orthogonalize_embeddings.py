"""North-star use case: orthogonalize a sharded embedding table.

BASELINE.json frames the framework's serving role: "tall-skinny QR
(CholeskyQR2) orthogonalizes sharded embedding tables and ALS-style
normal-equation Cholesky solves power candidate-retrieval model fitting."

This example runs both on whatever devices exist (virtual CPU mesh or a
real slice):

    python examples/orthogonalize_embeddings.py

1. A (num_embeddings, dim) table sharded row-wise over the full mesh is
   orthogonalized with CholeskyQR2 — two Gram psums total, everything else
   local MXU work.
2. A toy retrieval model is fitted with ALS (batched normal-equation
   Cholesky solves), then queries are scored against the orthogonalized
   item table.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp

from capital_tpu import matrix, validate
from capital_tpu.algs import cacqr
from capital_tpu.apps import als
from capital_tpu.grid import Grid


def main():
    devs = jax.devices()
    if len(devs) < 2:
        devs = jax.devices("cpu")
    grid = Grid.rect(c=1, devices=devs)
    print(f"mesh: {grid.shape} over {grid.num_devices} devices")

    # --- 1. orthogonalize an embedding table ----------------------------
    num_emb, dim = 1 << 16, 256
    table = matrix.tall_skinny(grid, num_emb, dim, jax.random.key(0))
    q, r = jax.jit(lambda t: cacqr.factor_1d(grid, t, cacqr.Config(num_iter=2)))(
        table.data)
    ortho = float(validate.qr_orthogonality(grid, q, layout="1d"))
    print(f"orthogonalized {num_emb}x{dim} table: ||Q^TQ - I||/sqrt(n) = {ortho:.2e}")

    # --- 2. fit a retrieval model with ALS -------------------------------
    users, items = 4096, 1024
    ratings, mask = als.synthetic_ratings(grid, users, items,
                                          jax.random.key(1), rank=8,
                                          density=0.1)
    cfg = als.Config(rank=32, lam=0.05, num_iters=6)
    u, v, rmse = jax.jit(lambda r_, m_: als.fit(grid, r_, m_, cfg))(ratings, mask)
    print(f"ALS fit {users}x{items} rank={cfg.rank}: observed RMSE = {float(rmse):.4f}")

    # --- 3. retrieve: score a query batch against orthogonalized items ---
    queries = u[:8]  # pretend user embeddings are queries
    scores = jnp.einsum("qk,ik->qi", queries, v)
    top = jnp.argsort(-scores, axis=1)[:, :5]
    print("top-5 items for first 8 users:\n", top)


if __name__ == "__main__":
    main()
