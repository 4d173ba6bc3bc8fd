"""Gaussian-process regression on the distributed solver stack.

The serving-shaped workload the cholinv design exists for: one SPD kernel
matrix, one factorization, many downstream consumers — the posterior mean
solve, the log marginal likelihood (slogdet off the SAME factor), and
variance diagonals through the explicit R^{-1}. Everything below is one
call each into capital_tpu; the kernel matrix lives sharded on whatever
mesh exists (virtual CPU devices here, a pod slice in production).

    python examples/gp_regression.py

Flow (standard GP regression, Rasmussen & Williams ch. 2):
    K = k(X, X) + sigma_n^2 I            (RBF kernel, distributed gram)
    R, Rinv = cholinv.factor(K)          (one factorization...)
    alpha = K^{-1} y                     (...three consumers)
    log p(y|X) = -1/2 y^T alpha - sum log R_ii - n/2 log 2pi
    mean* = k(X*, X) alpha
    var*  = k(X*,X*) - ||R^{-T} k(X,X*)||^2 column-wise
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
import numpy as np

from capital_tpu.grid import Grid
from capital_tpu.algs import cholinv
from capital_tpu.parallel import summa
from capital_tpu import linalg


def rbf(xa, xb, ell):
    d2 = (jnp.sum(xa**2, 1)[:, None] + jnp.sum(xb**2, 1)[None, :]
          - 2.0 * xa @ xb.T)
    return jnp.exp(-0.5 * d2 / (ell * ell))


def main():
    devs = jax.devices("cpu") if jax.default_backend() == "cpu" else jax.devices()
    n_dev = max(d * d for d in (1, 2) if d * d <= len(devs))
    grid = Grid.square(c=1, d=int(n_dev**0.5), devices=devs[:n_dev])
    print(f"grid {grid.shape} on {grid.platform}")

    n, n_star, dim, ell, noise = 2048, 256, 4, 0.8, 0.1
    key = jax.random.key(0)
    kx, kf, ks = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (n, dim), minval=-2.0, maxval=2.0)
    x_star = jax.random.uniform(ks, (n_star, dim), minval=-2.0, maxval=2.0)
    # latent function: a fixed random RBF mixture; y = f + noise
    centers = jax.random.uniform(kf, (16, dim), minval=-2.0, maxval=2.0)
    f = lambda pts: jnp.sum(rbf(pts, centers, 1.0), axis=1)  # noqa: E731
    y = f(x) + noise * jax.random.normal(jax.random.key(3), (n,))

    k_mat = rbf(x, x, ell) + (noise**2) * jnp.eye(n)
    k_mat = jax.device_put(np.asarray(k_mat, np.float32),
                           grid.sharding(grid.slice_spec))

    # one factorization, three consumers
    cfg = cholinv.Config(min_bc=64, base_method="auto")
    r, rinv = cholinv.factor(grid, k_mat, cfg)

    y2 = jax.device_put(np.asarray(y, np.float32)[:, None],
                        grid.sharding(grid.slice_spec))
    alpha = linalg.spd_solve(grid, k_mat, y2, cfg=cfg, refine=1,
                             factor=(r, rinv))

    _, logdet = linalg.slogdet_spd(grid, k_mat, cfg, factor=(r, rinv))
    logdet = float(logdet)
    lml = (-0.5 * float(y @ alpha[:, 0])
           - 0.5 * logdet - 0.5 * n * np.log(2 * np.pi))
    print(f"log marginal likelihood = {lml:.2f} "
          f"(logdet via the factor's diagonal = {logdet:.2f})")

    # posterior mean + variance at test points
    k_star = rbf(x_star, x, ell)                       # (n*, n)
    mean = np.asarray(k_star @ alpha[:, 0])
    # var_i = 1 - || R^{-T} k_i ||^2: one trmm against the explicit inverse
    v = summa.trmm(grid, rinv,
                   jax.device_put(np.asarray(k_star.T, np.float32),
                                  grid.sharding(grid.slice_spec)),
                   side="L", uplo="U", trans_a=True)
    var = 1.0 + noise**2 - np.sum(np.asarray(v) ** 2, axis=0)

    f_true = np.asarray(f(x_star))
    rmse = float(np.sqrt(np.mean((mean - f_true) ** 2)))
    inside = float(np.mean(np.abs(mean - f_true) <= 2.0 * np.sqrt(
        np.maximum(var, 1e-9))))
    print(f"posterior RMSE vs true latent = {rmse:.3f} "
          f"(noise floor {noise}); 2-sigma coverage = {inside:.2%}")
    assert rmse < 3 * noise, rmse
    assert inside > 0.85, inside


if __name__ == "__main__":
    main()
