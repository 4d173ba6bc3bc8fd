"""Spectral-layer walkthrough: whitening, PCA and Procrustes alignment.

Three standard serving/analysis flows, each one call into the distributed
spectral layer (algs/polar.py, algs/eigh.py, linalg.py), runnable on
whatever devices exist (virtual CPU mesh or a real slice):

    python examples/spectral_analysis.py

1. ZCA-whiten a feature covariance: W = C^{-1/2} via `linalg.spd_sqrt`
   (the distributed eigensolver under the hood), then verify
   W C W ~= I.
2. PCA without materializing the covariance's full eigenbasis on one
   host: `eigh.eigh` of the slice-sharded covariance, top components by
   eigenvalue.
3. Procrustes-align two embedding tables: the nearest orthogonal matrix
   to Y^T X is the polar factor (`linalg.nearest_orthogonal` — one QDWH
   sweep).
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

from capital_tpu import linalg
from capital_tpu.grid import Grid
from capital_tpu.algs import cholinv, eigh, polar


def main():
    devs = jax.devices("cpu") if jax.default_backend() == "cpu" else jax.devices()
    n_dev = max(d * d for d in (1, 2) if d * d <= len(devs))
    grid = Grid.square(c=1, d=int(n_dev ** 0.5), devices=devs[:n_dev])
    print(f"grid {grid.shape} on {grid.platform}")

    dim, m = 256, 4096
    key = jax.random.key(0)
    feats = jax.random.normal(key, (m, dim), jnp.float32) @ (
        jnp.eye(dim) + 0.3 * jax.random.normal(jax.random.key(1),
                                               (dim, dim), jnp.float32))
    cov = jax.device_put(feats.T @ feats / m + 1e-3 * jnp.eye(dim),
                         grid.sharding(grid.slice_spec))

    chol = cholinv.Config(min_bc=64, base_method="auto")
    ecfg = eigh.Config(base_n=128, polar=polar.Config(compute_h=False,
                                                      chol=chol))

    # 1. ZCA whitening
    w = linalg.spd_sqrt(grid, cov, cfg=ecfg, inverse=True)
    wcw = np.asarray(w, np.float64) @ np.asarray(cov, np.float64) \
        @ np.asarray(w, np.float64)
    print(f"ZCA: ||W C W - I||/sqrt(n) = "
          f"{np.linalg.norm(wcw - np.eye(dim)) / np.sqrt(dim):.2e}")

    # 2. PCA: top-8 eigenpairs WITHOUT solving the full spectrum
    # (eigh_partial: one bisected sign function isolates the top block)
    evals, evecs = eigh.eigh_partial(grid, cov, 8, ecfg, which="top")
    top = np.asarray(evals)[::-1]
    print("PCA top-8 eigenvalues:", np.array2string(top, precision=3))
    res = np.linalg.norm(
        np.asarray(cov, np.float64) @ np.asarray(evecs, np.float64)
        - np.asarray(evecs, np.float64) * np.asarray(evals, np.float64)
    ) / np.linalg.norm(np.asarray(cov, np.float64))
    print(f"PCA eigenpair residual = {res:.2e}")

    # 3. Procrustes: rotate table X onto table Y
    x = jax.random.normal(jax.random.key(2), (m, dim), jnp.float32)
    rot_true, _ = np.linalg.qr(np.random.default_rng(3).standard_normal(
        (dim, dim)))
    y = x @ jnp.asarray(rot_true, jnp.float32)
    c = jax.device_put(x.T @ y, grid.sharding(grid.slice_spec))
    pcfg = polar.Config(compute_h=False, chol=chol)
    r = linalg.nearest_orthogonal(grid, c, cfg=pcfg, layout="2d")
    err = np.abs(np.asarray(r, np.float64) - rot_true).max()
    print(f"Procrustes: max |R - R_true| = {err:.2e}")


if __name__ == "__main__":
    main()
