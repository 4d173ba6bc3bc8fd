"""Randomized SVD bench driver (apps/rsvd.py — the rank-k truncated SVD /
PCA serving workload built on CholeskyQR2).

Validation: planted low-rank-plus-noise spectrum; reports the max relative
singular-value error over the top k, and the subspace residual
||A V - U S||_F / ||A||_F (both computed distributed, no n^2 temporaries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from capital_tpu import tracing
from capital_tpu.apps import rsvd
from capital_tpu.bench.common import (apply_precision, base_parser, force,
                                      report, timed_loop)
from capital_tpu.grid import Grid


def _planted(grid, m, n, rank, dtype, key):
    """Row-sharded A = U diag(s) V^T + noise, geometric spectrum in [1, 10].
    U is orthonormalized by the library's own CholeskyQR2 (distributed);
    the noise spectral norm is ~0.02 so the planted values are the true
    ones to ~2% at the tail. Generated on-device (no m x n host array)."""
    from capital_tpu.algs import cacqr

    k1, k2, k3 = jax.random.split(key, 3)
    g = jax.device_put(jax.random.normal(k1, (m, rank), jnp.float32),
                       grid.row1d)
    u, _ = cacqr.factor_1d(grid, g, cacqr.Config(num_iter=2))
    v = jnp.linalg.qr(jax.random.normal(k2, (n, rank), jnp.float32))[0]
    s = jnp.geomspace(10.0, 1.0, rank, dtype=jnp.float32)
    sigma = 0.01 / float(m) ** 0.5  # ||E||_2 ~ sigma * sqrt(m) = 0.01

    def gen(uu):
        a = uu @ (v * s).T + sigma * jax.random.normal(k3, (m, n),
                                                       jnp.float32)
        return grid.constrain(a.astype(dtype), jax.sharding.PartitionSpec(
            ("z", "y", "x"), None))

    return jax.jit(gen)(u), s


def main(argv=None):
    p = base_parser("randomized SVD / PCA (CholeskyQR2 range finder)")
    p.add_argument("--m", type=int, default=1 << 18)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--k", type=int, default=128)
    p.add_argument("--oversample", type=int, default=16)
    p.add_argument("--power-iters", type=int, default=1)
    args = p.parse_args(argv)
    apply_precision(args)

    grid = Grid.rect(c=args.c)
    dtype = jnp.dtype(args.dtype)
    m, n, k, l = args.m, args.n, args.k, args.k + args.oversample
    # planted rank: k strong directions (recoverable) inside a noisy A
    a, s_true = _planted(grid, m, n, k, dtype, jax.random.key(0))

    cfg = rsvd.Config(k=k, oversample=args.oversample,
                      power_iters=args.power_iters)
    fn = jax.jit(lambda x: rsvd.rsvd(grid, x, cfg))
    with tracing.trace() as t:
        jax.eval_shape(fn, a)
    secs, _, (u, s, vt), (a,) = timed_loop(fn, (a,), args.num_iter)

    # (q+1) passes of 2mnl (sketch/power downs) + (q) ups + core, plus the
    # CholeskyQR2 sweeps ~ 4 m l^2 each; count the textbook products
    q = args.power_iters
    flops = (2.0 * m * n * l * (2 * q + 2)
             + (q + 1) * 8.0 * m * l * l)
    extra = {"m": m, "n": n, "k": k, "l": l, "power_iters": q,
             "grid": grid.shape, "dtype": args.dtype}
    if not args.no_validate:
        s_err = float(jnp.max(jnp.abs(s - s_true[: k]) / s_true[: k]))
        # subspace residual ||A V^T - U diag(s)||_F / ||A||_F, row-local;
        # the validator gemm runs f32-faithful — at the TPU ambient 1-pass
        # bf16 it would dominate the quantity measured
        av = jnp.dot(a.astype(jnp.float32), vt.T.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
        res = jnp.linalg.norm(av - (u * s).astype(jnp.float32)) \
            / jnp.linalg.norm(a.astype(jnp.float32))
        extra["sv_rel_err"] = round(s_err, 8)
        extra["subspace_residual"] = round(float(res), 8)
    rec = report("rsvd", secs=secs, flops=flops, extra=extra,
                 as_json=args.json)
    if args.costs:
        print(t.report())
    return rec


if __name__ == "__main__":
    main()
