"""ALS recommender bench driver (BASELINE.json config: "ALS matrix-
factorization recommender ... via batched normal-equation Cholesky solves").

MovieLens-25M-scale defaults (162k users x 59k items is the real dataset;
the synthetic generator plants a low-rank model at the same aspect). In the
zero-egress environment data is synthetic; pass --users/--items to scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from capital_tpu import tracing
from capital_tpu.apps import als
from capital_tpu.bench.common import apply_precision, base_parser, force, report
from capital_tpu.grid import Grid


def main(argv=None):
    p = base_parser("ALS recommender (batched normal-equation Cholesky)")
    p.add_argument("--users", type=int, default=65536)
    p.add_argument("--items", type=int, default=8192)
    p.add_argument("--rank", type=int, default=64)
    p.add_argument("--density", type=float, default=0.05)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--sparse", action="store_true",
                   help="bucketed-sparse updates: O(nnz k^2) instead of "
                        "O(U I k^2) — MovieLens-25M scale fits one chip")
    p.add_argument("--obs-per-user", type=int, default=192,
                   help="observations per user for --sparse (ML-25M ~ 154)")
    args = p.parse_args(argv)
    apply_precision(args)

    grid = Grid.rect(c=args.c) if args.c > 1 else Grid.square(
        c=1, d=1, devices=jax.devices()[:1])

    import time

    dtype = jnp.dtype(args.dtype)
    cfg = als.Config(rank=args.rank, lam=0.05, num_iters=args.iters)
    users, items, k = args.users, args.items, args.rank

    if args.sparse:
        s = args.obs_per_user
        data = als.synthetic_regular(grid, users, items, s,
                                     jax.random.key(0), dtype=dtype)
        fn = jax.jit(lambda d: als.fit_sparse(grid, d, cfg, items=items))
        with tracing.trace() as t:
            jax.eval_shape(fn, data)
        out = fn(data)
        force(out)
        times = []
        for i in range(args.num_iter):
            fresh = data._replace(val=data.val * (1.0 + (i + 1) * 1e-6),
                                  val_t=data.val_t * (1.0 + (i + 1) * 1e-6))
            force(fresh.val)
            t0 = time.perf_counter()
            out = fn(fresh)
            force(out)
            times.append(time.perf_counter() - t0)
        secs = min(times)
        u, v, err = out
        nnz = users * s
        # 2 sides x (gramians 2*nnz*k^2 + rhs 2*nnz*k) + solves
        flops = args.iters * (4.0 * nnz * k**2
                              + (users + items) * k**3 / 3)
        extra = {"users": users, "items": items, "rank": k, "nnz": nnz,
                 "iters": args.iters, "rmse": float(err), "sparse": True,
                 "grid": grid.shape}
    else:
        r, m = als.synthetic_ratings(grid, users, items, jax.random.key(0),
                                     rank=16, density=args.density,
                                     dtype=dtype)
        fn = jax.jit(lambda rr, mm: als.fit(grid, rr, mm, cfg))
        with tracing.trace() as t:
            jax.eval_shape(fn, r, m)
        out = fn(r, m)
        force(out)
        times = []
        for i in range(args.num_iter):
            rr = r * (1.0 + (i + 1) * 1e-7)
            force(rr)
            t0 = time.perf_counter()
            out = fn(rr, m)
            force(out)
            times.append(time.perf_counter() - t0)
        secs = min(times)
        u, v, err = out
        # per ALS iter: masked Gramian einsums dominate — 2*U*I*k^2 for the
        # user side + the same for items; solves add (U+I)*k^3/3
        flops = args.iters * (4.0 * users * items * k**2
                              + (users + items) * k**3 / 3)
        extra = {"users": users, "items": items, "rank": k,
                 "iters": args.iters, "rmse": float(err), "grid": grid.shape}
    rec = report("als", secs=secs, flops=flops, extra=extra, as_json=args.json)
    if args.costs:
        print(t.report())
    return rec


if __name__ == "__main__":
    main()
