"""Cholesky+inverse bench driver (ref: bench/cholesky/cholinv.cpp:8-71).

Reference argv: num_iter, N, rep_div/rep_factor, complete_inv, split,
bcMultiplier, layout, num_chunks — all mirrored as flags below (num_chunks
has no analog: XLA pipelines collective/compute overlap itself).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from capital_tpu import matrix, tracing, validate
from capital_tpu.algs import cholinv
from capital_tpu.bench.common import apply_precision, base_parser, report, timed_loop
from capital_tpu.grid import Grid


def main(argv=None):
    p = base_parser("recursive Cholesky + triangular inverse")
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--complete-inv", type=int, default=1)
    p.add_argument("--split", type=int, default=1)
    p.add_argument("--bc-mult", type=int, default=0,
                   help="base-case size multiplier (ref: bcMultiplier)")
    p.add_argument("--base-method", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--summa-impl", default="gspmd",
                   choices=["gspmd", "shard_map"])
    args = p.parse_args(argv)
    apply_precision(args)

    ndev = len(jax.devices())
    import math
    d = max(dd for dd in range(1, int(math.isqrt(ndev // args.c)) + 1)
            if args.c * dd * dd <= ndev)
    grid = Grid.square(c=args.c, d=d,
                       devices=jax.devices()[: args.c * d * d],
                       layout=args.layout)

    dtype = jnp.dtype(args.dtype)
    a = matrix.symmetric(grid, args.n, jax.random.key(0), dtype=dtype,
                         align=128)

    cfg = cholinv.Config(
        split=args.split, bc_mult=args.bc_mult,
        complete_inv=bool(args.complete_inv),
        base_method=args.base_method, summa_impl=args.summa_impl,
    )

    fn = jax.jit(lambda x: cholinv.factor(grid, x, cfg))
    with tracing.trace() as t:
        jax.eval_shape(fn, a.data)  # cost accounting pass (critter analog)

    if args.profile_dir:
        with tracing.profile(args.profile_dir):
            secs, _, (r, rinv) = timed_loop(fn, (a.data,), args.num_iter)
    else:
        secs, _, (r, rinv) = timed_loop(fn, (a.data,), args.num_iter)

    n = a.data.shape[0]
    flops = 2 * n**3 / 3  # chol + full triangular inverse
    extra = {"n": args.n, "grid": grid.shape, "bc": cfg.base_dim(grid, n)}
    if not args.no_validate:
        extra["residual"] = float(validate.cholesky_residual(
            grid, a.data, r, impl=cfg.summa_impl))
        extra["inv_residual"] = float(validate.inverse_residual(
            grid, r, rinv, impl=cfg.summa_impl))
    rec = report("cholinv", secs=secs, flops=flops, extra=extra,
                 as_json=args.json)
    if args.costs:
        print(t.report())
    return rec


if __name__ == "__main__":
    main()
