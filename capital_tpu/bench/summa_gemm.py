"""Distributed 2.5D GEMM bench driver (ref: bench/matmult/summa_gemm.cpp:8-55)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from capital_tpu import matrix, tracing
from capital_tpu.bench.common import apply_precision, base_parser, report, timed_loop
from capital_tpu.grid import Grid
from capital_tpu.parallel import summa


def main(argv=None):
    p = base_parser("2.5D SUMMA gemm")
    p.add_argument("--m", type=int, default=8192)
    p.add_argument("--k", type=int, default=8192)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--impl", default="shard_map",
                   choices=["shard_map", "gspmd"])
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
    a = matrix.rand(grid, args.m, args.k, jax.random.key(0), dtype=dtype)
    b = matrix.rand(grid, args.k, args.n, jax.random.key(1), dtype=dtype)

    fn = jax.jit(lambda x, y: summa.gemm(grid, x, y, impl=args.impl))
    with tracing.trace() as t:
        jax.eval_shape(fn, a.data, b.data)

    secs, _, out, (a_last, b_last) = timed_loop(fn, (a.data, b.data),
                                                args.num_iter)

    m, k = a.data.shape
    n = b.data.shape[1]
    extra = {"grid": grid.shape, "impl": args.impl}
    if not args.no_validate:
        # spot-check one tile against local recompute — at HIGHEST matmul
        # precision, else the bf16-pass reference dot dominates the error
        ref = jnp.dot(a_last[:256], b_last,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        err = float(jnp.max(jnp.abs(out[:256].astype(jnp.float32) - ref))
                    / jnp.max(jnp.abs(ref)))
        extra["tile_rel_err"] = err
    rec = report("summa_gemm", secs=secs, flops=2.0 * m * n * k, extra=extra,
                 as_json=args.json)
    if args.costs:
        print(t.report())
    return rec


if __name__ == "__main__":
    main()
