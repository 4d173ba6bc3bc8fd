"""Inverse bench driver: rectri + newton (ref: bench/inverse/rectri.cpp:8-54,
bench/inverse/newton.cpp — the latter does not compile in the reference)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from capital_tpu import matrix, tracing
from capital_tpu.algs import newton, rectri
from capital_tpu.bench.common import apply_precision, base_parser, report, timed_loop
from capital_tpu.grid import Grid


def main(argv=None):
    p = base_parser("triangular / Newton-Schulz inversion")
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--alg", default="rectri", choices=["rectri", "newton"])
    p.add_argument("--bc-mult", type=int, default=0)
    p.add_argument("--summa-impl", default="gspmd",
                   choices=["gspmd", "shard_map"])
    args = p.parse_args(argv)
    apply_precision(args)

    import math
    ndev = len(jax.devices())
    d = max(dd for dd in range(1, int(math.isqrt(ndev // args.c)) + 1)
            if args.c * dd * dd <= ndev)
    grid = Grid.square(c=args.c, d=d,
                       devices=jax.devices()[: args.c * d * d],
                       layout=args.layout)

    dtype = jnp.dtype(args.dtype)
    a = matrix.symmetric(grid, args.n, jax.random.key(0), dtype=dtype,
                         align=128).data
    n = a.shape[0]

    if args.alg == "rectri":
        t = jnp.tril(a)
        cfg = rectri.Config(bc_mult=args.bc_mult, summa_impl=args.summa_impl)
        fn = jax.jit(lambda x: rectri.invert(grid, x, lower=True, cfg=cfg))
        flops = n**3 / 3
        operand = t
    else:
        cfg = newton.Config(spd=True, summa_impl=args.summa_impl)
        fn = jax.jit(lambda x: newton.invert(grid, x, cfg))
        flops = None  # iteration count is data-dependent
        operand = a

    with tracing.trace() as tr:
        jax.eval_shape(fn, operand)

    secs, _, out = timed_loop(fn, (operand,), args.num_iter)

    extra = {"n": args.n, "alg": args.alg, "grid": grid.shape}
    if args.alg == "newton":
        x, iters, res = out
        extra["iters"] = int(iters)
        extra["ns_residual"] = float(res)
    if not args.no_validate:
        x = out[0] if args.alg == "newton" else out
        src = a if args.alg == "newton" else jnp.tril(a)
        err = jax.jit(lambda s, xx: jnp.linalg.norm(
            (s @ xx - jnp.eye(n, dtype=s.dtype)).astype(jnp.float32))
            / jnp.sqrt(jnp.float32(n)))(src, x)
        extra["inv_residual"] = float(err)
    rec = report(f"inverse_{args.alg}", secs=secs, flops=flops, extra=extra,
                 as_json=args.json)
    if args.costs:
        print(tr.report())
    return rec


if __name__ == "__main__":
    main()
