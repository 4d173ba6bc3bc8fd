"""Inverse/TRSM bench driver: rectri + newton + trsm (ref:
bench/inverse/rectri.cpp:8-54, bench/inverse/newton.cpp — the latter does
not compile in the reference; TRSM was static_assert(0) upstream,
src/alg/trsm/diaginvert/diaginvert.hpp:9, completed in algs/trsm.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from capital_tpu import matrix, tracing
from capital_tpu.algs import newton, rectri, trsm
from capital_tpu.bench.common import apply_precision, base_parser, report, timed_loop
from capital_tpu.grid import Grid


def main(argv=None):
    p = base_parser("triangular / Newton-Schulz inversion + TRSM solve")
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--alg", default="rectri",
                   choices=["rectri", "newton", "trsm"])
    p.add_argument("--m", type=int, default=1024,
                   help="RHS columns (trsm only)")
    p.add_argument("--nb", type=int, default=1024,
                   help="substitution panel width (trsm only)")
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
    elif args.alg == "trsm":
        # L X = B at bench scale (ref intent: diaginvert.h:12-17). Useful
        # flops = the textbook n^2 m substitution; the panel-scan schedule
        # executes ~2x that (full-width masked panel gemms) plus the
        # up-front diagonal-block inversions.
        t = jnp.tril(a)
        b = matrix.rand(grid, n, args.m, jax.random.key(1), dtype=dtype).data
        cfg = trsm.Config(nb=args.nb,
                          tri=rectri.Config(bc_mult=args.bc_mult,
                                            summa_impl=args.summa_impl))
        fn = jax.jit(lambda tt, bb: trsm.solve(grid, tt, bb, side="L",
                                               lower=True, cfg=cfg))
        flops = float(n) * n * args.m
        operand = t
    else:
        cfg = newton.Config(spd=True, summa_impl=args.summa_impl)
        fn = jax.jit(lambda x: newton.invert(grid, x, cfg))
        flops = None  # iteration count is data-dependent
        operand = a

    operands = (operand, b) if args.alg == "trsm" else (operand,)
    with tracing.trace() as tr:
        jax.eval_shape(fn, *operands)

    secs, _, out, last_ops = timed_loop(fn, operands, args.num_iter)
    operand = last_ops[0]
    if args.alg == "trsm":
        b = last_ops[1]

    extra = {"n": args.n, "alg": args.alg, "grid": grid.shape}
    if args.alg == "trsm":
        extra["m"] = args.m
        extra["nb"] = cfg.panel(grid, n)
    if args.alg == "newton":
        x, iters, res = out
        extra["iters"] = int(iters)
        extra["ns_residual"] = float(res)
    if not args.no_validate:
        # validator dots at HIGHEST precision: a bf16-pass product would
        # dominate the quantity measured on TPU
        hp = jax.lax.Precision.HIGHEST
        if args.alg == "trsm":
            # ||L X - B||_F / ||B||_F (the reference's residual formula
            # family, test/inverse/validate.hpp:7-34, applied to the solve)
            err = jax.jit(lambda tt, xx, bb: jnp.linalg.norm(
                (jnp.dot(tt, xx, precision=hp) - bb).astype(jnp.float32))
                / jnp.linalg.norm(bb.astype(jnp.float32)))(operand, out, b)
            extra["solve_residual"] = float(err)
        else:
            x = out[0] if args.alg == "newton" else out
            src = operand  # the last perturbed operand actually inverted
            err = jax.jit(lambda s, xx: jnp.linalg.norm(
                (jnp.dot(s, xx, precision=hp)
                 - jnp.eye(n, dtype=s.dtype)).astype(jnp.float32))
                / jnp.sqrt(jnp.float32(n)))(src, x)
            extra["inv_residual"] = float(err)
    rec = report(f"inverse_{args.alg}", secs=secs, flops=flops, extra=extra,
                 as_json=args.json)
    if args.costs:
        print(tr.report())
    return rec


if __name__ == "__main__":
    main()
