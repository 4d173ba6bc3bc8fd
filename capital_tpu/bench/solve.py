"""Solver bench driver: spd_solve / lstsq with mixed-precision refinement.

The reference has no solve entry point (its TRSM is a stub,
ref: src/alg/trsm/diaginvert/diaginvert.hpp:9) — this drives the
beyond-reference solver API (linalg.py) and makes the refinement
speed/accuracy frontier reproducible:

    python -m capital_tpu.bench.solve --n 16384 --k 256 \
        --precision default --refine 2

Reports wall time and the f64-oracle relative solve residual
||A x - b|| / ||b|| (computed on host over a column block, so the
measurement never rides the precision being measured).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from capital_tpu import linalg, matrix
from capital_tpu.algs import cacqr, cholinv
from capital_tpu.bench.common import apply_precision, base_parser, report, timed_loop
from capital_tpu.grid import Grid


def main(argv=None):
    p = base_parser("SPD solve / least squares with iterative refinement")
    p.add_argument("--alg", default="spd", choices=["spd", "lstsq"])
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--m", type=int, default=1 << 18,
                   help="rows for lstsq (tall-skinny)")
    p.add_argument("--k", type=int, default=256, help="right-hand sides")
    p.add_argument("--refine", type=int, default=0,
                   help="iterative-refinement sweeps (residual gemm pinned "
                        "to HIGHEST)")
    args = p.parse_args(argv)
    apply_precision(args)

    dtype = jnp.dtype(args.dtype)
    extra = {"alg": args.alg, "refine": args.refine,
             "precision": args.precision}

    if args.alg == "spd":
        import math

        ndev = len(jax.devices())
        d = max(dd for dd in range(1, int(math.isqrt(ndev // args.c)) + 1)
                if args.c * dd * dd <= ndev)
        grid = Grid.square(c=args.c, d=d,
                           devices=jax.devices()[: args.c * d * d])
        a = matrix.symmetric(grid, args.n, jax.random.key(0),
                             dtype=dtype, align=128).data
        b = matrix.rand(grid, args.n, args.k, jax.random.key(1),
                        dtype=dtype).data
        cfg = cholinv.Config(summa_impl="gspmd" if grid.num_devices == 1
                             else "shard_map")
        fn = jax.jit(lambda a_, b_: linalg.spd_solve(
            grid, a_, b_, cfg, refine=args.refine))
        extra["n"] = args.n
        flops = 2 * args.n**3 / 3 + (2 + 4 * args.refine) * args.n**2 * args.k
    else:
        grid = Grid.rect(c=1, devices=jax.devices())
        spec = jax.sharding.PartitionSpec(("z", "y", "x"), None)
        a = matrix.tall_skinny(grid, args.m, args.n, jax.random.key(0),
                               dtype=dtype).data
        b = matrix.rand(grid, args.m, args.k, jax.random.key(1), dtype=dtype,
                        spec=spec, row_tile=grid.num_devices).data
        cfg = cacqr.Config(num_iter=2)
        fn = jax.jit(lambda a_, b_: linalg.lstsq(
            grid, a_, b_, cfg, refine=args.refine))
        extra["m"], extra["n"] = args.m, args.n
        flops = (4 * args.m * args.n**2
                 + (2 + 4 * args.refine) * args.m * args.n * args.k)
    extra["k"] = args.k
    extra["grid"] = grid.shape

    secs, _, x, (a, b) = timed_loop(fn, (a, b), args.num_iter)

    if not args.no_validate:
        kb = min(args.k, 8)
        ax = np.asarray(a, np.float64) @ np.asarray(x[:, :kb], np.float64)
        bb = np.asarray(b[:, :kb], np.float64)
        if args.alg == "spd":
            extra["solve_residual"] = float(
                np.linalg.norm(ax - bb) / np.linalg.norm(bb))
        else:
            # least-squares optimality: A^T (A x - b) = 0
            at_r = np.asarray(a, np.float64).T @ (ax - bb)
            extra["normal_residual"] = float(
                np.linalg.norm(at_r) / np.linalg.norm(bb))

    report("solve", secs=secs, flops=flops, extra=extra, as_json=args.json)


if __name__ == "__main__":
    main()
