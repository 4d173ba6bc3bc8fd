"""Cholesky+inverse bench driver (ref: bench/cholesky/cholinv.cpp:8-71).

Reference argv: num_iter, N, rep_div/rep_factor, complete_inv, split,
bcMultiplier, layout, num_chunks — all mirrored as flags below
(--summa-chunks is the num_chunks analog; --summa-impl ring is the
Cannon-rotation overlap engine).
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
                   choices=["gspmd", "shard_map", "ring"])
    p.add_argument("--summa-chunks", type=int, default=1,
                   help="pipelined gather/gemm chunks (ref: num_chunks)")
    p.add_argument("--summa-throttle", action="store_true",
                   help="serialize operand gathers (ref: "
                        "COLLECTIVE_CONCURRENCY_SOLO/LAYER flags)")
    p.add_argument("--base-policy", default="replicated",
                   choices=["replicated", "layer", "gather"],
                   help="base-case placement (ref: BaseCasePolicy)")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint the recursion (FlushIntermediates "
                        "analog) — cuts peak memory for big N")
    p.add_argument("--donate", action="store_true",
                   help="donate the input buffer (A is the workspace; "
                        "matrices regenerate from seeds, ref: the "
                        "re-distribute before every timed iteration, "
                        "bench/qr/cacqr.cpp:43)")
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
        summa_chunks=args.summa_chunks, base_policy=args.base_policy,
        summa_throttle=args.summa_throttle, remat=args.remat,
    )

    fn = jax.jit(lambda x: cholinv.factor(grid, x, cfg),
                 donate_argnums=(0,) if args.donate else ())
    with tracing.trace() as t:
        jax.eval_shape(fn, a.data)  # cost accounting pass (critter analog)

    import contextlib

    prof = (tracing.profile(args.profile_dir) if args.profile_dir
            else contextlib.nullcontext())
    if args.donate:
        # donation consumes the input; regenerate from a fresh seed per
        # iteration (defeats remote result caching the same way _perturb
        # does, without two live operand buffers)
        import time as _time

        from capital_tpu.bench.common import force

        dtype_ = a.data.dtype
        del a

        def regen(seed: int):
            return matrix.symmetric(grid, args.n, jax.random.key(seed),
                                    dtype=dtype_, align=128).data

        r, rinv = fn(regen(0))
        force((r, rinv))
        times = []
        last_seed = 0
        with prof:
            for i in range(args.num_iter):
                del r, rinv
                x = regen(i + 1)
                force(x)
                last_seed = i + 1
                t0 = _time.perf_counter()
                r, rinv = fn(x)
                force((r, rinv))
                times.append(_time.perf_counter() - t0)
        secs = min(times)
    else:
        with prof:
            secs, _, (r, rinv), (a_last,) = timed_loop(fn, (a.data,),
                                                       args.num_iter)

    n = args.n
    flops = 2 * n**3 / 3  # chol + full triangular inverse
    extra = {"n": args.n, "grid": grid.shape, "bc": cfg.base_dim(grid, n)}
    if not args.no_validate:
        # Memory discipline for n=32768-class runs: jit each validator with
        # the buffer it consumes donated, use the chunked panel
        # accumulation (no n x n product materialized), check R*Rinv first
        # and free Rinv before regenerating A for the Cholesky residual.
        ch = 8 if n >= 16384 and grid.num_devices == 1 else 1
        extra["inv_residual"] = float(jax.jit(
            lambda r_, ri_: validate.inverse_residual(
                grid, r_, ri_, impl=cfg.summa_impl, chunks=ch, masked=True),
            donate_argnums=(1,))(r, rinv))
        if args.donate:
            del rinv
            a_arr = regen(last_seed)
        else:
            a_arr = a_last  # the last perturbed operand actually factored
        extra["residual"] = float(jax.jit(
            lambda a_, r_: validate.cholesky_residual(
                grid, a_, r_, impl=cfg.summa_impl, chunks=ch, masked=True),
            donate_argnums=(0,))(a_arr, r))
    rec = report("cholinv", secs=secs, flops=flops, extra=extra,
                 as_json=args.json)
    if args.costs:
        print(t.report())
    return rec


if __name__ == "__main__":
    main()
