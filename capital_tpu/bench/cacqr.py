"""CholeskyQR/CholeskyQR2 bench driver (ref: bench/qr/cacqr.cpp:8-77).

Reference argv: variant (1=cacqr, 2=cacqr2), m, n, rep_factor sweep range,
complete_inv, split, bcMultiplier sweep, layout, num_chunks, num_iter.
The rep_factor sweep (grid aspect) maps to --c; the in-process sweep moved
to the autotuner (capital_tpu/autotune/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from capital_tpu import matrix, tracing, validate
from capital_tpu.algs import cacqr, cholinv
from capital_tpu.bench.common import apply_precision, base_parser, report, timed_loop
from capital_tpu.grid import Grid


def main(argv=None):
    p = base_parser("communication-avoiding CholeskyQR2 (tall-skinny QR)")
    p.add_argument("--m", type=int, default=1 << 20)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--variant", type=int, default=2,
                   help="1 = CholeskyQR, 2 = CholeskyQR2 (ref: argv variant)")
    p.add_argument("--gram-policy", default="allreduce",
                   choices=["allreduce", "two_stage", "packed"])
    p.add_argument("--path", default="auto",
               choices=["auto", "1d", "3d", "hybrid"])
    p.add_argument("--base-method", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--formq-chunks", type=int, default=1,
                   help="form Q in place in N row chunks (memory)")
    args = p.parse_args(argv)
    apply_precision(args)

    grid = Grid.rect(c=args.c, layout=args.layout) if args.c > 1 else \
        Grid.square(c=1, d=1, devices=jax.devices()[:1]) if len(jax.devices()) == 1 else \
        Grid.rect(c=1, layout=args.layout)

    dtype = jnp.dtype(args.dtype)
    a = matrix.tall_skinny(grid, args.m, args.n, jax.random.key(0), dtype=dtype)

    cfg = cacqr.Config(num_iter=args.variant, gram_policy=args.gram_policy,
                       base_method=args.base_method,
                       formq_chunks=args.formq_chunks,
                       chol=cholinv.Config(base_method=args.base_method))

    # donate the input: A is dead once the first sweep's Q is formed, and the
    # matrix is regenerated from its seed on demand anyway (the reference
    # re-distributes before every timed iteration, ref: bench/qr/cacqr.cpp:43,47)
    if args.path == "3d":
        fn = jax.jit(lambda x: cacqr.factor_3d(grid, x, cfg), donate_argnums=0)
        layout = "2d"
    elif args.path == "hybrid":
        fn = jax.jit(lambda x: cacqr.factor_hybrid(grid, x, cfg),
                     donate_argnums=0)
        layout = "1d"
    else:
        fn = jax.jit(lambda x: cacqr.factor_1d(grid, x, cfg), donate_argnums=0)
        layout = "1d"

    with tracing.trace() as t:
        jax.eval_shape(fn, a.data)

    def regen(seed: int = 0):
        # a fresh key per iteration defeats remote result caching without
        # materializing a perturbed copy next to the original
        return matrix.tall_skinny(grid, args.m, args.n, jax.random.key(seed),
                                  dtype=dtype).data

    import time as _time

    from capital_tpu.bench.common import force

    # warmup (consumes a)
    q, r = fn(a.data)
    force((q, r))
    times = []
    for i in range(args.num_iter):
        del q  # free before regenerating: Q and a fresh A don't co-fit at 4M rows
        x = regen(seed=i + 1)  # fresh values each iter
        force(x)
        del r
        t0 = _time.perf_counter()
        q, r = fn(x)
        force((q, r))
        times.append(_time.perf_counter() - t0)
    secs = min(times)
    if args.profile_dir:
        with tracing.profile(args.profile_dir):
            x = regen()
            force(x)
            qp, rp = fn(x)
            force((qp, rp))
            del qp, rp

    m, n = q.shape
    sweeps = args.variant
    flops = sweeps * (4 * m * n * n + 2 * n**3 / 3)  # gram + formQ + chol
    extra = {"m": args.m, "n": args.n, "variant": args.variant,
             "grid": grid.shape}
    if not args.no_validate:
        # jitted so the 4-GB-scale temporaries fuse instead of materializing
        extra["orthogonality"] = float(jax.jit(
            lambda qq: validate.qr_orthogonality(grid, qq, layout=layout))(q))
        # residual needs A, Q and QR live together (3 operand-sized
        # buffers); skip it when they cannot co-fit in HBM
        esz = jnp.dtype(dtype).itemsize
        if 3 * q.size * esz < 12 * 2**30:
            # the factored A was donated; regenerate it from the LAST timed
            # iteration's seed (Q, R belong to that matrix, not seed 0)
            extra["residual"] = float(jax.jit(
                lambda aa, qq, rr: validate.qr_residual(grid, aa, qq, rr,
                                                        layout=layout),
                donate_argnums=0)(regen(seed=args.num_iter), q, r))
        else:
            extra["residual"] = "skipped (A+Q+QR exceed HBM)"
    rec = report("cacqr", secs=secs, flops=flops, extra=extra,
                 as_json=args.json)
    if args.costs:
        print(t.report())
    return rec


if __name__ == "__main__":
    main()
