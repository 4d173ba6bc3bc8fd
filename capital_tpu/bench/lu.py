"""LU bench driver: P A = L U with partial pivoting (algs/lu.py — the
general-matrix factorization the reference lacks; driver lifecycle follows
the reference's bench shape, ref: bench/cholesky/cholinv.cpp:8-71).

    python -m capital_tpu.bench.lu --n 16384 --nb 2048
    python -m capital_tpu.bench.lu --n 8192 --sweep      # panel-width knee
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from capital_tpu import tracing
from capital_tpu.algs import lu
from capital_tpu.parallel import summa
from capital_tpu.bench.common import (apply_precision, base_parser, report,
                                      timed_loop)
from capital_tpu.grid import Grid


def _chunked_residual(grid, w, perm, a, chunk: int = 2048):
    """||P A - L U||_F via row slabs of L: peak extra memory is one dense
    U plus an O(chunk x n) slab — the dense validator's full L and PA
    copies OOM at n >= ~20k where the factorization itself still fits."""
    n = w.shape[0]
    chunk = min(chunk, n)
    while n % chunk:
        chunk //= 2

    @jax.jit
    def slab_sq(wf, pa_rows, i0):
        rows = lax.dynamic_slice(wf, (i0, 0), (chunk, n))
        ridx = i0 + jnp.arange(chunk)[:, None]
        l_slab = jnp.where(jnp.arange(n)[None, :] < ridx, rows, 0.0) \
            + (jnp.arange(n)[None, :] == ridx).astype(rows.dtype)
        # K-chunked L @ triu(W): a monolithic jnp.triu(wf) is a second
        # full n^2 buffer — at n=32768 donate it OOMs the validator
        # while the factorization itself fits
        lu_rows = jnp.zeros((chunk, n), jnp.float32)
        with jax.default_matmul_precision("highest"):
            for k0 in range(0, n, chunk):
                wk = lax.slice(wf, (k0, 0), (k0 + chunk, n))
                tri = jnp.where(
                    jnp.arange(n)[None, :] >= (k0 + jnp.arange(chunk))[:, None],
                    wk, 0.0)
                lk = lax.slice(l_slab, (0, k0), (chunk, k0 + chunk))
                lu_rows = lu_rows + jnp.matmul(
                    lk, tri, preferred_element_type=jnp.float32)
        return jnp.sum(jnp.square(pa_rows.astype(jnp.float32) - lu_rows))

    total = 0.0
    for i0 in range(0, n, chunk):
        pa_rows = jnp.take(a, lax.dynamic_slice(perm, (i0,), (chunk,)),
                           axis=0)
        total += float(slab_sq(w, pa_rows, jnp.int32(i0)))
    return jnp.sqrt(jnp.float32(total))


def main(argv=None):
    p = base_parser("LU factorization with partial pivoting")
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--nb", type=int, default=1024, help="panel width")
    p.add_argument("--summa-impl", default="shard_map",
                   choices=["shard_map", "ring", "gspmd"])
    p.add_argument("--solve-k", type=int, default=0,
                   help="also time a k-column solve off the factorization")
    p.add_argument("--factor-dtype", default=None,
                   choices=[None, "bfloat16"],
                   help="solve path: factor a DOWNCAST copy of A and "
                        "refine against the original (the Wilkinson "
                        "low-precision-factor recipe; measures whether "
                        "refinement recovers f32-class residuals from "
                        "bf16 LU factors)")
    p.add_argument("--refine", type=int, default=2,
                   help="iterative-refinement sweeps in the timed solve "
                        "(0 = raw substitution; random square operands "
                        "have cond ~ n, where the unrefined f32 "
                        "substitution loses ~4 digits)")
    p.add_argument("--sweep", action="store_true",
                   help="sweep panel widths instead of one config")
    p.add_argument("--donate", action="store_true",
                   help="donate the input buffer (A is the workspace; "
                        "n=32768 f32 does not fit otherwise)")
    p.add_argument("--lookahead", action="store_true",
                   help="split-Schur lookahead: factor panel k+1 off a "
                        "narrow gemm before the remainder slabs "
                        "(CAPITAL_LU_LOOKAHEAD=1)")
    args = p.parse_args(argv)
    if args.lookahead:
        import os

        os.environ["CAPITAL_LU_LOOKAHEAD"] = "1"
    apply_precision(args)

    ndev = len(jax.devices())
    d = max(dd for dd in range(1, int(math.isqrt(ndev // args.c)) + 1)
            if args.c * dd * dd <= ndev)
    grid = Grid.square(c=args.c, d=d, devices=jax.devices()[: args.c * d * d],
                       layout=args.layout)

    dtype = jnp.dtype(args.dtype)
    n = args.n
    a = jax.random.normal(jax.random.key(0), (n, n), dtype=dtype)
    a = grid.constrain(a, grid.slice_spec)
    flops = 2.0 * n**3 / 3.0

    nbs = ([256, 512, 1024, 2048, 4096] if args.sweep else [args.nb])
    nbs = [nb for nb in nbs if nb <= n]
    if not nbs:
        p.error(f"no panel width <= n={n} (use --nb <= n)")
    rec = None
    for nb in nbs:
        cfg = lu.Config(nb=nb, summa_impl=args.summa_impl)
        fn = jax.jit(lambda x, _cfg=cfg: lu.factor(grid, x, _cfg),
                     donate_argnums=(0,) if args.donate else ())
        if args.donate:
            # donated buffers are consumed: regenerate fresh
            # seed-deterministic operands per call via timed_loop's
            # factory, and rebuild the LAST iteration's operand below so
            # validation/solve run against the matrix that was factored
            gen = jax.jit(lambda key: grid.constrain(
                jax.random.normal(key, (n, n), dtype=dtype),
                grid.slice_spec))
            secs, _, (w, perm, sign), _ = timed_loop(
                fn, (), args.num_iter,
                make_args=lambda i: (gen(jax.random.key(i)),))
            a = gen(jax.random.key(args.num_iter - 1))
        else:
            secs, _, (w, perm, sign), (a,) = timed_loop(fn, (a,),
                                                        args.num_iter)
        extra = {"nb": nb, "dtype": args.dtype, "precision": args.precision,
                 "devices": grid.num_devices}
        if not args.no_validate:
            # HIGHEST: at the TPU ambient 1-pass bf16 the validator's own
            # L@U gemm carries an O(1)-class error at these contraction
            # lengths — it would measure itself, not the factorization
            if n >= 16384:
                # chunked ||PA - LU|| (row slabs; the dense validator's
                # extra L and PA buffers OOM before the factorization
                # does — same discipline as the chol panel validators)
                num = _chunked_residual(grid, w, perm, a)
            else:
                with jax.default_matmul_precision("highest"):
                    l, u = lu.unpack(w)
                    pa = jnp.take(a, perm, axis=0)
                    num = jnp.linalg.norm(pa - l @ u)
            extra["residual"] = f"{float(num / jnp.linalg.norm(a)):.3e}"
        rec = report(f"lu_n{n}", secs=secs, flops=flops, extra=extra,
                     as_json=args.json)

    if args.solve_k:
        b = jax.random.normal(jax.random.key(1), (n, args.solve_k),
                              dtype=dtype)
        if args.factor_dtype:
            # re-factor a downcast copy (timed) and solve+refine against
            # the ORIGINAL operand — the constructive half of the
            # bf16-storage-LU experiment (BENCH_LOCAL.md negative result)
            fdt = jnp.dtype(args.factor_dtype)
            ffn = jax.jit(lambda x, _cfg=cfg: lu.factor(
                grid, x.astype(fdt), _cfg))
            fsecs, _, (wf, permf, _s), (a,) = timed_loop(
                ffn, (a,), args.num_iter)
            w = wf.astype(dtype)
            perm = permf
            report(f"lu_factor_{args.factor_dtype}_n{n}", secs=fsecs,
                   flops=flops, extra={"nb": nbs[-1]}, as_json=args.json)

        def solve_fn(ww, pp, bb, aa):
            x = lu.solve_factored(grid, ww, pp, bb)
            for _ in range(args.refine):
                with jax.default_matmul_precision("highest"):
                    r = bb - summa.gemm(grid, aa, x,
                                        impl=args.summa_impl)
                x = x + lu.solve_factored(grid, ww, pp, r)
            return x

        sf = jax.jit(solve_fn)
        secs, _, x, (w, perm, b, a) = timed_loop(sf, (w, perm, b, a),
                                                 args.num_iter)
        extra = {"k": args.solve_k, "refine": args.refine}
        if not args.no_validate:
            with jax.default_matmul_precision("highest"):
                res = jnp.linalg.norm(a @ x - b) / jnp.linalg.norm(b)
            extra["solve_residual"] = f"{float(res):.3e}"
        report(f"lu_solve_n{n}", secs=secs,
               flops=2.0 * n * n * args.solve_k, extra=extra,
               as_json=args.json)

    if args.costs:
        with tracing.trace() as t:
            jax.eval_shape(lambda x: lu.factor(grid, x, lu.Config(
                nb=nbs[-1], summa_impl=args.summa_impl)), a)
        print(t.report())
    return rec


if __name__ == "__main__":
    main()
