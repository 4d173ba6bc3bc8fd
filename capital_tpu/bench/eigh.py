"""Spectral bench driver: QDWH-eig / QDWH-SVD vs stock XLA.

The reference has no eigensolver (its capability frontier is cholinv +
cacqr); this driver measures the framework's spectral extension — built
entirely from the reference-parity engines — against the platform
alternative a TPU user would otherwise reach for (jnp.linalg.eigh /
jnp.linalg.svd, XLA's built-in one-chip solvers). Same knob/report shape
as the other drivers (ref: bench driver lifecycle, SURVEY §3.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from capital_tpu import matrix, tracing
from capital_tpu.algs import cholinv, eigh, polar, svd
from capital_tpu.bench.common import (apply_precision, base_parser, report,
                                      timed_loop)
from capital_tpu.grid import Grid


def main(argv=None):
    p = base_parser("QDWH spectral solvers (eigh / svd)")
    p.add_argument("--op", default="eigh",
               choices=["eigh", "svd", "partial", "svd_partial"])
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--m", type=int, default=None,
                   help="rows for --op svd (default: n, square)")
    p.add_argument("--k", type=int, default=256,
                   help="eigenpair count for --op partial")
    p.add_argument("--which", default="top", choices=["top", "bottom"],
                   help="spectrum end for --op partial")
    p.add_argument("--base-n", type=int, default=1024,
                   help="replicated dense base-case size")
    p.add_argument("--probe-dtype", default=None, choices=[None, "bfloat16"],
                   help="--op partial: storage dtype for the sign probes "
                        "and split (bf16 fits n=32768 in 16-GB HBM; the "
                        "RR refinement re-extracts against the full-"
                        "precision operand)")
    p.add_argument("--refine", type=int, default=None,
                   help="--op partial: Rayleigh-Ritz refinement sweeps")
    p.add_argument("--summa-impl", default="gspmd",
                   choices=["gspmd", "shard_map", "ring"])
    p.add_argument("--base-method", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--compare-xla", action="store_true",
                   help="also time jnp.linalg.{eigh,svd} (replicated) on "
                        "the same operand")
    args = p.parse_args(argv)
    apply_precision(args)

    import math
    ndev = len(jax.devices())
    d = max(dd for dd in range(1, int(math.isqrt(ndev // args.c)) + 1)
            if args.c * dd * dd <= ndev)
    grid = Grid.square(c=args.c, d=d, devices=jax.devices()[: args.c * d * d],
                       layout=args.layout)

    dtype = jnp.dtype(args.dtype)
    n = args.n
    chol_cfg = cholinv.Config(summa_impl=args.summa_impl,
                              base_method=args.base_method)
    ekw = {}
    if args.probe_dtype:
        ekw["probe_dtype"] = args.probe_dtype
    if args.refine is not None:
        ekw["partial_refine"] = args.refine
    ecfg = eigh.Config(
        base_n=args.base_n,
        polar=polar.Config(compute_h=False, chol=chol_cfg), **ekw)

    if args.op in ("eigh", "partial"):
        # spread (Wigner-class) spectrum: the honest D&C workload — a
        # diagonally dominant operand would shortcut through the cluster
        # early-out
        a = matrix.symmetric(grid, n, jax.random.key(0), dtype=dtype,
                             diag_shift=0.0, align=128).data
        if args.op == "partial":
            fn = lambda x: eigh.eigh_partial(  # noqa: E731
                grid, x, args.k, ecfg, which=args.which)
        else:
            fn = lambda x: eigh.eigh(grid, x, ecfg)  # noqa: E731
        oracle = jnp.linalg.eigh
    else:
        m = args.m or n
        a = matrix.rand(grid, m, n, jax.random.key(0), dtype=dtype,
                        row_tile=128 * grid.d1, col_tile=128 * grid.d2).data
        scfg = svd.Config(polar=polar.Config(chol=chol_cfg), eig=ecfg)
        if args.op == "svd_partial":
            fn = lambda x: svd.svd_partial(grid, x, args.k, scfg)  # noqa: E731
        else:
            fn = lambda x: svd.svd(grid, x, scfg)  # noqa: E731
        oracle = lambda x: jnp.linalg.svd(x, full_matrices=False)  # noqa: E731

    secs, _, out, (a,) = timed_loop(fn, (a,), args.num_iter)

    extra = {"n": n, "grid": grid.shape, "base_n": args.base_n}
    if args.op == "svd":
        extra["m"] = args.m or n
    if args.op in ("partial", "svd_partial"):
        extra["k"] = args.k
        if args.op == "partial":
            extra["which"] = args.which
    if not args.no_validate:
        if args.op in ("eigh", "partial"):
            w, v = out
            v64 = np.asarray(v, np.float64)
            a64 = np.asarray(a, np.float64)
            scale = np.linalg.norm(a64)
            kk = v64.shape[1]
            extra["residual"] = float(
                np.linalg.norm(a64 @ v64 - v64 * np.asarray(w, np.float64))
                / scale)
            extra["orthogonality"] = float(
                np.linalg.norm(v64.T @ v64 - np.eye(kk)) / np.sqrt(kk))
        else:
            u, s, v = out
            u64, v64 = np.asarray(u, np.float64), np.asarray(v, np.float64)
            a64 = np.asarray(a, np.float64)
            kk = u64.shape[1]
            if args.op == "svd_partial":
                # truncated: subspace residual ||A V - U s|| / ||A||
                extra["residual"] = float(
                    np.linalg.norm(a64 @ v64 - u64 * np.asarray(
                        s, np.float64)) / np.linalg.norm(a64))
            else:
                extra["residual"] = float(
                    np.linalg.norm((u64 * np.asarray(s, np.float64)) @ v64.T
                                   - a64) / np.linalg.norm(a64))
            extra["orthogonality"] = float(
                np.linalg.norm(u64.T @ u64 - np.eye(kk)) / np.sqrt(kk))

    if args.compare_xla:
        rep = jax.device_put(a, grid.replicated)
        xla_fn = jax.jit(oracle)
        xsecs, _, _, _ = timed_loop(xla_fn, (rep,), args.num_iter)
        extra["xla_time_s"] = round(xsecs, 6)
        extra["vs_xla"] = round(xsecs / secs, 3)

    rec = report(f"qdwh_{args.op}", secs=secs, flops=None, extra=extra,
                 as_json=args.json)
    return rec


if __name__ == "__main__":
    main()
