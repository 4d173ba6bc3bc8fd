"""Scaling sweep: run the distributed paths across mesh sizes/shapes.

The BASELINE metric is weak-scaling efficiency at 1 chip / 1 host / N hosts.
With one physical chip available, this driver does what can be done honestly:

  * functional + wall-clock sweep over VIRTUAL CPU meshes (1..N devices) —
    validates that the shard_map schedules run at every grid shape and
    reports the ANALYTIC cost model's predicted comm/compute split per
    shape (the quantity that determines real weak-scaling on ICI),
  * on a real multi-chip slice the same driver measures true scaling
    (device count comes from jax.devices()).

Emits one line per (grid shape, algorithm) with measured wall, model time,
per-device GFLOP and ICI MiB.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="mesh-shape scaling sweep")
    p.add_argument("--alg", default="cholinv",
                   choices=["cholinv", "cacqr", "summa", "polar"])
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--m", type=int, default=1 << 16)
    p.add_argument("--weak", action="store_true",
                   help="scale the problem with the mesh (weak scaling)")
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh even if accelerators exist")
    p.add_argument("--devices", type=int, default=None)
    args = p.parse_args(argv)

    import os
    if args.cpu and "xla_force_host_platform_device_count" not in \
            os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()

    import jax
    import jax.numpy as jnp

    from capital_tpu import matrix, tracing
    from capital_tpu.grid import Grid

    devs = jax.devices("cpu") if args.cpu else jax.devices()
    ndev = args.devices or len(devs)

    shapes = []
    for c, d in [(1, 1), (1, 2), (2, 1), (2, 2)]:
        if c * d * d <= ndev:
            shapes.append((c, d))

    rows = []
    for c, d in shapes:
        p_ = c * d * d
        grid = Grid.square(c=c, d=d, devices=devs[:p_])
        scale = int(np.sqrt(p_)) if args.weak else 1
        if args.alg == "cholinv":
            from capital_tpu.algs import cholinv
            n = args.n * scale
            a = matrix.symmetric(grid, n, jax.random.key(0)).data
            cfg = cholinv.Config(min_bc=128, base_method="xla",
                                 summa_impl="shard_map")
            fn = jax.jit(lambda x: cholinv.factor(grid, x, cfg))
            flops = 2 * n**3 / 3
            arg = a
        elif args.alg == "cacqr":
            from capital_tpu.algs import cacqr
            m = args.m * (p_ if args.weak else 1)
            a = matrix.tall_skinny(grid, m, args.n, jax.random.key(0)).data
            cfg = cacqr.Config(num_iter=2, base_method="xla")
            fn = jax.jit(lambda x: cacqr.factor_1d(grid, x, cfg))
            flops = 2 * (4 * m * args.n**2 + 2 * args.n**3 / 3)
            arg = a
        elif args.alg == "polar":
            # spectral-layer scaling proxy: the QDWH sweep is the dominant
            # cost of eigh/svd and is one traced program (polar_jit)
            from capital_tpu.algs import cholinv as _ci
            from capital_tpu.algs import polar as _polar
            n = args.n * scale
            a = matrix.rand(grid, n, n, jax.random.key(0)).data
            pcfg = _polar.Config(
                compute_h=False,
                chol=_ci.Config(min_bc=128, base_method="xla",
                                summa_impl="shard_map"))
            fn = jax.jit(lambda x: _polar.polar(grid, x, pcfg, layout="2d"))
            iters = len(_polar.qdwh_weights(
                pcfg.resolve_l0(jnp.float32), jnp.float32, pcfg.max_iter))
            flops = iters * 5 * n**3
            arg = a
        else:
            from capital_tpu.parallel import summa
            n = args.n * scale
            a = matrix.rand(grid, n, n, jax.random.key(0)).data
            b = matrix.rand(grid, n, n, jax.random.key(1)).data
            fn = jax.jit(lambda x, y: summa.gemm(grid, x, y,
                                                 impl="shard_map"))
            flops = 2 * n**3
            arg = (a, b)

        fargs = arg if isinstance(arg, tuple) else (arg,)
        with tracing.trace() as t:
            jax.eval_shape(fn, *fargs)
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*fargs)
        jax.block_until_ready(out)
        wall = time.perf_counter() - t0

        tot = t.totals()
        rows.append({
            "alg": args.alg, "grid": [c, d, d], "devices": p_,
            "wall_s": round(wall, 5),
            "model_s": round(t.model_time(3.3e13, 9e10), 6),
            "gflop_per_dev": round(tot.flops / 1e9, 3),
            "ici_mib_per_dev": round(tot.comm_bytes / 2**20, 3),
            "total_gflop": round(flops / 1e9, 3),
        })
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    main()
