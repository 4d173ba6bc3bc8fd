"""Config-space sweep harness (the reference's autotune/ + critter analog).

The reference sweeps (base-case policy x bcMultiplier x grid aspect) under
critter instrumentation, recording critical-path / per-process / volumetric
cost vectors to text tables (ref: autotune/cholesky/cholinv/tune.cpp:175-253,
autotune/util.h:4-127). Here each candidate config is:

  1. traced once to collect the ANALYTIC cost vector (tracing.Tracer — the
     decomposition-mode critter run, ref: tune.cpp:72-78),
  2. run + timed on hardware (the uninstrumented reference run,
     ref: tune.cpp:33-41),

and the sweep emits (a) the same style of whitespace table, (b) a JSON
records list, (c) the argmin-by-measured-time candidate.

Search axes mirror the reference's knobs: bc_mult (bcMultiplier), split,
complete_inv, base method (base-case policy analog), summa impl, mesh depth
c (rep_factor / grid-aspect analog), gram policy + variant for QR.
"""

from __future__ import annotations

import itertools
import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from capital_tpu import tracing
from capital_tpu.grid import Grid


@dataclass
class Candidate:
    params: dict
    time_s: float = float("inf")
    costs: dict = field(default_factory=dict)
    model_time_s: float = 0.0
    error: str | None = None

    def record(self):
        return {"params": self.params, "time_s": self.time_s,
                "model_time_s": self.model_time_s, **self.costs,
                **({"error": self.error} if self.error else {})}


def _measure(make_fn, args, num_iter: int) -> float:
    from capital_tpu.bench.common import force, _perturb

    fn = make_fn()
    out = fn(*args)
    force(out)
    best = float("inf")
    for i in range(num_iter):
        fresh = _perturb(args, i)
        force(fresh)
        t0 = time.perf_counter()
        out = fn(*fresh)
        force(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _trace_costs(fn, args) -> tuple[dict, float]:
    with tracing.trace() as t:
        jax.eval_shape(fn, *args)
    tot = t.totals()
    costs = {"gflop": tot.flops / 1e9, "ici_mib": tot.comm_bytes / 2**20,
             "msgs": tot.msgs}
    # roofline cost model: v5e-class chip, f32-faithful MXU + 1 ICI ring
    model = t.model_time(flops_per_s=3.3e13, ici_bytes_per_s=9e10)
    return costs, model


def sweep_cholinv(grid: Grid, a, space: dict | None = None,
                  num_iter: int = 2) -> list[Candidate]:
    """Sweep cholinv configs on a fixed grid + matrix.

    space keys (each a list): bc_mult, split, complete_inv, base_method,
    summa_impl (ref axes: bcMultiplier sweep at tune.cpp:239-253 and the 3
    base-case policy variants at tune.cpp:175-177)."""
    from capital_tpu.algs import cholinv

    space = space or {
        "bc_mult": [0, 1, 2],
        "split": [1],
        "complete_inv": [True],
        "base_method": ["auto"],
        # overlap engines + the Ibcast-chunking analog (summa.hpp:195-215)
        "summa_impl": (["gspmd"] if grid.num_devices == 1
                       else ["shard_map", "ring"]),
        "summa_chunks": [1] if grid.num_devices == 1 else [1, 2],
        # chunked depth collect (ref: the Iallreduce half, summa.hpp:238-249)
        "summa_collect_chunks": [1] if grid.c <= 1 else [1, 2],
        # collective-concurrency throttle (ref: summa.hpp:179-192)
        "summa_throttle": ([False] if grid.num_devices == 1
                           else [False, True]),
        # the reference's BaseCasePolicy axis (policy.h:160-514)
        "base_policy": (["replicated"] if grid.num_devices == 1
                        else ["replicated", "layer"]),
        # workspace layout: block-sharded vs block-cyclic (zero-resharding
        # recursion windows, algs/cholinv_cyclic.py — the `_restrict_`
        # economics of ref matrix.hpp:171-180; square multi-device only)
        "workspace": (["block", "cyclic"]
                      if grid.num_devices > 1 and grid.is_square
                      else ["block"]),
        # MXU pass-count ladder (ops/precision.py; reaches the Pallas
        # triangle kernels through ops/pallas_dot.py) — a tuning axis the
        # reference cannot have (MKL is always f64)
        "precision": ["highest", "high"],
    }
    out = []
    keys = list(space)
    for vals in itertools.product(*(space[k] for k in keys)):
        params = dict(zip(keys, vals))
        cand = Candidate(params=params)
        try:
            cfg_params = {k: v for k, v in params.items()
                          if k not in ("precision", "workspace")}
            cfg = cholinv.Config(**cfg_params)
            if params.get("workspace", "block") == "cyclic":
                from capital_tpu.algs import cholinv_cyclic

                factor = cholinv_cyclic.factor
            else:
                factor = cholinv.factor
            with jax.default_matmul_precision(params.get("precision",
                                                         "highest")):
                fn = jax.jit(lambda x, cfg=cfg, factor=factor:
                             factor(grid, x, cfg))
                cand.costs, cand.model_time_s = _trace_costs(fn, (a,))
                cand.time_s = _measure(lambda: fn, (a,), num_iter)
        except Exception as e:  # config invalid for this shape: record, move on
            cand.error = f"{type(e).__name__}: {e}"
        out.append(cand)
    return out


def cacqr_paths(grid: Grid) -> list[str]:
    """Feasible cacqr dispatch paths for a grid — the QR tuner's real
    decision variable (the reference sweeps grid aspect ratios precisely
    to move between these regimes, autotune/qr/cacqr/tune.cpp:84-89;
    dispatch at cacqr.hpp:229-244)."""
    paths = ["1d"]
    if grid.is_square and grid.num_devices > 1:
        paths.append("3d")
    if grid.c == grid.d2 and grid.c > 1:
        paths.append("hybrid")
    return paths


def sweep_cacqr(grid: Grid, a, space: dict | None = None,
                num_iter: int = 2) -> list[Candidate]:
    """Sweep CholeskyQR configs (ref: QR tune sweeps grid aspect ratios +
    bcMultiplier, autotune/qr/cacqr/tune.cpp:84-89).

    The `path` axis selects the dispatch regime (factor_1d / factor_3d /
    factor_hybrid) so the grid-aspect sweep tunes the thing it exists
    for: on a rect grid the hybrid Gram rides the (z, x) square view, on
    a square grid the 3D path distributes the Gram Cholesky, and the 1D
    gram-allreduce path is always feasible. formq_chunks (in-place Q
    formation) and gram_kernel (triangle-aware Pallas vs XLA dot) are the
    two single-chip knobs that dominate the tall-skinny regime."""
    from capital_tpu.algs import cacqr, cholinv

    space = space or {
        "path": cacqr_paths(grid),
        "num_iter": [2],
        "gram_policy": ["allreduce", "two_stage", "packed"],
        "gram_kernel": (["dot", "tri"]
                        if grid.platform in ("tpu", "axon") else ["auto"]),
        "formq_chunks": [1, 4],
        "base_method": ["auto"],
        "precision": ["highest", "high"],
    }
    fns = {"1d": cacqr.factor_1d, "3d": cacqr.factor_3d,
           "hybrid": cacqr.factor_hybrid, "auto": cacqr.factor}
    out = []
    keys = list(space)
    for vals in itertools.product(*(space[k] for k in keys)):
        params = dict(zip(keys, vals))
        cand = Candidate(params=params)
        try:
            cfg_params = {k: v for k, v in params.items()
                          if k not in ("precision", "path")}
            cfg = cacqr.Config(**cfg_params)
            factor = fns[params.get("path", "auto")]
            with jax.default_matmul_precision(params.get("precision",
                                                         "highest")):
                fn = jax.jit(lambda x, cfg=cfg, factor=factor:
                             factor(grid, x, cfg))
                cand.costs, cand.model_time_s = _trace_costs(fn, (a,))
                cand.time_s = _measure(lambda: fn, (a,), num_iter)
        except Exception as e:
            cand.error = f"{type(e).__name__}: {e}"
        out.append(cand)
    return out


def sweep_lu(grid: Grid, a, space: dict | None = None,
             num_iter: int = 2) -> list[Candidate]:
    """Sweep the LU panel width + Schur-engine knobs (algs/lu.py — the
    general-solver completion; no reference counterpart, same harness
    shape as sweep_cholinv)."""
    from capital_tpu.algs import lu

    import os

    space = space or {
        "nb": [512, 1024, 2048],
        "summa_impl": (["gspmd"] if grid.num_devices == 1
                       else ["shard_map", "ring"]),
        "precision": ["highest", "high"],
        "lookahead": [False, True],
    }
    out = []
    keys = list(space)
    for vals in itertools.product(*(space[k] for k in keys)):
        params = dict(zip(keys, vals))
        cand = Candidate(params=params)
        prev_la = os.environ.get("CAPITAL_LU_LOOKAHEAD")
        try:
            cfg_params = {k: v for k, v in params.items()
                          if k not in ("precision", "lookahead")}
            cfg = lu.Config(**cfg_params)
            if "lookahead" in params:
                os.environ["CAPITAL_LU_LOOKAHEAD"] = \
                    "1" if params["lookahead"] else "0"
            with jax.default_matmul_precision(params.get("precision",
                                                         "highest")):
                fn = jax.jit(lambda x, cfg=cfg: lu.factor(grid, x, cfg))
                cand.costs, cand.model_time_s = _trace_costs(fn, (a,))
                cand.time_s = _measure(lambda: fn, (a,), num_iter)
        except Exception as e:
            cand.error = f"{type(e).__name__}: {e}"
        finally:
            if prev_la is None:
                os.environ.pop("CAPITAL_LU_LOOKAHEAD", None)
            else:
                os.environ["CAPITAL_LU_LOOKAHEAD"] = prev_la
        out.append(cand)
    return out


def sweep_eigh(grid: Grid, a, space: dict | None = None,
               num_iter: int = 1) -> list[Candidate]:
    """Sweep the divide-and-conquer eigensolver's knobs (no reference
    counterpart — the spectral layer is beyond-parity; the sweep shape
    follows the same harness). eigh is host-orchestrated, so candidates
    are measured by full runs and the cost vector comes from the analytic
    records the run itself emits (tracing.record in algs/eigh.py)."""
    from capital_tpu.algs import cholinv, eigh, polar

    space = space or {
        "base_n": [1024, 2048] if grid.num_devices == 1 else [256, 512],
        "summa_impl": (["gspmd"] if grid.num_devices == 1
                       else ["shard_map", "gspmd"]),
        # None -> 10*eps (accuracy default); 1e-5 trades ~2 QDWH
        # iterations for split-coupling residual (see eigh.Config.sign_l0)
        "sign_l0": [None, 1e-5],
        "precision": ["highest", "high"],
    }
    out = []
    keys = list(space)
    for vals in itertools.product(*(space[k] for k in keys)):
        params = dict(zip(keys, vals))
        cand = Candidate(params=params)
        try:
            chol = cholinv.Config(summa_impl=params["summa_impl"],
                                  base_method="auto")
            cfg = eigh.Config(
                base_n=params["base_n"], sign_l0=params["sign_l0"],
                polar=polar.Config(compute_h=False, chol=chol))
            with jax.default_matmul_precision(params.get("precision",
                                                         "highest")):
                fn = lambda x, cfg=cfg: eigh.eigh(grid, x, cfg)  # noqa: E731
                with tracing.trace() as t:
                    w, v = fn(a)
                tot = t.totals()
                cand.costs = {"gflop": tot.flops / 1e9,
                              "ici_mib": tot.comm_bytes / 2**20,
                              "msgs": tot.msgs}
                # quality column: a candidate that silently degrades (e.g.
                # falls back to the dense base after failed splits) must
                # not win on time alone. Device-side chunked validator —
                # a host f64 residual is 2 n^2 doubles of traffic per
                # candidate, quietly impossible at the n >= 16384 shapes
                # the eigensolver exists for.
                from capital_tpu import validate as _val

                cand.costs["residual"] = float(
                    _val.eig_residual(grid, a, w, v,
                                      chunks=max(1, a.shape[0] // 2048)))
                cand.model_time_s = t.model_time(flops_per_s=3.3e13,
                                                 ici_bytes_per_s=9e10)
                cand.time_s = _measure(lambda: fn, (a,), num_iter)
        except Exception as e:
            cand.error = f"{type(e).__name__}: {e}"
        out.append(cand)
    return out


def grid_candidates(devices=None):
    """Feasible grid shapes for the visible device count — the reference's
    rep_factor / grid-aspect tuning axis (ref: the QR tuner sweeps aspect
    ratios in-process, autotune/qr/cacqr/tune.cpp:84-89; the bench drivers
    take rep_div/rep_factor, bench/qr/cacqr.cpp:17-18).

    Returns (kind, c, d) triples: square c x d x d sub-grids (device count
    c*d*d <= P) plus full-device rect d x c x c grids."""
    devs = devices if devices is not None else jax.devices()
    p = len(devs)
    out = [("square", 1, 1)]
    for c in (1, 2, 4):
        for d in (2, 4, 8):
            if 1 < c * d * d <= p:
                out.append(("square", c, d))
    for c in (2, 4):
        if c * c < p and p % (c * c) == 0:
            out.append(("rect", c, p // (c * c)))
    return out


def sweep_grids(alg: str = "cholinv", n: int = 4096, m: int = 1 << 18,
                shapes=None, space: dict | None = None, num_iter: int = 2,
                devices=None) -> list[Candidate]:
    """Outer sweep over mesh shapes (grid-aspect axis), inner sweep over the
    per-algorithm config space. Each candidate's params carry the grid
    shape + device count so the report tables get a grid column."""
    from capital_tpu import matrix

    devs = list(devices) if devices is not None else jax.devices()
    shapes = shapes or grid_candidates(devs)
    out: list[Candidate] = []
    for kind, c, d in shapes:
        try:
            if kind == "square":
                grid = Grid.square(c=c, d=d, devices=devs[: c * d * d])
            else:
                grid = Grid.rect(c=c, devices=devs)
        except ValueError:
            continue
        tag = f"{kind}-c{c}x{grid.d1}x{grid.d2}"
        if alg == "cholinv":
            a = matrix.symmetric(grid, n, jax.random.key(0), align=128).data
            cands = sweep_cholinv(grid, a, space, num_iter=num_iter)
        elif alg == "eigh":
            if kind != "square":
                continue  # the eigensolver's 2d stages want a square slice
            a = matrix.symmetric(grid, n, jax.random.key(0),
                                 diag_shift=0.0, align=128).data
            cands = sweep_eigh(grid, a, space, num_iter=num_iter)
        elif alg == "lu":
            if kind != "square":
                continue  # LU's slice layout wants a square grid
            a = matrix.rand(grid, n, n, jax.random.key(0),
                            row_tile=128 * grid.d1,
                            col_tile=128 * grid.d2).data
            cands = sweep_lu(grid, a, space, num_iter=num_iter)
        else:
            a = matrix.tall_skinny(grid, m, n, jax.random.key(0)).data
            cands = sweep_cacqr(grid, a, space, num_iter=num_iter)
        for cand in cands:
            cand.params = {"grid": tag, "devices": grid.num_devices,
                           **cand.params}
        out.extend(cands)
    return out


def best(cands: Sequence[Candidate]) -> Candidate:
    return min(cands, key=lambda c: c.time_s)


def write_tables(cands: Sequence[Candidate], prefix: str, num_devices: int = 1):
    """Emit the reference-style report files (ref: autotune/util.h:4-61
    layout; *_cp_* / *_cross_* naming at tune.cpp:208-217):

      <prefix>_cp_times.txt     config vs measured/model times
      <prefix>_cp_costs.txt     config vs critical-path cost vector
      <prefix>_cross_times.txt  max-per-process + volumetric times
      <prefix>_cross_costs.txt  max-per-process + volumetric cost vectors
      <prefix>.jsonl            machine-readable records

    In uniform SPMD the critical-path and max-per-process vectors coincide
    (every device executes the same program); volumetric = per-device x P —
    both stated explicitly so reference-style consumers see all three.
    Grid-sweep candidates carry their own device count in params."""
    keys = sorted({k for c in cands for k in c.params})

    def head(f, extra):
        f.write("  ".join(f"{k:>12}" for k in keys) + extra + "\n")

    def row(f, c, extra):
        f.write("  ".join(f"{str(c.params.get(k, '-')):>12}" for k in keys)
                + extra + "\n")

    def nd(c):
        return c.params.get("devices", num_devices)

    with open(f"{prefix}_cp_times.txt", "w") as f:
        head(f, f"  {'time_s':>12}  {'model_s':>12}")
        for c in cands:
            row(f, c, f"  {c.time_s:>12.6f}  {c.model_time_s:>12.6f}")
    with open(f"{prefix}_cp_costs.txt", "w") as f:
        head(f, f"  {'GFLOP':>12}  {'ICI_MiB':>12}  {'msgs':>8}")
        for c in cands:
            row(f, c, f"  {c.costs.get('gflop', 0):>12.3f}"
                      f"  {c.costs.get('ici_mib', 0):>12.3f}"
                      f"  {c.costs.get('msgs', 0):>8}")
    with open(f"{prefix}_cross_times.txt", "w") as f:
        head(f, f"  {'pp_time_s':>12}  {'vol_time_s':>12}")
        for c in cands:
            row(f, c, f"  {c.time_s:>12.6f}  {c.time_s * nd(c):>12.6f}")
    with open(f"{prefix}_cross_costs.txt", "w") as f:
        head(f, f"  {'pp_GFLOP':>12}  {'vol_GFLOP':>12}  {'vol_ICI_MiB':>12}")
        for c in cands:
            g = c.costs.get("gflop", 0)
            mib = c.costs.get("ici_mib", 0)
            row(f, c, f"  {g:>12.3f}  {g * nd(c):>12.3f}"
                      f"  {mib * nd(c):>12.3f}")
    with open(f"{prefix}.jsonl", "w") as f:
        for c in cands:
            f.write(json.dumps(c.record()) + "\n")


def main(argv=None):
    import argparse

    from capital_tpu import matrix

    p = argparse.ArgumentParser(description="autotune cholinv / cacqr / eigh")
    p.add_argument("--alg", default="cholinv",
                   choices=["cholinv", "cacqr", "eigh", "lu"])
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--m", type=int, default=1 << 18)
    p.add_argument("--num-iter", type=int, default=2)
    p.add_argument("--prefix", default=None)
    p.add_argument("--grid", default="auto",
                   help="'sweep' = mesh-shape sweep over all feasible "
                        "grids (the rep_factor axis); 'square:C:D'; "
                        "'rect:C'; 'auto' = sweep when >1 device visible")
    p.add_argument("--cpu", action="store_true",
                   help="sweep on the virtual CPU mesh (the multi-device "
                        "fake backend) even when an accelerator is visible")
    args = p.parse_args(argv)

    devs = jax.devices("cpu") if args.cpu else jax.devices()
    gspec = args.grid
    if gspec == "auto":
        gspec = "sweep" if len(devs) > 1 else "square:1:1"
    if gspec == "sweep":
        cands = sweep_grids(args.alg, n=args.n, m=args.m,
                            num_iter=args.num_iter, devices=devs)
        nd = 1
    else:
        parts = gspec.split(":")
        if parts[0] == "square":
            grid = Grid.square(c=int(parts[1]), d=int(parts[2]),
                               devices=devs[: int(parts[1]) * int(parts[2]) ** 2])
        elif parts[0] == "rect":
            grid = Grid.rect(c=int(parts[1]), devices=devs)
        else:
            raise SystemExit(f"bad --grid {args.grid!r}")
        if args.alg == "cholinv":
            a = matrix.symmetric(grid, args.n, jax.random.key(0),
                                 align=128).data
            cands = sweep_cholinv(grid, a, num_iter=args.num_iter)
        elif args.alg == "eigh":
            # spread spectrum (see bench/eigh.py): the honest D&C workload
            a = matrix.symmetric(grid, args.n, jax.random.key(0),
                                 diag_shift=0.0, align=128).data
            cands = sweep_eigh(grid, a, num_iter=args.num_iter)
        elif args.alg == "lu":
            a = matrix.rand(grid, args.n, args.n, jax.random.key(0),
                            row_tile=128 * grid.d1,
                            col_tile=128 * grid.d2).data
            cands = sweep_lu(grid, a, num_iter=args.num_iter)
        else:
            a = matrix.tall_skinny(grid, args.m, args.n,
                                   jax.random.key(0)).data
            cands = sweep_cacqr(grid, a, num_iter=args.num_iter)
        nd = grid.num_devices

    prefix = args.prefix or f"autotune_{args.alg}"
    write_tables(cands, prefix, num_devices=nd)
    b = best(cands)
    print(json.dumps({"best": b.params, "time_s": b.time_s}))
    return cands


if __name__ == "__main__":
    main()
