"""Shared driver machinery (ref: bench driver lifecycle, SURVEY §3.4).

The reference's drivers: MPI_Init -> parse positional ints -> build topology
-> distribute matrix -> warmup factor -> timed loop with barrier + max
MPI_Wtime -> rank-0 print (ref: bench/cholesky/cholinv.cpp:8-71). Here:
build Grid -> generate DistMatrix -> jit + warmup -> block_until_ready-timed
loop -> JSON/text report, plus the analytic cost table (critter analog).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

# Persistent compilation cache: repeated driver runs skip recompiles (the
# tunnel-attached TPU pays 20-40s per fresh compile otherwise).
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            os.path.expanduser("~/.cache/capital_tpu_xla"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--c", type=int, default=1,
                   help="depth/replication factor (ref: rep_factor argv)")
    p.add_argument("--layout", type=int, default=0,
                   help="device-order permutation (ref: layout argv)")
    p.add_argument("--num-iter", type=int, default=3,
                   help="timed iterations (ref: num_iter argv)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--precision", default="highest",
                   choices=["highest", "high", "default"],
                   help="matmul passes: highest=f32-faithful (6x bf16), "
                        "high=3x bf16 (~1.5x faster, 1e-5-class accuracy), "
                        "default=1x bf16")
    p.add_argument("--no-validate", action="store_true",
                   help="skip residual checks (the reference's default —"
                        " its validate calls are commented out)")
    p.add_argument("--costs", action="store_true",
                   help="print the analytic cost table (critter analog)")
    p.add_argument("--json", action="store_true", help="one JSON line only")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace into this dir")
    return p


def force(out):
    """Force execution to completion by fetching one element of every output
    leaf. On remote/tunneled TPU backends (axon) `block_until_ready` can
    return before the work has actually run; a host fetch cannot."""
    import numpy as np

    for leaf in jax.tree.leaves(out):
        idx = tuple(slice(0, 1) for _ in getattr(leaf, "shape", ()))
        np.asarray(jax.device_get(leaf[idx] if idx else leaf))


def _perturb(args, i: int):
    """Fresh input buffers each iteration (scaling by 1 + i*1e-7) so remote
    execution caches can never serve a previous result."""
    s = 1.0 + (i + 1) * 1e-7
    return jax.tree.map(
        lambda x: x * s if hasattr(x, "dtype") and x.dtype.kind == "f" else x,
        args,
    )


def apply_precision(args):
    """Apply the --precision flag globally (precision.prec() honors an
    explicit jax_default_matmul_precision over the framework HIGHEST
    default)."""
    if getattr(args, "precision", "highest") != "highest":
        jax.config.update("jax_default_matmul_precision", args.precision)


def timed_loop(fn, args, num_iter: int, warmup: int = 1, make_args=None):
    """Warmup + timed loop; returns (min_secs, times, out, last_args) —
    min over iters matching the reference's max-over-ranks / best-practice
    minimum, and the LAST iteration's (perturbed) input operands, so
    validators can compare `out` against the operand that actually
    produced it (the perturbation scale is 1e-7-level: without this, a
    validator comparing against the unperturbed operand has a ~3e-7
    residual floor).

    make_args: optional factory i -> args tuple, for DONATING jits whose
    input buffers are consumed — each call gets freshly generated
    (seed-deterministic) operands instead of the perturbed `args`. The
    last timed call uses i = num_iter - 1, so callers can regenerate the
    exact operand the returned outputs correspond to (donated last_args
    buffers are consumed and returned as None)."""
    if make_args is None:
        for _ in range(warmup):
            out = fn(*args)
        force(out)
        times = []
        for i in range(num_iter):
            fresh = _perturb(args, i)
            force(fresh)
            t0 = time.perf_counter()
            out = fn(*fresh)
            force(out)
            times.append(time.perf_counter() - t0)
        return min(times), times, out, fresh
    for w in range(warmup):
        out = fn(*make_args(1000 + w))
    force(out)
    times = []
    for i in range(num_iter):
        # free the previous call's outputs BEFORE regenerating: at the
        # donate frontier (n=32768 f32) holding last iteration's n^2
        # results across the next call is the difference between fitting
        # HBM and ResourceExhausted
        del out
        fresh = make_args(i)
        force(fresh)
        t0 = time.perf_counter()
        out = fn(*fresh)
        force(out)
        times.append(time.perf_counter() - t0)
    return min(times), times, out, None


def report(name: str, *, secs: float, flops: float | None = None,
           extra: dict | None = None, as_json: bool = False):
    rec = {"bench": name, "time_s": round(secs, 6)}
    if flops is not None:
        rec["gflops"] = round(flops / secs / 1e9, 2)
    rec.update(extra or {})
    if as_json:
        print(json.dumps(rec))
    else:
        parts = [f"{name}: {secs*1e3:.3f} ms"]
        if flops is not None:
            parts.append(f"{rec['gflops']} GFLOP/s")
        parts += [f"{k}={v}" for k, v in (extra or {}).items()]
        print("  ".join(parts))
    return rec
