"""Headline benchmark: recursive Cholesky+inverse (cholinv) on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md) — its metric is wall time
per factor() (ref: bench/cholesky/cholinv.cpp:51-59). The measurable baseline
here is stock XLA doing the same work (cholesky + triangular solve against I):
vs_baseline = t_xla / t_ours, so > 1.0 means the framework beats the
compiler's native lowering on the same chip.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/capital_tpu_xla")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _force(out):
    """Fetch one element of each leaf: on tunneled backends block_until_ready
    can return before execution; a host fetch cannot."""
    import numpy as np

    for leaf in jax.tree.leaves(out):
        idx = tuple(slice(0, 1) for _ in leaf.shape)
        np.asarray(jax.device_get(leaf[idx]))


def _time(f, a, iters=5, warmup=2):
    for _ in range(warmup):
        out = f(a)
    _force(out)
    times = []
    for i in range(iters):
        fresh = a * (1.0 + (i + 1) * 1e-7)  # defeat remote result caching
        _force(fresh)
        t0 = time.perf_counter()
        out = f(fresh)
        _force(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def _regen(n, seed):
    u = jax.random.uniform(jax.random.key(seed), (n, n), dtype=jnp.float32,
                           minval=-0.5, maxval=0.5)
    return (u + u.T) * 0.5 + n * jnp.eye(n, dtype=jnp.float32)


def _time_donated(f, n, iters=3, warmup=1):
    """Timed loop for a donating jit: regenerate the operand from a fresh
    seed per iteration (fresh values defeat remote result caching), freeing
    the previous outputs BEFORE regenerating — at n=32768 f32 the outputs
    (8 GB) plus generation temps would not co-fit in HBM."""
    regen = jax.jit(_regen, static_argnums=0)

    def one(seed):
        x = regen(n, seed)
        _force(x)
        t0 = time.perf_counter()
        out = f(x)
        _force(out)
        dt = time.perf_counter() - t0
        del out
        return dt

    for w in range(warmup):
        one(1000 + w)
    return min(one(i + 1) for i in range(iters))


def main():
    from capital_tpu.grid import Grid
    from capital_tpu.algs import cholinv

    on_tpu = jax.default_backend() not in ("cpu",)
    n = 32768 if on_tpu else 2048  # north-star shape (BASELINE.md)

    grid = Grid.square(c=1, d=1, devices=jax.devices()[:1])

    cfg = cholinv.Config(base_method="auto", summa_impl="gspmd",
                         complete_inv=True)  # bc=512 (autotuned 512-1024)
    # Headline precision: 'high' (3 bf16 MXU passes, incl. the software
    # lowering inside the triangle Pallas kernels — ops/pallas_dot.py).
    # Residual at this config, n=32768: 4.0e-7 / inv 2.9e-7 (BENCH_LOCAL.md)
    # — far inside the 1e-5 acceptance bar, 1.67x faster than the 6-pass
    # f32-faithful HIGHEST default (which remains the framework default).
    # The XLA baseline below keeps ITS default (1-pass bf16 dots inside
    # cholesky/triangular_solve) — it is never slowed by this choice.
    jax.config.update("jax_default_matmul_precision", "high")
    ours = jax.jit(lambda x: cholinv.factor(grid, x, cfg), donate_argnums=0)

    def make_xla_ref(nn):
        def xla_ref(x):
            l = jax.lax.linalg.cholesky(x)
            linv = jax.lax.linalg.triangular_solve(
                l, jnp.eye(nn, dtype=x.dtype), left_side=True, lower=True)
            return l.T, linv.T
        return jax.jit(xla_ref)

    try:
        t_ours = _time_donated(ours, n)
    except Exception:
        # fall back one size rather than reporting nothing
        n //= 2
        t_ours = _time_donated(ours, n)
    jax.config.update("jax_default_matmul_precision", None)

    # Baseline = stock XLA (cholesky + triangular_solve). At n>=16384 its
    # triangular-solve expansion OOMs 16-GB HBM, so fall back to the largest
    # size it can run and scale by the n^3 flop ratio (generous to the
    # baseline: its efficiency only improves with n).
    nb = min(n, 8192)
    t_xla = None
    while nb >= 2048:
        try:
            t_xla = _time(make_xla_ref(nb), _regen(nb, 7)) * (n / nb) ** 3
            break
        except Exception:
            nb //= 2
    if t_xla is None:
        t_xla = float("inf")

    # useful flops: n^3/3 (cholesky) + n^3/3 (full triangular inverse)
    gflops = (2 * n**3 / 3) / t_ours / 1e9
    print(json.dumps({
        "metric": f"cholinv_n{n}_gflops_per_chip",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(t_xla / t_ours, 4),
    }))


if __name__ == "__main__":
    main()
