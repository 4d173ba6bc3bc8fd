"""Analytic cost model (critter analog) — costs recorded at trace time.

ref: the reference extracts critical-path/volumetric cost vectors via
critter (autotune/cholesky/cholinv/tune.cpp:63-66); here they are computed
analytically from mesh + shapes while the recursion unrolls."""

import jax
import jax.numpy as jnp
import pytest

from capital_tpu import tracing
from capital_tpu.algs import cacqr, cholinv
from capital_tpu.parallel import summa


def test_summa_gemm_costs(grid222):
    n = 256
    a = jnp.ones((n, n), jnp.float32)
    with tracing.trace() as t:
        jax.eval_shape(lambda x, y: summa.gemm(grid222, x, y), a, a)
    tot = t.totals()
    d, c = grid222.d, grid222.c
    assert tot.flops == pytest.approx(2 * n**3 / (d * d * c))
    assert tot.comm_bytes > 0
    assert tot.msgs == 3


def test_cholinv_phases(grid122):
    n = 512
    a = jnp.eye(n, dtype=jnp.float32) * n
    cfg = cholinv.Config(base_method="xla", min_bc=128, bc_mult=0)
    with tracing.trace() as t:
        jax.eval_shape(lambda x: cholinv.factor(grid122, x, cfg), a)
    phases = set(k.split("/")[0] for k in t.by_phase if k != "<total>")
    # reference ALGORITHMIC_SYMBOLS names (cholinv.hpp:94-136)
    assert {"CI::factor_diag", "CI::trsm", "CI::tmu", "CI::inv"} <= phases
    # total MXU flops should be within a small factor of 2*n^3/3 / P * P...
    # at least nonzero and dominated by non-base phases
    assert t.totals().flops > 0


def test_cacqr_1d_cost_model(grid_rect):
    m, n = 1024, 128
    a = jnp.ones((m, n), jnp.float32)
    cfg = cacqr.Config(num_iter=2, base_method="xla")
    with tracing.trace() as t:
        jax.eval_shape(lambda x: cacqr.factor_1d(grid_rect, x, cfg), a)
    tot = t.totals()
    p = grid_rect.num_devices
    # two sweeps: each 2mn^2/P (gram) + 2mn^2/P (formQ) + 2n^3/3 (chol)
    expect = 2 * (2 * m * n * n / p + 2 * m * n * n / p + 2 * n**3 / 3)
    assert tot.flops == pytest.approx(expect)
    # communication: exactly one Gram psum per sweep
    assert tot.msgs == 2
    assert t.model_time(1e12, 1e11) > 0


def test_no_tracer_is_noop(grid122):
    n = 256
    a = jnp.ones((n, n), jnp.float32)
    # no tracer active: phases degrade to named_scope, record() is a no-op
    out = jax.eval_shape(lambda x, y: summa.gemm(grid122, x, y), a, a)
    assert out.shape == (n, n)
    assert tracing.active() is None
