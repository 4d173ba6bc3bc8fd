"""Software matmul-precision lowering for in-kernel dots (ops/pallas_dot.py).

Mosaic only lowers DEFAULT/HIGHEST; HIGH (3-pass bf16x3) is lowered in
software by the triangle kernels. The key regression these tests pin down:
the hi/lo split must NOT be expressible as x - f32(bf16(x)) — XLA's
excess-precision folding elides that round trip inside a compiled body and
silently degrades HIGH to 1-pass (caught on-chip, 2026-08-18).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental import pallas as pl

from capital_tpu.ops.pallas_dot import canonicalize, tile_dot
from capital_tpu.ops.pallas_syrk import syrk_upper
from capital_tpu.ops.pallas_trmm import trmm_upper


def _err(f):
    """Max abs error of a compiled (256,256)x(256,128) product vs f64."""
    a = jax.random.normal(jax.random.key(0), (256, 256), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (256, 128), jnp.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    out = jax.jit(f)(a, b)
    return np.abs(np.asarray(out) - ref).max()


def test_canonicalize():
    assert canonicalize("high") == lax.Precision.HIGH
    assert canonicalize("highest") == lax.Precision.HIGHEST
    assert canonicalize("float32") == lax.Precision.HIGHEST
    assert canonicalize("bfloat16_3x") == lax.Precision.HIGH
    assert canonicalize("default") == lax.Precision.DEFAULT
    assert canonicalize(lax.Precision.HIGH) == lax.Precision.HIGH
    # (lhs, rhs) pairs take the stricter
    assert canonicalize(("default", "highest")) == lax.Precision.HIGHEST


@pytest.mark.parametrize("contract_dim0", [False, True])
def test_precision_ladder_compiled(contract_dim0):
    """Under jit (where XLA folding applies), the three precisions must be
    strictly ordered in accuracy — HIGH genuinely 3-pass, not 1-pass."""
    def make(p):
        def f(a, b):
            aa = a.T if contract_dim0 else a
            return tile_dot(aa, b, contract_dim0=contract_dim0, prec=p)
        return f

    e_highest = _err(make("highest"))
    e_high = _err(make("high"))
    e_default = _err(make("default"))
    assert e_highest < 5e-5
    assert e_high < 5e-3           # 3-pass class
    assert e_high < e_default / 10  # and MUCH better than 1-pass
    assert e_default < 1.0


def test_high_inside_pallas_interpret():
    """The folding regression happened specifically inside a pallas body."""
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = tile_dot(a_ref[:], b_ref[:], False, "high")

    a = jax.random.normal(jax.random.key(0), (256, 256), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (256, 128), jnp.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        interpret=True)(a, b)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    assert np.abs(np.asarray(out) - ref).max() < 5e-3


@pytest.mark.parametrize("p,tol", [("highest", 1e-4), ("high", 5e-3)])
def test_trmm_kernel_precisions(p, tol):
    u = jax.random.normal(jax.random.key(2), (256, 256), jnp.float32)
    b = jax.random.normal(jax.random.key(3), (256, 128), jnp.float32)
    tri = np.triu(np.asarray(u, np.float64))
    out = trmm_upper(u, b, side="L", interpret=True, t=128, mc=128,
                     matmul_precision=p)
    np.testing.assert_allclose(np.asarray(out), tri @ np.asarray(b),
                               atol=tol)
    outt = trmm_upper(u, b, side="L", trans_a=True, interpret=True,
                      t=128, mc=128, matmul_precision=p)
    np.testing.assert_allclose(np.asarray(outt), tri.T @ np.asarray(b),
                               atol=tol)
    outr = trmm_upper(u, b.T, side="R", interpret=True, t=128, mc=128,
                      matmul_precision=p)
    np.testing.assert_allclose(np.asarray(outr), np.asarray(b).T @ tri,
                               atol=tol)


@pytest.mark.parametrize("p,tol", [("highest", 1e-2), ("high", 0.5)])
def test_syrk_kernel_precisions(p, tol):
    a = jax.random.normal(jax.random.key(4), (512, 256), jnp.float32)
    g = syrk_upper(a, interpret=True, t=128, mc=128, matmul_precision=p)
    ref = np.asarray(a, np.float64).T @ np.asarray(a, np.float64)
    np.testing.assert_allclose(np.asarray(g), ref, atol=tol)


def test_context_precision_reaches_kernels():
    """jax.default_matmul_precision('high') must reach the Pallas kernels
    through blas-layer dispatch (the --precision knob path)."""
    u = jax.random.normal(jax.random.key(5), (256, 256), jnp.float32)
    b = jax.random.normal(jax.random.key(6), (256, 128), jnp.float32)
    with jax.default_matmul_precision("high"):
        out = trmm_upper(u, b, side="L", interpret=True, t=128, mc=128)
    hi = trmm_upper(u, b, side="L", interpret=True, t=128, mc=128,
                    matmul_precision="highest")
    lo = trmm_upper(u, b, side="L", interpret=True, t=128, mc=128,
                    matmul_precision="default")
    ref = np.triu(np.asarray(u, np.float64)) @ np.asarray(b, np.float64)
    e_ctx = np.abs(np.asarray(out) - ref).max()
    e_hi = np.abs(np.asarray(hi) - ref).max()
    e_lo = np.abs(np.asarray(lo) - ref).max()
    assert e_hi <= e_ctx <= e_lo
    assert e_ctx < e_lo / 10  # genuinely 3-pass, not 1-pass
