"""Matmul precision policy.

On TPU, f32 matmuls run through bf16 MXU passes by default (DEFAULT
precision = 1 pass), silently costing ~1e-4-level relative error — fatal for
a dense linear-algebra library whose acceptance criteria are 1e-5-level
residuals (the reference gets full fp64 from MKL unconditionally;
ref: src/blas/interface.hpp:43-97). Policy here:

  * default = HIGHEST (6-pass f32-faithful MXU) for every dot in the
    framework,
  * an explicit `jax.default_matmul_precision(...)` context from the user
    wins (so bf16/throughput runs are one `with` block away).

All framework dots go through `dot()` / the `prec()` helper below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def prec() -> lax.Precision:
    """Active precision: user's explicit jax.default_matmul_precision if set,
    else HIGHEST."""
    v = jax.config.jax_default_matmul_precision
    if v is None:
        return lax.Precision.HIGHEST
    return v


def acc_dtype(*xs):
    """Accumulation dtype: f64 stays f64 (the reference's MKL precision);
    everything else accumulates in f32."""
    if any(x.dtype == jnp.float64 for x in xs):
        return jnp.float64
    return jnp.float32


def _resolve(a, b, precision):
    """bf16 x bf16 always runs DEFAULT: the MXU multiplies bf16 natively
    and accumulates in f32, so every product is EXACT — extra passes can
    only re-derive the same answer 6x slower (XLA upcasts and multi-passes
    bf16 operands under HIGHEST; measured as a 2.3x cholinv slowdown when
    bf16 fallback dots inherited the framework's HIGHEST default)."""
    if precision is not None:
        return precision
    if a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16:
        return lax.Precision.DEFAULT
    return prec()


def dot(a, b, preferred_element_type=None, precision=None):
    return jnp.dot(
        a, b,
        preferred_element_type=preferred_element_type or acc_dtype(a, b),
        precision=_resolve(a, b, precision),
    )


def dot_general(a, b, dimension_numbers, preferred_element_type=None,
                precision=None):
    return lax.dot_general(
        a, b, dimension_numbers,
        preferred_element_type=preferred_element_type or acc_dtype(a, b),
        precision=_resolve(a, b, precision),
    )
