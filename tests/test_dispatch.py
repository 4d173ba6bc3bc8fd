"""Kernel-dispatch policy units (the measured gates in blas/cacqr/precision).

These pin the on-chip measurements of 2026-08-18 as policy:
  * bf16 x bf16 dots always run DEFAULT precision (products are exact
    under f32 accumulation; HIGHEST just re-derives the answer 6x slower),
  * the bf16 Gram routes to the triangle kernel only at n >= 2048,
  * the bf16 tall-skinny narrow-n formQ trmm stays on XLA's fused dot.
"""

import jax.numpy as jnp
from jax import lax

from capital_tpu.algs.cacqr import _resolve_gram_kernel
from capital_tpu.ops.precision import _resolve


def test_bf16_dots_resolve_to_default():
    a = jnp.zeros((4, 4), jnp.bfloat16)
    b = jnp.zeros((4, 4), jnp.bfloat16)
    assert _resolve(a, b, None) == lax.Precision.DEFAULT
    # explicit user precision still wins
    assert _resolve(a, b, lax.Precision.HIGHEST) == lax.Precision.HIGHEST
    # mixed/f32 inputs keep the framework policy (HIGHEST by default)
    f = jnp.zeros((4, 4), jnp.float32)
    assert _resolve(f, f, None) == lax.Precision.HIGHEST


def test_gram_kernel_resolution():
    assert _resolve_gram_kernel("auto", jnp.float32, "tpu", 1024) == "tri"
    assert _resolve_gram_kernel("auto", jnp.bfloat16, "tpu", 4096) == "tri"
    assert _resolve_gram_kernel("auto", jnp.bfloat16, "tpu", 1024) == "dot"
    assert _resolve_gram_kernel("auto", jnp.float32, "cpu", 4096) == "dot"
    # explicit choice always wins
    assert _resolve_gram_kernel("dot", jnp.float32, "tpu", 4096) == "dot"
    assert _resolve_gram_kernel("tri", jnp.bfloat16, "cpu", 256) == "tri"
