"""In-kernel MXU tile product with software matmul-precision lowering.

Mosaic only lowers DEFAULT and HIGHEST dot precisions inside Pallas TPU
kernels; requesting HIGH raises "Unsupported dot precision". But HIGH
(XLA's `default_matmul_precision('high')`, 3 bf16 MXU passes instead of
HIGHEST's 6) is exactly the speed/accuracy point a tuned f32 run wants, so
the triangle kernels (pallas_trmm/pallas_syrk) lower it here in software:

    a = a_hi + a_lo,  a_hi = bf16(a),  a_lo = bf16(a - a_hi)
    a @ b  ~=  a_hi b_hi + a_hi b_lo + a_lo b_hi     (lo*lo dropped,
                                                      identical to XLA HIGH)

Each pass is a native-rate bf16 MXU dot with f32 accumulation; the
splitting is a handful of VPU casts per tile, negligible next to the
matmuls at the 512^2 tile sizes these kernels run.

(ref: the precision ladder this mirrors is XLA's own; the reference gets
MKL f64 unconditionally — src/blas/interface.hpp:43-97 — and this
framework's default stays the f32-faithful HIGHEST, ops/precision.py.)
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_ALIASES = {
    "default": lax.Precision.DEFAULT,
    "fastest": lax.Precision.DEFAULT,
    "bfloat16": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "bfloat16_3x": lax.Precision.HIGH,
    "tensorfloat32": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
    "float32": lax.Precision.HIGHEST,
}


def canonicalize(p) -> lax.Precision:
    """Map the strings `jax.default_matmul_precision` accepts onto the
    three-level lax.Precision enum."""
    if isinstance(p, str):
        return _ALIASES[p.lower()]
    if isinstance(p, tuple):  # (lhs, rhs) pair — take the stricter
        a, b = (canonicalize(x) for x in p)
        return max(a, b, key=lambda e: e.value)
    return p


def _split_f32(x):
    # NOT x - x.astype(bf16).astype(f32): XLA's excess-precision folding
    # elides the bf16->f32 round trip inside a compiled body, making lo
    # identically zero (HIGH silently degrades to 1-pass). And Mosaic has
    # no reduce_precision lowering. So round to the bf16 grid by hand:
    # round-to-nearest-even on the top 16 bits of the f32 encoding
    # (carry into the exponent is the correct RNE overflow behavior).
    #
    # Both halves stay f32 (hi exactly on the bf16 grid; lo's in-matmul
    # bf16 rounding under DEFAULT precision is the same RNE cast an
    # explicit bf16 split would do). Keeping f32 lets the dots contract
    # dimension 0 directly — Mosaic rejects bf16-lhs dim-0 contraction,
    # and the VMEM transposes that workaround needs cost more VPU time
    # than the split itself.
    u = lax.bitcast_convert_type(x, jnp.uint32)
    rne = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    hi = lax.bitcast_convert_type(rne & jnp.uint32(0xFFFF0000),
                                  jnp.float32)
    return hi, x - hi


def tile_dot(a, b, contract_dim0: bool = False,
             prec=lax.Precision.HIGHEST):
    """f32-accumulated `a @ b` (or `a.T @ b` when contract_dim0) for use
    INSIDE a Pallas TPU kernel body.

    bf16 inputs always take 1 native pass. f32 inputs take 6 (HIGHEST,
    lowered by Mosaic), 3 (HIGH, lowered here — see module doc) or 1
    (DEFAULT, explicit bf16 cast). Mosaic rejects dim-0 contraction on a
    bf16 lhs ("Bad lhs type"), so every bf16-pass path transposes the lhs
    in VMEM first."""
    # Every dot below pins precision explicitly: an unpinned jnp.dot
    # inherits the ambient jax_default_matmul_precision at trace time, and
    # Mosaic rejects HIGH on a raw dot (bf16 passes are DEFAULT by
    # construction).
    prec = canonicalize(prec)
    if a.dtype == jnp.bfloat16:
        if contract_dim0:
            # Mosaic rejects a bf16 lhs on dim-0 contraction ("Bad lhs
            # type"). Upcasting to f32 and letting the MXU's own DEFAULT-
            # precision bf16 rounding undo it (exact: the values ARE bf16)
            # keeps the contraction transpose-free — an in-VMEM 512² bf16
            # transpose per step costs more VPU time than the convert.
            return lax.dot_general(a.astype(jnp.float32),
                                   b.astype(jnp.float32),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=lax.Precision.DEFAULT)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=lax.Precision.DEFAULT)
    if prec == lax.Precision.HIGHEST:
        if contract_dim0:
            return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=lax.Precision.HIGHEST)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)
    if prec == lax.Precision.DEFAULT:
        # explicit bf16 cast (not f32 operands under DEFAULT precision)
        # so the 1-pass semantics hold on CPU/interpret too, where the
        # precision flag is a no-op
        if contract_dim0:
            a = a.T
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32,
                       precision=lax.Precision.DEFAULT)

    # HIGH: 3 one-pass dots on f32 operands. On TPU the MXU's own RNE
    # bf16 rounding under DEFAULT precision is exact for hi (already on
    # the bf16 grid) and IS the bf16 cast for lo; f32 operands keep dim-0
    # contraction legal (Mosaic rejects a bf16 lhs there), avoiding VMEM
    # transposes.
    if contract_dim0:
        def d(x, y):
            return lax.dot_general(x, y, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=lax.Precision.DEFAULT)
    else:
        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)

    a_hi, a_lo = _split_f32(a)
    b_hi, b_lo = _split_f32(b)
    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))
