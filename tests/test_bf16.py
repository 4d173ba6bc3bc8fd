"""bfloat16 storage paths: factorizations accept bf16 operands (MXU-native
storage; accumulation stays f32 via preferred_element_type). Accuracy is
bf16-class — tolerances reflect eps_bf16 ~ 8e-3."""

import jax
import jax.numpy as jnp

from capital_tpu import matrix, validate
from capital_tpu.algs import cacqr, cholinv


def test_cholinv_bf16(grid122):
    n = 256
    a = matrix.symmetric(grid122, n, jax.random.key(0), dtype=jnp.bfloat16)
    cfg = cholinv.Config(min_bc=64, base_method="xla")
    r, rinv = cholinv.factor(grid122, a, cfg)
    assert r.dtype == jnp.bfloat16
    res = float(validate.cholesky_residual(grid122, a.data.astype(jnp.float32),
                                           r.astype(jnp.float32)))
    assert res < 0.05, res


def test_cacqr_bf16(grid_rect):
    m, n = 4096, 128
    a = matrix.tall_skinny(grid_rect, m, n, jax.random.key(1),
                           dtype=jnp.bfloat16)
    cfg = cacqr.Config(num_iter=2, base_method="xla")
    q, r = cacqr.factor_1d(grid_rect, a, cfg)
    assert q.dtype == jnp.bfloat16
    ortho = float(validate.qr_orthogonality(
        grid_rect, q.astype(jnp.float32), layout="1d"))
    # CholeskyQR2's second sweep recovers bf16-class orthogonality
    assert ortho < 0.05, ortho
