"""Pallas panel-LU leaf kernel (ops/pallas_getrf.py) — interpret-mode
equivalence with LAPACK's getrf (lax.linalg.lu): identical pivot sequence,
identical swap bookkeeping, factors to rounding. The kernel is the TPU
fusion of the panel's sequential elimination loop (the MKL-native fusion
the reference gets from LAPACKE_dgetrf, ref: src/lapack/interface.hpp:30-88).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from capital_tpu.ops.pallas_getrf import getrf_leaf_pallas


@pytest.mark.parametrize("mm,ib", [(256, 16), (512, 32), (640, 24)])
def test_leaf_matches_lapack(mm, ib):
    rng = np.random.default_rng(mm + ib)
    a = jnp.asarray(rng.standard_normal((mm, ib)).astype(np.float32))
    lu_, pj, piv = getrf_leaf_pallas(a, interpret=True)
    ref, piv_ref, perm_ref = lax.linalg.lu(a)
    np.testing.assert_array_equal(np.asarray(pj), np.asarray(perm_ref))
    np.testing.assert_array_equal(np.asarray(piv), np.asarray(piv_ref))
    scale = np.abs(np.asarray(ref)).max()
    assert np.abs(np.asarray(lu_) - np.asarray(ref)).max() < 1e-5 * scale


def test_leaf_zero_pivot_column():
    # a leading zero forces a swap at step 0; an all-zero column exercises
    # the safe-divide guard (LAPACK info>0 analog: garbage-free zeros)
    rng = np.random.default_rng(7)
    a = rng.standard_normal((128, 16)).astype(np.float32)
    a[0, 0] = 0.0
    lu_, pj, piv = getrf_leaf_pallas(jnp.asarray(a), interpret=True)
    assert int(pj[0]) != 0
    z = a.copy()
    z[:, 3] = 0.0
    lu_, pj, piv = getrf_leaf_pallas(jnp.asarray(z), interpret=True)
    assert np.isfinite(np.asarray(lu_)).all()


def test_leaf_reconstructs():
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((384, 32)).astype(np.float32))
    lu_, pj, piv = getrf_leaf_pallas(a, interpret=True)
    w = np.asarray(lu_, np.float64)
    l = np.tril(w, -1)[:, :32] + np.eye(384, 32)
    u = np.triu(w[:32])
    pa = np.asarray(a, np.float64)[np.asarray(pj)]
    assert np.linalg.norm(l @ u - pa) / np.linalg.norm(pa) < 1e-6
