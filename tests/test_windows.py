"""Windowed (zero-copy) operands for the triangle kernels and their
blas/summa plumbing: a windowed call must equal slicing first.

(The windows reproduce the reference's `_restrict_` pointer-offset
submatrix views, ref: src/matrix/matrix.hpp:171-180, as static offsets in
the Pallas BlockSpec index maps.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu.ops.pallas_syrk import syrk_upper
from capital_tpu.ops.pallas_trmm import trmm_upper


@pytest.fixture(scope="module")
def big():
    w = jax.random.normal(jax.random.key(0), (512, 512), jnp.float32)
    return w


@pytest.mark.parametrize("side,trans", [("L", False), ("L", True),
                                        ("R", False)])
def test_trmm_window_equals_slice(big, side, trans):
    # triangular operand: 256x256 window at (128, 128); rectangular
    # operand: 256x256 window at (128, 256)
    uw = (128, 128, 256)
    if side == "L":
        bw = (128, 256, 256, 256)
        b_sl = big[128:384, 256:512]
    else:
        bw = (128, 128, 256, 256)
        b_sl = big[128:384, 128:384]
    u_sl = big[128:384, 128:384]
    got = trmm_upper(big, big, side=side, trans_a=trans, interpret=True,
                     t=128, mc=128, u_window=uw, b_window=bw)
    want = trmm_upper(u_sl, b_sl, side=side, trans_a=trans, interpret=True,
                      t=128, mc=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_trmm_window_misaligned_falls_back(big):
    # offsets not tile-aligned: must still be CORRECT (explicit slice path)
    uw = (64, 64, 256)
    bw = (64, 192, 256, 256)
    got = trmm_upper(big, big, side="L", interpret=True, t=128, mc=128,
                     u_window=uw, b_window=bw)
    u_sl = np.triu(np.asarray(big[64:320, 64:320], np.float64))
    b_sl = np.asarray(big[64:320, 192:448], np.float64)
    np.testing.assert_allclose(np.asarray(got), u_sl @ b_sl, atol=1e-3)


def test_syrk_window_equals_slice(big):
    aw = (128, 256, 384, 256)
    got = syrk_upper(big, interpret=True, t=128, mc=128, a_window=aw)
    a_sl = big[128:512, 256:512]
    want = syrk_upper(a_sl, interpret=True, t=128, mc=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_syrk_window_misaligned_falls_back(big):
    aw = (64, 192, 384, 256)
    got = syrk_upper(big, interpret=True, t=128, mc=128, a_window=aw)
    a_sl = np.asarray(big[64:448, 192:448], np.float64)
    np.testing.assert_allclose(np.asarray(got), a_sl.T @ a_sl, atol=1e-2)


def test_blas_window_plumbing(big):
    """blas.trmm/syrk honor windows on the dot path (CPU)."""
    from capital_tpu.ops import blas

    out = blas.trmm(big, big, side="L", a_window=(128, 128, 256, 256),
                    b_window=(128, 256, 256, 256))
    u_sl = np.triu(np.asarray(big[128:384, 128:384], np.float64))
    b_sl = np.asarray(big[128:384, 256:512], np.float64)
    np.testing.assert_allclose(np.asarray(out), u_sl @ b_sl, atol=1e-3)

    g = blas.syrk(big, a_window=(128, 256, 384, 256))
    a_sl = np.asarray(big[128:512, 256:512], np.float64)
    np.testing.assert_allclose(np.asarray(g), a_sl.T @ a_sl, atol=1e-2)


def test_summa_window_multi_device(grid222):
    """Distributed summa slices windows explicitly — same result."""
    from capital_tpu import matrix
    from capital_tpu.parallel import summa

    a = matrix.rand(grid222, 128, 128, jax.random.key(3)).data
    out = summa.trmm(grid222, a, a, side="L",
                     a_window=(64, 64, 64, 64), b_window=(0, 64, 64, 64))
    u_sl = np.triu(np.asarray(a[64:128, 64:128], np.float64))
    b_sl = np.asarray(a[0:64, 64:128], np.float64)
    np.testing.assert_allclose(np.asarray(out), u_sl @ b_sl, atol=1e-3)

    g = summa.syrk(grid222, a, a_window=(0, 64, 128, 64))
    a_sl = np.asarray(a[:, 64:128], np.float64)
    np.testing.assert_allclose(np.asarray(g), a_sl.T @ a_sl, atol=1e-2)
