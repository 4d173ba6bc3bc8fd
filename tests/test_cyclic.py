"""Block-cyclic layout (parallel/cyclic.py): the zero-copy distributed
window mechanism (ref: the `_restrict_` pointer views of
src/matrix/matrix.hpp:171-180, possible only on cyclic layouts —
util.hpp:56-133). Equivalence against the standard block-sharded path on
the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu import matrix
from capital_tpu.parallel import cyclic, summa

TB = 16  # small test tile so 256-sized operands have many aligned windows


def _rand(grid, m, n, seed):
    return matrix.rand(grid, m, n, jax.random.key(seed)).data


def test_roundtrip(grid222):
    a = _rand(grid222, 256, 128, 0)
    phys = cyclic.to_cyclic(grid222, a, tb=TB)
    back = cyclic.from_cyclic(grid222, phys, tb=TB)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(back))
    # the physical array is a real permutation, not the identity
    assert not np.array_equal(np.asarray(a), np.asarray(phys))


def test_global_index_maps(grid222):
    a = _rand(grid222, 256, 128, 1)
    phys = cyclic.to_cyclic(grid222, a, tb=TB)
    gr = cyclic.global_rows(grid222, 256, tb=TB)
    gc = cyclic.global_cols(grid222, 128, tb=TB)
    np.testing.assert_array_equal(
        np.asarray(phys), np.asarray(a)[gr][:, gc])
    # a global-coordinate triangular mask on the permuted array
    masked = jnp.where(jnp.asarray(gr)[:, None] <= jnp.asarray(gc)[None, :],
                       phys, 0.0)
    np.testing.assert_array_equal(
        np.asarray(cyclic.from_cyclic(grid222, masked, tb=TB)),
        np.where(np.arange(256)[:, None] <= np.arange(128)[None, :],
                 np.asarray(a), 0.0))


@pytest.mark.parametrize("awin,bwin", [
    ((0, 0, 256, 256), (0, 0, 256, 128)),       # full
    ((64, 128, 128, 64), (192, 64, 64, 64)),    # interior windows
    ((128, 0, 128, 256), (0, 0, 256, 32)),      # tall-wide mix
])
def test_gemm_window_matches_dense(grid222, awin, bwin):
    """gemm on zero-copy cyclic windows == dense slice @ dense slice."""
    a = _rand(grid222, 256, 256, 2)
    b = _rand(grid222, 256, 128, 3)
    pa = cyclic.to_cyclic(grid222, a, tb=TB)
    pb = cyclic.to_cyclic(grid222, b, tb=TB)
    if awin[3] != bwin[2]:
        bwin = (bwin[0], bwin[1], awin[3], bwin[3])
    c = cyclic.gemm_window(grid222, pa, pb, a_window=awin, b_window=bwin,
                           tb=TB)
    # result is cyclic over (awin rows, bwin cols): build a view grid of
    # the same mesh to invert the layout
    cg = cyclic.from_cyclic(grid222, c, tb=TB)
    r0, c0, h, w = awin
    s0, t0, k, w2 = bwin
    ref = (np.asarray(a, np.float64)[r0:r0 + h, c0:c0 + w]
           @ np.asarray(b, np.float64)[s0:s0 + k, t0:t0 + w2])
    np.testing.assert_allclose(np.asarray(cg), ref, rtol=1e-5, atol=1e-4)


def test_gemm_window_chunked(grid222):
    a = _rand(grid222, 256, 256, 4)
    b = _rand(grid222, 256, 256, 5)
    pa = cyclic.to_cyclic(grid222, a, tb=TB)
    pb = cyclic.to_cyclic(grid222, b, tb=TB)
    win = (64, 64, 128, 128)
    c1 = cyclic.gemm_window(grid222, pa, pb, a_window=win, b_window=win,
                            num_chunks=2, tb=TB)
    c0 = cyclic.gemm_window(grid222, pa, pb, a_window=win, b_window=win,
                            tb=TB)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                               rtol=1e-6, atol=1e-5)


def test_read_update_window_roundtrip(grid222):
    a = _rand(grid222, 256, 256, 6)
    phys = cyclic.to_cyclic(grid222, a, tb=TB)
    win = (64, 128, 128, 64)
    v = cyclic.read_window(grid222, phys, win, tb=TB)
    assert v.shape == (128, 64)
    phys2 = cyclic.update_window(grid222, phys, 2.0 * v, win, tb=TB)
    back = np.asarray(cyclic.from_cyclic(grid222, phys2, tb=TB))
    ref = np.asarray(a).copy()
    ref[64:192, 128:192] *= 2.0
    np.testing.assert_allclose(back, ref, rtol=1e-6, atol=0)


def test_window_alignment_rejected(grid222):
    a = _rand(grid222, 256, 256, 7)
    phys = cyclic.to_cyclic(grid222, a, tb=TB)
    with pytest.raises(ValueError):
        cyclic.read_window(grid222, phys, (8, 0, 64, 64), tb=TB)


def test_schur_update_in_workspace(grid222):
    """One recursion-style in-place Schur step entirely on zero-copy
    windows: W22 -= W21 @ W12 (the per-level pattern multi-device
    cholinv/LU pay a resharding slice for under block layout)."""
    n, h = 256, 128
    a = _rand(grid222, n, n, 8)
    phys = cyclic.to_cyclic(grid222, a, tb=TB)
    prod = cyclic.gemm_window(grid222, phys, phys,
                              a_window=(h, 0, h, h),
                              b_window=(0, h, h, h), tb=TB)
    w22 = cyclic.read_window(grid222, phys, (h, h, h, h), tb=TB)
    phys = cyclic.update_window(grid222, phys, w22 - prod, (h, h, h, h),
                                tb=TB)
    back = np.asarray(cyclic.from_cyclic(grid222, phys, tb=TB), np.float64)
    ref = np.asarray(a, np.float64).copy()
    ref[h:, h:] -= ref[h:, :h] @ ref[:h, h:]
    np.testing.assert_allclose(back, ref, rtol=1e-5, atol=1e-4)
