"""Distributed LU with partial pivoting (algs/lu.py).

The reference has no general factorization (its newton/rectri inverse
family is broken/half-done, SURVEY §0); LU completes the direct-solver
family. Acceptance criteria follow the reference's validator style
(relative Frobenius residuals, ref: test/inverse/validate.hpp:7-34):
||P A - L U|| / ||A||, solve residual, det parity vs numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu import linalg
from capital_tpu.algs import lu


def _gen(n, seed=0, dtype=jnp.float32):
    # general (non-symmetric, non-dominant) — exercises real pivoting
    return jax.random.normal(jax.random.key(seed), (n, n), dtype=dtype)


def _lu_residual(a, w, perm):
    l, u = lu.unpack(w)
    pa = jnp.take(a, perm, axis=0)
    return float(jnp.linalg.norm(pa - l @ u) / jnp.linalg.norm(a))


def test_lu_single(grid1):
    n = 384
    a = _gen(n)
    w, perm, sign = lu.factor(grid1, a, lu.Config(nb=128))
    assert _lu_residual(a, w, perm) < 5e-6
    # perm is a real permutation
    assert np.array_equal(np.sort(np.asarray(perm)), np.arange(n))


def test_lu_pivoting_matters(grid1):
    # leading zero pivot: unpivoted elimination would blow up immediately
    n = 128
    a = _gen(n, seed=3).at[0, 0].set(0.0)
    w, perm, _ = lu.factor(grid1, a, lu.Config(nb=32))
    assert _lu_residual(a, w, perm) < 5e-6
    assert int(perm[0]) != 0  # the zero pivot row was swapped away


def test_lu_distributed(grid222):
    n = 256
    a = grid222.constrain(_gen(n, seed=1), grid222.slice_spec)
    w, perm, _ = lu.factor(grid222, a, lu.Config(nb=64))
    assert _lu_residual(a, w, perm) < 5e-6


def test_lu_matches_single_device(grid122, grid1):
    # same matrix, same panel width: distributed == single-device bitwise
    # up to collective reduction order (f32 tolerance)
    n = 192
    a = _gen(n, seed=5)
    w1, p1, s1 = lu.factor(grid1, a, lu.Config(nb=64))
    w2, p2, s2 = lu.factor(
        grid122, grid122.constrain(a, grid122.slice_spec), lu.Config(nb=64))
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert float(s1) == float(s2)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=0, atol=2e-4)


def test_lu_solve_and_refine(grid122):
    n, k = 256, 8
    a = grid122.constrain(_gen(n, seed=2), grid122.slice_spec)
    b = jax.random.normal(jax.random.key(7), (n, k), dtype=jnp.float32)
    x = linalg.solve(grid122, a, b, method="lu")
    res = float(jnp.linalg.norm(a @ x - b) / jnp.linalg.norm(b))
    assert res < 1e-5, res


def test_lu_slogdet(grid1):
    n = 192
    a = _gen(n, seed=4)
    sign, logdet = lu.slogdet(grid1, a, lu.Config(nb=64))
    s_ref, ld_ref = np.linalg.slogdet(np.asarray(a, np.float64))
    assert float(sign) == pytest.approx(s_ref)
    assert float(logdet) == pytest.approx(ld_ref, rel=1e-4)


def test_lu_f64(grid1):
    with jax.enable_x64():
        n = 256
        a = _gen(n, dtype=jnp.float64)
        w, perm, _ = lu.factor(grid1, a, lu.Config(nb=64))
        assert _lu_residual(a, w, perm) < 1e-14


def test_lu_single_panel(grid1):
    # nb >= n degenerates to one replicated getrf
    n = 128
    a = _gen(n, seed=6)
    w, perm, _ = lu.factor(grid1, a, lu.Config(nb=512))
    assert _lu_residual(a, w, perm) < 5e-6


def test_lu_jit(grid122):
    n = 128
    a = grid122.constrain(_gen(n, seed=8), grid122.slice_spec)
    f = jax.jit(lambda x: lu.factor(grid122, x, lu.Config(nb=64)))
    w, perm, sign = f(a)
    assert _lu_residual(a, w, perm) < 5e-6


def test_panel_lu_jax_matches_custom_call(grid1, monkeypatch):
    """The pure-JAX blocked panel getrf (the tall-panel route: XLA's
    LuDecompositionBlock scoped-VMEM footprint scales with panel height
    and dies at m >= ~14k on a 16-MB v5e) picks the identical pivot
    sequence as lax.linalg.lu and reproduces its factors to rounding."""
    from jax import lax as jlax
    from capital_tpu.algs.lu import _panel_lu_jax

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((640, 192)).astype(np.float32))
    w, perm, piv = _panel_lu_jax(a)
    lu_ref, piv_ref, perm_ref = jlax.linalg.lu(a)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(perm_ref))
    scale = np.abs(np.asarray(lu_ref)).max()
    assert np.abs(np.asarray(w) - np.asarray(lu_ref)).max() < 1e-5 * scale
    # and PA = LU holds in its own right
    w64 = np.asarray(w, np.float64)
    l = np.tril(w64, -1)[:, :192] + np.eye(640, 192)
    u = np.triu(w64[:192])
    pa = np.asarray(a, np.float64)[np.asarray(perm)]
    assert np.linalg.norm(l @ u - pa) / np.linalg.norm(pa) < 1e-6


def test_factor_with_jax_panel_route(grid122, monkeypatch):
    """lu.factor end-to-end with the JAX panel forced: same residual
    class as the custom-call route."""
    from capital_tpu import matrix

    monkeypatch.setenv("CAPITAL_LU_PANEL", "jax")
    n = 256
    a = matrix.rand(grid122, n, n, jax.random.key(11)).data
    w, perm, sign = lu.factor(grid122, a, lu.Config(nb=64))
    l, u = lu.unpack(w)
    pa = jnp.take(a, perm, axis=0)
    res = np.linalg.norm(np.asarray(l, np.float64) @ np.asarray(u, np.float64)
                         - np.asarray(pa, np.float64))
    assert res / np.linalg.norm(np.asarray(a)) < 1e-5


def test_lu_bench_donate_validates_factored_matrix(grid1, capsys):
    """--donate regenerates per iteration; validation must check the
    matrix that was actually factored LAST (review finding, round 4 —
    it previously checked the startup operand and reported O(1)
    residuals for correct factorizations)."""
    from capital_tpu.bench import lu as lu_bench

    rec = lu_bench.main(["--n", "128", "--nb", "64", "--num-iter", "3",
                         "--donate", "--json"])
    assert float(rec["residual"]) < 1e-5


def test_chunked_residual_matches_dense(grid1):
    """The bench's row-slab ||PA - LU|| (used at n >= 16384, where the
    dense validator's buffers OOM before the factorization) equals the
    dense formula."""
    from capital_tpu.bench.lu import _chunked_residual

    n = 512
    a = _gen(n, seed=9)
    w, perm, _ = lu.factor(grid1, a, lu.Config(nb=128))
    l, u = lu.unpack(w)
    dense = float(jnp.linalg.norm(jnp.take(a, perm, axis=0) - l @ u))
    chunked = float(_chunked_residual(grid1, w, perm, a, chunk=128))
    # the K-chunked L @ triu(W) (needed so the validator never holds a
    # second n^2 triu buffer at n=32768) reorders the accumulation, and
    # every element of PA - LU is itself an eps-level cancellation — the
    # two norms agree in magnitude (the validator's job), not in digits
    assert abs(dense - chunked) / dense < 0.3


def test_lu_lookahead_matches(grid222, monkeypatch):
    """CAPITAL_LU_LOOKAHEAD=1 (split Schur: next-panel gemm + factor
    before the remainder slabs) produces the same factorization as the
    monolithic schedule — same pivots, same workspace, on a 2x2x2 mesh."""
    n = 256
    a = _gen(n, seed=3)
    cfg = lu.Config(nb=64)
    w0, p0, s0 = lu.factor(grid222, a, cfg)
    monkeypatch.setenv("CAPITAL_LU_LOOKAHEAD", "1")
    w1, p1, s1 = lu.factor(grid222, a, cfg)
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert float(s0) == float(s1)
    # the narrow gemm's device tiling differs from the slab's, so the
    # f32 accumulation order differs and compounds through the panel
    # chain — assert the factorization quality, not bitwise agreement
    assert _lu_residual(a, w1, p1) < 5e-6
    assert _lu_residual(a, w0, p0) < 5e-6
