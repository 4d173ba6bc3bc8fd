import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu import matrix
from capital_tpu.parallel import summa


def _pair(grid, m, k, n, seed=0):
    a = matrix.rand(grid, m, k, jax.random.key(seed)).data
    b = matrix.rand(grid, k, n, jax.random.key(seed + 1)).data
    return a, b


@pytest.mark.parametrize("gridname", ["grid122", "grid222"])
def test_gemm_matches_numpy(gridname, request):
    grid = request.getfixturevalue(gridname)
    a, b = _pair(grid, 32, 64, 32)
    out = summa.gemm(grid, a, b)
    ref = np.asarray(a) @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-4)


def test_gemm_alpha_beta(grid222):
    a, b = _pair(grid222, 32, 32, 32)
    c = matrix.rand(grid222, 32, 32, jax.random.key(9)).data
    out = summa.gemm(grid222, a, b, c=c, alpha=2.0, beta=-0.5)
    ref = 2.0 * (np.asarray(a) @ np.asarray(b)) - 0.5 * np.asarray(c)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-4)


def test_gemm_vs_gspmd(grid222):
    a, b = _pair(grid222, 32, 32, 32, seed=4)
    out_sm = summa.gemm(grid222, a, b, impl="shard_map")
    out_gs = summa.gemm(grid222, a, b, impl="gspmd")
    np.testing.assert_allclose(np.asarray(out_sm), np.asarray(out_gs), atol=1e-4)


def test_transpose(grid222):
    a = matrix.rand(grid222, 32, 64, jax.random.key(3)).data
    at = summa.transpose(grid222, a)
    np.testing.assert_array_equal(np.asarray(at), np.asarray(a).T)


def test_trmm_left_trans(grid222):
    a, b = _pair(grid222, 32, 32, 32, seed=6)
    out = summa.trmm(grid222, a, b, side="L", uplo="U", trans_a=True)
    ref = np.triu(np.asarray(a)).T @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-4)


def test_trmm_right(grid222):
    a, b = _pair(grid222, 32, 32, 32, seed=8)
    out = summa.trmm(grid222, b, a, side="R", uplo="U")
    ref = np.asarray(a) @ np.triu(np.asarray(b))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-4)


def test_syrk(grid222):
    a = matrix.rand(grid222, 64, 32, jax.random.key(5)).data
    c = matrix.rand(grid222, 32, 32, jax.random.key(6)).data
    out = summa.syrk(grid222, a, c=c, alpha=-1.0, beta=1.0)
    ref = np.asarray(c) - np.asarray(a).T @ np.asarray(a)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-4)


def test_syrk_single_device_local_path(grid1):
    """On a 1-device grid syrk routes through the local blas.syrk (the
    triangle-kernel dispatch layer on TPU; plain dot here on CPU) — same
    semantics as the distributed schedule, including the alpha/beta
    epilogue (the cholinv Schur-update shape, ref: cholinv.hpp:131-134)."""
    a = matrix.rand(grid1, 64, 32, jax.random.key(5)).data
    c = matrix.rand(grid1, 32, 32, jax.random.key(6)).data
    out = summa.syrk(grid1, a, c=c, alpha=-1.0, beta=1.0)
    ref = np.asarray(c) - np.asarray(a).T @ np.asarray(a)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-4)


def test_divisibility_check(grid222):
    a = jnp.zeros((32, 34))  # k=34 not divisible by d*c=4
    b = jnp.zeros((34, 32))
    with pytest.raises(ValueError):
        summa.gemm(grid222, a, b)


def test_syrk2(grid222):
    """Two-matrix SYRK C = A^T B (ref: summa.hpp:85-108 2-matrix overload)."""
    import numpy as np

    a = matrix.rand(grid222, 64, 32, jax.random.key(11)).data
    b = matrix.rand(grid222, 64, 32, jax.random.key(12)).data
    out = summa.syrk2(grid222, a, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(a).T @ np.asarray(b),
                               atol=1e-4)


def test_gemm_ring_matches(grid222):
    """Cannon-rotation impl ('ring') computes the same product as the
    all_gather schedule (the overlap knob, ref: summa.hpp:195-215)."""
    m = k = n = 128
    a = matrix.rand(grid222, m, k, jax.random.key(31)).data
    b = matrix.rand(grid222, k, n, jax.random.key(32)).data
    c0 = summa.gemm(grid222, a, b, impl="shard_map")
    c1 = summa.gemm(grid222, a, b, impl="ring")
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                               rtol=1e-6, atol=1e-5)


def test_gemm_ring_flat_grid(grid122):
    """ring on a c=1 grid (pure Cannon, no depth psum)."""
    m = k = n = 64
    a = matrix.rand(grid122, m, k, jax.random.key(33)).data
    b = matrix.rand(grid122, k, n, jax.random.key(34)).data
    c1 = summa.gemm(grid122, a, b, impl="ring")
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(c1), ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("chunks", [2, 4])
def test_gemm_chunked_pipeline_matches(grid222, chunks):
    """num_chunks K-pipelining (the Ibcast chunk knob) is numerically
    identical to the single-gather schedule."""
    m = k = n = 128
    a = matrix.rand(grid222, m, k, jax.random.key(35)).data
    b = matrix.rand(grid222, k, n, jax.random.key(36)).data
    c0 = summa.gemm(grid222, a, b)
    c1 = summa.gemm(grid222, a, b, num_chunks=chunks)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                               rtol=1e-6, atol=1e-5)


def test_gemm_throttled_matches(grid222):
    """Serialized operand gathers (the COLLECTIVE_CONCURRENCY_SOLO/LAYER
    throttle analog, ref: summa.hpp:179-192) are numerically identical to
    the concurrent schedule — the optimization_barrier only orders issue."""
    m = k = n = 128
    a = matrix.rand(grid222, m, k, jax.random.key(41)).data
    b = matrix.rand(grid222, k, n, jax.random.key(42)).data
    c0 = summa.gemm(grid222, a, b)
    c1 = summa.gemm(grid222, a, b, throttle=True)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                               rtol=1e-6, atol=1e-5)


def test_cholinv_with_throttled_summa(grid222):
    from capital_tpu.algs import cholinv
    from capital_tpu import validate

    n = 256
    a = matrix.symmetric(grid222, n, jax.random.key(43)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_throttle=True)
    r, _ = cholinv.factor(grid222, a, cfg)
    assert float(validate.cholesky_residual(grid222, a, r)) < 5e-6


def test_cholinv_with_ring_summa(grid222):
    """End-to-end: the flagship recursion runs on the ring engine."""
    from capital_tpu.algs import cholinv
    from capital_tpu import validate

    n = 256
    a = matrix.symmetric(grid222, n, jax.random.key(37)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_impl="ring")
    r, rinv = cholinv.factor(grid222, a, cfg)
    assert float(validate.cholesky_residual(grid222, a, r)) < 5e-6
    assert float(validate.inverse_residual(grid222, r, rinv)) < 5e-6


def test_cholinv_with_chunked_summa(grid222):
    from capital_tpu.algs import cholinv
    from capital_tpu import validate

    n = 256
    a = matrix.symmetric(grid222, n, jax.random.key(38)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla", summa_chunks=2)
    r, _ = cholinv.factor(grid222, a, cfg)
    assert float(validate.cholesky_residual(grid222, a, r)) < 5e-6


@pytest.mark.parametrize("cc", [2, 4])
def test_gemm_collect_chunked_matches(grid222, cc):
    """collect_chunks slab-pipelines the depth psum (the chunked
    MPI_Iallreduce collect, ref: summa.hpp:238-249) and is numerically
    identical to the monolithic psum — same per-slab accumulation order,
    same reduction order."""
    m = k = n = 128
    a = matrix.rand(grid222, m, k, jax.random.key(51)).data
    b = matrix.rand(grid222, k, n, jax.random.key(52)).data
    c0 = summa.gemm(grid222, a, b)
    c1 = summa.gemm(grid222, a, b, collect_chunks=cc)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                               rtol=1e-6, atol=1e-5)


def test_gemm_collect_and_k_chunks_compose(grid222):
    """Both overlap halves at once: K-chunked gathers inside slab gemms +
    slab psums (the reference's Ibcast AND Iallreduce chunking together,
    summa.hpp:195-249)."""
    m = k = n = 128
    a = matrix.rand(grid222, m, k, jax.random.key(53)).data
    b = matrix.rand(grid222, k, n, jax.random.key(54)).data
    c0 = summa.gemm(grid222, a, b)
    c1 = summa.gemm(grid222, a, b, num_chunks=2, collect_chunks=2)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                               rtol=1e-6, atol=1e-5)


def test_gemm_ring_collect_chunked_matches(grid222):
    """The ring engine's chunked collect (last rotation step slabbed)."""
    m = k = n = 128
    a = matrix.rand(grid222, m, k, jax.random.key(55)).data
    b = matrix.rand(grid222, k, n, jax.random.key(56)).data
    c0 = summa.gemm(grid222, a, b, impl="ring")
    c1 = summa.gemm(grid222, a, b, impl="ring", collect_chunks=2)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                               rtol=1e-6, atol=1e-5)


def test_gemm_collect_chunked_flat_grid(grid122):
    """collect_chunks is a no-op on c == 1 grids (no depth axis)."""
    m = k = n = 64
    a = matrix.rand(grid122, m, k, jax.random.key(57)).data
    b = matrix.rand(grid122, k, n, jax.random.key(58)).data
    c0 = summa.gemm(grid122, a, b)
    c1 = summa.gemm(grid122, a, b, collect_chunks=4)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                               rtol=1e-6, atol=1e-5)


def test_cholinv_with_collect_chunked_summa(grid222):
    from capital_tpu.algs import cholinv
    from capital_tpu import validate

    n = 256
    a = matrix.symmetric(grid222, n, jax.random.key(59)).data
    cfg = cholinv.Config(min_bc=64, base_method="xla",
                         summa_collect_chunks=2)
    r, _ = cholinv.factor(grid222, a, cfg)
    assert float(validate.cholesky_residual(grid222, a, r)) < 5e-6
