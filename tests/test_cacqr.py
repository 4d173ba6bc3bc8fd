import jax
import jax.numpy as jnp
import numpy as np
import pytest

from capital_tpu import matrix, validate
from capital_tpu.algs import cacqr, cholinv


def test_cholqr2_1d(grid222):
    m, n = 1024, 32
    a = matrix.tall_skinny(grid222, m, n, jax.random.key(0))
    cfg = cacqr.Config(num_iter=2, base_method="xla")
    q, r = cacqr.factor_1d(grid222, a.data, cfg)
    assert float(validate.qr_orthogonality(grid222, q)) < 1e-5
    assert float(validate.qr_residual(grid222, a.data, q, r)) < 1e-5
    assert np.allclose(np.asarray(r), np.triu(np.asarray(r)))


def test_cholqr2_beats_cholqr1(grid222):
    """The second sweep is the conditioning fix (ref: cacqr.hpp:180-210)."""
    m, n = 2048, 32
    key = jax.random.key(1)
    # ill-conditioned columns
    a = matrix.tall_skinny(grid222, m, n, key).data
    scale = jnp.logspace(0, 3, n)[None, :].astype(a.dtype)
    a = (a * scale).block_until_ready()
    orth = {}
    for it in (1, 2):
        cfg = cacqr.Config(num_iter=it, base_method="xla")
        q, r = cacqr.factor_1d(grid222, a, cfg)
        orth[it] = float(validate.qr_orthogonality(grid222, q))
    assert orth[2] < orth[1]
    assert orth[2] < 1e-5


def test_gram_policies_match(grid222):
    m, n = 512, 16
    a = matrix.tall_skinny(grid222, m, n, jax.random.key(2)).data
    g1 = cacqr.gram_1d(grid222, a, "allreduce")
    g2 = cacqr.gram_1d(grid222, a, "two_stage")
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(a).T @ np.asarray(a), atol=1e-4
    )


def test_cholqr2_3d(grid122):
    """3D path: distributed Gram + distributed cholinv."""
    m, n = 256, 128
    a = matrix.rand(grid122, m, n, jax.random.key(3)).data
    cfg = cacqr.Config(
        num_iter=2, chol=cholinv.Config(min_bc=32, base_method="xla")
    )
    q, r = cacqr.factor_3d(grid122, a, cfg)
    assert float(validate.qr_orthogonality(grid122, q)) < 1e-5
    assert float(validate.qr_residual(grid122, a, q, r)) < 1e-5


def test_cholqr_3d_partial_inverse_solve(grid122):
    """complete_inv=False exercises the 2-block back-substitution
    (ref: solve, cacqr.hpp:44-73)."""
    m, n = 256, 128
    a = matrix.rand(grid122, m, n, jax.random.key(4)).data
    cfg = cacqr.Config(
        num_iter=2,
        chol=cholinv.Config(min_bc=32, complete_inv=False, base_method="xla"),
    )
    q, r = cacqr.factor_3d(grid122, a, cfg)
    assert float(validate.qr_orthogonality(grid122, q)) < 1e-5
    assert float(validate.qr_residual(grid122, a, q, r)) < 1e-5


def test_apply_q_1d(grid222):
    m, n = 512, 32
    a = matrix.tall_skinny(grid222, m, n, jax.random.key(5)).data
    q, r = cacqr.factor_1d(grid222, a, cacqr.Config(base_method="xla"))
    x = jnp.eye(n, dtype=q.dtype)
    qx = cacqr.apply_q(grid222, q, x)
    np.testing.assert_allclose(np.asarray(qx), np.asarray(q), atol=1e-5)
    # Q^T A == R
    qta = cacqr.apply_q(grid222, q, a, trans=True)
    np.testing.assert_allclose(np.asarray(qta), np.asarray(r), atol=1e-3)


def test_factor_hybrid(grid_rect):
    """Hybrid (1<c<d) path: Gram factored distributed on the (z, x) axis
    view (ref: sweep_tune, cacqr.hpp:124-170)."""
    import jax
    import jax.numpy as jnp

    from capital_tpu import matrix, validate
    from capital_tpu.algs import cacqr, cholinv

    m, n = 2048, 256
    a = matrix.tall_skinny(grid_rect, m, n, jax.random.key(9))
    cfg = cacqr.Config(
        num_iter=2,
        chol=cholinv.Config(min_bc=64, base_method="xla",
                            summa_impl="shard_map"),
    )
    q, r = cacqr.factor_hybrid(grid_rect, a, cfg)
    ortho = float(validate.qr_orthogonality(grid_rect, q, layout="1d"))
    assert ortho < 1e-5, ortho
    res = float(validate.qr_residual(grid_rect, a.data, q, r, layout="1d"))
    assert res < 1e-5, res


def test_factor_hybrid_rejects_square(grid122):
    import jax.numpy as jnp
    import pytest

    from capital_tpu.algs import cacqr

    with pytest.raises(ValueError):
        cacqr.factor_hybrid(grid122, jnp.ones((64, 16)))


def test_formq_inplace_matches(grid_rect):
    """Chunked in-place Q formation is numerically identical to the plain
    trmm path."""
    import jax
    import numpy as np

    from capital_tpu import matrix
    from capital_tpu.algs import cacqr

    m, n = 2048, 128
    a = matrix.tall_skinny(grid_rect, m, n, jax.random.key(5))
    base = cacqr.Config(num_iter=2, base_method="xla")
    chunked = cacqr.Config(num_iter=2, base_method="xla", formq_chunks=4)
    q0, r0 = cacqr.factor_1d(grid_rect, a, base)
    q1, r1 = cacqr.factor_1d(grid_rect, a, chunked)
    np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)


def test_gram_packed_matches(grid222):
    """'packed' allreduces the tile-packed triangle (half the words, ref:
    policy.h:77-85) and must agree with the flat allreduce exactly."""
    m, n = 512, 256  # n % _PACK_T == 0 so the packed path engages
    a = matrix.tall_skinny(grid222, m, n, jax.random.key(6)).data
    g1 = cacqr.gram_1d(grid222, a, "allreduce")
    g2 = cacqr.gram_1d(grid222, a, "packed")
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
    # ragged n falls back to the flat allreduce (still correct)
    a2 = matrix.tall_skinny(grid222, 512, 48, jax.random.key(7)).data
    g3 = cacqr.gram_1d(grid222, a2, "packed")
    np.testing.assert_allclose(
        np.asarray(g3), np.asarray(a2).T @ np.asarray(a2), atol=1e-4)


def test_tri_pack_roundtrip():
    """Tile pack/unpack is exact for symmetric matrices and halves words."""
    n = 512
    u = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    g = jnp.asarray(u + u.T)
    p = cacqr._pack_tri(g)
    assert p.size == cacqr._tri_pack_size(n) < n * n * 0.63
    np.testing.assert_array_equal(np.asarray(cacqr._unpack_tri(p, n)),
                                  np.asarray(g))


@pytest.mark.parametrize("policy", ["allreduce", "two_stage", "packed"])
def test_gram_hybrid_policies_match(grid_rect, policy):
    """gram_hybrid lands G sharded on the (z, x) square view for every
    policy; two_stage is the hierarchical column_contig/column_alt tree
    (ref: cacqr.hpp:146-149)."""
    m, n = 2048, 256
    a = matrix.tall_skinny(grid_rect, m, n, jax.random.key(8)).data
    g = cacqr.gram_hybrid(grid_rect, a, policy)
    ref = np.asarray(a, dtype=np.float64).T @ np.asarray(a, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(g), ref, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("policy", ["two_stage", "packed"])
def test_factor_hybrid_gram_policies(grid_rect, policy):
    """The hybrid sweep honors cfg.gram_policy end to end."""
    m, n = 2048, 256
    a = matrix.tall_skinny(grid_rect, m, n, jax.random.key(10))
    cfg = cacqr.Config(
        num_iter=2, gram_policy=policy,
        chol=cholinv.Config(min_bc=64, base_method="xla"),
    )
    q, r = cacqr.factor_hybrid(grid_rect, a, cfg)
    assert float(validate.qr_orthogonality(grid_rect, q, layout="1d")) < 1e-5
    assert float(validate.qr_residual(grid_rect, a.data, q, r,
                                      layout="1d")) < 1e-5
